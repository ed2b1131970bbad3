"""Streaming ingest deduplication: watermark-bounded exact content dedup.

A 100 TB training-data ingest is a stream: documents arrive continuously,
and the same document often arrives more than once (retries, overlapping
crawls, at-least-once upstream delivery). The batch `exact_dedup`
(operators/dedup.py) dedups a corpus at rest; this module suppresses
duplicates AT THE DOOR, with state bounded by an event-time watermark —
the streaming analogue of the batch fingerprint-groupBy:

- fingerprint = md5(normalized text): the wide text column never enters
  the dedup state, which stores O(distinct fingerprints within the
  watermark horizon) * 32 bytes.
- `dropDuplicatesWithinWatermark` keeps the first-seen row per
  fingerprint and expires state once the watermark passes, so unbounded
  streams run in bounded memory. Duplicates that recur further apart
  than the horizon are caught by the periodic batch dedup sweep — the
  standard two-tier design.
- State lives in the checkpoint: suppression is exactly-once across
  restarts (a duplicate arriving in a later run of the same query is
  still suppressed — proven by tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from tablecloth_time_spark.functions.text import fingerprint_md5


def streaming_dedup_exact(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """Suppress rows whose normalized text content was already seen
    within the watermark horizon. Keeps the first-seen row (all input
    columns + the fingerprint)."""
    out = stream_df.withColumn(fingerprint_col, fingerprint_md5(text_col))
    out = out.withWatermark(ts_col, watermark)
    return out.dropDuplicatesWithinWatermark([fingerprint_col])
