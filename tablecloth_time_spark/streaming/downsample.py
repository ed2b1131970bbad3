"""Streaming M4 downsampling — the live-dashboard tail path.

A live chart over an event stream wants the same pixel-bucket extremum
points the batch ``m4_downsample`` computes, fresh within seconds. M4 is
four mergeable struct min/max aggregates, which is exactly the shape
Structured Streaming's windowed state store handles natively — the same
partial forms merge across micro-batches, and the watermark closes and
emits buckets in append mode (bounded state, exactly-once with a
checkpoint, like streaming_rollup).

Metric units only (window() needs a fixed duration); the emitted
``bucket`` (window start) equals the batch operator's
``down_to_nearest`` floor for metric units, so streamed tails and batch
backfills line up row-for-row — pinned by tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tablecloth_time_spark.operators.downsample import (
    m4_agg_exprs,
    m4_point_exprs,
)
from tablecloth_time_spark.streaming.rollup import _interval_string


def streaming_m4(
    stream: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    interval: int,
    unit: str = "minute",
    watermark: str = "10 minutes",
    bucket_col: str = "bucket",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming DataFrame of finalized M4 pixel rows (append mode —
    one row per (keys, bucket) once the watermark passes the bucket)."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    win = F.window(F.col(ts_col), _interval_string(interval, unit))
    grouped = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*ks, win.alias("__w"))
        .agg(*m4_agg_exprs(ts_col, value_col, order_cols))
    )
    return grouped.select(
        *ks, F.col("__w.start").alias(bucket_col), *m4_point_exprs()
    )
