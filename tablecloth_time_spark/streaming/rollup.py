"""Structured Streaming tier rollup — the live-tail path.

The engine's primary maintenance mode is snapshot-incremental batch
(plans/continuous.py), matching the reference's batch model (SURVEY.md
§1.4). This module is the complementary live path: the SAME mergeable
aggregate semantics as operators/rollup.py expressed as a Structured
Streaming query, for deployments that want second/minute tiers fresh
within seconds instead of per-snapshot.

Design:
- event-time bucketing uses ``F.window(ts, interval)`` — for metric units
  window.start is exactly ``down_to_nearest(ts, n, unit)``, and using
  window() (not the bare expr) is what lets the state store drop buckets
  once the watermark passes them;
- the watermark bounds BOTH late data and state size: a 10-minute
  watermark on a second tier keeps ~600 buckets per conversation in state,
  regardless of stream length;
- aggregates reuse the partial/mergeable forms (count/sum/min/max,
  first/last as order-struct min/max), so a streaming tier can later be
  merged into batch tier state without recomputation — append-mode output
  per closed bucket is the streaming analogue of the batch dirty-partition
  rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tablecloth_time_spark.functions.units import (
    is_calendar_unit,
    milliseconds_in,
    normalize_unit,
)
from tablecloth_time_spark.operators.rollup import _parse_aggs


def _interval_string(interval: int, unit: str) -> str:
    u = normalize_unit(unit)
    if is_calendar_unit(u):
        raise ValueError(
            "streaming rollup supports metric units only (calendar buckets "
            "have no fixed duration for window()); tier months/quarters/"
            "years via the batch cascade instead"
        )
    return f"{interval * milliseconds_in(u)} milliseconds"


def streaming_rollup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    interval: int,
    unit: str,
    aggs: dict[str, tuple[str, str]],
    order_cols: list[str] | None = None,
    watermark: str = "10 minutes",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Streaming DataFrame of finalized tier rows (append after watermark).

    ``stream`` is any streaming source in the transcripts shape
    (``spark.readStream.schema(...).parquet(dir)``, Kafka + from_json, ...).
    """
    specs = _parse_aggs(aggs)
    order_cols = order_cols or [ts_col]
    win = F.window(F.col(ts_col), _interval_string(interval, unit))
    partials = [e for s in specs for e in s.partial_exprs(order_cols)]
    grouped = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys, win.alias("__w"))
        .agg(*partials)
    )
    return grouped.select(
        *keys,
        F.col("__w.start").alias(bucket_col),
        *[s.final_expr() for s in specs],
    )


def streaming_hopping_rollup(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    width: int,
    hop: int,
    unit: str,
    aggs: dict[str, tuple[str, str]],
    order_cols: list[str] | None = None,
    watermark: str = "10 minutes",
    start_col: str = "window_start",
    end_col: str = "window_end",
) -> DataFrame:
    """Streaming hopping (sliding) windows — the live twin of
    ``operators/rollup.hopping_rollup``: the SAME native
    ``F.window(ts, width, hop)`` Expand feeds the stateful aggregate, so
    streamed output on a closed input equals the batch operator row for
    row (pinned in tests). State per key is ~width/hop open windows
    within the watermark horizon; each window row appends exactly once
    when the watermark passes its end. Requires hop <= width (dead-zone
    configurations are a batch-only literal)."""
    if width <= 0 or hop <= 0 or hop > width:
        raise ValueError(
            "streaming_hopping_rollup: need 0 < hop <= width, got "
            f"width={width}, hop={hop}"
        )
    u = normalize_unit(unit)
    if is_calendar_unit(u):
        raise ValueError(
            "streaming hopping windows support metric units only"
        )
    specs = _parse_aggs(aggs)
    order_cols = order_cols or [ts_col]
    width_ms = width * milliseconds_in(u)
    hop_ms = hop * milliseconds_in(u)
    win = F.window(
        F.col(ts_col), f"{width_ms} milliseconds", f"{hop_ms} milliseconds"
    )
    partials = [e for s in specs for e in s.partial_exprs(order_cols)]
    grouped = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys, win.alias("__w"))
        .agg(*partials)
    )
    return grouped.select(
        *keys,
        F.col("__w.start").alias(start_col),
        F.col("__w.end").alias(end_col),
        *[s.final_expr() for s in specs],
    )


def streaming_profile(
    stream: DataFrame,
    ts_col: str,
    cols: list[str],
    interval: int,
    unit: str,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
    bucket_col: str = "bucket",
) -> DataFrame:
    """Streaming twin of ``operators/profile.profile_rollup`` — per-bucket
    data-quality stats on the live feed, so shape regressions (a producer
    starting to send nulls, a unit change) alert within the watermark
    instead of at the next batch audit. Same mergeable aggregates
    (count/null/NaN/min/max/sum + HLL distinct — the sketch form is the
    only distinct that streams; exact audits stay batch), same long
    (bucket, column) output via a post-aggregate explode, so streamed
    rows on a closed input equal ``profile_rollup(exact=False)`` row for
    row (pinned in tests). HLL merge is register-max — commutative and
    associative — so the sketch counts are batch-identical, not merely
    close."""
    if not cols:
        raise ValueError("streaming_profile: need at least one column")
    keys = keys or []
    win = F.window(F.col(ts_col), _interval_string(interval, unit))
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        v = F.col(c).cast("double")
        finite = v.isNotNull() & ~F.isnan(v)
        fv = F.when(finite, v)
        aggs += [
            F.sum(F.when(v.isNull(), 1).otherwise(0)).alias(f"__null{i}"),
            F.sum(F.when(v.isNotNull() & F.isnan(v), 1).otherwise(0)).alias(
                f"__nan{i}"
            ),
            F.min(fv).alias(f"__min{i}"),
            F.max(fv).alias(f"__max{i}"),
            F.sum(fv).alias(f"__sum{i}"),
            F.count(fv).alias(f"__cnt{i}"),
            F.approx_count_distinct(F.col(c)).alias(f"__dst{i}"),
        ]
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys, win.alias("__w"))
        .agg(*aggs)
    )
    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__null{i}").cast("bigint").alias("n_null"),
            F.col(f"__nan{i}").cast("bigint").alias("n_nan"),
            F.col(f"__min{i}").alias("min"),
            F.col(f"__max{i}").alias("max"),
            F.try_divide(
                F.col(f"__sum{i}"), F.col(f"__cnt{i}").cast("double")
            ).alias("mean"),
            F.col(f"__dst{i}").cast("bigint").alias("n_distinct"),
        )
        for i, c in enumerate(cols)
    ]
    exploded = agg.select(
        *keys,
        F.col("__w.start").alias(bucket_col),
        F.col("__n").alias("n"),
        F.explode(F.array(*rows)).alias("__e"),
    )
    return exploded.select(
        *keys, bucket_col, "n",
        F.col("__e.column").alias("column"),
        F.col("__e.n_null").alias("n_null"),
        F.col("__e.n_nan").alias("n_nan"),
        F.col("__e.min").alias("min"),
        F.col("__e.max").alias("max"),
        F.col("__e.mean").alias("mean"),
        F.col("__e.n_distinct").alias("n_distinct"),
    )


def streaming_rollup_to_sink(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    interval: int,
    unit: str,
    aggs: dict[str, tuple[str, str]],
    sink_path: str,
    checkpoint_dir: str,
    order_cols: list[str] | None = None,
    watermark: str = "10 minutes",
    available_now: bool = False,
):
    """Start (or one-shot drain with available_now) the rollup to parquet.

    Append mode: a bucket row is emitted exactly once, when the watermark
    closes it — downstream consumers see immutable tier rows, and the
    checkpoint makes the query exactly-once across restarts.
    """
    out = streaming_rollup(
        stream, keys, ts_col, interval, unit, aggs,
        order_cols=order_cols, watermark=watermark,
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_sessionize(
    stream: DataFrame,
    keys: list[str],
    ts_col: str,
    gap: int,
    unit: str = "minute",
    aggs: dict[str, tuple[str, str]] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming per-session aggregates via native ``session_window``.

    One output row per closed session (append once the watermark passes
    the session's end), with the same stat columns as the batch
    ``operators/sessions.session_stats``: session_start / session_end
    (last event) / duration_ms / n_events + caller aggregates. State per
    key is bounded by the watermark — sessions merge server-side as late
    events arrive inside it.

    Boundary semantics: ``session_window`` is STRICT — an event exactly
    ``gap`` after the previous one starts a NEW session, while the batch
    ``sessionize`` keeps it (its rule is ``gap_to_previous > gap``). The
    two agree everywhere except gaps exactly equal to the threshold.
    """
    specs = _parse_aggs(aggs or {})
    sw = F.session_window(F.col(ts_col), _interval_string(gap, unit))
    partials = [e for s in specs for e in s.partial_exprs([ts_col])]
    grouped = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys, sw.alias("__sw"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            *partials,
        )
    )
    return grouped.select(
        *keys,
        "session_start",
        "session_end",
        (
            F.unix_millis(F.col("session_end").cast("timestamp"))
            - F.unix_millis(F.col("session_start").cast("timestamp"))
        ).alias("duration_ms"),
        "n_events",
        *[s.final_expr() for s in specs],
    )
