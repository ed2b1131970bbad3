"""Gap-based sessionization — the event-time grouping between row and bucket.

A session is a maximal run of a key's events where consecutive gaps stay
within ``gap`` units. Two-step pure-window construction (the standard
scalable shape — one shuffle on the key, two ordered passes fused into one
sort by Catalyst):

1. ``is_new = gap_to_previous > gap`` via ``lag`` (first event -> new);
2. ``session_idx = running sum of is_new`` per key — a stable, dense
   per-key session ordinal, independent of absolute time.

``session_stats`` folds a sessionized frame to one row per session
(start/end/duration/count + caller aggregates) with an ordinary
partial/final hash aggregate.

Batch analogue of Spark's Structured Streaming ``session_window``; this
form also yields the per-event session id (which session_window's
groupBy-only API does not expose) and has a direct SQL translation, so the
driver oracle can pin it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tablecloth_time_spark.functions.timeops import to_epoch_millis
from tablecloth_time_spark.functions.units import milliseconds_in, normalize_unit


def sessionize(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    gap: int,
    unit: str = "minute",
    order_cols: list[str] | None = None,
    session_col: str = "session_idx",
    validate: bool = False,
) -> DataFrame:
    """Append a dense per-key session ordinal (0-based, time order).

    ``order_cols`` breaks timestamp ties deterministically (e.g. event_id);
    a gap STRICTLY greater than ``gap`` units starts a new session —
    gap == threshold stays in-session. Spark's ``session_window``
    (streaming/rollup.streaming_sessionize) agrees on that boundary: its
    per-event windows ``[t, t+gap)`` merge when adjacent (``start <=
    prev_end``), so an event exactly ``gap`` later also merges
    (contract-pinned by tests/test_streaming.py
    test_session_gap_boundary_contract).

    Null timestamps have no place on a session timeline: a null-ts row
    sorts first, opens a session of its own, AND forces the next real row
    to open another (its lag is null) — silently fragmenting the key's
    sessions. ``validate=True`` spends one limit-1 job to raise instead.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    if validate and df.filter(F.col(ts_col).isNull()).limit(1).count() > 0:
        raise ValueError(
            f"sessionize: time column {ts_col!r} contains nulls — drop or "
            "impute them first (null rows fragment the session sequence)"
        )
    gap_ms = gap * milliseconds_in(normalize_unit(unit))
    order = [to_epoch_millis(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(*ks).orderBy(*order)
    prev = F.lag(to_epoch_millis(ts_col)).over(w)
    is_new = F.when(
        prev.isNull() | (to_epoch_millis(ts_col) - prev > gap_ms), F.lit(1)
    ).otherwise(F.lit(0))
    run = (
        Window.partitionBy(*ks)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(session_col, (F.sum(is_new).over(run) - F.lit(1)).cast("long"))


def session_stats(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    gap: int,
    unit: str = "minute",
    aggs: dict[str, tuple[str, str]] | None = None,
    order_cols: list[str] | None = None,
    validate: bool = False,
) -> DataFrame:
    """One row per (key, session): start/end/duration_ms/n_events plus
    caller aggregates ({out_name: (kind, src_col)}, kinds as in rollup)."""
    from tablecloth_time_spark.operators.rolling import ROLLING_AGGS

    ks = [keys] if isinstance(keys, str) else list(keys)
    s = sessionize(df, ks, ts_col, gap, unit, order_cols, validate=validate)
    exprs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (to_epoch_millis(F.max(ts_col)) - to_epoch_millis(F.min(ts_col))).alias(
            "duration_ms"
        ),
        F.count(F.lit(1)).alias("n_events"),
    ]
    for name, (kind, src) in (aggs or {}).items():
        if kind not in ROLLING_AGGS:
            raise ValueError(f"unsupported session agg {kind!r}")
        exprs.append(ROLLING_AGGS[kind](src).alias(name))
    return s.groupBy(*ks, "session_idx").agg(*exprs)
