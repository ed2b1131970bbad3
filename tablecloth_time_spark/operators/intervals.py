"""Interval algebra: bucketized range join, gaps-and-islands union
(merge_intervals), and per-bucket coverage/uptime (interval_coverage).

Spark has no native band/interval join; the naive form

    points JOIN intervals ON p.ts >= i.start AND p.ts < i.end

plans as BroadcastNestedLoopJoin (small side) or a cartesian product —
O(|points| x |intervals|) compared rows, unpayable when both sides are
large. The standard distributed shape (used by Databricks' range-join hints
and interval libraries like bioframe/Sedona) is BUCKETIZATION:

1. pick a bucket width W ~ the typical interval length;
2. explode each interval to the buckets it overlaps
   (floor(start/W) .. floor((end-1)/W) — ``sequence`` + ``explode``,
   executor-side, no Python);
3. equi-join points on (keys..., bucket = floor(ts/W)) — a plain shuffled
   hash join Catalyst/AQE can optimize;
4. re-apply the exact predicate as a post-filter.

Each point lands in exactly one bucket, so a point x interval pair can
match in at most one bucket — no dedup pass needed. Cost: the interval
side inflates by ceil(len/W)+1 rows per interval (bounded by choosing W),
and the join compares only per-bucket pairs instead of all pairs.

Skew note: a bucket holding a hot interval set still concentrates on one
reducer; AQE skew-join handles the join-side skew, and extreme cases can
pre-salt the bucket column. A degenerate interval (end <= start) matches
nothing, mirroring the half-open predicate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tablecloth_time_spark.functions.timeops import to_epoch_millis
from tablecloth_time_spark.functions.units import milliseconds_in, normalize_unit

_BUCKET = "__iv_bucket"
_SALT = "__iv_salt"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    on: str | list[str] | None = None,
    bucket_width: int = 1,
    unit: str = "hour",
    how: str = "inner",
    salt: int = 0,
) -> DataFrame:
    """Join each point to every interval with ``start <= ts < end``
    (half-open), optionally also equi-matching key columns ``on``.

    ``how``: 'inner' keeps matched pairs; 'left' keeps unmatched points
    with null interval columns. Output = point columns + interval columns
    (minus join keys); colliding names must be resolved by the caller
    before the join (raises otherwise).

    ``salt > 1`` splits each HOT bucket across ``salt`` reducers: every
    interval-bucket row is replicated to all ``salt`` sub-buckets while
    each point hashes (on its timestamp) into exactly one — results are
    identical, the interval side inflates x``salt``, and a bucket that
    concentrates most points (a flash-event hour at 10^12 rows) no longer
    lands on one reducer. AQE skew-join handles moderate skew on its own;
    the explicit salt is for the pathological hot-bucket case.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on or [])
    width_ms = bucket_width * milliseconds_in(normalize_unit(unit))
    collide = [
        c for c in intervals.columns if c not in keys and c in points.columns
    ]
    if collide:
        raise ValueError(
            f"interval columns {collide} collide with point columns; "
            "rename before joining"
        )

    s_ms = to_epoch_millis(start_col)
    e_ms = to_epoch_millis(end_col)
    # floor-div of the half-open range: last covered bucket is (end-1)//W
    iv = intervals.filter(e_ms > s_ms).withColumn(
        _BUCKET,
        F.explode(
            F.sequence(
                F.floor(s_ms / width_ms), F.floor((e_ms - 1) / width_ms)
            )
        ),
    )
    pt = points.withColumn(_BUCKET, F.floor(to_epoch_millis(point_ts) / width_ms))

    if salt and salt > 1:
        iv = iv.withColumn(
            _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        # hash ALL point columns, not just the timestamp: flash-event hot
        # buckets often share one (truncated) timestamp, which would map
        # every hot point to the same sub-bucket and defeat the salt
        pt = pt.withColumn(
            _SALT,
            F.pmod(
                F.xxhash64(*[F.col(c) for c in points.columns]), F.lit(salt)
            ),
        )

    cond = [pt[_BUCKET] == iv[_BUCKET]]
    if salt and salt > 1:
        cond.append(pt[_SALT] == iv[_SALT])
    for k in keys:
        cond.append(pt[k] == iv[k])
    p_ts = to_epoch_millis(pt[point_ts])
    exact = (p_ts >= to_epoch_millis(iv[start_col])) & (
        p_ts < to_epoch_millis(iv[end_col])
    )

    iv_payload = [c for c in intervals.columns if c not in keys]
    joined = pt.join(iv, [*cond, exact], how)
    return joined.select(
        *[pt[c] for c in points.columns], *[iv[c] for c in iv_payload]
    )


def merge_intervals(
    df: DataFrame,
    keys: str | list[str],
    start_col: str = "start",
    end_col: str = "end",
    min_gap: int = 0,
    gap_unit: str = "millisecond",
    out_start: str = "start",
    out_end: str = "end",
    count_col: str = "n_merged",
) -> DataFrame:
    """Union overlapping (or near-adjacent) intervals per key into maximal
    disjoint spans — the classic gaps-and-islands shape (coalescing alert
    windows, session spans, maintenance windows).

    Two intervals belong to one span when the next one starts no more than
    ``min_gap`` (x ``gap_unit``) after the running maximum end of everything
    seen so far; half-open semantics, so with min_gap=0 touching intervals
    [a,b) + [b,c) merge. The plan is pure window expressions over ONE
    Exchange (partition by keys, order by start): running max of end,
    island-start flag, running island id, then a (keys, island) aggregate
    that reuses the window's sort. No Python, no join, no self-cartesian;
    at 10^12 intervals this is one shuffle of (keys, start, end).
    """
    from pyspark.sql.window import Window

    from tablecloth_time_spark.functions.timeops import to_epoch_micros

    ks = [keys] if isinstance(keys, str) else list(keys)
    gap_us = 1000 * min_gap * milliseconds_in(normalize_unit(gap_unit))
    # gap arithmetic at FULL timestamp precision (microseconds) — a
    # millisecond pivot here would silently bridge sub-ms gaps
    s_us = to_epoch_micros(start_col)
    e_us = to_epoch_micros(end_col)

    # order by the ORIGINAL columns, and the merged span carries the
    # original values untouched (min/max of the inputs, no round-trip)
    w = Window.partitionBy(*ks).orderBy(
        F.col(start_col).asc(), F.col(end_col).asc()
    )
    # running max end over STRICTLY PRECEDING rows: null on each key's
    # first row -> always starts a new island
    prev_max_end = F.max(e_us).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = (
        F.when(prev_max_end.isNull(), F.lit(1))
        .when(s_us > prev_max_end + F.lit(gap_us), F.lit(1))
        .otherwise(F.lit(0))
    )
    marked = df.select(
        *ks,
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
        F.sum(new_island).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("__island"),
    )
    return (
        marked.groupBy(*ks, "__island")
        .agg(
            F.min("__s").alias(out_start),
            F.max("__e").alias(out_end),
            F.count(F.lit(1)).alias(count_col),
        )
        .drop("__island")
    )


def interval_coverage(
    df: DataFrame,
    keys: str | list[str],
    start_col: str = "start",
    end_col: str = "end",
    interval: int = 1,
    unit: str = "hour",
    bucket_col: str = "bucket",
    covered_col: str = "covered_ms",
    fraction_col: str = "coverage",
    merge_first: bool = True,
) -> DataFrame:
    """Per-(keys, time-bucket) covered milliseconds and coverage fraction —
    the uptime/SLO view of an interval set (alert windows, session spans,
    maintenance windows).

    Each interval explodes to the buckets it overlaps (``sequence`` on the
    floored bucket ids, executor-side like interval_join), its span is
    clipped to each bucket's bounds, and a hash aggregate sums per
    (keys, bucket) — all map-side combinable. Overlapping input intervals
    would double-count, so by default the input is first run through
    ``merge_intervals`` (one extra window Exchange); pass
    ``merge_first=False`` when the caller already holds disjoint spans.

    Buckets no interval touches are absent (coverage 0 rows are a grid
    question — compose with resample_to_regular_grid's grid if needed).
    Half-open [start, end) semantics throughout. Buckets use floor
    division on epoch millis — identical to ``down_to_nearest`` for
    post-epoch timestamps (the engine's data domain).
    """
    if interval < 1:
        raise ValueError(f"interval must be >= 1, got {interval}")
    ks = [keys] if isinstance(keys, str) else list(keys)
    if merge_first:
        df = merge_intervals(
            df, ks, start_col, end_col,
            out_start=start_col, out_end=end_col,
        )
    width_ms = interval * milliseconds_in(normalize_unit(unit))
    s_ms = to_epoch_millis(start_col)
    e_ms = to_epoch_millis(end_col)
    exploded = df.filter(e_ms > s_ms).select(
        *ks,
        s_ms.alias("__s"),
        e_ms.alias("__e"),
        F.explode(
            F.sequence(
                F.floor(s_ms / width_ms), F.floor((e_ms - 1) / width_ms)
            )
        ).alias("__b"),
    )
    b_lo = F.col("__b") * width_ms
    covered = F.least(F.col("__e"), b_lo + width_ms) - F.greatest(
        F.col("__s"), b_lo
    )
    return (
        exploded.groupBy(*ks, F.timestamp_millis(b_lo).alias(bucket_col))
        .agg(F.sum(covered).alias(covered_col))
        .withColumn(
            fraction_col, F.col(covered_col) / F.lit(float(width_ms))
        )
    )
