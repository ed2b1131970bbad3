"""Cohort retention over event streams.

Classic product/ops analysis the reference's resample recipe composes
toward but never packages: group users by the time bucket of their FIRST
activity (the cohort), then for each later bucket count how many of that
cohort came back. Output is the retention triangle
(cohort, period offset) -> distinct users + fraction of the cohort.

Plan shape (scales to 10^12 events):
1. distinct (user, bucket) — hash aggregate, map-side combined, so the
   shuffle carries one row per user-bucket pair, not per event;
2. per-user cohort = min(bucket) over a user-partitioned window — one
   exchange on user;
3. (cohort, offset) counts — rows are already unique per (user, bucket),
   so a plain COUNT is a distinct-user count; tiny output frame;
4. retention fraction via a window over the TINY result (size at offset 0).

Only metric units (day/week/...) are supported for the offset arithmetic;
calendar cohorts (month) use months_between on the calendar floors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tablecloth_time_spark.functions.timeops import down_to_nearest, to_epoch_millis
from tablecloth_time_spark.functions.units import (
    is_calendar_unit,
    milliseconds_in,
    months_in,
    normalize_unit,
)


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    interval: int = 1,
    unit: str = "week",
    cohort_col: str = "cohort",
    offset_col: str = "offset",
) -> DataFrame:
    """Retention triangle: for each first-activity cohort bucket and each
    period offset >= 0, the distinct users active and the fraction of the
    cohort they represent.

    Output: (cohort timestamp, offset long, n_users long,
    cohort_size long, retention double in (0, 1]).
    """
    u = normalize_unit(unit)
    bucket = down_to_nearest(ts_col, interval, u).alias("__bucket")
    # 1. one row per (user, bucket): NULL users don't form cohorts
    activity = (
        df.filter(F.col(user_col).isNotNull())
        .groupBy(F.col(user_col).alias("__user"), bucket)
        .agg(F.lit(1).alias("__one"))
        .drop("__one")
    )
    # 2. cohort = the user's first bucket
    w_user = Window.partitionBy("__user")
    with_cohort = activity.withColumn(
        "__cohort", F.min("__bucket").over(w_user)
    )
    # 3. offset in whole periods from the cohort bucket
    if is_calendar_unit(u):
        off = (
            F.months_between(F.col("__bucket"), F.col("__cohort"))
            / months_in(u)
            / interval
        ).cast("long")
    else:
        step_ms = interval * milliseconds_in(u)
        off = (
            (to_epoch_millis("__bucket") - to_epoch_millis("__cohort"))
            / F.lit(step_ms)
        ).cast("long")
    counts = (
        with_cohort.select(
            F.col("__cohort").alias(cohort_col), off.alias(offset_col)
        )
        # rows are unique per (user, bucket) => COUNT(*) == distinct users
        .groupBy(cohort_col, offset_col)
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    # 4. fraction of the cohort — window over the tiny triangle frame
    w_cohort = Window.partitionBy(cohort_col)
    size = F.max(
        F.when(F.col(offset_col) == 0, F.col("n_users"))
    ).over(w_cohort)
    return counts.select(
        cohort_col,
        offset_col,
        "n_users",
        size.alias("cohort_size"),
        (F.col("n_users") / size).alias("retention"),
    )


def funnel(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    step_col: str,
    steps: list[str],
    within: int | None = None,
    unit: str = "hour",
) -> DataFrame:
    """Ordered k-step funnel (the Amplitude/Mixpanel-style conversion
    query): per key, the FIRST time each step completes IN ORDER —
    step i counts only at/after the key's step i-1 completion time
    (``ts >= prev``, so a same-timestamp pair completes both). ``within``
    bounds the whole funnel to ``within x unit`` after step 1 (the
    conversion window).

    "First B after the first A" is NOT min(B): a key can click before
    ever viewing and again after — so each step is its own conditional
    re-aggregation. The plan is k passes, each one:

      scan(step == s_i, PUSHED to parquet — only that step's rows are
      read) -> equi-join to the per-key funnel frame (keys shuffle; the
      frame is one row per key, orders of magnitude under the fact
      table) -> min() hash aggregate

    chained left joins keep keys that stall mid-funnel (null later
    steps). k is small and fixed (3-5 steps); there is no window over
    the big table at all, and each pass reads only its own step's rows —
    at 100 TB the funnel costs k filtered scans + k key-partitioned
    aggregates, never a sort of the full fact table.

    Output: keys..., ts_1..ts_k (timestamps), steps_completed,
    converted (completed every step; within-window if ``within``).
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    if len(steps) < 2:
        raise ValueError(f"funnel needs >= 2 steps, got {steps!r}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps!r}")
    deadline_ms = (
        within * milliseconds_in(normalize_unit(unit))
        if within is not None
        else None
    )

    ms = to_epoch_millis(ts_col)
    base = df.select(*ks, ms.alias("__ms"), F.col(step_col).alias("__step"))
    result = (
        base.filter(F.col("__step") == steps[0])
        .groupBy(*ks)
        .agg(F.min("__ms").alias("__ms_1"))
    )
    for i, s in enumerate(steps[1:], start=2):
        prev = F.col(f"__ms_{i - 1}")
        cond = F.col("__ms") >= prev
        if deadline_ms is not None:
            cond = cond & (F.col("__ms") <= F.col("__ms_1") + deadline_ms)
        carry = [f"__ms_{j}" for j in range(1, i)]
        stepped = (
            base.filter(F.col("__step") == s)
            .join(result.select(*ks, *carry), ks)
            .filter(cond)
            .groupBy(*ks)
            .agg(F.min("__ms").alias(f"__ms_{i}"))
        )
        result = result.join(stepped, ks, "left")

    ts_cols = [
        F.timestamp_millis(F.col(f"__ms_{i}")).alias(f"ts_{i}")
        for i in range(1, len(steps) + 1)
    ]
    completed = sum(
        (F.col(f"__ms_{i}").isNotNull().cast("int") for i in
         range(1, len(steps) + 1)),
        start=F.lit(0),
    )
    return result.select(
        *ks,
        *ts_cols,
        completed.alias("steps_completed"),
        F.col(f"__ms_{len(steps)}").isNotNull().alias("converted"),
    )


def survival_curve(
    df: DataFrame,
    duration_col: str,
    step: float,
    keys: list[str] | None = None,
    max_steps: int | None = None,
) -> DataFrame:
    """Empirical survival curve over a duration column: for each grid
    point t = 0, step, 2*step, ... the fraction of entities whose
    duration is >= t (the product-analytics view of "how long do
    sessions/conversations last", the complement of the duration CDF;
    with complete durations and no censoring the Kaplan-Meier estimator
    reduces to exactly this empirical curve).

    Plan: ONE hash aggregate buckets durations to the grid
    (floor(d/step) — map-side combinable, the rollup shape), then the
    descending cumulative sum and the divide-by-total run as window
    expressions over the TINY bucket frame (rows ∝ distinct grid
    points, not entities). ``keys`` gives one curve per group (e.g. per
    cohort week); ``max_steps`` clips the tail into a final catch-all
    point (like the histogram edge bins).

    Output: keys..., t (grid point, double), n_at_least (entities with
    duration >= t), survival (fraction of the group's total). Grid
    points with no exact-bucket mass still appear implicitly via the
    next lower bucket — downstream plotting can gap-fill with ffill,
    but the curve's VALUE at every emitted t is exact.
    """
    if step <= 0:
        raise ValueError(f"step must be positive, got {step}")
    ks = list(keys or [])
    d = F.col(duration_col).cast("double")
    bucket = F.floor(d / F.lit(float(step))).cast("long")
    if max_steps is not None:
        bucket = F.least(F.lit(int(max_steps)), bucket)
    binned = (
        # NaN >= 0 is TRUE in Spark and floor(NaN) casts to bucket 0 —
        # the histogram module's phantom-sample hazard; drop NaN like null
        df.filter(d.isNotNull() & ~F.isnan(d) & (d >= 0))
        .groupBy(*ks, bucket.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = Window.partitionBy(*ks).orderBy(F.col("__b").asc())
    # entities with duration >= t are ALL buckets at or above t
    from_here = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    whole = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    n_at_least = F.sum("__n").over(from_here)
    total = F.sum("__n").over(whole)
    return binned.select(
        *ks,
        (F.col("__b").cast("double") * F.lit(float(step))).alias("t"),
        n_at_least.alias("n_at_least"),
        (n_at_least.cast("double") / total.cast("double")).alias(
            "survival"
        ),
    )


def rolling_active_users(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    window: int = 7,
    out_day: str = "day",
    out_count: str = "active_users",
) -> DataFrame:
    """Rolling distinct-active-user counts — DAU/WAU/MAU: for each day,
    how many distinct users were active in the trailing ``window`` days
    ([day - window + 1, day] inclusive).

    COUNT(DISTINCT) over a sliding window is the naive trap (a range
    join or a per-day re-scan). Instead each user's activity is turned
    into COVERAGE INTERVALS: an active day d covers output days
    [d, d + window) — merge those per user into disjoint spans
    (``merge_intervals``, one windowed pass), then the day's active
    count is simply how many spans cover it: explode spans to days
    (``sequence``, executor-side, <= window rows per merged-span day)
    and COUNT — a plain sum, no distinct, because a user's merged spans
    never overlap. Three rollup-class shuffles of (user, day)-sized
    frames; the raw fact table is touched once by the initial distinct.

    Trailing semantics mean days up to ``window - 1`` past the last
    activity still carry that activity (a Monday-active user is WAU
    through Sunday) — filter the tail caller-side if the grid should
    stop at the data's horizon.

    Output: (out_day timestamp, out_count) — one row per day covered by
    at least one user's window.
    """
    from tablecloth_time_spark.operators.intervals import merge_intervals

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    day = down_to_nearest(ts_col, 1, "day")
    # a NULL user id must not become its own "distinct user" (matches
    # COUNT(DISTINCT user) semantics and cohort_retention's filter)
    acts = (
        df.filter(F.col(user_col).isNotNull())
        .select(F.col(user_col).alias("__u"), day.alias("__d"))
        .distinct()
    )
    iv = acts.select(
        "__u",
        F.col("__d").alias("__start"),
        (F.col("__d") + F.expr(f"INTERVAL {int(window)} DAY")).alias(
            "__end"
        ),
    )
    merged = merge_intervals(
        iv, ["__u"], "__start", "__end", out_start="__s", out_end="__e"
    )
    days = merged.select(
        F.explode(
            F.sequence(
                F.col("__s"),
                F.col("__e") - F.expr("INTERVAL 1 DAY"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias(out_day)
    )
    return days.groupBy(out_day).agg(F.count(F.lit(1)).alias(out_count))
