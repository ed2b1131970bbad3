"""Per-series feature extraction (tsfresh / catch22-style battery).

The standard "series -> fixed-width feature vector" step a training-data
pipeline runs before clustering, classification, or quality filtering of
time series at corpus scale. Every feature here is a published, public
definition (the tsfresh feature-calculator catalogue and the classic
moment/autocorrelation formulas); the implementation is pure Spark
window + aggregate expressions — no Python in the plan, one raw-data
shuffle.

Extends the reference's descriptive-statistics recipe (mean/min/max
over a column, /root/reference/README.md:20-36) to the full feature
battery the host ecosystem reaches for next.

Numerical contract: every moment-derived feature is computed from the
raw power sums (S1..S4) and lagged cross sums with EXPLICIT formulas,
so a SQL oracle can reproduce the identical operation sequence —
important because Spark's built-in ``skewness``/``kurtosis`` and
DuckDB's use different bias corrections and would never hash-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tablecloth_time_spark.functions.timeops import to_epoch_millis
from tablecloth_time_spark.functions.units import milliseconds_in, normalize_unit


def series_features(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed feature battery per key over the value series ordered by
    (``ts_col``, ``order_cols``):

    - ``n`` — observations (NULL/NaN values dropped first);
    - ``mean``, ``std_pop`` — population moments from power sums;
    - ``skewness``, ``kurtosis`` — population (biased) g1 and Pearson
      (non-excess) kurtosis m4/m2^2, from S1..S4;
    - ``abs_energy`` — sum of squares (tsfresh ``abs_energy``);
    - ``abs_sum_changes``, ``mean_abs_change`` — tsfresh
      ``absolute_sum_of_changes`` / ``mean_abs_change``;
    - ``autocorr1`` — lag-1 sample autocorrelation with the standard
      ACF denominator sum((x-mean)^2) over ALL n points;
    - ``n_mean_crossings`` — sign changes of (x - mean) between
      consecutive points (boundary touches where a point equals the
      mean count as no crossing, matching tsfresh
      ``number_crossing_m``'s strict sign product < 0);
    - ``longest_above`` — longest consecutive run strictly above the
      series mean (tsfresh ``longest_strike_above_mean``), 0 when no
      point exceeds the mean.

    Degenerate series follow SQL semantics via try_divide: n = 1 leaves
    the change/autocorr features NULL; zero variance leaves
    skewness/kurtosis/autocorr1 NULL (0/0), crossings 0.

    Plan: ONE raw-data Exchange (the per-key window) materializes the
    lagged value, the full-partition mean, and the run-id counter in a
    single sort; the per-key power-sum aggregate reuses that clustering
    (partials under the Window). The run-length branch aggregates
    (keys, run_id) — counts only, mergeable — and joins its one row per
    key back. Nothing wider than (keys, 8-byte sums) ever shuffles
    twice, so the operator holds the sessionize/arrival_stats plan
    class at 10^12 rows.
    """
    order_cols = order_cols or []
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull() & ~F.isnan(v)).select(
        *keys, F.col(ts_col).alias("__ts"), v.alias("__v"),
        *[F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)],
    )
    ordering = [F.col("__ts").asc()] + [
        F.col(f"__o{i}").asc() for i in range(len(order_cols))
    ]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    wfull = Window.partitionBy(*keys).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    x = F.col("__v")
    prev = F.lag(x).over(w)
    mu = F.avg(x).over(wfull)
    above = (x > mu).cast("int")
    run_start = F.when(
        F.lag(x).over(w).isNull()
        | ((x > mu).cast("int") != (F.lag(x).over(w) > mu).cast("int")),
        F.lit(1),
    ).otherwise(F.lit(0))
    run_id = F.sum(run_start).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = base.select(
        *keys,
        x.alias("__x"),
        prev.alias("__prev"),
        mu.alias("__mu"),
        above.alias("__above"),
        run_id.alias("__run"),
    )

    n = F.count(F.lit(1)).cast("double")
    s1 = F.sum("__x")
    s2 = F.sum(F.col("__x") * F.col("__x"))
    s3 = F.sum(F.col("__x") * F.col("__x") * F.col("__x"))
    s4 = F.sum(F.col("__x") * F.col("__x") * F.col("__x") * F.col("__x"))
    mean = s1 / n
    var_pop = s2 / n - mean * mean
    std_pop = F.sqrt(var_pop)
    # lagged cross sums over the n-1 adjacent pairs
    p = F.sum(F.col("__x") * F.col("__prev"))
    t1 = F.sum(F.when(F.col("__prev").isNotNull(), F.col("__x")))
    t2 = F.sum(F.col("__prev"))
    cnt = F.count("__prev").cast("double")
    acf_num = p - mean * (t1 + t2) + cnt * mean * mean
    acf_den = s2 - n * mean * mean
    moments = staged.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        mean.alias("mean"),
        std_pop.alias("std_pop"),
        F.try_divide(
            s3 / n - F.lit(3.0) * mean * (s2 / n) + F.lit(2.0) * mean * mean * mean,
            std_pop * std_pop * std_pop,
        ).alias("skewness"),
        F.try_divide(
            s4 / n
            - F.lit(4.0) * mean * (s3 / n)
            + F.lit(6.0) * mean * mean * (s2 / n)
            - F.lit(3.0) * mean * mean * mean * mean,
            var_pop * var_pop,
        ).alias("kurtosis"),
        s2.alias("abs_energy"),
        F.sum(F.abs(F.col("__x") - F.col("__prev"))).alias("abs_sum_changes"),
        F.try_divide(
            F.sum(F.abs(F.col("__x") - F.col("__prev"))), cnt
        ).alias("mean_abs_change"),
        F.try_divide(acf_num, acf_den).alias("autocorr1"),
        F.coalesce(
            F.sum(
                (
                    (F.col("__x") - F.col("__mu"))
                    * (F.col("__prev") - F.col("__mu"))
                    < F.lit(0.0)
                ).cast("long")
            ),
            F.lit(0),
        ).alias("n_mean_crossings"),
    )
    runs = (
        staged.filter(F.col("__above") == 1)
        .groupBy(*keys, "__run")
        .agg(F.count(F.lit(1)).alias("__len"))
        .groupBy(*keys)
        .agg(F.max("__len").alias("longest_above"))
    )
    return moments.join(runs, on=list(keys), how="left").select(
        *keys,
        "n", "mean", "std_pop", "skewness", "kurtosis", "abs_energy",
        "abs_sum_changes", "mean_abs_change", "autocorr1",
        "n_mean_crossings",
        F.coalesce(F.col("longest_above"), F.lit(0)).alias("longest_above"),
    )


def theil_sen_trend(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    interval: int = 1,
    unit: str = "day",
    slope_col: str = "slope",
    intercept_col: str = "intercept",
) -> DataFrame:
    """Theil-Sen robust trend per key: bucket the series to
    (``interval``, ``unit``) means, then slope = MEDIAN over all bucket
    pairs i<j of (y_j - y_i)/(x_j - x_i) and intercept = median of the
    per-bucket residuals y - slope*x (Theil 1950 / Sen 1968 — the
    standard outlier-robust alternative to OLS trend: up to ~29% of the
    points can be arbitrary outliers before the estimate breaks,
    where one bad point already drags a least-squares fit;
    complements the OLS members ``trend_fit`` / ``predict_linear``).

    The time axis is the bucket INDEX anchored at each key's first
    bucket (exact small integers — the same anchoring rationale as
    predict_linear), so the slope reads "value per ``unit``" and the
    intercept is the robust level at the series start.

    Scale contract: pair enumeration is O(buckets^2) PER KEY — by
    construction of the bucketing, bounded by the series span over the
    bucket width (e.g. 30 buckets -> 435 pairs for daily buckets over a
    month), NOT by the raw row count; raw rows fold into bucket means in
    one mergeable aggregate first. The self-join carries only the tiny
    per-key bucket frames, and the exact medians sort O(buckets^2)
    values per key inside a hash aggregate. Metric units only (a
    calendar-varying bucket width has no linear x axis).

    Keys with a single bucket have no pairs and are dropped (a trend
    needs two points). NULL/NaN values are dropped first.
    """
    u = normalize_unit(unit)
    width = interval * milliseconds_in(u)
    v = F.col(value_col).cast("double")
    ms = to_epoch_millis(ts_col)
    base = df.filter(v.isNotNull() & ~F.isnan(v))
    g = base.groupBy(
        *keys, (ms - ms % F.lit(width)).alias("__bms")
    ).agg(F.sum(v).alias("__s"), F.count(v).alias("__c"))
    wk = Window.partitionBy(*keys)
    g = g.select(
        *keys,
        (
            (F.col("__bms") - F.min("__bms").over(wk)) / F.lit(width)
        ).cast("double").alias("__x"),
        (F.col("__s") / F.col("__c")).alias("__y"),
    )
    a = g.select(
        *keys, F.col("__x").alias("__xa"), F.col("__y").alias("__ya")
    )
    b = g.select(
        *keys, F.col("__x").alias("__xb"), F.col("__y").alias("__yb")
    )
    slopes = (
        a.join(b, on=list(keys))
        .filter(F.col("__xb") > F.col("__xa"))
        .select(
            *keys,
            (
                (F.col("__yb") - F.col("__ya"))
                / (F.col("__xb") - F.col("__xa"))
            ).alias("__m"),
        )
    )
    med = slopes.groupBy(*keys).agg(
        F.expr("percentile(__m, 0.5)").alias("__slope"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    return (
        g.join(med, on=list(keys))
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("n_pairs").alias("n_pairs"),
            F.max("__slope").alias(slope_col),
            F.expr("percentile(__y - __slope * __x, 0.5)").alias(
                intercept_col
            ),
        )
    )


def winsorize(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    out_col: str | None = None,
    flag_col: str = "clipped",
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-key quantile winsorization: clamp ``value_col`` into its own
    key's [p_lo, p_hi] quantile band and flag the clamped rows — the
    standard robust-cleaning step before feeding heavy-tailed metrics to
    training or aggregation (a fat-finger price or a runaway counter
    stops dominating every mean downstream while the row itself
    survives, unlike a filter).

    ``exact=True`` uses the exact type-7 (linear-interpolation)
    percentile — measured byte-identical between Spark's ``percentile``
    and DuckDB's ``quantile_cont`` on identical groups, which is what
    makes the driver oracle exact with NO rounding. The exact aggregate
    buffers each key's values, so it is for keys that fit an executor
    (the usual per-entity series); at mega-key scale pass
    ``exact=False`` for ``percentile_approx`` (bounded-memory KLL-style
    sketch, rank error 1/``accuracy``) — same plan shape, approximate
    band edges, pytest-oracled only.

    NULL/NaN values pass through unclamped with a NULL flag (unknown
    can't be compared to a band); a key whose values are all NULL gets
    no band and passes through whole.

    Plan: one per-key aggregate (two percentiles in a single pass) +
    one equi-join of the two-column band frame back onto the rows —
    at 10^12 rows the band frame is |keys| rows and broadcasts; the
    clamp itself is a pure projection.
    """
    if not 0.0 <= p_lo <= p_hi <= 1.0:
        raise ValueError(f"winsorize: need 0 <= p_lo <= p_hi <= 1, got {p_lo}, {p_hi}")
    out_col = out_col or f"{value_col}_w"
    v = F.col(value_col).cast("double")
    if exact:
        agg = [
            F.expr(f"percentile({value_col}, {p_lo!r})").alias("__lo"),
            F.expr(f"percentile({value_col}, {p_hi!r})").alias("__hi"),
        ]
    else:
        agg = [
            F.expr(
                f"percentile_approx({value_col}, {p_lo!r}, {accuracy})"
            ).cast("double").alias("__lo"),
            F.expr(
                f"percentile_approx({value_col}, {p_hi!r}, {accuracy})"
            ).cast("double").alias("__hi"),
        ]
    q = df.filter(v.isNotNull() & ~F.isnan(v)).groupBy(*keys).agg(*agg)
    lo, hi = F.col("__lo"), F.col("__hi")
    return (
        df.join(F.broadcast(q), on=list(keys), how="left")
        .withColumn(
            out_col,
            F.when(v.isNull() | F.isnan(v), v).otherwise(
                F.least(F.greatest(v, lo), hi)
            ),
        )
        .withColumn(flag_col, ((v < lo) | (v > hi)).cast("int"))
        .drop("__lo", "__hi")
    )


def standardize(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    methods: tuple[str, ...] = ("zscore", "minmax", "robust"),
    prefix: str | None = None,
) -> DataFrame:
    """Per-key feature scaling, the training-prep staple: add one column
    per requested method —

    - ``zscore``: (x - mean) / std_pop (population moments from explicit
      power sums, the same cross-engine-mirrorable formulas as
      :func:`series_features`);
    - ``minmax``: (x - min) / (max - min), NULL when the key is constant
      (zero range carries no information, not infinity);
    - ``robust``: (x - median) / IQR (p75 - p25, exact type-7
      percentiles) — scikit-learn RobustScaler semantics, immune to the
      fat tails that stretch a min-max or z scale.

    One per-key aggregate computes every needed statistic in a single
    pass; the stats frame is |keys| rows and broadcasts back onto the
    rows, so the scaling itself is a pure projection — no second
    raw-data shuffle at any size. NULL/NaN values pass through NULL.
    Zero-spread keys (std/range/IQR = 0) yield NULL scaled values for
    that method.
    """
    allowed = {"zscore", "minmax", "robust"}
    bad = set(methods) - allowed
    if bad:
        raise ValueError(f"standardize: unknown methods {sorted(bad)}")
    prefix = prefix if prefix is not None else f"{value_col}_"
    v = F.col(value_col).cast("double")
    n = F.count(F.lit(1)).cast("double")
    s1, s2 = F.sum(v), F.sum(v * v)
    mean = s1 / n
    aggs = []
    if "zscore" in methods:
        aggs += [
            mean.alias("__mu"),
            F.sqrt(s2 / n - mean * mean).alias("__sd"),
        ]
    if "minmax" in methods:
        aggs += [F.min(v).alias("__lo"), F.max(v).alias("__hi")]
    if "robust" in methods:
        aggs += [
            F.expr(f"percentile({value_col}, 0.5)").alias("__med"),
            (
                F.expr(f"percentile({value_col}, 0.75)")
                - F.expr(f"percentile({value_col}, 0.25)")
            ).alias("__iqr"),
        ]
    stats = df.filter(v.isNotNull() & ~F.isnan(v)).groupBy(*keys).agg(*aggs)
    out = df.join(F.broadcast(stats), on=list(keys), how="left")
    if "zscore" in methods:
        out = out.withColumn(
            f"{prefix}z",
            F.when(
                F.col("__sd") > 0, (v - F.col("__mu")) / F.col("__sd")
            ),
        )
    if "minmax" in methods:
        out = out.withColumn(
            f"{prefix}mm",
            F.when(
                F.col("__hi") > F.col("__lo"),
                (v - F.col("__lo")) / (F.col("__hi") - F.col("__lo")),
            ),
        )
    if "robust" in methods:
        out = out.withColumn(
            f"{prefix}rb",
            F.when(
                F.col("__iqr") > 0, (v - F.col("__med")) / F.col("__iqr")
            ),
        )
    return out.drop("__mu", "__sd", "__lo", "__hi", "__med", "__iqr")


def tenure_features(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
) -> DataFrame:
    """Per-key activity-tenure features — the entity-level signals a
    retention / cohort / sampling pipeline keys on: ``first_ts`` /
    ``last_ts`` (activity bounds), ``span_days`` (calendar days between
    them, inclusive of both endpoints' dates), ``active_days``
    (distinct calendar dates with any event), ``n_events``, and
    ``density`` = active_days / span_days (1.0 = active every calendar
    day of the tenure, -> 0 for drive-by-then-dormant keys).

    ONE mergeable hash aggregate: min/max/count combine map-side and
    the exact distinct-date count is the classic two-phase
    count-distinct on (key, date) — nothing but key/date/count partials
    shuffle. All outputs are timestamps and exact integers (plus one
    exact-integer ratio), so the whole row is cross-engine
    deterministic with no rounding.
    """
    ts = F.col(ts_col)
    d = F.to_date(ts)
    out = df.filter(ts.isNotNull()).groupBy(*keys).agg(
        F.min(ts).alias("first_ts"),
        F.max(ts).alias("last_ts"),
        (
            F.datediff(F.max(d), F.min(d)) + F.lit(1)
        ).cast("long").alias("span_days"),
        F.count_distinct(d).alias("active_days"),
        F.count(F.lit(1)).alias("n_events"),
    ).withColumn(
        "density",
        F.col("active_days").cast("double")
        / F.col("span_days").cast("double"),
    )
    return out
