"""Distribution / ranking / fit aggregates over time buckets.

Extends the reference's resample recipe (bucket -> group-by -> aggregate,
README.md:20-36) with the aggregate families it lacks: order statistics
(percentiles), distinct counts, per-bucket ranking (top-k heavy hitters),
fixed-bin histograms, changepoint scores, and OLS trend fits. All are
single hash-aggregate / window plans — no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tablecloth_time_spark.functions.timeops import down_to_nearest, to_epoch_millis
from tablecloth_time_spark.functions.units import milliseconds_in, normalize_unit


def percentile_rollup(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    interval: int,
    unit: str = "hour",
    percentiles: dict[str, float] | None = None,
    bucket_col: str = "bucket",
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-(keys, bucket) percentiles of ``value_col``.

    ``exact=True`` uses ``F.percentile`` (sort-based, linear interpolation
    — the definition DuckDB's ``quantile_cont`` shares, so the driver
    oracle can pin it). Exact percentiles buffer each group's values, so
    the EXACT path is for verification and small groups; at 100 TB use
    ``exact=False`` -> ``approx_percentile`` (KLL-sketch-style, mergeable,
    map-side-combinable — the same plan shape as any sum/count rollup).

    ``percentiles`` maps output column name -> fraction, default
    p50/p95/p99.
    """
    pcts = percentiles or {"p50": 0.5, "p95": 0.95, "p99": 0.99}
    bucket = down_to_nearest(ts_col, interval, unit).alias(bucket_col)
    v = F.col(value_col).cast("double")
    if exact:
        aggs = [F.percentile(v, F.lit(q)).alias(name) for name, q in pcts.items()]
    else:
        aggs = [
            F.approx_percentile(v, F.lit(q), F.lit(accuracy)).alias(name)
            for name, q in pcts.items()
        ]
    return df.groupBy(*keys, bucket).agg(*aggs)


def distinct_rollup(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    distinct_col: str,
    interval: int,
    unit: str = "day",
    bucket_col: str = "bucket",
    out_col: str = "n_distinct",
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    """Distinct count of ``distinct_col`` per (keys, bucket).

    ``exact=True`` uses the skew-safe two-level shape — dedup on
    (keys, bucket, value) with map-side combine, then count — instead of a
    single ``countDistinct`` whose per-group value sets concentrate on one
    reducer. ``exact=False`` uses HyperLogLog++
    (``approx_count_distinct``), whose sketches are map-side mergeable and
    constant-size — the 100 TB path when ±rsd error is acceptable.

    Neither form's OUTPUT re-aggregates: summing per-hour distincts does
    not give per-day distincts. For distinct counts that must survive
    retention tiers and incremental maintenance, use the ``("hll", col)``
    aggregate kind in the rollup family (``operators.rollup``): its
    partial is a STORABLE binary DataSketches sketch that unions
    losslessly across tiers, snapshots, and crash-resume.
    """
    bucket = down_to_nearest(ts_col, interval, unit).alias(bucket_col)
    if exact:
        # NULL is not a distinct value (COUNT(DISTINCT) / HLL semantics),
        # but the (keys, bucket) GROUP must survive even when all its
        # values are null — count the value column (null-skipping) instead
        # of pre-filtering rows, so an all-null group yields n_distinct=0
        # exactly like the exact=False path
        dedup = df.groupBy(*keys, bucket, F.col(distinct_col)).agg(F.lit(1))
        return dedup.groupBy(*keys, bucket_col).agg(
            F.count(F.col(distinct_col)).alias(out_col)
        )
    return df.groupBy(*keys, bucket).agg(
        F.approx_count_distinct(distinct_col, rsd).alias(out_col)
    )


def sketch_overlap_series(
    tier: DataFrame,
    keys: list[str],
    bucket_col: str = "bucket",
    sketch_col: str = "sketch",
    step: tuple[int, str] | None = None,
) -> DataFrame:
    """Returning / new / churned distinct counts between CONSECUTIVE
    buckets of a stored HLL sketch tier (the ``("hll", col)`` rollup
    kind's partial column) — day-over-day returning users, computed
    entirely from the retention tier, never re-reading raw data.

    Pure inclusion-exclusion over the binary sketches:
    ``returning = est(prev) + est(cur) - est(prev U cur)`` via the
    scalar ``hll_union``; one lag window over the tiny tier frame, no
    join, no Python. The first bucket of each key has no predecessor ->
    NULL returning/new/churned (unknown, not zero).

    Rollup tiers are SPARSE (empty buckets are absent), so the lag row
    is only "yesterday" when no gap intervenes. Pass ``step`` (e.g.
    ``(1, "day")``, metric units) to enforce adjacency: when the
    previous stored bucket is not exactly one step back, the comparison
    columns are NULL — a quiet day never silently turns a two-day-apart
    pair into "day-over-day returning". ``step=None`` keeps literal
    previous-stored-bucket semantics (documented, for irregular tiers).

    Estimates are exact while both buckets sit in the sketch's
    coupon-list regime; at dense-mode cardinalities the direct (HIP)
    and post-union (composite) estimators differ, so each derived count
    is clamped at 0 — intersections far below the noise floor read as
    0, never negative. HLL cannot intersect losslessly; for exact
    audits use ``distinct_rollup(exact=True)`` on the raw slice.

    Output: keys, bucket, n_distinct (current bucket), returning,
    new_distinct, churned (vs the previous bucket).
    """
    w = Window.partitionBy(*keys).orderBy(bucket_col)
    cur = F.col(sketch_col)
    prev = F.lag(cur).over(w)
    adjacent = prev.isNotNull()
    if step is not None:
        from tablecloth_time_spark.functions.timeops import to_epoch_millis
        from tablecloth_time_spark.functions.units import (
            milliseconds_in,
            normalize_unit,
        )

        step_ms = step[0] * milliseconds_in(normalize_unit(step[1]))
        bms = to_epoch_millis(bucket_col)
        adjacent = adjacent & (bms - F.lag(bms).over(w) == F.lit(step_ms))
    cur_est = F.hll_sketch_estimate(cur)
    prev_est = F.hll_sketch_estimate(prev)
    union_est = F.hll_sketch_estimate(F.hll_union(prev, cur))
    # NOTE: greatest() SKIPS nulls (greatest(NULL, 0) = 0), which would
    # turn a first/gapped bucket's unknown into a fabricated 0 — guard
    # every derived column on adjacency first, then clamp. The clamps
    # are independent: direct sketches estimate via HIP, unions via the
    # composite estimator, so union_est is NOT guaranteed >= prev/cur
    # and any of the three differences can dip below zero.
    returning = F.when(
        adjacent, F.greatest(prev_est + cur_est - union_est, F.lit(0))
    )
    return tier.select(
        *keys,
        bucket_col,
        cur_est.alias("n_distinct"),
        returning.alias("returning"),
        F.when(adjacent, F.greatest(cur_est - returning, F.lit(0))).alias(
            "new_distinct"
        ),
        F.when(adjacent, F.greatest(prev_est - returning, F.lit(0))).alias(
            "churned"
        ),
    )


def topk_per_bucket(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    interval: int,
    unit: str = "day",
    k: int = 3,
    bucket_col: str = "bucket",
    count_col: str = "n",
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k heavy hitters of ``group_col`` per time bucket, by row count.

    Two-stage: hash-aggregate counts per (bucket, group) — map-side
    combined, so the shuffle carries one row per distinct pair — then a
    rank window partitioned by bucket. Ties break deterministically on
    ``group_col`` ascending (reproducible output, oracle-pinnable).

    At 100 TB the count aggregate is the standard scalable shape; the rank
    window partitions by bucket only, which is fine because its input is
    already one row per distinct (bucket, group) — the heavy lifting
    happened in the combine. For very high-cardinality group columns,
    pre-filter with a frequency sketch before ranking.
    """
    bucket = down_to_nearest(ts_col, interval, unit).alias(bucket_col)
    counts = df.groupBy(bucket, group_col).agg(F.count(F.lit(1)).alias(count_col))
    w = Window.partitionBy(bucket_col).orderBy(
        F.col(count_col).desc(), F.col(group_col).asc()
    )
    return (
        counts.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def level_shift_scores(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    window: int = 12,
    order_cols: list[str] | None = None,
    shift_col: str = "shift",
    score_col: str = "shift_score",
) -> DataFrame:
    """Changepoint (level-shift) scoring via a two-sided moving-average
    difference filter: at each row, mean of the NEXT ``window`` values
    (current row included) minus mean of the PREVIOUS ``window`` values,
    normalized by the pooled sample stddev of the two sides.

    This is the embarrassingly-parallel member of the changepoint family
    (for the sequential member see ``cusum_scores``, whose clipped
    recurrence turns out to collapse to pure prefix algebra too; PELT's
    dynamic program genuinely would need the Arrow kernel): two row-frame
    window aggregates over ONE sort — a single
    Exchange per series key, no Python, no self-join. Rows where either
    side is not full (series edges) get null shift/score, so every emitted
    score compares equal-sized samples.

    Downstream picks changepoints by thresholding ``score_col`` (e.g.
    |score| > 3) and/or taking per-series top-k.
    """
    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    before = w.rowsBetween(-window, -1)
    after = w.rowsBetween(0, window - 1)
    v = F.col(value_col).cast("double")

    n_b = F.count(v).over(before)
    n_a = F.count(v).over(after)
    mu_b = F.avg(v).over(before)
    mu_a = F.avg(v).over(after)
    var_b = F.var_samp(v).over(before)
    var_a = F.var_samp(v).over(after)
    full = (n_b == window) & (n_a == window)
    shift = F.when(full, mu_a - mu_b)
    pooled = F.sqrt((var_b + var_a) / 2)
    score = F.when(full & (pooled > 0), (mu_a - mu_b) / pooled)
    return df.select(
        "*", shift.alias(shift_col), score.alias(score_col)
    )


def cusum_scores(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    k: float = 0.5,
    h: float = 5.0,
    order_cols: list[str] | None = None,
    pos_col: str = "cusum_pos",
    neg_col: str = "cusum_neg",
    flag_col: str = "is_drift",
) -> DataFrame:
    """Tabular CUSUM drift detection (Page 1954; the NIST/SEMATECH
    two-sided recipe): standardize each value against its key's mean and
    sample stddev, then accumulate one-sided sums

        S+_t = max(0, S+_{t-1} + z_t - k)
        S-_t = max(0, S-_{t-1} - z_t - k)

    with slack ``k`` (in stddevs; 0.5 targets a 1-sigma shift) and alarm
    threshold ``h`` (4-5 is the standard choice). CUSUM accumulates many
    SMALL sustained deviations, catching slow drifts a pointwise z-score
    (``mad_anomalies``) never flags.

    The recurrence looks sequential, but the clipped sum has a closed
    form over prefix sums: with ``P_t = sum_{i<=t} (z_i - k)``,

        S+_t = P_t - min(0, min_{j<=t} P_j)

    (the running minimum is where the clip last reset), and symmetrically
    for S-. Both are ONE cumulative sum + ONE running min — pure window
    functions over a single per-key sort: one Exchange, no Python, no
    recurrence. The same identity is what DuckDB-side oracles replay.

    Per-key mean/stddev come from one tiny aggregate broadcast back (the
    ``mad_anomalies`` shape) — the big table itself never shuffles beyond
    the one window sort. Keys with stddev 0 or a single row leave scores
    null (drift is undefined there), flag false.
    """
    v = F.col(value_col).cast("double")
    stats = df.groupBy(*keys).agg(
        F.avg(v).alias("__mu"), F.stddev_samp(v).alias("__sd")
    )
    scored = df.join(F.broadcast(stats), list(keys))
    z = F.try_divide(v - F.col("__mu"), F.col("__sd"))

    order = [F.col(ts_col).asc()] + [
        F.col(c).asc() for c in (order_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    run = w.rowsBetween(Window.unboundedPreceding, 0)

    def one_sided(x: Column) -> Column:
        prefix = F.sum(x).over(run)
        runmin = F.min(prefix).over(run)
        return prefix - F.least(F.lit(0.0), runmin)

    sp = one_sided(z - F.lit(k))
    sn = one_sided(-z - F.lit(k))
    return (
        scored.withColumn(pos_col, sp)
        .withColumn(neg_col, sn)
        .withColumn(
            flag_col,
            F.coalesce(
                (F.col(pos_col) > F.lit(h)) | (F.col(neg_col) > F.lit(h)),
                F.lit(False),
            ),
        )
        .drop("__mu", "__sd")
    )


def trend_fit(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    per: str = "day",
    slope_col: str = "slope",
    intercept_col: str = "intercept",
    r2_col: str = "r2",
) -> DataFrame:
    """Per-series linear trend (fpp3 ch. 7's TSLM trend baseline): OLS of
    value on time, one row per key with slope (units of value per ``per``),
    intercept (fitted value at epoch 0 of the scaled time axis), r-squared
    and the observation count.

    Least squares over (time, value) needs only sum moments, so this is a
    single map-side-combined hash aggregate (Spark's built-in regr_slope /
    regr_intercept / regr_r2) — the same plan class as any rollup; no
    window, no Python, no second pass. Time is scaled to ``per`` units so
    the slope is readable ("+3.2 events/day") instead of per-millisecond.
    """
    x = to_epoch_millis(ts_col) / F.lit(
        float(milliseconds_in(normalize_unit(per)))
    )
    y = F.col(value_col).cast("double")
    return df.groupBy(*keys).agg(
        F.regr_slope(y, x).alias(slope_col),
        F.regr_intercept(y, x).alias(intercept_col),
        F.regr_r2(y, x).alias(r2_col),
        F.count(y).alias("n"),
    )


def predict_linear(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    window: tuple[int, str] = (4, "hour"),
    horizon: tuple[int, str] = (1, "hour"),
    per: str = "hour",
    slope_col: str = "slope",
    predict_col: str = "predicted",
) -> DataFrame:
    """Prometheus-style ``predict_linear``: per sample, OLS over the
    trailing ``window`` of the series and the fitted value extrapolated
    ``horizon`` ahead — "at this trend, where is the disk/queue/error
    count in an hour". The windowed member of the regression family
    (:func:`trend_fit` is the whole-series one).

    One RANGE frame ([ts - window, ts] inclusive; duplicate timestamps
    are frame PEERS, so the result is deterministic under ties) over one
    per-key time sort — the ``rolling`` plan class, 1 Exchange, no
    Python. The time axis is scaled to ``per`` units so the slope reads
    "value per hour", and ANCHORED at each key's first sample (a
    per-key min over the same sort's unbounded frame — same Window
    operator, no extra Exchange): a constant shift leaves the slope and
    the prediction mathematically unchanged, but keeps the regression
    axis at series-span magnitude instead of epoch magnitude — at epoch
    scale (~5e5 ``per``-units) the co-moment roundoff of regr_slope /
    regr_intercept is engine-implementation-dependent and was measured
    at ~1e-6 relative between Spark and DuckDB, vs < 1e-12 anchored.
    predicted = intercept + slope * (x_now + horizon/per).

    Frames with < 2 samples or zero time-variance yield NULL slope and
    prediction (regr_slope's own contract on both engines — never a
    fabricated flat fit). Null values drop out pairwise (regr_* skip
    rows where either side is null).

    At 100 TB this runs on a pre-aggregated tier (per-minute rollup)
    exactly as it runs on raw samples — the frame buffers only
    ``window`` worth of rows per key either way.
    """
    w_ms = window[0] * milliseconds_in(normalize_unit(window[1]))
    h_ms = horizon[0] * milliseconds_in(normalize_unit(horizon[1]))
    if w_ms <= 0 or h_ms < 0:
        raise ValueError(
            f"predict_linear: window must be > 0 and horizon >= 0, "
            f"got {window!r}, {horizon!r}"
        )
    per_ms = float(milliseconds_in(normalize_unit(per)))
    t = to_epoch_millis(ts_col)
    w_all = (
        Window.partitionBy(*keys)
        .orderBy(t)
        .rangeBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    x = (t - F.min(t).over(w_all)) / F.lit(per_ms)
    y = F.col(value_col).cast("double")
    w = Window.partitionBy(*keys).orderBy(t).rangeBetween(-w_ms, 0)
    slope = F.regr_slope(y, x).over(w)
    intercept = F.regr_intercept(y, x).over(w)
    return df.select(
        "*",
        slope.alias(slope_col),
        (intercept + slope * (x + F.lit(h_ms / per_ms))).alias(predict_col),
    )


def histogram_rollup(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    interval: int,
    unit: str,
    lo: float,
    hi: float,
    n_bins: int = 20,
    bucket_col: str = "bucket",
    bin_col: str = "bin",
    count_col: str = "n",
    cumulative: bool = False,
) -> DataFrame:
    """Fixed-bin value histogram per (keys, time bucket) in long format
    (one row per non-empty bin) — the Prometheus-histogram view of a
    series, as ONE map-side-combined hash aggregate.

    Bins split [lo, hi) into ``n_bins`` equal widths; out-of-range values
    clamp into the edge bins (bin 0 / bin n_bins-1 act as -Inf / +Inf
    catch-alls, like Prometheus' le=+Inf), nulls AND NaNs are dropped
    (floor(NaN) would land NaN in bin 0 as phantom samples). Output adds
    ``bin_lo``/``bin_hi`` edges for rendering. ``cumulative=True`` adds a
    Prometheus-style less-or-equal running count per (keys, bucket) via a
    window over the tiny histogram frame (rows ∝ groups x bins, not
    events).

    Counts are mergeable (sums), so histograms cascade across retention
    tiers exactly like any rollup — and the same shape runs under
    Structured Streaming if needed.
    """
    if n_bins < 1 or not hi > lo:
        raise ValueError("need n_bins >= 1 and hi > lo")
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    bin_idx = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width))),
    ).cast("int")
    bucket = down_to_nearest(ts_col, interval, unit).alias(bucket_col)
    hist = (
        df.filter(v.isNotNull() & ~F.isnan(v))
        .groupBy(*keys, bucket, bin_idx.alias(bin_col))
        .agg(F.count(F.lit(1)).alias(count_col))
        .withColumn("bin_lo", F.lit(lo) + F.col(bin_col) * F.lit(width))
        .withColumn("bin_hi", F.lit(lo) + (F.col(bin_col) + 1) * F.lit(width))
    )
    if cumulative:
        w = (
            Window.partitionBy(*keys, bucket_col)
            .orderBy(bin_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        hist = hist.withColumn("cum_n", F.sum(count_col).over(w))
    return hist


def series_correlations(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval: int,
    unit: str = "hour",
    agg: str = "avg",
    min_overlap: int = 3,
) -> DataFrame:
    """Pairwise Pearson correlation between every two series, computed
    over their bucket-aligned values (fpp3 ch. 4's cross-series
    relationships): bucket each series (``agg`` in avg|sum|count), align
    pairs with a self equi-join on the bucket, and reduce each pair with
    the built-in ``corr`` aggregate. Pairs sharing fewer than
    ``min_overlap`` buckets are dropped (a 2-point correlation is always
    ±1 — noise).

    Output: (key_a, key_b, corr, n_overlap), key_a < key_b. Null/NaN
    values are dropped before bucketing (one NaN would poison corr for
    every pair touching its bucket); ``n_overlap`` counts the buckets
    corr actually consumed. Null-keyed rows are excluded — a null series
    key cannot be ordered into a pair (documented deviation from the
    null-key-is-a-group convention of the single-frame rollups).

    Scale note: output is O(k^2) in the number of SERIES (not rows) — the
    bucketed frames are tiny next to the raw data, the self-join is a
    plain shuffled equi-join on the bucket, and corr map-side-combines.
    Meant for metric-dashboard cardinalities (k up to ~10^3, i.e. <=10^6
    pairs); for document/embedding-scale similarity use the LSH family in
    operators/similarity.py instead.
    """
    bucket = down_to_nearest(ts_col, interval, unit).alias("__b")
    v = F.col(value_col).cast("double")
    aggs = {
        "avg": lambda: F.avg(v),
        "sum": lambda: F.sum(v),
        "count": lambda: F.count(v).cast("double"),
    }
    if agg not in aggs:
        raise ValueError(f"agg must be one of {sorted(aggs)}, got {agg!r}")
    series = (
        df.filter(
            F.col(key_col).isNotNull() & v.isNotNull() & ~F.isnan(v)
        )
        .groupBy(F.col(key_col).alias("__k"), bucket)
        .agg(aggs[agg]().alias("__v"))
    )
    a = series.select(
        F.col("__k").alias("key_a"), F.col("__b"), F.col("__v").alias("__va")
    )
    b = series.select(
        F.col("__k").alias("key_b"), F.col("__b"), F.col("__v").alias("__vb")
    )
    pairs = a.join(b, "__b").filter(F.col("key_a") < F.col("key_b"))
    both = F.col("__va").isNotNull() & F.col("__vb").isNotNull()
    return (
        pairs.groupBy("key_a", "key_b")
        .agg(
            F.corr("__va", "__vb").alias("corr"),
            # count what corr actually consumed, not raw joined rows
            F.count(F.when(both, F.lit(1))).alias("n_overlap"),
        )
        .filter(F.col("n_overlap") >= min_overlap)
    )


def mad_anomalies(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    threshold: float = 3.5,
    exact: bool = True,
    accuracy: int = 10_000,
    score_col: str = "score",
    flag_col: str = "is_anomaly",
) -> DataFrame:
    """Robust per-key anomaly scoring via the modified z-score
    (Iglewicz & Hoaglin 1993, the NIST outlier recipe):

        score = 0.6745 * (x - median) / MAD,
        MAD   = median(|x - median|)

    flagged when |score| > ``threshold`` (their recommended 3.5). Median/
    MAD resist the outliers a mean/stddev z-score would absorb — the right
    default for monitoring metric streams with fat tails.

    Plan: two per-key aggregates (MAD needs the median first), each a tiny
    one-row-per-key frame broadcast back onto the input — the big table is
    never shuffled, just scanned twice. ``exact=True`` uses the sort-based
    ``F.median`` (interpolated, the definition DuckDB's ``median`` shares,
    so driver oracles pin it bit-for-bit); exact medians buffer each
    group's values, so at 100 TB switch ``exact=False`` ->
    ``approx_percentile(0.5)`` (KLL sketch, mergeable, map-side-combined).

    A zero MAD (>= half the key's values identical) leaves ``score`` null
    and the flag false — "undefined", never a division blow-up.
    """
    v = F.col(value_col).cast("double")

    def med(c) -> Column:
        if exact:
            return F.median(c)
        return F.approx_percentile(c, F.lit(0.5), F.lit(accuracy))

    medians = df.groupBy(*keys).agg(med(v).alias("__med"))
    withmed = df.join(F.broadcast(medians), list(keys))
    mads = withmed.groupBy(*keys).agg(
        med(F.abs(v - F.col("__med"))).alias("__mad")
    )
    scored = withmed.join(F.broadcast(mads), list(keys))
    score = F.try_divide(
        F.lit(0.6745) * (v - F.col("__med")), F.col("__mad")
    )
    return (
        scored.withColumn(score_col, score)
        .withColumn(
            flag_col,
            F.coalesce(F.abs(F.col(score_col)) > F.lit(threshold), F.lit(False)),
        )
        .drop("__med", "__mad")
    )


def histogram_quantile(
    hist: DataFrame,
    group_cols: list[str],
    quantiles: dict[str, float] | None = None,
    bin_col: str = "bin",
    count_col: str = "n",
    lo_col: str = "bin_lo",
    hi_col: str = "bin_hi",
) -> DataFrame:
    """Prometheus-style ``histogram_quantile``: estimate quantiles FROM a
    long-format histogram (``histogram_rollup`` output) by linear
    interpolation inside the target bin — rank = q * total, target = the
    lowest bin whose cumulative count reaches the rank, estimate =
    bin_lo + bin_width * (rank - cum_prev) / bin_n.

    This closes the mergeable-quantile loop for the retention tiers:
    exact percentiles buffer raw values and approx_percentile sketches
    can't be STORED, but histogram counts are plain sums — they cascade
    through every tier and through continuous-aggregate maintenance like
    any rollup, and this operator turns the stored tier back into
    quantiles at read time. Accuracy is bounded by the bin width (and by
    the edge-bin clamp for out-of-range mass, exactly as in Prometheus).

    ONE cumulative window over the tiny histogram frame (rows ∝ groups x
    bins, not events) + ONE aggregate: per quantile, a conditional
    struct-min picks the lowest qualifying bin — all quantiles ride the
    same pass. q = 0 -> first non-empty bin's lower edge; q = 1 -> last
    non-empty bin's upper edge.

    Output: group_cols..., total, <one column per ``quantiles`` name>
    (default p50/p95/p99).
    """
    qs = quantiles or {"p50": 0.5, "p95": 0.95, "p99": 0.99}
    for name, q in qs.items():
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile {name}={q} outside [0, 1]")
    w = Window.partitionBy(*group_cols).orderBy(F.col(bin_col).asc())
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    whole = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    n = F.col(count_col).cast("double")
    cum = F.sum(n).over(run)
    total = F.sum(n).over(whole)
    prev = cum - n
    lo, hi = F.col(lo_col), F.col(hi_col)

    base = hist.select(
        *group_cols,
        F.col(bin_col),
        cum.alias("__cum"),
        total.alias("__total"),
        prev.alias("__prev"),
        n.alias("__n"),
        lo.alias("__lo"),
        hi.alias("__hi"),
    )
    # the aggregate reads the materialized window columns, not window
    # expressions (windows can't nest inside aggregate functions)
    cols = [F.first(F.col("__total")).alias("total")]
    for name, q in qs.items():
        rank = F.lit(float(q)) * F.col("__total")
        # linear interpolation inside the bin, clamped to its edges
        # (rank==prev -> lo, rank==cum -> hi; float noise must not
        # escape the bin)
        est = F.col("__lo") + (F.col("__hi") - F.col("__lo")) * (
            (rank - F.col("__prev")) / F.col("__n")
        )
        est = F.least(F.col("__hi"), F.greatest(F.col("__lo"), est))
        cand = F.when(
            F.col("__cum") >= rank,
            F.struct(F.col(bin_col).alias("b"), est.alias("v")),
        )
        cols.append(F.min(cand).getField("v").alias(name))
    return base.groupBy(*group_cols).agg(*cols)


def arrival_stats(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key inter-arrival process statistics: the mean/std/CV of the
    gap between consecutive events and the Goh-Barabasi burstiness
    coefficient B = (sigma - mu) / (sigma + mu) (public: Goh & Barabasi,
    "Burstiness and memory in complex systems", EPL 81, 2008). B -> -1
    for a perfectly regular (clock-like) arrival process, B = 0 for a
    memoryless Poisson process, B -> 1 for extreme burstiness — the
    standard single-number activity-shape feature for event streams
    (alert storms, chatty conversations, scraper traffic).

    Extends the reference's descriptive-stats recipe
    (README.md:20-36, mean/min/max over a column) from value columns to
    the TIME AXIS itself. One window Exchange on ``keys`` whose
    clustering the final per-key aggregate reuses — the lag/aggregate
    fusion every shift-family operator here uses (operators/shift.py).

    Keys with a single event have no gaps: mean/std/cv/burstiness are
    null (undefined, not zero). ``stddev_samp`` needs >= 2 gaps. Ties on
    ``ts_col`` are ordered by ``order_cols`` and contribute 0-second
    gaps (they are real arrivals).
    """
    ms = to_epoch_millis(ts_col)
    w = Window.partitionBy(*keys).orderBy(
        ms.asc(), *[F.col(c).asc() for c in (order_cols or [])]
    )
    gap = (ms - F.lag(ms).over(w)).cast("double") / 1000.0
    base = df.select(*keys, gap.alias("__gap"))
    mu = F.avg("__gap")
    sd = F.stddev_samp("__gap")
    return base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("__gap").alias("n_gaps"),
        mu.alias("mean_gap_s"),
        sd.alias("std_gap_s"),
        F.try_divide(sd, mu).alias("cv"),
        F.try_divide(sd - mu, sd + mu).alias("burstiness"),
    )


def categorical_entropy(
    df: DataFrame,
    keys: list[str],
    cat_col: str,
) -> DataFrame:
    """Per-key Shannon entropy (bits) of the distribution of
    ``cat_col`` values, plus the distinct count and the entropy
    normalized to [0, 1] by its log2(n_distinct) maximum. The standard
    behavioral-diversity / class-balance feature (a training-data
    quality signal: near-0 normalized entropy = a key dominated by one
    category; near-1 = uniform mix).

    Identity used: H = log2(n) - (1/n) * sum(c * log2(c)) over the
    per-category counts c — so the whole operator is TWO mergeable hash
    aggregates (count per (key, cat), then one pass over the tiny
    per-key count frame). Both shuffles carry only key/category/count;
    no window, no Python. NULL categories count as a category of their
    own (both engines group NULLs together).

    Single-category keys get entropy 0 and normalized entropy 0 (by
    convention log2(1) = 0 would divide by zero).
    """
    counts = df.groupBy(*keys, cat_col).agg(F.count(F.lit(1)).alias("__c"))
    c = F.col("__c").cast("double")
    n = F.sum("__c").cast("double")
    k = F.count(F.lit(1))
    ent = F.log2(n) - F.sum(c * F.log2(c)) / n
    return counts.groupBy(*keys).agg(
        F.sum("__c").alias("n_rows"),
        k.alias("n_distinct"),
        ent.alias("entropy_bits"),
        F.when(k > 1, ent / F.log2(k.cast("double")))
        .otherwise(F.lit(0.0))
        .alias("norm_entropy"),
    )
