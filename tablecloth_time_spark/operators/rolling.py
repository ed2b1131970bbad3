"""Rolling time-duration windows (the reference's planned-but-stubbed op).

The reference stubs ``rolling`` and specifies the intended semantics as
variable time-duration windows over a sorted time column — one window per
row, width expressed in real time units (reference
src/tablecloth/time/api/rolling.clj:6-13, development-plan.md:641-720).

Spark-native form: ``Window.partitionBy(keys).orderBy(unix_millis(ts))
.rangeBetween(-width_ms, 0)`` — a RANGE frame over the epoch-millis ordering
key, computed inside the JVM window operator (one shuffle on the series key,
then a sorted streaming pass per partition; no Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tablecloth_time_spark.functions.timeops import to_epoch_millis
from tablecloth_time_spark.functions.units import milliseconds_in, normalize_unit

ROLLING_AGGS = {
    "sum": F.sum,
    "avg": F.avg,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "stddev": F.stddev_samp,
}


def rolling(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    width: int,
    unit: str,
    aggs: dict[str, tuple[str, str]],
    closed_left: bool = True,
    validate: bool = False,
) -> DataFrame:
    """Add trailing time-window aggregates, one value per input row.

    ``aggs``: {output_name: (agg_kind, source_col)}. The frame covers
    [ts - width, ts] inclusive (``closed_left=True``) or (ts - width, ts]
    (exclusive left edge).

    ``validate=True`` runs the reference's ensure-time-column pre-flight
    (operators/validate.py): raises if ``ts_col`` is missing or contains
    nulls (null ordering keys would silently land in one frame edge). The
    window itself sorts, so out-of-order input is fine — the check here is
    the null/existence half of the contract.
    """
    if validate:
        # existence is a schema check; nulls need ONE limit-1 job. The full
        # is_sorted scan would be pure waste here — the window sorts anyway.
        if ts_col not in df.columns:
            raise ValueError(
                f"Time column not found: {ts_col!r}; columns: {df.columns}"
            )
        if df.filter(F.col(ts_col).isNull()).limit(1).count() > 0:
            raise ValueError(f"rolling: time column {ts_col!r} contains nulls")
    u = normalize_unit(unit)
    width_ms = width * milliseconds_in(u)
    lo = -width_ms if closed_left else -(width_ms - 1)
    w = (
        Window.partitionBy(*keys)
        .orderBy(to_epoch_millis(ts_col))
        .rangeBetween(lo, 0)
    )
    out = df
    exprs = []
    for name, (kind, src) in aggs.items():
        if kind not in ROLLING_AGGS:
            raise ValueError(f"unsupported rolling agg {kind!r}")
        exprs.append(ROLLING_AGGS[kind](src).over(w).alias(name))
    return out.select("*", *exprs)


def rolling_corr(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    col_a: str,
    col_b: str,
    width: int,
    unit: str,
    corr_col: str = "corr",
    min_periods: int = 2,
) -> DataFrame:
    """Trailing-window Pearson correlation of two columns per key — the
    "are these two metrics moving together RIGHT NOW" monitor (lead/lag
    drift between e.g. request rate and error rate shows up as the
    correlation decaying long before either series alone alarms). The
    windowed companion of :func:`~tablecloth_time_spark.operators.stats.
    series_correlations` (which compares whole bucket-aligned series
    pairwise).

    Same plan class as :func:`rolling`: ONE RANGE frame
    ([ts - width, ts] inclusive, duplicate timestamps are frame peers)
    over one per-key time sort — 1 Exchange, no Python.

    NOT Spark's built-in ``corr`` window aggregate: under ANSI mode
    (Spark 4's default) ``corr`` RAISES DIVIDE_BY_ZERO the moment any
    frame has zero variance — a constant-valued quiet hour would kill
    the whole job — and ``F.when`` can't guard it (window aggregates
    evaluate in the Window operator, before any projection-level CASE).
    Instead: five plain SUM/COUNT frames over pairwise-complete values
    give the raw co-moments, and the Pearson ratio is an explicitly
    guarded projection. To keep raw moments well-conditioned, both
    columns are first centered by their per-key GLOBAL mean (an
    unbounded frame over the same sort — same Window operator, no extra
    Exchange; a constant shift leaves Pearson r unchanged).

    Rows where either column is null drop out pairwise. Frames with
    fewer than ``min_periods`` non-null PAIRS, or zero variance on
    either side, yield NULL — never a fabricated ±1, never an error.
    """
    if min_periods < 2:
        raise ValueError(
            f"rolling_corr: min_periods must be >= 2 (Pearson needs two "
            f"points), got {min_periods}"
        )
    u = normalize_unit(unit)
    width_ms = width * milliseconds_in(u)
    if width_ms <= 0:
        raise ValueError(f"rolling_corr: width must be > 0, got {width}")
    order = to_epoch_millis(ts_col)
    w = (
        Window.partitionBy(*keys)
        .orderBy(order)
        .rangeBetween(-width_ms, 0)
    )
    w_all = (
        Window.partitionBy(*keys)
        .orderBy(order)
        .rangeBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    a_raw = F.col(col_a).cast("double")
    b_raw = F.col(col_b).cast("double")
    a = a_raw - F.avg(a_raw).over(w_all)
    b = b_raw - F.avg(b_raw).over(w_all)
    pa = F.when(b.isNotNull(), a)  # pairwise-complete
    pb = F.when(a.isNotNull(), b)
    n = F.count(pa).over(w).cast("double")
    sa, sb = F.sum(pa).over(w), F.sum(pb).over(w)
    saa = F.sum(pa * pa).over(w)
    sbb = F.sum(pb * pb).over(w)
    sab = F.sum(pa * pb).over(w)
    cov = sab - sa * sb / n
    va = saa - sa * sa / n
    vb = sbb - sb * sb / n
    # clamp: on exactly-collinear frames cov and sqrt(va*vb) are
    # algebraically equal but round differently, so the ratio can land
    # an ulp outside [-1, 1] — downstream sqrt(1 - r^2) would NaN
    r = F.when(
        (n >= min_periods) & (va > 0) & (vb > 0),
        F.least(F.greatest(cov / F.sqrt(va * vb), F.lit(-1.0)), F.lit(1.0)),
    )
    return df.select("*", r.alias(corr_col))


def rolling_quantiles(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    value_col: str,
    n: int,
    quantiles: dict[str, float],
    min_periods: int = 1,
) -> DataFrame:
    """Exact interpolated quantiles over a trailing ``n``-row frame — the
    rolling-median/despiking companion to :func:`rolling_rows`.

    Spark's ``median``/``percentile`` aggregates reject window frames
    (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so the frame's non-null
    values are collected and sorted per row (``sort_array(collect_list)``)
    and each quantile interpolates explicitly:

        idx = q * (m - 1);  lo = floor(idx);  frac = idx - lo
        value = arr[lo] + (arr[min(lo+1, m-1)] - arr[lo]) * frac

    — the linear-interpolation definition shared by numpy/pandas/DuckDB
    ``quantile_cont``, spelled out so an oracle can mirror the exact
    arithmetic instead of trusting another engine's internals.

    Cost: O(w log w) array work PER ROW inside the JVM — right for the
    small windows despiking uses (w <= a few hundred); an unbounded or
    very wide robust baseline belongs to ``mad_anomalies`` (two global
    medians) or the histogram tier (``histogram_quantile``). Still one
    Exchange + one sorted pass, no Python.

    Nulls/NaNs in ``value_col`` drop out of the frame (``collect_list``
    skips nulls; NaNs are masked to null first); a frame with fewer than
    ``min_periods`` surviving values yields null quantiles.
    """
    if n < 1:
        raise ValueError(f"rolling_quantiles: window must be >= 1, got {n}")
    for name, q in quantiles.items():
        if not (0.0 <= q <= 1.0):
            raise ValueError(
                f"rolling_quantiles: quantile {name!r}={q} outside [0, 1]"
            )
    w = Window.partitionBy(*keys).orderBy(*order_cols).rowsBetween(
        -(n - 1), 0
    )
    v = F.col(value_col).cast("double")
    masked = F.when(~F.isnan(v), v)  # null already excluded by collect_list
    arr = F.sort_array(F.collect_list(masked).over(w))
    out = df.select("*", arr.alias("__arr"))
    m = F.size("__arr")
    exprs = []
    for name, q in quantiles.items():
        idx = F.lit(float(q)) * (m - F.lit(1)).cast("double")
        lo = F.floor(idx).cast("int")
        frac = idx - lo.cast("double")
        a_lo = F.element_at("__arr", lo + F.lit(1))
        a_hi = F.element_at(
            "__arr", F.least(lo + F.lit(2), m).cast("int")
        )
        val = a_lo + (a_hi - a_lo) * frac
        exprs.append(F.when(m >= max(min_periods, 1), val).alias(name))
    return out.select("*", *exprs).drop("__arr")


def rolling_rows(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    n: int,
    aggs: dict[str, tuple[str, str]],
    min_periods: int = 1,
) -> DataFrame:
    """Add trailing row-count window aggregates, one value per input row.

    The reference's ARCHIVED rolling-window API (reference
    development-plan.md:645-666): a fixed window of the previous ``n``
    rows (current row included), truncated at the start of each series —
    the first row's window holds 1 row, the second 2, ... until ``n``.
    Not time-aware: the frame counts rows in ``order_cols`` order, which
    is the point ("last N observations" vs "last N minutes").

    Spark-native form: ``Window.partitionBy(keys).orderBy(order_cols)
    .rowsBetween(-(n - 1), 0)`` — a ROWS frame, one shuffle on the series
    key then a sorted streaming pass, no Python. ``min_periods`` mirrors
    the pandas contract the archived API's truncation implies: windows
    holding fewer rows yield null (default 1 = reference behavior, every
    truncated prefix window still aggregates).
    """
    if n < 1:
        raise ValueError(f"rolling_rows: window must be >= 1 row, got {n}")
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(-(n - 1), 0)
    )
    exprs = []
    count_in_frame = F.count(F.lit(1)).over(w)
    for name, (kind, src) in aggs.items():
        if kind not in ROLLING_AGGS:
            raise ValueError(f"unsupported rolling agg {kind!r}")
        e = ROLLING_AGGS[kind](src).over(w)
        if min_periods > 1:
            e = F.when(count_in_frame >= min_periods, e)
        exprs.append(e.alias(name))
    return df.select("*", *exprs)


def hampel_filter(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    value_col: str,
    n: int = 7,
    k: float = 3.0,
    out_col: str | None = None,
    flag_col: str = "is_spike",
) -> DataFrame:
    """Hampel spike filter (Hampel 1974; the standard despiking
    identifier in sensor/metric pipelines): over a CENTERED ``n``-row
    window, m = exact interpolated median and S = 1.4826 * median of
    the absolute deviations |x_i - m| (the Gaussian-consistent MAD
    scale); a point with |x - m| > ``k``*S is flagged and replaced by
    the window median in ``out_col`` — robust where a rolling-mean
    z-score smears the spike into its own baseline.

    Same machinery as :func:`rolling_quantiles` (sort_array over a
    collected frame + the shared type-7 interpolation, all JVM
    expressions; the MAD adds one ``transform`` + ``array_sort`` over
    the same w-element array) — O(w log w) per row, one Exchange, no
    Python. Edge rows see truncated windows (standard). A zero-MAD
    (locally constant) window flags ANY deviation from the median —
    the textbook Hampel limit behavior. NULL/NaN points pass through
    unflagged and unreplaced, and drop out of neighbors' windows.
    """
    if n < 3 or n % 2 == 0:
        raise ValueError(f"hampel_filter: window must be odd and >= 3, got {n}")
    if k < 0:
        raise ValueError(f"hampel_filter: k must be >= 0, got {k}")
    out_col = out_col or f"{value_col}_f"
    half = n // 2
    w = Window.partitionBy(*keys).orderBy(*order_cols).rowsBetween(-half, half)
    v = F.col(value_col).cast("double")
    masked = F.when(~F.isnan(v), v)
    arr = F.sort_array(F.collect_list(masked).over(w))

    def interp(a, q: float):
        s = F.size(a)
        idx = F.lit(q) * (s - F.lit(1)).cast("double")
        lo = F.floor(idx).cast("int")
        frac = idx - lo.cast("double")
        a_lo = F.element_at(a, lo + F.lit(1))
        a_hi = F.element_at(a, F.least(lo + F.lit(2), s).cast("int"))
        return a_lo + (a_hi - a_lo) * frac

    staged = df.select("*", arr.alias("__arr")).withColumn(
        "__med", interp(F.col("__arr"), 0.5)
    )
    devs = F.array_sort(
        F.transform(F.col("__arr"), lambda x: F.abs(x - F.col("__med")))
    )
    staged = staged.withColumn(
        "__mad", interp(devs, 0.5) * F.lit(1.4826)
    )
    spike = F.abs(v - F.col("__med")) > F.lit(k) * F.col("__mad")
    return (
        staged.withColumn(
            flag_col,
            F.when(v.isNull() | F.isnan(v), F.lit(None).cast("int"))
            .otherwise(spike.cast("int")),
        )
        .withColumn(
            out_col,
            F.when(v.isNull() | F.isnan(v), v).otherwise(
                F.when(spike, F.col("__med")).otherwise(v)
            ),
        )
        .drop("__arr", "__med", "__mad")
    )
