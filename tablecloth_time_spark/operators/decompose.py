"""Classical seasonal decomposition (additive): y = trend + seasonal + remainder.

The reference's notebook track follows fpp3 (Hyndman & Athanasopoulos,
"Forecasting: Principles and Practice", 3rd ed.) — chapter 2 ships as
`notebooks/chapter_02_time_series_graphics.clj` (seasonal plots, ACF);
chapter 3's classical decomposition is the next operation that workload
reaches for. Public algorithm (fpp3 §3.4):

1. trend-cycle T_t = centered m-MA of y (for even m, the 2×m-MA: a
   weighted (m+1)-point average with half weight on the endpoints);
   undefined (null) where the window is incomplete at the series edges.
2. detrended_t = y_t − T_t.
3. seasonal index S_j = mean of detrended over each season j
   (e.g. day-of-week for m=7, month for m=12), re-centered so the m
   indices sum to zero over one period.
4. remainder R_t = y_t − T_t − S_t.

Spark-native plan: the centered MA is ONE rows-frame window (shuffle on
the series key, sorted streaming pass, whole-stage codegen); the seasonal
indices are a tiny groupBy over (keys × m) rows joined back with a
broadcast hash join — no Python anywhere, and the big table is shuffled
exactly once on the series key (the seasonal join broadcasts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def classical_decomposition(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    period: int,
    season_col: str | Column,
    trend_col: str = "trend",
    seasonal_col: str = "seasonal",
    remainder_col: str = "remainder",
) -> DataFrame:
    """Add additive classical-decomposition columns to a regular series.

    ``df`` is one observation per (keys, ts); ``season_col`` names (or
    computes) the season index of each row — day-of-week for daily data
    with ``period=7``, month for monthly data with ``period=12``. The
    caller controls the season labeling precisely so that it matches the
    period; the operator does not re-derive it from the timestamp.

    Returns the input columns plus a ``__season`` tag and the three
    component columns. ``trend`` / ``remainder`` are null at the series
    edges (incomplete centered window), matching fpp3's classical
    decomposition output shape.
    """
    if period < 2:
        raise ValueError(f"classical_decomposition: period must be >= 2, got {period}")
    season = F.col(season_col) if isinstance(season_col, str) else season_col
    out = df.withColumn("__season", season)
    y = F.col(value_col)

    if period % 2 == 1:
        h = (period - 1) // 2
        w = Window.partitionBy(*keys).orderBy(ts_col).rowsBetween(-h, h)
        # null unless the frame holds the full m rows (series edges)
        trend = F.when(
            F.count(F.lit(1)).over(w) == period, F.avg(y).over(w)
        )
    else:
        # 2xm-MA: (0.5*y[t-h] + y[t-h+1..t+h-1] + 0.5*y[t+h]) / m, h = m/2
        h = period // 2
        w = Window.partitionBy(*keys).orderBy(ts_col).rowsBetween(-h, h)
        wo = Window.partitionBy(*keys).orderBy(ts_col)
        full = F.sum(y.cast("double")).over(w)
        ends = F.lag(y, h).over(wo) + F.lead(y, h).over(wo)
        trend = F.when(
            F.count(F.lit(1)).over(w) == period + 1,
            (full - ends / F.lit(2.0)) / F.lit(float(period)),
        )
    out = out.withColumn(trend_col, trend.cast("double"))
    out = out.withColumn("__detrended", y - F.col(trend_col))

    # seasonal indices: tiny (keys x m) aggregate, broadcast back
    sidx = (
        out.groupBy(*keys, "__season")
        .agg(F.avg("__detrended").alias("__s_raw"))
    )
    adj = sidx.groupBy(*keys).agg(F.avg("__s_raw").alias("__s_adj"))
    sidx = (
        sidx.join(adj, on=list(keys)) if keys else sidx.crossJoin(adj)
    ).select(
        *keys, "__season", (F.col("__s_raw") - F.col("__s_adj")).alias(seasonal_col)
    )
    out = out.join(F.broadcast(sidx), on=[*keys, "__season"])
    return out.withColumn(
        remainder_col, y - F.col(trend_col) - F.col(seasonal_col)
    ).drop("__detrended")


def decomposition_strength(
    df: DataFrame,
    keys: list[str],
    trend_col: str = "trend",
    seasonal_col: str = "seasonal",
    remainder_col: str = "remainder",
) -> DataFrame:
    """fpp3 chapter-4 STL feature pair over a decomposed series (the
    output of ``classical_decomposition``):

        trend_strength    = max(0, 1 - Var(R) / Var(T + R))
        seasonal_strength = max(0, 1 - Var(R) / Var(S + R))

    Values near 1 mean the component dominates; near 0, noise does. One
    map-side-combined hash aggregate per key (three var_samp moments over
    the complete-case rows — all three components non-null, so every
    variance compares the same sample; classical_decomposition's series
    edges with null trend are excluded, matching feasts). A zero-variance
    denominator (constant series) or a single complete row yields null —
    "undefined", never a fake 0.0.
    """
    t, s, r = F.col(trend_col), F.col(seasonal_col), F.col(remainder_col)
    defined = df.filter(t.isNotNull() & s.isNotNull() & r.isNotNull())
    agg = defined.groupBy(*keys).agg(
        F.var_samp(r).alias("__vr"),
        F.var_samp(t + r).alias("__vtr"),
        F.var_samp(s + r).alias("__vsr"),
        F.count(r).alias("n"),
    )

    def strength(den: str):
        # greatest() skips nulls (would turn undefined into 0.0); gate on
        # the ratio being defined first
        ratio = 1.0 - F.try_divide(F.col("__vr"), F.col(den))
        return F.when(ratio.isNotNull(), F.greatest(F.lit(0.0), ratio))

    return agg.select(
        *keys,
        strength("__vtr").alias("trend_strength"),
        strength("__vsr").alias("seasonal_strength"),
        "n",
    )
