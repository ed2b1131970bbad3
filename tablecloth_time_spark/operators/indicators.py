"""Rolling technical indicators over ROWS frames — Bollinger bands and
Cutler's RSI.

The reference's archived rolling-window API (reference
development-plan.md:645-666) stops at plain trailing aggregates; these are
the canonical indicator compositions built from exactly those aggregates
(mean/stddev/lag over a fixed row window), so they stay in the same plan
class: ONE Exchange on the series key, one in-partition sorted pass, all
arithmetic inside whole-stage codegen — no Python, no join, no second
shuffle (every window spec shares the one (keys, order) sort).

RSI here is Cutler's variant (simple moving average of gains/losses) —
unlike Wilder's original it is NOT a recurrence, so it stays a pure window
expression; expressed as ``100 * avg_gain / (avg_gain + avg_loss)``, which
is algebraically Wilder's 100 - 100/(1+RS) form but well-defined at
avg_loss = 0 (100 when rising, null on a 0/0 flat window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def bollinger_bands(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    value_col: str,
    n: int = 20,
    k: float = 2.0,
    min_periods: int | None = None,
) -> DataFrame:
    """Bollinger bands over a trailing ``n``-row frame per key: ``mid`` =
    SMA(n), ``upper``/``lower`` = mid +- ``k`` sample stddevs, ``pct_b`` =
    (x - lower) / (upper - lower) (null when the band has zero width),
    ``bandwidth`` = (upper - lower) / mid (null at mid = 0).

    ``min_periods`` (default ``n``) nulls the truncated head windows the
    way pandas ``rolling(n, min_periods=n)`` does — an indicator over 3
    of its 20 samples is noise, not signal.
    """
    if n < 2:
        raise ValueError(f"bollinger_bands: need n >= 2 rows, got {n}")
    mp = n if min_periods is None else min_periods
    w = Window.partitionBy(*keys).orderBy(*order_cols).rowsBetween(
        -(n - 1), 0
    )
    v = F.col(value_col).cast("double")
    cnt = F.count(v).over(w)
    mid = F.when(cnt >= mp, F.avg(v).over(w))
    sd = F.when(cnt >= mp, F.stddev_samp(v).over(w))
    upper = mid + F.lit(float(k)) * sd
    lower = mid - F.lit(float(k)) * sd
    return df.select(
        "*",
        mid.alias("mid"),
        upper.alias("upper"),
        lower.alias("lower"),
        F.try_divide(v - lower, upper - lower).alias("pct_b"),
        F.try_divide(upper - lower, mid).alias("bandwidth"),
    )


def rsi_cutler(
    df: DataFrame,
    keys: list[str],
    order_cols: list[str],
    value_col: str,
    n: int = 14,
    out_col: str = "rsi",
) -> DataFrame:
    """Cutler's RSI over a trailing ``n``-row frame per key: gains and
    losses come from the one-row diff, their simple moving averages from
    the same sort, and ``rsi = 100 * avg_gain / (avg_gain + avg_loss)``.
    Rows whose frame holds fewer than ``n`` diffs report null (pandas
    ``min_periods=n`` discipline); a flat window (0/0) is null.
    """
    if n < 1:
        raise ValueError(f"rsi_cutler: need n >= 1 diffs, got {n}")
    wo = Window.partitionBy(*keys).orderBy(*order_cols)
    w = wo.rowsBetween(-(n - 1), 0)
    v = F.col(value_col).cast("double")
    diff = v - F.lag(v, 1).over(wo)
    gain = F.when(diff > 0, diff).otherwise(
        F.when(diff.isNotNull(), F.lit(0.0))
    )
    loss = F.when(diff < 0, -diff).otherwise(
        F.when(diff.isNotNull(), F.lit(0.0))
    )
    stepped = df.select("*", gain.alias("__gain"), loss.alias("__loss"))
    cnt = F.count("__gain").over(w)
    ag = F.when(cnt >= n, F.avg("__gain").over(w))
    al = F.when(cnt >= n, F.avg("__loss").over(w))
    rsi = F.lit(100.0) * F.try_divide(ag, ag + al)
    return stepped.select("*", rsi.alias(out_col)).drop("__gain", "__loss")
