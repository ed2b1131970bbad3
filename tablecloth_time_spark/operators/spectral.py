"""Periodogram power at candidate periods — dominant-seasonality detection.

The reference's notebook track (ACF/decomposition, fpp3 ch. 2-4) answers
"is there structure at lag k?"; the periodogram answers the preceding
question — "WHICH period dominates?" — without materializing every lag.
For each candidate period ``p`` the Schuster periodogram needs only four
sums per key:

    A_p = sum (x - mean) * cos(2*pi*t/p)
    B_p = sum (x - mean) * sin(2*pi*t/p)

expanded so the mean never needs a first pass:
``A_p = sum(x*cos) - mean * sum(cos)`` — every term is a plain SUM, so the
whole operator is ONE partial/final hash aggregate per key (2 + 4*k
mergeable sums), the same 100 TB shape as any rollup: map-side combined,
one Exchange, no window, no Python. Per-period rows come from exploding a
k-element struct array of the final tiny frame.

Numerics: the phase is reduced EXACTLY before the trig call — epoch
millis mod period-in-millis is integer arithmetic, so the cos/sin
argument is always in [0, 2*pi) and bit-identical in any engine
(a raw 2*pi*t/p with t ~ 1e12 ms would hit each engine's different
large-argument reduction). Variance uses the sum-of-squares identity;
outputs:

    amp        = 2*sqrt(A^2+B^2)/n        (amplitude of the fitted sinusoid)
    power_frac = (2*(A^2+B^2)/n) / sum((x-mean)^2)

``power_frac`` is 1.0 for a pure sinusoid sampled on a uniform grid whose
length is a multiple of ``p``, ~0 for noise at a wrong period — the
self-normalizing "fraction of variance at this period" reading.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tablecloth_time_spark.functions.timeops import to_epoch_millis
from tablecloth_time_spark.functions.units import milliseconds_in, normalize_unit


def periodogram(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    periods: list[int],
    unit: str = "hour",
) -> DataFrame:
    """Periodogram power of ``value_col`` per key at each candidate
    ``period`` (integers, in ``unit``). Output: one row per (keys,
    period) with ``n`` (valid samples), ``amp``, ``power_frac``.

    Null/NaN values are missing data — they contribute to none of the
    sums (matching acf/ewma masking); a key with < 2 valid samples or
    zero variance reports null ``power_frac``.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    if not periods:
        raise ValueError("periodogram: need at least one candidate period")
    if any(int(p) != p or p <= 0 for p in periods):
        raise ValueError(f"periodogram: periods must be positive ints: {periods}")
    unit_ms = milliseconds_in(normalize_unit(unit))

    x = F.col(value_col).cast("double")
    valid = x.isNotNull() & ~F.isnan(x)
    xv = F.when(valid, x)
    ms = to_epoch_millis(ts_col)

    aggs = [
        F.count(xv).alias("__n"),
        F.sum(xv).alias("__sx"),
        F.sum(xv * xv).alias("__sxx"),
    ]
    for i, p in enumerate(periods):
        p_ms = int(p) * unit_ms
        # exact integer phase reduction, then one small-argument trig call
        ang = F.lit(math.tau) * (
            F.pmod(ms, F.lit(p_ms)).cast("double") / F.lit(float(p_ms))
        )
        c, s = F.cos(ang), F.sin(ang)
        aggs += [
            F.sum(F.when(valid, c)).alias(f"__c{i}"),
            F.sum(F.when(valid, s)).alias(f"__s{i}"),
            F.sum(xv * c).alias(f"__xc{i}"),
            F.sum(xv * s).alias(f"__xs{i}"),
        ]
    agg = df.groupBy(*ks).agg(*aggs)

    n = F.col("__n").cast("double")
    mean = F.col("__sx") / n
    sst = F.col("__sxx") - F.col("__sx") * mean
    rows = []
    for i, p in enumerate(periods):
        a = F.col(f"__xc{i}") - mean * F.col(f"__c{i}")
        b = F.col(f"__xs{i}") - mean * F.col(f"__s{i}")
        pw = a * a + b * b
        rows.append(
            F.struct(
                F.lit(int(p)).cast("bigint").alias("period"),
                (F.lit(2.0) * F.sqrt(pw) / n).alias("amp"),
                # strictly-positive guard: the sum-of-squares identity can
                # return a tiny NEGATIVE sst for a constant series, and a
                # near-zero divisor would fabricate huge power readings
                F.when(sst > F.lit(0.0), F.lit(2.0) * pw / n / sst).alias(
                    "power_frac"
                ),
            )
        )
    exploded = agg.select(
        *ks, F.col("__n").alias("n"), F.explode(F.array(*rows)).alias("__e")
    )
    return exploded.select(
        *ks,
        F.col("__e.period").alias("period"),
        "n",
        F.when(F.col("n") >= 2, F.col("__e.amp")).alias("amp"),
        F.when(F.col("n") >= 2, F.col("__e.power_frac")).alias("power_frac"),
    )
