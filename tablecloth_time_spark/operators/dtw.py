"""Dynamic Time Warping distances between bucketed series.

DTW (Sakoe & Chiba 1978; Berndt & Clifford 1994 for time-series mining)
scores two sequences by the cheapest monotone alignment path — the
standard elastic similarity measure when series are out of phase
(shifted daily peaks, stretched sessions) and plain Pearson correlation
(operators/stats.py:series_correlations) under-reports the relationship.

Scale shape (the series_correlations contract):

- raw data reduces FIRST to one bucketed value per (key, bucket) — a
  rollup-class aggregate, map-side combined;
- each series then collapses to ONE row carrying its ordered value
  array (rows ∝ series, array length ∝ buckets — bounded by the caller's
  grid, never raw events);
- pairs come from a self-join with ``key_a < key_b`` — output is O(k²)
  in the number of SERIES, meant for metric-dashboard cardinalities
  (k <= ~10^3); embedding-scale similarity belongs to the LSH family;
- the DP itself is the sanctioned Arrow path: a pandas UDF over the
  tiny pair frame, numpy-vectorized along ANTI-DIAGONALS (cells of
  diagonal d depend only on diagonals d-1 and d-2, so each of the
  n+m-1 steps is one vector op — no per-cell Python).

The DP is inherently sequential per pair (like LTTB/PELT); a pair's two
arrays must fit one task, which holds by construction for bucketed
series. ``band`` (Sakoe-Chiba radius) prunes the DP to |i-j| <= r,
widened to |n-m| when needed for feasibility.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from tablecloth_time_spark.functions.timeops import down_to_nearest


def dtw_pairwise(a: np.ndarray, b: np.ndarray, band: int | None = None) -> float:
    """DTW distance (|a_i - b_j| local cost, symmetric steps) between two
    1-d float arrays, computed over anti-diagonals."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return float("nan")
    r = None
    if band is not None:
        r = max(int(band), abs(n - m))  # keep the endpoint reachable
    inf = np.inf
    prev2 = np.full(n, inf)
    prev = np.full(n, inf)
    for d in range(n + m - 1):
        lo, hi = max(0, d - m + 1), min(d, n - 1)
        i = np.arange(lo, hi + 1)
        j = d - i
        cur = np.full(n, inf)
        c = np.abs(a[i] - b[j])
        if d == 0:
            cur[0] = c[0]
        else:
            im1 = np.maximum(i - 1, 0)
            up = np.where(i >= 1, prev[im1], inf)           # D[i-1, j]
            left = np.where(j >= 1, prev[i], inf)           # D[i, j-1]
            diag = np.where((i >= 1) & (j >= 1), prev2[im1], inf)
            cur[i] = c + np.minimum(np.minimum(up, left), diag)
        if r is not None:
            out = np.abs(i - j) > r
            if out.any():
                cur[i[out]] = inf
        prev2, prev = prev, cur
    return float(prev[n - 1])


def dtw_distances(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval: int,
    unit: str = "hour",
    agg: str = "avg",
    band: int | None = None,
) -> DataFrame:
    """Pairwise DTW over every two series' bucketed values.

    Output: (key_a, key_b, n_a, n_b, dtw, dtw_norm), key_a < key_b;
    ``dtw_norm`` = dtw / (n_a + n_b), the usual length normalization.
    Null/NaN values are dropped before bucketing; null keys are excluded
    (cannot be ordered into a pair — the series_correlations deviation).
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
        df.filter(F.col(key_col).isNotNull() & v.isNotNull() & ~F.isnan(v))
        .groupBy(F.col(key_col).alias("__k"), bucket)
        .agg(aggs[agg]().alias("__v"))
        .groupBy("__k")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__b", "__v"))),
                lambda s: s["__v"],
            ).alias("__vals"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    a = series.select(
        F.col("__k").alias("key_a"),
        F.col("__vals").alias("__va"),
        F.col("__n").alias("n_a"),
    )
    b = series.select(
        F.col("__k").alias("key_b"),
        F.col("__vals").alias("__vb"),
        F.col("__n").alias("n_b"),
    )
    pairs = a.crossJoin(b).filter(F.col("key_a") < F.col("key_b"))

    @pandas_udf("double")
    def dtw_udf(va: pd.Series, vb: pd.Series) -> pd.Series:
        return pd.Series(
            [
                dtw_pairwise(
                    np.asarray(x, dtype=np.float64),
                    np.asarray(y, dtype=np.float64),
                    band,
                )
                for x, y in zip(va, vb)
            ]
        )

    out = pairs.select(
        "key_a",
        "key_b",
        "n_a",
        "n_b",
        dtw_udf("__va", "__vb").alias("dtw"),
    )
    return out.withColumn(
        "dtw_norm",
        F.col("dtw") / (F.col("n_a") + F.col("n_b")).cast("double"),
    )
