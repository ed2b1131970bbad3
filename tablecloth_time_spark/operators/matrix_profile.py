"""Self-join matrix profile per series (motif + discord discovery).

The matrix profile (Yeh et al., ICDM 2016, "Matrix Profile I") gives
every length-m window of a series the distance to its nearest
non-trivial neighbor window: minima are MOTIFS (repeated behavior —
recurring daily shapes, templated conversations), maxima are DISCORDS
(the single strangest window — the classic anomaly definition that
needs no model or threshold). It completes the engine's symbolic/
elastic family: SAX words (operators/symbolic.py) for cheap candidate
grouping, DTW (operators/dtw.py) for pairwise elastic distance, matrix
profile for within-series structure.

Two distance modes:

- ``normalize=True`` (default, the canonical profile): z-normalized
  Euclidean distance via the STOMP dot-product identity
  d = sqrt(2m(1 - (QT - m*mu_i*mu_j) / (m*sig_i*sig_j))); windows with
  zero variance carry no shape and are excluded (their own profile row
  is NaN, and they never win as neighbors).
- ``normalize=False``: raw Euclidean distance. On integral inputs every
  squared difference and windowed sum is an exact integer in float64
  (order-independent), so results — including argmin indices under the
  (distance, index) lexicographic tie-break — are bit-reproducible in
  any engine; this is the mode the driver oracle re-derives brute-force
  in DuckDB.

Distributed shape: the profile is per-SERIES sequential/quadratic work
(the PELT/LTTB contract) — raw events reduce to the bucketed series
first, ONE shuffle co-locates each key, and the kernel streams groups
through Arrow batches. Inside the kernel the O(n^2) work is vectorized
along DIAGONALS (STOMP's iteration order): diagonal k compares every
window pair (i, i+k) with one O(n) numpy pass — windowed sums by
convolution — so Python-level iteration is O(n) diagonals, never
O(n^2) cells. A series' windows must fit one task (documented, same as
lttb/pelt); cross-series parallelism is free.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from tablecloth_time_spark.functions.timeops import down_to_nearest
from tablecloth_time_spark.operators._grouped import grouped_apply_stream


def matrix_profile_self(
    vals: np.ndarray,
    m: int,
    normalize: bool = True,
    exclusion: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(profile, profile_index) for one series; profile[i] is the
    distance from window i to its nearest neighbor window j with
    |i - j| >= exclusion (default max(1, m // 2)); ties break to the
    smallest j. Undefined entries (no eligible neighbor, or zero
    variance under normalize) are NaN / -1."""
    vals = np.asarray(vals, dtype=np.float64)
    n = len(vals)
    w = n - m + 1
    excl = exclusion if exclusion is not None else max(1, m // 2)
    prof = np.full(max(w, 0), np.inf)
    pidx = np.full(max(w, 0), -1, dtype=np.int64)
    if w < 1:
        return prof, pidx
    ones = np.ones(m)
    if normalize:
        c = np.cumsum(np.concatenate(([0.0], vals)))
        c2 = np.cumsum(np.concatenate(([0.0], vals * vals)))
        mu = (c[m:] - c[:-m]) / m
        var = (c2[m:] - c2[:-m]) / m - mu * mu
        sig = np.sqrt(np.maximum(var, 0.0))
    for k in range(excl, w):
        i = np.arange(w - k)
        if normalize:
            qt = np.convolve(vals[: n - k] * vals[k:], ones, "valid")
            denom = m * sig[i] * sig[i + k]
            with np.errstate(divide="ignore", invalid="ignore"):
                rho = (qt - m * mu[i] * mu[i + k]) / denom
                d = np.sqrt(np.maximum(2 * m * (1.0 - rho), 0.0))
            d[denom <= 0] = np.inf  # flat windows never match
        else:
            diff = vals[: n - k] - vals[k:]
            d = np.sqrt(np.convolve(diff * diff, ones, "valid"))
        # forward direction: for row i the candidate j = i + k arrives in
        # ascending-j order, so strict < keeps the smallest tied j
        upd = d < prof[i]
        prof[i[upd]] = d[upd]
        pidx[i[upd]] = i[upd] + k
        # backward direction: for row i + k the candidate j = i is SMALLER
        # than any previously seen neighbor from earlier diagonals only if
        # it wins strictly or ties (ties prefer the smaller j)
        r = i + k
        upd = (d < prof[r]) | ((d == prof[r]) & (i < pidx[r]))
        prof[r[upd]] = d[upd]
        pidx[r[upd]] = i[upd]
    if normalize:
        prof[sig <= 0] = np.nan
        pidx[sig <= 0] = -1
    prof[pidx == -1] = np.nan
    return prof, pidx


def matrix_profile(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    interval: int,
    unit: str,
    m: int,
    normalize: bool = True,
    exclusion: int | None = None,
    agg: str = "avg",
) -> DataFrame:
    """Matrix profile of each key's bucketed series.

    Buckets (``agg`` in avg|sum|count, rollup-class) become the series;
    missing buckets are simply absent (gapfill first via
    operators/gapfill.py when a regular grid matters). Output: one row
    per (keys, window start) — ``w_idx``/``w_start`` (index and bucket
    timestamp of the window's first point), ``mp`` (nearest-neighbor
    distance), ``mp_idx`` (that neighbor's window index, -1 when
    undefined)."""
    ks = [keys] if isinstance(keys, str) else list(keys)
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
        df.filter(v.isNotNull() & ~F.isnan(v))
        .groupBy(*ks, bucket)
        .agg(aggs[agg]().alias("__v"))
    )
    schema = StructType(
        [f for f in series.schema.fields if f.name in ks]
        + [
            StructField("w_idx", LongType()),
            StructField("w_start", series.schema["__b"].dataType),
            StructField("mp", DoubleType()),
            StructField("mp_idx", LongType()),
        ]
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        vals = g["__v"].to_numpy(dtype=np.float64)
        wn = len(vals) - m + 1
        if wn < 1:
            return pd.DataFrame(
                {c: pd.Series(dtype="object") for c in schema.names}
            )
        prof, pidx = matrix_profile_self(vals, m, normalize, exclusion)
        out = g.iloc[:wn][[*ks, "__b"]].rename(columns={"__b": "w_start"})
        out["w_idx"] = np.arange(wn, dtype=np.int64)
        out["mp"] = prof
        out["mp_idx"] = pidx
        return out[[*ks, "w_idx", "w_start", "mp", "mp_idx"]]

    return grouped_apply_stream(series, ks, ["__b"], kernel, schema)
