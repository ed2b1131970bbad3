"""PELT optimal changepoint detection (Killick, Fearnhead & Eckley 2012).

The engine's changepoint surface so far is scoring-shaped:
``level_shift_scores`` ranks candidate points and ``cusum_scores`` flags
drift onsets — both pure window plans. PELT answers the stronger
question ("what is the OPTIMAL segmentation of this series into
constant-mean pieces?") exactly, by dynamic programming over

    F(t) = min_tau [ F(tau) + C(tau, t) ] + beta,

with the L2 segment cost C(a, b) = sum(x^2) - (sum x)^2 / n over
``[a, b)`` (the Gaussian mean-shift RSS) and the inadmissible-candidate
pruning that makes the sweep O(n) amortized. The recursion is inherently
sequential per series, so this is one of the engine's sanctioned Arrow
kernels (lttb / pacf / compression codecs family): ONE shuffle
co-locates each key, groups stream through ``mapInPandas`` batches
(``_grouped.grouped_apply_stream``), and the DP runs vectorized numpy
over the pruned candidate set — raw series length enters Python memory
once per key, so a single key's series must fit an executor's Python
heap (same contract as lttb; the compressed-tier blocks are the path for
longer histories).

Exactness: PELT provably returns the SAME optimum as the O(n^2)
exhaustive partitioning DP — the pytest oracle runs that brute force and
asserts identical breakpoints.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StructField,
    StructType,
    TimestampType,
)


def _pelt_l2(x: np.ndarray, beta: float, min_size: int) -> list[int]:
    """Breakpoint indices (start of each new segment) for the L2 cost.

    Vectorized over the pruned candidate set; candidates enter when a
    segment of ``min_size`` behind the frontier becomes possible and
    leave via the F(tau) + C(tau, t) <= F(t) inadmissibility prune
    (K = 0 for an additive cost) — with one refinement the min-size
    constraint forces: Killick's pruning theorem compares tau against
    "t as the last changepoint", which is only admissible from
    s >= t + min_size onward. A tau failing the inequality at t can
    therefore STILL be optimal for s in (t, t + min_size), so pruned
    candidates are kept on a deathbed until that horizon passes instead
    of being dropped immediately (the brute-force oracle caught exactly
    this: a min_size=5 series where immediate dropping lost the optimum).
    With min_size=1 the deathbed is empty and this is textbook PELT.
    """
    n = len(x)
    if n < 2 * min_size:
        return []
    cs = np.concatenate(([0.0], np.cumsum(x)))
    cs2 = np.concatenate(([0.0], np.cumsum(x * x)))
    F = np.full(n + 1, np.inf)
    F[0] = -beta
    prev = np.zeros(n + 1, dtype=np.int64)
    horizon = np.iinfo(np.int64).max
    cand = np.array([0], dtype=np.int64)
    expire = np.array([horizon], dtype=np.int64)  # last step tau is usable
    for t in range(min_size, n + 1):
        tau_new = t - min_size
        if tau_new > 0:
            cand = np.append(cand, tau_new)
            expire = np.append(expire, horizon)
        seg_n = (t - cand).astype(np.float64)
        s = cs[t] - cs[cand]
        cost = (cs2[t] - cs2[cand]) - s * s / seg_n
        tot = F[cand] + cost
        i = int(np.argmin(tot))
        F[t] = tot[i] + beta
        prev[t] = cand[i]
        newly_pruned = (tot > F[t]) & (expire == horizon)
        expire = np.where(newly_pruned, t + min_size - 1, expire)
        keep = expire > t
        cand, expire = cand[keep], expire[keep]
    cps = []
    t = n
    while t > 0:
        tau = int(prev[t])
        if tau > 0:
            cps.append(tau)
        t = tau
    cps.reverse()
    return cps


def _bic_penalty(x: np.ndarray) -> float:
    """2 * sigma^2 * log n with a robust first-difference MAD sigma —
    outlier-resistant and changepoint-resistant (a level shift moves ONE
    difference, not the median of them)."""
    n = len(x)
    if n < 3:
        return np.inf
    d = np.diff(x)
    mad = np.median(np.abs(d - np.median(d)))
    sigma = 1.4826 * mad / np.sqrt(2.0)
    if sigma == 0.0:
        sigma = float(np.std(d) / np.sqrt(2.0))
    if sigma == 0.0:
        return np.inf  # constant series: no finite-penalty changepoints
    return 2.0 * sigma * sigma * np.log(n)


def pelt_changepoints(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    penalty: float | str = "bic",
    min_size: int = 2,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Optimal mean-shift changepoints per key: one output row per
    detected breakpoint with ``cp_index`` (0-based position of the first
    row of the new segment, among the key's valid samples), ``cp_ts``
    (that row's timestamp), ``n`` (valid samples), and the adjacent
    segment means. Null/NaN values are dropped before the DP (the series
    compacts, matching acf/pacf). ``penalty='bic'`` derives
    2*sigma^2*log(n) per series with a robust sigma; pass a float to pin
    it (what the exactness oracle does)."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    if isinstance(penalty, str) and penalty != "bic":
        raise ValueError(f"penalty must be a float or 'bic', got {penalty!r}")
    if min_size < 1:
        raise ValueError(f"min_size must be >= 1, got {min_size}")
    order_cols = order_cols or []

    from tablecloth_time_spark.operators._grouped import grouped_apply_stream

    slim = df.select(*ks, ts_col, value_col, *order_cols)
    key_fields = [f for f in slim.schema.fields if f.name in ks]
    ts_field = next(f for f in slim.schema.fields if f.name == ts_col)
    schema = StructType(
        key_fields
        + [
            StructField("cp_index", IntegerType()),
            StructField("cp_ts", ts_field.dataType or TimestampType()),
            StructField("n", IntegerType()),
            StructField("mean_before", DoubleType()),
            StructField("mean_after", DoubleType()),
        ]
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        x_all = pd.to_numeric(g[value_col], errors="coerce").to_numpy(
            dtype=np.float64
        )
        valid = ~np.isnan(x_all)
        x = x_all[valid]
        ts = g[ts_col].to_numpy()[valid]
        n = len(x)
        beta = _bic_penalty(x) if penalty == "bic" else float(penalty)
        cps = _pelt_l2(x, beta, min_size) if np.isfinite(beta) else []
        if not cps:
            return pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in schema.fields}
            )
        bounds = [0, *cps, n]
        rows = []
        for j, cp in enumerate(cps):
            lo, hi = bounds[j], bounds[j + 2]
            rows.append(
                {
                    **{k: g[k].iloc[0] for k in ks},
                    "cp_index": int(cp),
                    "cp_ts": ts[cp],
                    "n": int(n),
                    "mean_before": float(x[lo:cp].mean()),
                    "mean_after": float(x[cp:hi].mean()),
                }
            )
        return pd.DataFrame(rows)

    return grouped_apply_stream(
        slim, ks, [ts_col, *order_cols], kernel, schema
    )
