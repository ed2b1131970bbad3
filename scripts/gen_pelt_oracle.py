"""Regenerate the pinned-golden VALUES oracle for the pelt_synthetic
driver query — independently of the PELT implementation.

Contract (must match __spark_entry__.q_pelt_synthetic exactly):
- keys 'stable' / 'step' / 'multi', n = 400 points each, one per minute
  from 2024-01-01T00:00Z;
- mean schedule: stable = 5.0; step = 0 -> 6 at i=150;
  multi = 0 -> 6 at i=120, 6 -> 2 at i=260;
- noise_i = (int(md5(f"{k}:{i}")[:8], 16) / 2^32 - 0.5) * 2.0 — every
  operation is exact or identically rounded in IEEE double, so the Spark
  expression (conv(substring(md5(...),1,8),16,10)/4294967296.0-0.5)*2.0
  produces the SAME bits;
- penalty = 30.0, min_size = 2.

The expected breakpoints come from the EXHAUSTIVE O(n^2) optimal
partitioning DP (not PELT), so the driver check also re-proves the
pruning's exactness on this input. Segment means are numpy means over
the same arrays the kernel sees.

Usage: python scripts/gen_pelt_oracle.py  -> prints the VALUES SQL body.
"""

from __future__ import annotations

import hashlib

import numpy as np

N = 400
PENALTY = 30.0
MIN_SIZE = 2
T0_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z
STEP_MS = 60_000


def mean_at(k: str, i: int) -> float:
    if k == "stable":
        return 5.0
    if k == "step":
        return 0.0 if i < 150 else 6.0
    if k == "multi":
        if i < 120:
            return 0.0
        return 6.0 if i < 260 else 2.0
    raise ValueError(k)


def noise(k: str, i: int) -> float:
    h = int(hashlib.md5(f"{k}:{i}".encode()).hexdigest()[:8], 16)
    return (h / 4294967296.0 - 0.5) * 2.0


def series(k: str) -> np.ndarray:
    return np.array([mean_at(k, i) + noise(k, i) for i in range(N)])


def brute_force_opt(x: np.ndarray, beta: float, min_size: int) -> list[int]:
    n = len(x)
    cs = np.concatenate(([0.0], np.cumsum(x)))
    cs2 = np.concatenate(([0.0], np.cumsum(x * x)))

    def cost(a, b):
        s = cs[b] - cs[a]
        return (cs2[b] - cs2[a]) - s * s / (b - a)

    F = np.full(n + 1, np.inf)
    F[0] = -beta
    prev = np.zeros(n + 1, dtype=int)
    for t in range(min_size, n + 1):
        best, arg = np.inf, 0
        for tau in range(0, t - min_size + 1):
            if not np.isfinite(F[tau]):
                continue
            v = F[tau] + cost(tau, t)
            if v < best:
                best, arg = v, tau
        F[t] = best + beta
        prev[t] = arg
    cps, t = [], n
    while t > 0:
        tau = int(prev[t])
        if tau > 0:
            cps.append(tau)
        t = tau
    return cps[::-1]


def main() -> None:
    rows = []
    for k in ["stable", "step", "multi"]:
        x = series(k)
        cps = brute_force_opt(x, PENALTY, MIN_SIZE)
        bounds = [0, *cps, N]
        for j, cp in enumerate(cps):
            lo, hi = bounds[j], bounds[j + 2]
            ts_ms = T0_MS + cp * STEP_MS
            rows.append(
                (
                    k,
                    cp,
                    ts_ms,
                    N,
                    round(float(x[lo:cp].mean()), 6),
                    round(float(x[cp:hi].mean()), 6),
                )
            )
    print("SELECT k, CAST(cp_index AS INTEGER) AS cp_index,")
    print("       make_timestamp(ts_ms * 1000) AS cp_ts,")
    print("       CAST(n AS INTEGER) AS n,")
    print("       CAST(mean_before AS DOUBLE) AS mean_before,")
    print("       CAST(mean_after AS DOUBLE) AS mean_after")
    print("FROM (VALUES")
    body = ",\n".join(
        f"  ('{k}', {cp}, {ts}, {n}, {mb}, {ma})"
        for k, cp, ts, n, mb, ma in rows
    )
    print(body)
    print(") AS t(k, cp_index, ts_ms, n, mean_before, mean_after)")


if __name__ == "__main__":
    main()
