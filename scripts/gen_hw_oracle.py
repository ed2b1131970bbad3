"""Regenerate the pinned-golden VALUES oracle for the hw_synthetic driver
query — via an INDEPENDENT scalar implementation of the documented
classical Holt-Winters convention (not the Spark kernel's code).

Contract (must match __spark_entry__.q_hw_synthetic exactly):
- keys 'retail' / 'traffic', n = 84 daily points from 2024-01-01T00:00Z;
- y_i = (20.0 + 0.25*i + seas_k[i % 7]) + noise(k, i), all construction
  ops exact in IEEE double (0.25 and the seasonal literals are binary
  fractions; noise is the md5 contract shared with gen_pelt_oracle.py);
- m=7, horizon=14, alpha=0.4, beta=0.2, gamma=0.3; outputs ROUND(.,6).
"""

from __future__ import annotations

import hashlib

N = 84
M = 7
HORIZON = 14
ALPHA, BETA, GAMMA = 0.4, 0.2, 0.3
T0_MS = 1_704_067_200_000
DAY_MS = 86_400_000

SEAS = {
    "retail": [4.0, 2.5, -1.5, -3.0, 0.5, -2.0, -0.5],
    "traffic": [-6.0, 1.0, 2.5, 3.0, 2.0, 0.5, -3.0],
}


def noise(k: str, i: int) -> float:
    h = int(hashlib.md5(f"{k}:{i}".encode()).hexdigest()[:8], 16)
    return (h / 4294967296.0 - 0.5) * 2.0


def series(k: str) -> list[float]:
    return [
        (20.0 + 0.25 * i + SEAS[k][i % M]) + noise(k, i) for i in range(N)
    ]


def hw(y: list[float], m: int, horizon: int, a: float, b_: float, g: float):
    """Scalar-loop re-derivation (deliberately NOT the numpy kernel)."""
    import numpy as np

    # classical init: means as the kernel computes them (np.mean), the
    # recurrence as plain scalars
    l = float(np.mean(y[:m]))
    b = float((np.mean(y[m : 2 * m]) - np.mean(y[:m])) / m)
    s = [float(v) - l for v in y[:m]]
    for t in range(m, len(y)):
        lp, bp = l, b
        l = a * (y[t] - s[t - m]) + (1.0 - a) * (lp + bp)
        b = b_ * (l - lp) + (1.0 - b_) * bp
        s.append(g * (y[t] - lp - bp) + (1.0 - g) * s[t - m])
    n = len(y)
    out = []
    for h in range(1, horizon + 1):
        k_back = (h - 1) // m + 1
        out.append(l + h * b + s[n - 1 + h - m * k_back])
    return out


def main() -> None:
    rows = []
    for k in ["retail", "traffic"]:
        fc = hw(series(k), M, HORIZON, ALPHA, BETA, GAMMA)
        for h in range(1, HORIZON + 1):
            ts_ms = T0_MS + (N - 1 + h) * DAY_MS
            rows.append((k, h, ts_ms, round(fc[h - 1], 6)))
    print("SELECT k, 'holt_winters' AS method, CAST(h AS INTEGER) AS h,")
    print("       make_timestamp(ts_ms * 1000) AS ts,")
    print("       CAST(forecast AS DOUBLE) AS forecast")
    print("FROM (VALUES")
    print(",\n".join(f"  ('{k}', {h}, {ts}, {fc})" for k, h, ts, fc in rows))
    print(") AS t(k, h, ts_ms, forecast)")


if __name__ == "__main__":
    main()
