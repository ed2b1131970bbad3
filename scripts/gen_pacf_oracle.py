"""Regenerate the pinned-golden VALUES oracle for q_pacf_synthetic.

The pinned values are derived INDEPENDENTLY of the engine: the synthetic
panel is rebuilt in pure Python (hashlib md5 fractions, integer sawtooth
— bit-identical to the Spark expressions by construction), the ACF is
recomputed with sequential row-order float sums (mirroring a single-key
Spark partition), and pacf_k comes from solving the Yule-Walker Toeplitz
system with np.linalg.solve per lag — NOT the engine's Durbin-Levinson
recursion. The script then runs the engine query and asserts the
independent values sit within 1e-9 BEFORE printing the rounded VALUES
(rounding uses decimal ROUND_HALF_UP, the same rule as Spark's
F.round); a byte-level mismatch at the pinned precision aborts.

Usage: python scripts/gen_pacf_oracle.py   # prints SQL_PACF_SYNTHETIC
"""

from __future__ import annotations

import hashlib
import sys
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

sys.path.insert(0, "/root/repo")

N, NK, MAX_LAG = 256, 3, 12
SCALE = float(16**15)


def series(k: int) -> list[float]:
    xs = []
    for t in range(N):
        h = hashlib.md5(f"s{k}:{t}pacf".encode()).hexdigest()
        frac = float(int(h[:15], 16)) / SCALE
        xs.append((t % 24) / 24.0 + 0.5 * ((t % 168) / 168.0) + (frac - 0.5))
    return xs


def seq_sum(vals) -> float:
    # sequential row-order accumulation — a single-key Spark partition
    acc = 0.0
    for v in vals:
        acc += v
    return acc


def acf_seq(xs: list[float]) -> list[float]:
    mean = seq_sum(xs) / len(xs)
    yc = [v - mean for v in xs]
    denom = seq_sum(c * c for c in yc)
    out = []
    for k in range(1, MAX_LAG + 1):
        num = seq_sum(yc[t] * yc[t - k] for t in range(k, len(yc)))
        out.append(num / denom)
    return out


def yule_walker_pacf(r: list[float]) -> list[float]:
    out = []
    for k in range(1, MAX_LAG + 1):
        R = np.empty((k, k))
        for i in range(k):
            for j in range(k):
                d = abs(i - j)
                R[i, j] = 1.0 if d == 0 else r[d - 1]
        phi = np.linalg.solve(R, np.array(r[:k]))
        out.append(float(phi[-1]))
    return out


def round_half_up(v: float, places: int = 6) -> float:
    q = Decimal(1).scaleb(-places)
    return float(Decimal(v).quantize(q, rounding=ROUND_HALF_UP)) + 0.0


def main() -> int:
    golden = {}
    for k in range(NK):
        golden[f"s{k}"] = yule_walker_pacf(acf_seq(series(k)))

    # independence gate: engine (Durbin-Levinson) must agree to 1e-9,
    # and the ROUNDED values must be byte-identical
    import __spark_entry__ as E
    from tablecloth_time_spark.session import get_session

    spark = get_session("gen_pacf_oracle", master="local[4]", shuffle_partitions=4)
    got = {
        (r["k"], r["lag"]): r["pacf"]
        for r in E.q_pacf_synthetic(spark, "unused").collect()
    }
    worst = 0.0
    for key, vals in golden.items():
        for lag, v in enumerate(vals, start=1):
            g = got[(key, lag)]
            worst = max(worst, abs(g - round_half_up(v)))
            assert round_half_up(v) == g, (key, lag, v, g)
    print(f"-- independence gate passed: max |engine - YW| post-round {worst}",
          file=sys.stderr)

    rows = ", ".join(
        f"('s{k}', {lag}, {round_half_up(v):.6f})"
        for k in range(NK)
        for lag, v in enumerate(golden[f"s{k}"], start=1)
    )
    print('SQL_PACF_SYNTHETIC = """')
    print("SELECT CAST(k AS VARCHAR) AS k, CAST(lag AS INT) AS lag,")
    print("       CAST(pacf AS DOUBLE) AS pacf")
    print(f"FROM (VALUES {rows}) AS t(k, lag, pacf)")
    print('"""')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
