"""Generate the pinned IVF coarse-quantizer centroids for the driver query.

Production IVF trains the quantizer offline and ships it with the index
(the FAISS recipe); pinning the trained centroids as literals makes the
driver's ivf_topk query fully deterministic AND lets the DuckDB oracle
re-derive the identical cell assignment from the same double literals —
upgrading the query from a rows-only check to a full hash oracle.

Training recipe (Spark-independent, replayable): embeddings parquet read
in vec_id order (capped at 20k rows), L2-normalized float64, spherical
k-means with default_rng(42) init and 10 Lloyd iterations — the same
math as operators.similarity.train_ivf_centroids, minus the Spark-side
sample whose row membership depends on parquet partitioning.

Usage: python scripts/gen_ivf_centroids.py [sf_dir] [n_centroids]
Paste the printed literal over _IVF_CENTROIDS in __spark_entry__.py.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np


def train(sf_dir: str, n_centroids: int = 8, iters: int = 10, seed: int = 42,
          cap: int = 20_000) -> np.ndarray:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding FROM read_parquet('{sf_dir}/embeddings.parquet') "
        f"ORDER BY vec_id LIMIT {cap}"
    ).fetchall()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ cent.T
        assign = sims.argmax(axis=1)
        for j in range(len(cent)):
            members = X[assign == j]
            if len(members):
                m = members.mean(axis=0)
                cent[j] = m / max(np.linalg.norm(m), 1e-12)
    return cent


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_centroids = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cent = train(sf_dir, n_centroids)
    print("_IVF_CENTROIDS: list[list[float]] = [")
    for row in cent:
        print("    [" + ", ".join(repr(float(x)) for x in row) + "],")
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
