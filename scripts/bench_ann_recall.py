"""ANN recall vs corpus scale: measure, don't extrapolate.

The IVF >=0.9 / LSH >=0.8 recall floors are pinned at sf0.01 in
tests/test_training_ops.py; the 100 TB claim for the ANN surface rests on
recall HOLDING as buckets densify (same n_planes/nlist over a growing
corpus means more candidates per bucket — recall rises, cost rises; the
knobs trade one for the other). This script measures recall@k and the
mean exact-scored candidate-set size per query for BOTH index families
across a knob grid at two scale factors, so the knob guidance in
BENCH/ANN_RECALL.md is a measured curve, not an argument.

Ground truth = brute_force_topk (exact cosine). Recall@k = |ANN top-k
intersset exact top-k| / (n_queries * k). Candidates/query = the mean number
of corpus vectors each query exact-scores after bucket/cell pruning —
the cost knob (brute force scores the whole corpus).

Two data regimes, both measured at two corpus sizes:

- the driver testdata panels (`/root/testdata/sf*/embeddings.parquet`)
  are i.i.d. uniform — measured mean true-NN cosine 0.37, mean pairwise
  cosine 0.0004 — the concentration-of-measure worst case where NO
  sublinear index can separate neighbors from noise;
- a deterministic in-memory CLUSTERED panel (16 Gaussian clusters,
  dim 64, same generator family as tests/test_training_ops.py) at the
  same two sizes — the regime real embedding corpora live in and the
  one the pinned >=0.8 / >=0.9 pytest floors are stated for.

Usage:
  python scripts/bench_ann_recall.py [sf_dir ...]   # default sf0.01 sf0.1
Writes BENCH/ANN_RECALL.md and prints one JSON line per (sf, family, knobs).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from tablecloth_time_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    ivf_assign,
    ivf_topk,
    lsh_ann_topk,
    rp_lsh_bucket,
    train_ivf_centroids,
)
from tablecloth_time_spark.session import get_session  # noqa: E402

DIM = 64
K = 10
N_QUERIES = 50
LSH_GRID = [(10, 4), (12, 4), (14, 4), (10, 8), (12, 8), (14, 8)]
IVF_GRID = [(8, 1), (8, 2), (8, 4), (16, 1), (16, 2), (16, 4), (16, 8)]


def _truth(corpus, queries):
    rows = brute_force_topk(corpus, queries, k=K).collect()
    t: dict[int, set[int]] = {}
    for r in rows:
        t.setdefault(r["query_id"], set()).add(r["vec_id"])
    return t


def _recall(rows, truth) -> float:
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    num = sum(len(got.get(q, set()) & ids) for q, ids in truth.items())
    return num / sum(len(ids) for ids in truth.values())


def _lsh_candidates(corpus, queries, n_planes, n_tables, seed=42):
    """Mean distinct candidates per query — the same bucket construction
    lsh_ann_topk scores (operators/similarity.py), counted pre-re-rank."""

    def wb(df, vcol, idc):
        tables = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table_id"),
                    rp_lsh_bucket(vcol, DIM, n_planes, seed + 1000 * t).alias(
                        "bucket"
                    ),
                )
                for t in range(n_tables)
            ]
        )
        return df.select(idc, F.explode(tables).alias("tb")).select(
            idc, "tb.table_id", "tb.bucket"
        )

    c = wb(corpus, "embedding", "vec_id")
    q = wb(queries, "query_vec", "query_id")
    n = (
        c.join(F.broadcast(q), on=["table_id", "bucket"])
        .select("query_id", "vec_id")
        .distinct()
        .count()
    )
    return n / N_QUERIES


def _ivf_candidates(corpus, queries, centroids, nprobe):
    c = corpus.select(
        "vec_id", ivf_assign("embedding", centroids, nprobe=1)[0].alias("cell")
    )
    q = queries.select(
        "query_id",
        F.explode(ivf_assign("query_vec", centroids, nprobe=nprobe)).alias(
            "cell"
        ),
    )
    n = c.join(F.broadcast(q), on="cell").select("query_id", "vec_id").count()
    return n / N_QUERIES


def _clustered_corpus(spark, n: int, dim: int = DIM, n_clusters: int = 16,
                      seed: int = 7):
    """Deterministic clustered panel: N(0,1) cluster centers (norm ~sqrt(dim)
    = 8) + sigma=0.15 per-dim Gaussian noise (noise norm ~1.2, SNR ~7:1 —
    the same clustered regime as the tests/test_training_ops.py fixture,
    slightly noisier). Both sizes share the SAME centers so growing the
    corpus densifies existing buckets rather than re-drawing the geometry."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    rng_pts = np.random.default_rng(seed + 1)
    cluster = np.arange(n) % n_clusters
    pts = centers[cluster] + 0.15 * rng_pts.normal(size=(n, dim))
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row.astype(np.float32).tolist() for row in pts],
        }
    )
    return spark.createDataFrame(
        pdf, schema="vec_id long, embedding array<float>"
    )


def measure(spark, sf_dir: str, clustered_n: int | None = None) -> list[dict]:
    if clustered_n is not None:
        corpus = _clustered_corpus(spark, clustered_n).cache()
        sf_dir = f"clustered-{clustered_n}"
    else:
        corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n_corpus = corpus.count()
    queries = (
        corpus.filter(f"vec_id < {N_QUERIES}")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        .cache()
    )
    queries.count()
    truth = _truth(corpus, queries)
    out = []
    for n_planes, n_tables in LSH_GRID:
        rows = lsh_ann_topk(
            corpus, queries, dim=DIM, k=K, n_planes=n_planes,
            n_tables=n_tables,
        ).collect()
        rec = {
            "sf_dir": sf_dir,
            "n_corpus": n_corpus,
            "family": "lsh",
            "n_planes": n_planes,
            "n_tables": n_tables,
            "recall_at_k": round(_recall(rows, truth), 4),
            "cand_per_query": round(
                _lsh_candidates(corpus, queries, n_planes, n_tables), 1
            ),
        }
        print(json.dumps(rec))
        out.append(rec)
    for n_centroids, nprobe in IVF_GRID:
        cents = train_ivf_centroids(
            corpus, DIM, n_centroids=n_centroids, sample_fraction=1.0
        )
        rows = ivf_topk(
            corpus, queries, dim=DIM, k=K, nprobe=nprobe, centroids=cents
        ).collect()
        rec = {
            "sf_dir": sf_dir,
            "n_corpus": n_corpus,
            "family": "ivf",
            "n_centroids": n_centroids,
            "nprobe": nprobe,
            "recall_at_k": round(_recall(rows, truth), 4),
            "cand_per_query": round(
                _ivf_candidates(corpus, queries, cents, nprobe), 1
            ),
        }
        print(json.dumps(rec))
        out.append(rec)
    corpus.unpersist()
    queries.unpersist()
    return out


def write_report(results: list[dict]) -> None:
    path = os.path.join(REPO, "BENCH", "ANN_RECALL.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    sfs = sorted({r["sf_dir"] for r in results})
    lines = [
        "# BENCH — ANN recall vs corpus scale (measured)",
        "",
        f"recall@{K} over {N_QUERIES} held-in queries against the exact",
        "brute-force cosine top-k; candidates/query = mean corpus vectors",
        "exact-scored per query after bucket/cell pruning (the cost side;",
        "brute force scores the whole corpus). Same seeds/knob meanings as",
        "operators/similarity.py and the driver queries.",
        "",
    ]
    for sf in sfs:
        n = next(r["n_corpus"] for r in results if r["sf_dir"] == sf)
        lines += [f"## {sf} — corpus {n:,} vectors", ""]
        lines += [
            "| family | knobs | recall@10 | candidates/query | corpus scored |",
            "|---|---|---|---|---|",
        ]
        for r in results:
            if r["sf_dir"] != sf:
                continue
            knobs = (
                f"planes={r['n_planes']}, tables={r['n_tables']}"
                if r["family"] == "lsh"
                else f"nlist={r['n_centroids']}, nprobe={r['nprobe']}"
            )
            lines.append(
                f"| {r['family']} | {knobs} | {r['recall_at_k']:.3f} "
                f"| {r['cand_per_query']} "
                f"| {r['cand_per_query'] / r['n_corpus'] * 100:.1f}% |"
            )
        lines.append("")
    # hand-written analysis below the marker survives regeneration
    tail = "<!-- ANALYSIS -->"
    if os.path.exists(path):
        prev = open(path).read()
        if "<!-- ANALYSIS -->" in prev:
            tail += prev.split("<!-- ANALYSIS -->", 1)[1]
    lines.append(tail)
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_session(
        "ann-recall", cores=cpus, shuffle_partitions=cpus
    )
    results = []
    for d in dirs:
        results += measure(spark, d)
    for n in (500, 2000):
        results += measure(spark, "", clustered_n=n)
    write_report(results)
    spark.stop()


if __name__ == "__main__":
    main()
