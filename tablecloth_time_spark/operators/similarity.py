"""Similarity search over embedding columns (array<float>).

Two paths, as a training-data pipeline needs both:

- **Brute-force cosine top-k** — the exact baseline. Query set broadcast
  against the corpus (a map-side nested loop: corpus never shuffles),
  cosine as zip_with/aggregate codegen exprs, per-query top-k via window.
  Exact, O(|Q| * n); right whenever |Q| is small — which is the common
  "find neighbors of these 1k probes in 10^10 docs" shape.
- **Random-hyperplane LSH ANN** — the scale path for all-pairs-ish loads:
  sign-pattern bucket per vector (planes fixed by seed, shipped as
  literal arrays into codegen), candidates = same-bucket rows (optionally
  multi-probe across several independent tables), exact cosine re-rank
  within buckets. Bucket join shuffles on a 32-bit key, never on vectors.

Cosine is computed in double precision with an explicit left-to-right
zip_with/aggregate sum so results are deterministic for a given plan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k neighbors per query row; queries are broadcast.

    Ties order deterministically by (cosine desc, corpus id asc).
    """
    joined = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(query_vec_col), F.col(vec_col)).alias("cosine_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rank")
    )


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def rp_lsh_bucket(
    vec_col: str | Column, dim: int, n_planes: int = 16, seed: int = 42
) -> Column:
    """Random-hyperplane sign bucket (int) as a pure expression.

    Bit i = sign(v . plane_i). Cosine-similar vectors collide with
    probability (1 - theta/pi)^n_planes (SimHash bound for angles).
    """
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    planes = _planes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = F.when(dot(v, plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    round_sim: int | None = None,
) -> DataFrame:
    """Approximate top-k: multi-table LSH candidates + exact re-rank.

    ``n_tables`` independent hash tables (different seeds) are unioned per
    row via explode, so one shuffle covers all tables; recall rises as
    1-(1-p)^n_tables. Candidates dedupe before the cosine re-rank.

    ``round_sim`` rounds the cosine to that many decimals BEFORE ranking,
    making the rank order independent of last-ULP summation differences —
    set it when results must reproduce bit-for-bit across engines (the
    driver's DuckDB oracle re-derives the same buckets from the same
    plane literals and ranks on the same rounded value).
    """
    def with_buckets(df: DataFrame, vcol: str, idc: str, keep: list[str]) -> DataFrame:
        tables = F.array(
            *[
                F.struct(
                    F.lit(t).alias("table_id"),
                    rp_lsh_bucket(vcol, dim, n_planes, seed + 1000 * t).alias(
                        "bucket"
                    ),
                )
                for t in range(n_tables)
            ]
        )
        return df.select(
            *keep, F.explode(tables).alias("tb")
        ).select(*keep, "tb.table_id", "tb.bucket")

    c = with_buckets(corpus, vec_col, id_col, [id_col, vec_col])
    q = with_buckets(queries, query_vec_col, query_id_col, [query_id_col, query_vec_col])

    cand = (
        c.join(F.broadcast(q), on=["table_id", "bucket"])
        .select(query_id_col, id_col, query_vec_col, vec_col)
        .dropDuplicates([query_id_col, id_col])
    )
    sim = cosine(F.col(query_vec_col), F.col(vec_col))
    if round_sim is not None:
        sim = F.round(sim, round_sim)
    scored = cand.select(query_id_col, id_col, sim.alias("cosine_sim"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rank")
    )


def train_ivf_centroids(
    df: DataFrame,
    dim: int,
    n_centroids: int = 16,
    sample_fraction: float = 0.1,
    max_sample: int = 20_000,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Coarse-quantizer centroids for IVF: k-means on a driver-side sample.

    Sampling + driver k-means is the standard IVF recipe (FAISS trains on a
    sample too): the sample is O(max_sample * dim) regardless of corpus
    size, and only the (n_centroids, dim) float array ships back to
    executors as a broadcast literal. Deterministic in ``seed``.
    """
    sample = (
        df.select(vec_col)
        .sample(fraction=sample_fraction, seed=seed)
        .limit(max_sample)
        .toPandas()
    )
    X = np.array(sample[vec_col].tolist(), dtype=np.float64)
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


def _centroid_sims(vec_col: str | Column, centroids: np.ndarray) -> list[Column]:
    # Raw dot products, NOT cosine: centroids are unit-normalized by
    # train_ivf_centroids and dividing every product by l2_norm(v) is a
    # per-row constant that cannot change the argmax/top-nprobe ordering —
    # Catalyst would re-inline the l2_norm aggregate once per centroid
    # (n_centroids extra array traversals per row for nothing).
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return [dot(v, F.array(*[F.lit(float(x)) for x in c])) for c in centroids]


def ivf_assign(
    vec_col: str | Column, centroids: np.ndarray, nprobe: int = 1
) -> Column:
    """Array of the nprobe nearest centroid ids (cosine) — pure exprs.

    nprobe=1 gives the storage-side cell assignment; queries use nprobe>1
    to probe neighboring cells (the IVF recall knob).
    """
    sims = _centroid_sims(vec_col, centroids)
    pairs = F.array(
        *[
            F.struct(s.alias("sim"), F.lit(i).alias("cell"))
            for i, s in enumerate(sims)
        ]
    )
    top = F.slice(F.reverse(F.array_sort(pairs)), 1, nprobe)
    return F.transform(top, lambda p: p.getField("cell"))


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    round_sim: int | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize, probe nprobe cells, re-rank.

    Corpus rows get ONE cell each (inverted list); each query probes its
    ``nprobe`` nearest cells, so the scored candidate set is ~nprobe/n_cells
    of the corpus. Equi-join on the cell id — shuffles a 4-byte key, with
    the (tiny) query side broadcast. Exact cosine re-rank inside the
    probed cells; ties break by (cosine desc, id asc).
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, dim, n_centroids=n_centroids, seed=seed, vec_col=vec_col
        )
    c = corpus.select(
        id_col, vec_col,
        ivf_assign(vec_col, centroids, nprobe=1)[0].alias("cell"),
    )
    q = queries.select(
        query_id_col, query_vec_col,
        F.explode(
            ivf_assign(query_vec_col, centroids, nprobe=nprobe)
        ).alias("cell"),
    )
    sim = cosine(F.col(query_vec_col), F.col(vec_col))
    if round_sim is not None:
        # rounded-before-rank => ordering reproducible across engines
        # (see lsh_ann_topk docstring)
        sim = F.round(sim, round_sim)
    scored = (
        c.join(F.broadcast(q), on="cell")
        .select(query_id_col, id_col, sim.alias("cosine_sim"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine_sim", "rank")
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 10,
    n_tables: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicate pairs via LSH blocking + exact verify.

    Returns (id_a < id_b, cosine_sim >= threshold). Bucket sizes bound the
    quadratic term; at corpus scale tune n_planes up for smaller buckets.

    Shuffle discipline: vectors ride ONE shuffle — the bucket equi-join
    keyed on (table_id, bucket), one copy per (row x table). The cosine is
    computed and thresholded INSIDE the join's output projection
    (pipelined, no materialization), so the cross-table dedup Exchange
    that follows carries only (id_a, id_b, cosine_sim) — at 10^10-doc
    scale the quadratic candidate stream never shuffles vector bytes.
    A pair blocked by k tables is scored k times; that trades bounded
    duplicate JVM codegen work for a pair-granularity vector shuffle,
    the right side of the trade at any realistic dim. (Verified identical
    results; plan pinned by test_plan_shapes.)
    """
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("table_id"),
                rp_lsh_bucket(vec_col, dim, n_planes, seed + 1000 * t).alias(
                    "bucket"
                ),
            )
            for t in range(n_tables)
        ]
    )
    b = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__vec"),
        F.explode(tables).alias("tb"),
    ).select("__id", "__vec", "tb.table_id", "tb.bucket")
    x, y = b.alias("a"), b.alias("b")
    return (
        x.join(
            y,
            on=[
                F.col("a.table_id") == F.col("b.table_id"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            cosine(F.col("a.__vec"), F.col("b.__vec")).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def centroid_outliers(
    df: DataFrame,
    keys: list[str],
    id_col: str,
    vec_col: str,
    z_thresh: float = 2.0,
) -> DataFrame:
    """Embedding-space quality screening: per group (``keys``), the mean
    embedding (centroid), each vector's cosine similarity to its own
    group's centroid, and a z-score outlier flag (cos more than
    ``z_thresh`` population-stddevs BELOW the group mean similarity) —
    the standard first-pass detector for mislabeled / off-topic /
    garbage members of a labeled embedding corpus before training.

    Plan: posexplode -> (keys, dim, sum/count) mergeable aggregate
    (the only raw-vector shuffle, carrying 8-byte partials per
    dimension) -> centroid arrays reassembled per key and
    ``broadcast()`` back -> cosine as pure array expressions (the
    similarity-family fold, no Python) -> one tiny (keys, cos) stats
    pass for the z threshold. Vectors themselves never shuffle: both
    joins broadcast |keys|-row frames.

    Mean/std use the explicit power-sum formulas (cross-engine
    mirrorable, as everywhere in this engine). NULL embeddings drop.
    """
    if z_thresh < 0:
        raise ValueError(f"centroid_outliers: z_thresh must be >= 0, got {z_thresh}")
    base = df.filter(F.col(vec_col).isNotNull())
    dims = base.select(
        *keys, F.posexplode(vec_col).alias("__pos", "__val")
    )
    cent = dims.groupBy(*keys, "__pos").agg(
        F.avg(F.col("__val").cast("double")).alias("__cv")
    )
    carr = cent.groupBy(*keys).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__pos", "__cv"))),
            lambda s: s["__cv"],
        ).alias("__centroid")
    )
    j = base.join(F.broadcast(carr), on=list(keys))
    sims = j.select(
        *keys,
        F.col(id_col).alias(id_col),
        cosine(F.col(vec_col), F.col("__centroid")).alias("cos_centroid"),
    )
    n = F.count(F.lit(1)).cast("double")
    s1 = F.sum("cos_centroid")
    s2 = F.sum(F.col("cos_centroid") * F.col("cos_centroid"))
    mean = s1 / n
    stats = sims.groupBy(*keys).agg(
        mean.alias("__m"),
        F.sqrt(s2 / n - mean * mean).alias("__sd"),
    )
    return (
        sims.join(F.broadcast(stats), on=list(keys))
        .select(
            *keys, id_col, "cos_centroid",
            (
                F.col("cos_centroid")
                < F.col("__m") - F.lit(z_thresh) * F.col("__sd")
            ).cast("int").alias("is_outlier"),
        )
    )
