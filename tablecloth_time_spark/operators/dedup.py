"""Deduplication operators for web-scale training-data pipelines.

Five strategies, each a `DataFrame -> DataFrame` with a scale-first shape:

- exact: hash-groupBy on the normalized-text fingerprint. One shuffle on a
  short key; the text column itself never shuffles.
- MinHash + LSH: shingle -> k minhashes (one xxhash64 per shingle + k
  affine rehashes, all array exprs) -> band buckets -> self-join within
  bucket -> exact-Jaccard verify. The self-join key is (band_id, band_hash)
  so candidate pairs are generated per-bucket, never all-pairs; verify cost
  is proportional to candidates, not n^2.
- SimHash: 64-bit signature -> 4x16-bit band blocking -> hamming<=t verify
  via bit_count(xor).
- n-gram Jaccard: blocked self-join + exact set Jaccard (the verify kernel
  alone, for when an upstream blocking key already exists).
- embedding cosine near-dup: random-hyperplane LSH buckets -> in-bucket
  cosine (see operators/similarity.py) or brute-force within a blocking
  key for oracle-checkable small scopes.

All pair outputs are canonical: (id_a < id_b), one row per pair, sorted
columns — dedup 'clusters' derive from pairs via the min-id representative
(connected components are deliberately out of scope; at 100 TB you run
label propagation over the pair table, which composes from these outputs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tablecloth_time_spark.functions.text import (
    fingerprint_md5,
    hash64_md5,
    jaccard,
    with_char_ngrams,
    with_word_shingles,
)

# Mersenne prime 2^31-1 for affine minhash rehashing: keeps a*h + b within
# int64 under ANSI overflow checking (a, h < 2^31 -> product < 2^62)
_MERSENNE = (1 << 31) - 1


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct normalized text: representative id + count.

    groupBy on the md5 fingerprint — the wide text column is dropped before
    the shuffle, so shuffle bytes are O(n * 32B) regardless of doc size.
    """
    return (
        df.select(
            fingerprint_md5(text_col).alias("fingerprint"),
            F.col(id_col).alias("__id"),
        )
        .groupBy("fingerprint")
        .agg(
            F.min("__id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def exact_dedup_keep_first(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Filter df down to the representative row per duplicate group."""
    keep = exact_dedup(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    # keep-set is O(distinct docs) — same order as df, so this is a real
    # shuffle join (leftsemi keeps it shuffle-one-side + no duplicate cols)
    return df.join(keep, on=id_col, how="leftsemi")


def _minhash_coeffs(n_hashes: int, seed: int) -> list[tuple[int, int]]:
    import random

    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, _MERSENNE), rnd.randrange(0, _MERSENNE))
        for _ in range(n_hashes)
    ]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    shingle_words: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(__id, __sig: array<long>) — one minhash signature row per document.

    ``hash_fn`` picks the per-shingle base hash: ``'xxhash64'`` (default —
    one JVM hash, the 100 TB path) or ``'md5'`` (``text.hash64_md5`` —
    bit-for-bit recomputable in any md5-capable engine, which is what lets
    the driver contract run a FULL DuckDB oracle over the LSH pipeline).
    Both are uniform 64/60-bit hashes; the sketch semantics are identical,
    only the concrete candidate sets differ.

    Shape matters here: a pure column expression for the signature would be
    re-inlined by Catalyst's project collapsing into EVERY one of the
    n_hashes elements (and again into every LSH band), recomputing the
    shingle pipeline 64x+ per row — measured 100x slower. Instead: explode
    shingles, hash each ONCE, and take the k affine min-aggregates in a
    single hash-aggregation pass (map-side partial mins, tiny shuffle of
    k longs per doc). The agg's exchange is also a plan barrier, so
    downstream band projections reference the signature attribute instead
    of re-deriving it.
    """
    coeffs = _minhash_coeffs(n_hashes, seed)
    sh_df = with_word_shingles(
        df.select(F.col(id_col).alias("__id"), text_col),
        text_col, "__wsh", n=shingle_words,
    )
    exploded = sh_df.select("__id", F.explode_outer("__wsh").alias("__s"))
    raw = F.xxhash64("__s") if hash_fn == "xxhash64" else hash64_md5(F.col("__s"))
    base = exploded.select(
        "__id",
        F.when(
            F.col("__s").isNull(), F.lit(None).cast("long")
        ).otherwise(F.pmod(raw, F.lit(_MERSENNE))).alias("__h"),
    )
    mins = [
        F.min(
            F.pmod(
                F.pmod(F.lit(a) * F.col("__h"), F.lit(_MERSENNE)) + F.lit(b),
                F.lit(_MERSENNE),
            )
        ).alias(f"__m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    sig = base.groupBy("__id").agg(*mins)
    return sig.select(
        "__id",
        F.array(
            *[
                F.coalesce(F.col(f"__m{i}"), F.lit(-1).cast("long"))
                for i in range(n_hashes)
            ]
        ).alias("__sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
    threshold: float = 0.5,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-duplicate pairs with exact-Jaccard verification.

    LSH recall knob: rows-per-band r = n_hashes/bands; candidate-capture
    probability for similarity s is 1-(1-s^r)^bands.
    Returns (id_a, id_b, jaccard_sim) with id_a < id_b, jaccard_sim from
    the EXACT shingle sets (false positives filtered; output is exact
    given the candidate set).

    ``hash_fn='md5'`` switches the base hash to the cross-engine
    ``text.hash64_md5`` AND the band bucket key from xxhash64 to md5 of
    the band's signature slice, making the whole candidate pipeline
    recomputable in DuckDB (the bucket key only needs equality semantics,
    so any injective-enough digest works; md5 keeps shuffle bytes at
    32 B/band like the 64-bit hash's 8 B — same join shape).
    """
    assert n_hashes % bands == 0
    r = n_hashes // bands

    sig = minhash_signatures(
        df, text_col, id_col, n_hashes, shingle_words, seed, hash_fn
    )
    # docs with NO shingles (shorter than the shingle size) all share the
    # sentinel signature: banding them would collapse every short doc into
    # one bucket (O(n^2) candidates) and report unrelated short docs as
    # jaccard-1.0 duplicates. They are non-comparable at this granularity —
    # route them to exact_dedup instead.
    sig = sig.filter(F.element_at("__sig", 1) != -1)

    # band join carries ONLY (id, band key): candidate volume is ids, never
    # shingle arrays (16 bands would otherwise ship every shingle set 16x)
    band_key = F.xxhash64 if hash_fn == "xxhash64" else F.md5
    banded = sig.select(
        "__id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        band_key(
                            F.concat_ws(",", F.slice("__sig", b * r + 1, r))
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("__id", "band.band_id", "band.band_hash")

    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

    # exact-Jaccard verify: re-attach shingle sets per side (shuffle joins
    # on the id, proportional to candidates + corpus, not candidates x bands)
    sh = with_word_shingles(
        df.select(F.col(id_col).alias("__id"), text_col),
        text_col, "__shingles", n=shingle_words,
    ).select("__id", "__shingles")
    verified = (
        cand.join(sh.withColumnRenamed("__id", "id_a"), "id_a")
        .withColumnRenamed("__shingles", "sh_a")
        .join(sh.withColumnRenamed("__id", "id_b"), "id_b")
        .withColumnRenamed("__shingles", "sh_b")
    )
    return (
        verified.select(
            "id_a",
            "id_b",
            jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 2,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(__id, __sim: long) — SimHash64 per document via explode + groupBy.

    Same bit semantics as functions/text.simhash64 (bit i set iff the
    per-position sign sum >= 0; empty docs hash to all-ones), but computed
    with ONE xxhash per shingle and 64 sum-aggregates in a single
    hash-aggregation pass — the df-level shape that avoids Catalyst
    re-inlining the shingle pipeline into every bit position (see
    minhash_signatures).

    ``hash_fn='md5'`` draws the 64 bits from the md5 digest instead — two
    32-bit halves of the first 16 hex chars, materialized as attributes so
    the 64 bit tests reference cheap column refs (bit i<32 from the low
    half, i>=32 from the high) — which DuckDB reproduces exactly, enabling
    the driver contract's full SQL oracle."""
    exploded = with_word_shingles(
        df.select(F.col(id_col).alias("__id"), text_col),
        text_col, "__wsh", n=shingle_words,
    ).select("__id", F.explode_outer("__wsh").alias("__s"))
    if hash_fn == "md5":
        hexd = F.md5("__s")
        exploded = exploded.select(
            "__id",
            "__s",
            F.conv(F.substring(hexd, 1, 8), 16, 10).cast("long").alias("__bh"),
            F.conv(F.substring(hexd, 9, 8), 16, 10).cast("long").alias("__bl"),
        )

        def bit_set(i: int):
            src = F.col("__bl") if i < 32 else F.col("__bh")
            return (
                F.shiftright(src, i % 32).bitwiseAND(F.lit(1).cast("long")) == 1
            )

    else:
        h = F.xxhash64("__s")

        def bit_set(i: int):
            return F.shiftright(h, i).bitwiseAND(F.lit(1).cast("long")) == 1

    sums = [
        F.sum(
            F.when(F.col("__s").isNull(), F.lit(0))
            .when(bit_set(i), 1)
            .otherwise(-1)
        ).alias(f"__b{i}")
        for i in range(64)
    ]
    agg = exploded.groupBy("__id").agg(
        *sums, F.count("__s").alias("__n_shingles")
    )
    sim = F.lit(0).cast("long")
    for i in range(64):
        weight = (1 << i) if i < 63 else -(1 << 63)
        sim = sim.bitwiseOR(
            F.when(
                F.coalesce(F.col(f"__b{i}"), F.lit(0)) >= 0,
                F.lit(weight).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )
    return agg.select("__id", sim.alias("__sim"), "__n_shingles")


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    shingle_words: int = 2,
    bands: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup pairs: banded blocking + exact hamming verify.

    With 4 bands of 16 bits, any pair within hamming distance 3 shares at
    least one exact band (pigeonhole); larger max_hamming trades recall.
    ``hash_fn`` as in ``simhash_signatures`` ('md5' = the cross-engine
    oracle-checkable variant).
    """
    bits_per = 64 // bands
    # shingle-less docs share the degenerate all-ones signature; banding
    # them would pair every short doc with every other (see minhash note)
    sigs = simhash_signatures(
        df, text_col, id_col, shingle_words, hash_fn
    ).filter(F.col("__n_shingles") > 0)
    banded = sigs.select(
        "__id",
        "__sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright("__sim", b * bits_per)
                        .bitwiseAND(F.lit((1 << bits_per) - 1))
                        .alias("band_val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("__id", "__sim", "band.band_id", "band.band_val")

    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_val") == F.col("b.band_val"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            F.col("a.__sim").alias("sim_a"),
            F.col("b.__sim").alias("sim_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def pairs_to_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over a near-dup pair table -> (id, cluster_id).

    Iterative min-label propagation (the Spark-native union-find): every id
    starts as its own label; each round, a node adopts the minimum label in
    its neighborhood; converges in O(diameter) rounds. Dedup chains are
    shallow (a near-dup cluster's diameter is tiny), so 3-5 rounds settle
    real data; ``max_iter`` bounds adversarial chains. Each round is two
    shuffle joins on the id — no driver-side graph, scales with the pair
    table. Rows not in any pair are absent (callers union singletons back
    if needed: cluster_id = own id).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    labels = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nmin", F.col("label"))
                ).alias("label"),
            )
        )
        # localCheckpoint FIRST (truncates per-iteration lineage), then run
        # the convergence check against the materialized frame — otherwise
        # the round's joins execute twice
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"pairs_to_clusters did not converge in {max_iter} rounds — a "
            "component's diameter exceeds max_iter; raise max_iter (rounds "
            "needed = longest chain of near-dup pairs)"
        )
    return labels.select("id", F.col("label").alias("cluster_id"))


def ngram_jaccard_pairs(
    df: DataFrame,
    block_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact char-n-gram Jaccard pairs within a blocking key.

    The verify kernel: all-pairs INSIDE each block only. Use when a cheap
    partitioning (domain, length band, LSH bucket) already bounds block
    size; cost is sum of block_size^2, never global n^2.
    """
    g = (
        with_char_ngrams(
            df.select(
                F.col(block_col).alias("__blk"),
                F.col(id_col).alias("__id"),
                text_col,
            ),
            text_col, "__grams", n=n,
        )
        .select("__blk", "__id", "__grams")
        .filter(F.size("__grams") > 0)  # empty gram sets are non-comparable
    )
    a, b = g.alias("a"), g.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.__blk") == F.col("b.__blk"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("b.__id").alias("id_b"),
            jaccard(F.col("a.__grams"), F.col("b.__grams")).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


def suppress_duplicate_events(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    fingerprint_cols: list[str],
    window: int,
    unit: str = "minute",
    order_cols: list[str] | None = None,
    flag_col: str = "is_duplicate",
) -> DataFrame:
    """Flag re-deliveries: a row is a duplicate when the SAME
    (keys, fingerprint) appeared within ``window`` units before it.

    The ingestion-dedup primitive (at-least-once sources re-deliver; exact
    content dedup across all time is too aggressive when a user may
    legitimately repeat an action later): one ``lag`` window over
    (keys + fingerprint) — a single shuffle, whole-stage codegen, and a
    run of back-to-back re-deliveries chains correctly (each row compares
    to its immediate predecessor, so a burst spanning longer than
    ``window`` still flags every copy after the first).
    """
    from pyspark.sql.window import Window

    from tablecloth_time_spark.functions.timeops import to_epoch_millis
    from tablecloth_time_spark.functions.units import (
        milliseconds_in,
        normalize_unit,
    )

    ks = [keys] if isinstance(keys, str) else list(keys)
    order_cols = order_cols or []
    window_ms = window * milliseconds_in(normalize_unit(unit))
    w = Window.partitionBy(*ks, *fingerprint_cols).orderBy(
        to_epoch_millis(ts_col), *order_cols
    )
    ms = to_epoch_millis(ts_col)
    gap = ms - F.lag(ms).over(w)
    return df.withColumn(
        flag_col, F.coalesce(gap <= F.lit(window_ms), F.lit(False))
    )


def ngram_overlap_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_hits: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing >=
    ``min_hits`` distinct word n-grams with any benchmark/eval document —
    the standard leakage filter training pipelines run before a model sees
    the data (n=8..13 word grams is the published range, e.g. GPT-3
    appendix C / PaLM / Llama decontamination).

    Plan: both sides shingle through the single-tokenize builder
    (functions/text.py:with_word_shingles), the benchmark's DISTINCT
    shingle set equi-joins the corpus' exploded shingles — broadcast by
    default (an eval suite is tiny next to a training corpus; set
    ``broadcast_benchmark=False`` when it is not), then one count per doc
    and a left join back so clean documents keep ``n_hits = 0``. The
    corpus text never shuffles — only (id, shingle) pairs move.

    Output: corpus ``id_col`` + ``n_hits`` (distinct contaminated n-grams)
    + ``is_contaminated``.
    """
    from tablecloth_time_spark.functions.text import with_word_shingles

    # explode_OUTER deliberately: plain explode lets Catalyst's
    # InferFiltersFromGenerate push a `size(__sh) > 0` filter below the
    # token-materializing projection, inlining the whole
    # normalize/tokenize/shingle pipeline into a per-row filter expression
    # (measured 16 s for the sf0.1 corpus gram scan vs <1 s without).
    # The post-Generate isNotNull filter is on the generator OUTPUT, so
    # nothing can push it below the projection.
    bench_set = (
        with_word_shingles(benchmark, text_col, "__sh", n=n)
        .select(F.explode_outer("__sh").alias("__gram"))
        .filter(F.col("__gram").isNotNull())
        .distinct()
    )
    if broadcast_benchmark:
        bench_set = F.broadcast(bench_set)
    corpus_grams = (
        with_word_shingles(corpus, text_col, "__sh", n=n)
        .select(id_col, F.explode_outer("__sh").alias("__gram"))
        .filter(F.col("__gram").isNotNull())
    )
    hits = (
        corpus_grams.join(bench_set, "__gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= min_hits).alias(
                "is_contaminated"
            ),
        )
    )
