"""Training-data pipeline ops: text analysis, dedup family, similarity,
multimodal plumbing — verified against pure-Python/numpy oracles."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tablecloth_time_spark.functions import text as TX
from tablecloth_time_spark.operators import dedup as DD
from tablecloth_time_spark.operators import multimodal as MM
from tablecloth_time_spark.operators import similarity as SIM

DOCS = [
    (0, "The quick brown fox jumps over the lazy dog near the river bank."),
    (1, "The quick brown fox jumps over the lazy dog near the river bend."),  # near-dup of 0
    (2, "Der Hund und die Katze sind nicht im Haus, das ist klar."),
    (3, "Le chat et le chien sont dans la maison et les jardins."),
    (4, "El perro y el gato de la casa es una maravilla para los vecinos."),
    (5, "completely different content about spark query engines and shuffles"),
    (6, "The quick brown fox jumps over the lazy dog near the river bank."),  # exact dup of 0
    (7, ""),
    (8, "a b a b a b a b a b"),
    (9, "numbers 123 and 456 plus punctuation!!! ??? ..."),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    df = spark.createDataFrame(
        pd.DataFrame(DOCS, columns=["doc_id", "text"]),
        schema="doc_id long, text string",
    )
    df.cache().count()
    return df


# ---------------------------------------------------------------------------
# text expressions vs python oracle
# ---------------------------------------------------------------------------


def _py_norm(s: str) -> str:
    return re.sub(r"\s+", " ", s.strip().lower())


def test_token_counts(spark, docs_df):
    rows = docs_df.select(
        "doc_id",
        TX.token_count_ws("text").alias("ws"),
        TX.token_count_bpe("text").alias("bpe"),
    ).collect()
    for r in rows:
        s = dict(DOCS)[r["doc_id"]]
        assert r["ws"] == len(s.split()), (r["doc_id"], s)
        assert r["bpe"] == len(re.findall(TX.BPE_TOKEN_PATTERN, s))


def test_char_ngrams_and_shingles(spark, docs_df):
    r = docs_df.filter("doc_id = 8").select(
        TX.char_ngrams("text", 3).alias("g"),
        TX.word_shingles("text", 2).alias("w"),
    ).collect()[0]
    s = dict(DOCS)[8]
    expected_g = sorted({s[i : i + 3] for i in range(len(s) - 2)})
    assert sorted(r["g"]) == expected_g
    toks = _py_norm(s).split()
    expected_w = sorted({" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)})
    assert sorted(r["w"]) == expected_w


def test_quality_score_bounds_and_shape(spark, docs_df):
    rows = docs_df.select("doc_id", TX.quality_score("text").alias("q")).collect()
    q = {r["doc_id"]: r["q"] for r in rows}
    assert all(0.0 <= v <= 1.0 for v in q.values())
    # natural sentence beats punctuation soup and empty text
    assert q[0] > q[9]
    assert q[0] > q[7]


def test_lang_id(spark, docs_df):
    rows = docs_df.select("doc_id", TX.lang_id("text").alias("lang")).collect()
    lang = {r["doc_id"]: r["lang"] for r in rows}
    assert lang[0] == "en"
    assert lang[2] == "de"
    assert lang[3] == "fr"
    assert lang[4] == "es"
    assert lang[7] == "und"


def test_simhash_df_matches_expression(spark, docs_df):
    """The scalable explode+groupBy SimHash equals the expression form."""
    expr_vals = {
        r["doc_id"]: r["h"]
        for r in docs_df.select(
            "doc_id", TX.simhash64("text", 2).alias("h")
        ).collect()
    }
    df_vals = {
        r["__id"]: r["__sim"]
        for r in DD.simhash_signatures(docs_df, shingle_words=2).collect()
    }
    assert df_vals == expr_vals


def test_simhash_properties(spark, docs_df):
    rows = docs_df.select("doc_id", TX.simhash64("text").alias("h")).collect()
    h = {r["doc_id"]: r["h"] for r in rows}
    assert h[0] == h[6]  # identical text -> identical signature
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham(h[0], h[1]) < ham(h[0], h[5])  # near-dup closer than unrelated


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------


def test_exact_dedup(spark, docs_df):
    groups = DD.exact_dedup(docs_df).collect()
    by_keep = {r["keep_id"]: r["n_docs"] for r in groups}
    assert by_keep[0] == 2  # docs 0 and 6
    assert sum(by_keep.values()) == len(DOCS)
    kept = DD.exact_dedup_keep_first(docs_df)
    assert kept.count() == len(DOCS) - 1
    assert kept.filter("doc_id = 6").count() == 0


def _py_shingle_jaccard(a: str, b: str, n: int) -> float:
    ta, tb = _py_norm(a).split(), _py_norm(b).split()
    sa = {" ".join(ta[i : i + n]) for i in range(max(len(ta) - n + 1, 0))}
    sb = {" ".join(tb[i : i + n]) for i in range(max(len(tb) - n + 1, 0))}
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def test_minhash_lsh_pairs(spark, docs_df):
    pairs = DD.minhash_lsh_pairs(
        docs_df, threshold=0.5, n_hashes=64, bands=16, shingle_words=3
    ).collect()
    found = {(r["id_a"], r["id_b"]): r["jaccard_sim"] for r in pairs}
    assert (0, 6) in found and found[(0, 6)] == 1.0  # exact dup
    assert (0, 1) in found  # near dup
    assert found[(0, 1)] == pytest.approx(_py_shingle_jaccard(DOCS[0][1], DOCS[1][1], 3))
    assert (1, 6) in found
    # unrelated docs never pass the exact-jaccard verify
    assert all(a in (0, 1, 6) and b in (0, 1, 6) for (a, b) in found)


def test_simhash_pairs(spark, docs_df):
    pairs = DD.simhash_pairs(docs_df, max_hamming=10).collect()
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert found[(0, 6)] == 0
    assert (0, 1) in found
    assert (0, 5) not in found


def test_ngram_jaccard_pairs(spark, docs_df):
    blocked = docs_df.withColumn("blk", F.lit(1))
    pairs = DD.ngram_jaccard_pairs(blocked, "blk", threshold=0.6).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert {(0, 1), (0, 6), (1, 6)} <= found
    assert (0, 5) not in found


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((5, 32)) * 3
    rows = []
    for i in range(200):
        c = i % 5
        v = centers[c] + rng.standard_normal(32) * 0.15
        rows.append({"vec_id": i, "cluster": c, "embedding": v.astype(np.float32).tolist()})
    pdf = pd.DataFrame(rows)
    df = spark.createDataFrame(
        pdf, schema="vec_id long, cluster int, embedding array<float>"
    )
    df.cache().count()
    return df, pdf


def _np_topk(pdf, qvec, k):
    M = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    q = np.asarray(qvec, dtype=np.float64)
    cos = (M @ q) / (np.linalg.norm(M, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(cos)), key=lambda i: (-cos[i], pdf["vec_id"][i]))
    return [pdf["vec_id"][i] for i in order[:k]], cos


def test_brute_force_topk_exact(spark, vectors):
    df, pdf = vectors
    queries = spark.createDataFrame(
        pd.DataFrame(
            [{"query_id": 0, "query_vec": pdf["embedding"][0]},
             {"query_id": 7, "query_vec": pdf["embedding"][7]}]
        ),
        schema="query_id long, query_vec array<float>",
    )
    out = SIM.brute_force_topk(df, queries, k=10).collect()
    for qid in (0, 7):
        got = [r["vec_id"] for r in sorted(
            (r for r in out if r["query_id"] == qid), key=lambda r: r["rank"]
        )]
        expected, _ = _np_topk(pdf, pdf["embedding"][qid], 10)
        assert got == expected


def test_lsh_ann_recall(spark, vectors):
    df, pdf = vectors
    queries = spark.createDataFrame(
        pd.DataFrame(
            [{"query_id": i, "query_vec": pdf["embedding"][i]} for i in range(10)]
        ),
        schema="query_id long, query_vec array<float>",
    )
    ann = SIM.lsh_ann_topk(df, queries, dim=32, k=10, n_planes=10, n_tables=6).collect()
    recall_num = recall_den = 0
    for qid in range(10):
        expected, _ = _np_topk(pdf, pdf["embedding"][qid], 10)
        got = {r["vec_id"] for r in ann if r["query_id"] == qid}
        recall_num += len(got & set(expected))
        recall_den += len(expected)
    assert recall_num / recall_den >= 0.8  # clustered data, generous tables


def test_cosine_near_dup_pairs(spark, vectors):
    df, pdf = vectors
    # plant an exact duplicate vector pair
    dup = spark.createDataFrame(
        pd.DataFrame(
            [{"vec_id": 9000, "cluster": 0, "embedding": pdf["embedding"][0]}]
        ),
        schema="vec_id long, cluster int, embedding array<float>",
    )
    out = SIM.cosine_near_dup_pairs(
        df.unionByName(dup), dim=32, threshold=0.999
    ).collect()
    assert any(r["id_a"] == 0 and r["id_b"] == 9000 for r in out)


def test_pairs_to_clusters(spark):
    """Min-label propagation vs a python union-find on a random graph."""
    rng = np.random.default_rng(5)
    edges = set()
    for _ in range(120):
        a, b = sorted(rng.integers(0, 80, 2).tolist())
        if a != b:
            edges.add((a, b))
    pairs = spark.createDataFrame(
        pd.DataFrame(sorted(edges), columns=["id_a", "id_b"]),
        schema="id_a long, id_b long",
    )
    got = {
        r["id"]: r["cluster_id"]
        for r in DD.pairs_to_clusters(pairs).collect()
    }

    parent = {}
    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for a, b in sorted(edges):
        union(a, b)
    # canonical representative = min id in component
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    expected = {n: min(members) for r, members in comp.items() for n in members}
    assert got == expected


def test_winnow_fingerprints(spark, docs_df):
    """Winnowing vs a direct python implementation, plus the shared-substring
    guarantee on the planted near-dup pair."""
    rows = {
        r["__id"]: r["fp"]
        for r in TX.winnow_fingerprint_sets(docs_df, "text", "doc_id", 5, 4).collect()
    }

    # python oracle for one doc using the same xxhash via Spark (hash parity):
    s = _py_norm(DOCS[5][1])
    grams = [s[i : i + 5] for i in range(len(s) - 4)]
    gdf = spark.createDataFrame(pd.DataFrame({"g": grams}))
    h = [r["h"] for r in gdf.select(F.xxhash64("g").alias("h")).collect()]
    expected = sorted({min(h[i : i + 4]) for i in range(len(h) - 3)})
    assert rows[5] == expected

    # identical docs -> identical fingerprint sets; near-dups share most
    assert rows[0] == rows[6]
    f0, f1, f5 = set(rows[0]), set(rows[1]), set(rows[5])
    shared_near = len(f0 & f1) / len(f0 | f1)
    shared_far = len(f0 & f5) / len(f0 | f5)
    assert shared_near > 0.5 > shared_far

    # empty doc -> empty fingerprints
    assert rows[7] == []


# ---------------------------------------------------------------------------
# hash_fn='md5' variants (the driver contract's cross-engine oracle path)
# vs a FULLY independent hashlib oracle — unlike the xxhash64 tests above,
# nothing here round-trips through Spark to obtain the hash values
# ---------------------------------------------------------------------------

_MERS = (1 << 31) - 1


def _py_h60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _py_h32_halves(s: str) -> tuple[int, int]:
    import hashlib

    d = hashlib.md5(s.encode("utf-8")).hexdigest()
    return int(d[:8], 16), int(d[8:16], 16)


def _py_shingles(s: str, n: int) -> set[str]:
    t = _py_norm(s).split()
    return {" ".join(t[i : i + n]) for i in range(max(len(t) - n + 1, 0))}


def test_minhash_md5_signatures_match_hashlib(spark, docs_df):
    coeffs = DD._minhash_coeffs(64, 42)
    got = {
        r["__id"]: list(r["__sig"])
        for r in DD.minhash_signatures(
            docs_df, n_hashes=64, shingle_words=2, hash_fn="md5"
        ).collect()
    }
    for doc_id, text in DOCS:
        sh = _py_shingles(text, 2)
        if not sh:
            assert got[doc_id] == [-1] * 64
            continue
        hs = [_py_h60(s) % _MERS for s in sh]
        expected = [
            min((a * h % _MERS + b) % _MERS for h in hs) for a, b in coeffs
        ]
        assert got[doc_id] == expected, doc_id


def test_minhash_md5_pairs_match_full_python_pipeline(spark, docs_df):
    """End-to-end python re-derivation of the md5-variant LSH pipeline:
    signatures -> 16 band buckets -> candidates -> exact jaccard ->
    threshold. The same contract SQL_* re-derives in DuckDB for the
    driver; here the oracle is hashlib + pure python."""
    import hashlib

    coeffs = DD._minhash_coeffs(64, 42)
    sigs, shsets = {}, {}
    for doc_id, text in DOCS:
        sh = _py_shingles(text, 2)
        shsets[doc_id] = sh
        if not sh:
            continue
        hs = [_py_h60(s) % _MERS for s in sh]
        sigs[doc_id] = [
            min((a * h % _MERS + b) % _MERS for h in hs) for a, b in coeffs
        ]
    buckets: dict[tuple[int, str], list[int]] = {}
    for doc_id, sig in sigs.items():
        for b in range(16):
            key = ",".join(str(v) for v in sig[b * 4 : (b + 1) * 4])
            bh = hashlib.md5(key.encode()).hexdigest()
            buckets.setdefault((b, bh), []).append(doc_id)
    cand = set()
    for ids in buckets.values():
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                cand.add((min(a, b), max(a, b)))
    expected = {}
    for a, b in sorted(cand):
        inter = len(shsets[a] & shsets[b])
        union = len(shsets[a] | shsets[b])
        j = 1.0 if union == 0 else inter / union
        if j >= 0.35:
            expected[(a, b)] = j
    got = {
        (r["id_a"], r["id_b"]): r["jaccard_sim"]
        for r in DD.minhash_lsh_pairs(
            docs_df, threshold=0.35, n_hashes=64, bands=16,
            shingle_words=2, hash_fn="md5",
        ).collect()
    }
    assert got == expected


def _py_simhash_md5(text: str, n: int) -> int | None:
    sh = _py_shingles(text, n)
    if not sh:
        return None
    sums = [0] * 64
    for s in sh:
        hi, lo = _py_h32_halves(s)
        for i in range(64):
            bit = (lo >> i) & 1 if i < 32 else (hi >> (i - 32)) & 1
            sums[i] += 1 if bit else -1
    v = 0
    for i in range(64):
        if sums[i] >= 0:
            v |= 1 << i
    return v - (1 << 64) if v >= (1 << 63) else v


def test_simhash_md5_signatures_match_hashlib(spark, docs_df):
    got = {
        r["__id"]: r["__sim"]
        for r in DD.simhash_signatures(
            docs_df, shingle_words=2, hash_fn="md5"
        ).collect()
    }
    for doc_id, text in DOCS:
        expected = _py_simhash_md5(text, 2)
        if expected is not None:
            assert got[doc_id] == expected, doc_id


def test_simhash_md5_pairs_match_hashlib(spark, docs_df):
    sigs = {
        d: _py_simhash_md5(t, 2) for d, t in DOCS if _py_simhash_md5(t, 2) is not None
    }
    expected = {}
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            sa, sb = sigs[a] & ((1 << 64) - 1), sigs[b] & ((1 << 64) - 1)
            # candidate iff some 16-bit band agrees (the blocking contract)
            if any(
                (sa >> (16 * k)) & 0xFFFF == (sb >> (16 * k)) & 0xFFFF
                for k in range(4)
            ):
                ham = bin(sa ^ sb).count("1")
                if ham <= 6:
                    expected[(a, b)] = ham
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in DD.simhash_pairs(
            docs_df, max_hamming=6, shingle_words=2, hash_fn="md5"
        ).collect()
    }
    assert got == expected


def test_winnow_md5_fingerprints_match_hashlib(spark, docs_df):
    got = {
        r["__id"]: list(r["fp"])
        for r in TX.winnow_fingerprint_sets(
            docs_df, "text", "doc_id", 5, 4, hash_fn="md5"
        ).collect()
    }
    for doc_id, text in DOCS:
        s = _py_norm(text)
        grams = [s[i : i + 5] for i in range(len(s) - 4)]
        if not grams:
            assert got[doc_id] == []
            continue
        h = [_py_h60(g) for g in grams]
        n_win = max(len(h) - 3, 1)
        expected = sorted({min(h[i : i + 4]) for i in range(n_win)})
        assert got[doc_id] == expected, doc_id


def test_ivf_topk_recall(spark, vectors):
    df, pdf = vectors
    queries = spark.createDataFrame(
        pd.DataFrame(
            [{"query_id": i, "query_vec": pdf["embedding"][i]} for i in range(10)]
        ),
        schema="query_id long, query_vec array<float>",
    )
    out = SIM.ivf_topk(
        df, queries, dim=32, k=10, n_centroids=8, nprobe=3, seed=7
    ).collect()
    recall_num = recall_den = 0
    for qid in range(10):
        expected, _ = _np_topk(pdf, pdf["embedding"][qid], 10)
        got = {r["vec_id"] for r in out if r["query_id"] == qid}
        recall_num += len(got & set(expected))
        recall_den += len(expected)
    # 5 true clusters, 8 cells, 3 probes: high recall expected
    assert recall_num / recall_den >= 0.9


def test_ivf_centroids_deterministic(spark, vectors):
    import numpy as np

    df, _ = vectors
    c1 = SIM.train_ivf_centroids(df, 32, n_centroids=4, seed=3)
    c2 = SIM.train_ivf_centroids(df, 32, n_centroids=4, seed=3)
    np.testing.assert_array_equal(c1, c2)


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def test_extract_features_deterministic(spark):
    media = MM.synthetic_media(spark, n=24)
    feats = MM.extract_features(media, feature_dim=16)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 24
    codec = MM.fake_decode(16)
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, r in rows.items():
        np.testing.assert_allclose(
            np.array(r["feature"], dtype=np.float32), codec(src[mid]), rtol=1e-6
        )
        assert r["payload_bytes"] == len(src[mid])


def test_synthetic_media_non_arrow_create(spark):
    """The driver's session may run createDataFrame WITHOUT Arrow; the old
    pandas-frame construction coerced partially-None width/height to float64
    and the non-Arrow verifier rejected 346.0 against IntegerType. Pin the
    plain-row-dict path under both Arrow settings."""
    key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "false")
        media = MM.synthetic_media(spark, n=12)
        rows = media.orderBy("media_id").collect()
        assert len(rows) == 12
        for r in rows:
            if r["kind"] == "image":
                assert isinstance(r["width"], int) and isinstance(r["height"], int)
                assert r["duration_ms"] is None
            else:
                assert r["width"] is None and r["height"] is None
                assert isinstance(r["duration_ms"], int)
    finally:
        spark.conf.set(key, prev)


def test_real_codec_is_gated(spark):
    media = MM.synthetic_media(spark, n=3)
    out = MM.extract_features(media, codec=MM.real_image_decode)
    with pytest.raises(Exception, match="NotImplementedError|Pillow|image decode"):
        out.collect()


def test_frame_sample_counts(spark):
    media = MM.synthetic_media(spark, n=24).filter("duration_ms IS NOT NULL")
    frames = MM.frame_sample(media, every_ms=1000)
    got = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    for r in media.select("media_id", "duration_ms").collect():
        expected = (r["duration_ms"] - 1) // 1000 + 1
        assert got[r["media_id"]] == expected
    one = frames.limit(1).collect()[0]
    assert isinstance(bytes(one["frame"]), bytes) and len(bytes(one["frame"])) > 0
