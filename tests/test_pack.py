"""Sequence packing + mixture sampling vs python re-derivations."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tablecloth_time_spark.operators.pack import (
    mixture_sample,
    pack_documents,
    packing_stats,
)


def py_fraction(doc_id, salt: str = "") -> float:
    h = hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()
    return float(int(h[:15], 16)) / float(16**15)


def py_pack(rows, budget, n_shards, salt=""):
    """Independent re-derivation of the shard + first-fit contract."""
    shards = {}
    for doc_id, toks in rows:
        f = py_fraction(doc_id, salt)
        shards.setdefault(int(f * n_shards), []).append((f, doc_id, toks))
    out = {}
    for shard, docs in shards.items():
        open_fill = []
        for _, doc_id, t in sorted(docs):
            placed = -1
            for b, fill in enumerate(open_fill):
                if fill + t <= budget:
                    placed = b
                    break
            if placed < 0:
                open_fill.append(t)
                placed = len(open_fill) - 1
            else:
                open_fill[placed] += t
            out[doc_id] = (shard, placed)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, 50 + (i * 37) % 900) for i in range(500)]
    return (
        spark.createDataFrame(rows, "doc_id long, n_tokens long"),
        rows,
    )


def test_packing_matches_python_first_fit(docs):
    df, rows = docs
    got = {
        r["doc_id"]: (r["shard"], r["bin_idx"])
        for r in pack_documents(df, "doc_id", "n_tokens", 1024, n_shards=8).collect()
    }
    assert got == py_pack(rows, 1024, 8)


def test_every_bin_within_budget_and_fill_consistent(docs):
    df, _ = docs
    packed = pack_documents(df, "doc_id", "n_tokens", 1024, n_shards=8)
    rows = packed.collect()
    agg = {}
    for r in rows:
        agg.setdefault((r["shard"], r["bin_idx"]), [0, r["bin_fill"]])
        agg[(r["shard"], r["bin_idx"])][0] += r["n_tokens"]
    for (shard, b), (total, fill) in agg.items():
        assert total == fill, (shard, b)
        assert total <= 1024


def test_overlong_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(1, 5000), (2, 100), (3, 100)], "doc_id long, n_tokens long"
    )
    packed = pack_documents(df, "doc_id", "n_tokens", 1024, n_shards=1).collect()
    by_id = {r["doc_id"]: r for r in packed}
    big = by_id[1]
    assert big["bin_fill"] == 5000
    others = [r for r in packed if r["doc_id"] != 1]
    assert all(r["bin_idx"] != big["bin_idx"] for r in others)


def test_packing_stats(docs):
    df, _ = docs
    packed = pack_documents(df, "doc_id", "n_tokens", 1024, n_shards=8)
    s = packing_stats(packed, 1024).collect()[0]
    total_tokens = df.agg(F.sum("n_tokens")).collect()[0][0]
    assert s["tokens_packed"] == total_tokens
    assert 0.5 < s["fill_ratio"] <= 1.0


def test_packing_deterministic_across_partitionings(docs):
    df, _ = docs
    a = sorted(
        map(tuple, pack_documents(df, "doc_id", "n_tokens", 512, n_shards=4).collect())
    )
    b = sorted(
        map(
            tuple,
            pack_documents(
                df.repartition(13), "doc_id", "n_tokens", 512, n_shards=4
            ).collect(),
        )
    )
    assert a == b


def test_mixture_sample_rates_and_determinism(spark):
    rows = [(i, ["web", "books", "code"][i % 3]) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = mixture_sample(
        df, "domain", {"web": 0.2, "books": 1.0}, "doc_id", default_rate=0.0
    )
    got = out.collect()
    # code: default 0 -> absent; books: rate 1 -> all kept
    assert not [r for r in got if r["domain"] == "code"]
    assert len([r for r in got if r["domain"] == "books"]) == 200
    # web rows: exactly those whose fraction < 0.2
    kept_web = {r["doc_id"] for r in got if r["domain"] == "web"}
    expect_web = {
        i for i, d in rows if d == "web" and py_fraction(i) < 0.2
    }
    assert kept_web == expect_web


def test_mixture_sample_rejects_bad_rate(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, domain string")
    with pytest.raises(ValueError, match="must be in"):
        mixture_sample(df, "domain", {"a": 1.5}, "doc_id")
