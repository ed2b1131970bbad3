"""Deterministic hash sampling: reproducibility, nesting, stratified quotas."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tablecloth_time_spark.operators.sample import (
    assign_splits,
    deterministic_sample,
    hash_fraction,
    stratified_sample_exact,
)


def py_fraction(doc_id, salt: str = "") -> float:
    h = hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()
    return float(int(h[:15], 16)) / float(16**15)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, ["en", "de", "fr"][i % 3], ["web", "books"][i % 2]) for i in range(300)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, source string")


def test_fraction_matches_python_md5(docs):
    got = docs.select("doc_id", hash_fraction("doc_id").alias("f")).collect()
    for r in got:
        assert r["f"] == pytest.approx(py_fraction(r["doc_id"]), abs=1e-15)


def test_sample_is_deterministic_and_nests(docs):
    s10 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.1).collect()}
    s30 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.3).collect()}
    s30_again = {
        r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.3).collect()
    }
    assert s30 == s30_again
    assert s10 <= s30  # nested-sample property
    # roughly the right rate (binomial tolerance on n=300)
    assert 0.03 < len(s10) / 300 < 0.20
    assert 0.18 < len(s30) / 300 < 0.45


def test_salt_changes_the_draw(docs):
    a = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.3).collect()}
    b = {
        r["doc_id"]
        for r in deterministic_sample(docs, "doc_id", 0.3, salt="v2").collect()
    }
    assert a != b


def test_assign_splits_partitions_every_row(docs):
    out = assign_splits(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 300
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"]
    # row-level agreement with the python fraction
    for r in out.collect():
        f = py_fraction(r["doc_id"])
        expect = "train" if f < 0.8 else ("val" if f < 0.9 else "test")
        assert r["split"] == expect


def test_assign_splits_rejects_bad_weights(docs):
    with pytest.raises(ValueError, match="sum to 1"):
        assign_splits(docs, "doc_id", {"a": 0.5, "b": 0.2})


def test_stratified_exact_quota(docs):
    out = stratified_sample_exact(docs, ["lang", "source"], "doc_id", 5)
    counts = out.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()
    assert len(counts) == 6  # 3 langs x 2 sources
    assert all(r["n"] == 5 for r in counts)
    # winners are the lowest hash fractions of their stratum
    rows = docs.collect()
    by_stratum = {}
    for r in rows:
        by_stratum.setdefault((r["lang"], r["source"]), []).append(r["doc_id"])
    picked = {(r["lang"], r["source"], r["doc_id"]) for r in out.collect()}
    for (lang, src), ids in by_stratum.items():
        expect = sorted(ids, key=lambda i: (py_fraction(i), i))[:5]
        assert {(lang, src, i) for i in expect} == {
            p for p in picked if p[0] == lang and p[1] == src
        }


def test_pre_thin_preserves_winners(docs):
    """Nested-sample property: generous pre-thinning keeps the same
    top-n (all winners hash below the thinning rate here)."""
    full = stratified_sample_exact(docs, ["lang"], "doc_id", 3)
    thinned = stratified_sample_exact(
        docs, ["lang"], "doc_id", 3, pre_thin_rate=0.5
    )
    assert {tuple(r) for r in full.collect()} == {
        tuple(r) for r in thinned.collect()
    }
