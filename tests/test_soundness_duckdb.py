"""DuckDB soundness oracles for the hash-seeded pair queries.

Since r4 the driver queries run the hash_fn='md5' variant and carry FULL
DuckDB pipeline oracles (__spark_entry__._sql_minhash_dedup /
_sql_simhash_dedup / SQL_WINNOW_DEDUP), so the candidate sets themselves
are cross-checked. These tests remain as an INDEPENDENT soundness layer
with different failure modes: the emitted pairs' similarity VALUES are
recomputed from the raw text via SQL string ops (no hashing at all), so
a bug that corrupted both engines' hash pipelines identically would
still be caught here:

- minhash_dedup: the emitted jaccard_sim must EQUAL the exact word-2-
  shingle jaccard recomputed in SQL (the operator verifies candidates
  against exact shingle sets, so this is an equality, not a floor);
- simhash_dedup: every emitted pair (hamming <= 6 on a 64-bit SimHash of
  word-2-shingles) must have true shingle jaccard above a pinned floor;
- winnow_dedup: every emitted pair (winnowed k=5,w=4 fingerprint jaccard
  >= 0.25) must have true char-5-gram jaccard above a pinned floor.

Floors pinned from the sf0.01 distribution with ~25% headroom
(simhash min true_j = 0.909; winnow min true_j = 0.204).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata absent"
)

# exact word-2-shingle jaccard of the pair table {p}, mirroring
# functions/text.with_word_shingles (normalize = lower/trim/collapse-ws,
# whitespace tokens, 2-word shingles joined by ' ', distinct)
WORD_SHINGLE_J = """
WITH t AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS w
  FROM documents),
sh AS (
  SELECT doc_id,
         CASE WHEN len(w) < 2 THEN []::VARCHAR[]
              ELSE list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))])
         END AS s
  FROM t)
SELECT p.id_a, p.id_b,
       CASE WHEN len(list_distinct(list_concat(a.s, b.s))) = 0 THEN 1.0
            ELSE len(list_intersect(a.s, b.s)) * 1.0
                 / len(list_distinct(list_concat(a.s, b.s))) END AS true_j
FROM {p} p JOIN sh a ON p.id_a = a.doc_id JOIN sh b ON p.id_b = b.doc_id
"""

# exact char-5-gram jaccard of the NORMALIZED text, mirroring
# functions/text.with_char_ngrams(n=5)
CHAR_5GRAM_J = """
WITH t AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
  FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN length(norm) < 5 THEN []::VARCHAR[]
              ELSE list_distinct([substring(norm, i, 5)
                                  for i in range(1, length(norm) - 3)])
         END AS s
  FROM t)
SELECT p.id_a, p.id_b,
       len(list_intersect(a.s, b.s)) * 1.0
         / len(list_distinct(list_concat(a.s, b.s))) AS true_j
FROM {p} p JOIN g a ON p.id_a = a.doc_id JOIN g b ON p.id_b = b.doc_id
"""


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return c


def test_minhash_emitted_jaccard_is_exact(spark, con):
    pairs = E._raw_queries()["minhash_dedup"](spark, SF_DIR).toPandas()
    assert len(pairs) >= 20
    con.register("mh_pairs", pairs)
    truth = con.execute(WORD_SHINGLE_J.format(p="mh_pairs")).fetchdf()
    merged = truth.merge(pairs, on=["id_a", "id_b"], validate="1:1")
    assert len(merged) == len(pairs)
    # operator verifies candidates against exact shingle sets -> equality
    assert (merged["true_j"].round(6) == merged["jaccard_sim"]).all()
    assert (merged["jaccard_sim"] >= 0.35).all()


def test_simhash_emitted_pairs_are_truly_similar(spark, con):
    pairs = E._raw_queries()["simhash_dedup"](spark, SF_DIR).toPandas()
    assert len(pairs) >= 15
    assert (pairs["hamming"] <= 6).all()
    con.register("sh_pairs", pairs)
    truth = con.execute(WORD_SHINGLE_J.format(p="sh_pairs")).fetchdf()
    assert len(truth) == len(pairs)
    assert (truth["true_j"] >= 0.70).all()


def test_winnow_emitted_pairs_are_truly_similar(spark, con):
    pairs = E._raw_queries()["winnow_dedup"](spark, SF_DIR).toPandas()
    # thickened driver query: threshold 0.25 over all docs -> >= 20 rows
    assert len(pairs) >= 20
    assert (pairs["fp_sim"] >= 0.25).all()
    con.register("wn_pairs", pairs)
    truth = con.execute(CHAR_5GRAM_J.format(p="wn_pairs")).fetchdf()
    assert len(truth) == len(pairs)
    assert (truth["true_j"] >= 0.15).all()


def test_lttb_recursive_cte_matches_kernel():
    """The SQL_LTTB_DOWNSAMPLE oracle's recursive selection is the same
    algorithm as the Arrow kernel, not merely the same answer on one
    fixture: on random ALL-INTEGER series of many lengths the DuckDB
    recursion must pick the kernel's exact index set. Integer inputs make
    centroid means exact sums (+ one division) and triangle areas
    identical IEEE op sequences — the property the driver query's
    hourly-count series relies on."""
    import numpy as np
    import pandas as pd

    from tablecloth_time_spark.operators.downsample import lttb_select

    con2 = duckdb.connect()
    sql = """
WITH RECURSIVE
arr AS (
  SELECT list(CAST(ts AS DOUBLE) ORDER BY ts) AS t,
         list(CAST(v AS DOUBLE) ORDER BY ts) AS v, COUNT(*) AS n
  FROM series
),
sel AS (
  SELECT t, v, n, 0 AS i, CAST(0 AS BIGINT) AS a FROM arr
  UNION ALL
  SELECT t, v, n, i + 1,
         CASE WHEN hi > lo
              THEN lo + CAST(list_position(areas, list_max(areas)) AS BIGINT) - 1
              ELSE lo END
  FROM (
    SELECT t, v, n, i, lo, hi,
           list_transform(range(lo, hi), j ->
             abs((t[a + 1] - cx) * (v[j + 1] - v[a + 1])
               - (t[a + 1] - t[j + 1]) * (cy - v[a + 1]))) AS areas
    FROM (
      SELECT t, v, n, i, a, lo, hi,
             CASE WHEN nhi > nlo THEN list_sum(list_slice(t, nlo + 1, nhi)) / (nhi - nlo) ELSE t[n] END AS cx,
             CASE WHEN nhi > nlo THEN list_sum(list_slice(v, nlo + 1, nhi)) / (nhi - nlo) ELSE v[n] END AS cy
      FROM (
        SELECT t, v, n, i, a,
               CAST(FLOOR(1.0 + i * ((CAST(n AS DOUBLE) - 2.0) / 18.0)) AS BIGINT) AS lo,
               CASE WHEN i + 1 = 18 THEN n - 1 ELSE CAST(FLOOR(1.0 + (i + 1) * ((CAST(n AS DOUBLE) - 2.0) / 18.0)) AS BIGINT) END AS hi,
               CASE WHEN i + 1 = 18 THEN n - 1 ELSE CAST(FLOOR(1.0 + (i + 1) * ((CAST(n AS DOUBLE) - 2.0) / 18.0)) AS BIGINT) END AS nlo,
               CASE WHEN i = 17 THEN n WHEN i + 2 = 18 THEN n - 1
                    ELSE CAST(FLOOR(1.0 + (i + 2) * ((CAST(n AS DOUBLE) - 2.0) / 18.0)) AS BIGINT) END AS nhi
        FROM sel WHERE i < 18
      )
    )
  )
),
idx AS (SELECT a FROM sel UNION SELECT n - 1 FROM arr)
SELECT a FROM idx ORDER BY a
"""
    for trial in range(8):
        rng = np.random.default_rng(trial)
        n = int(rng.integers(25, 900))
        ts = (
            np.sort(rng.choice(10**6, size=n, replace=False)).astype(np.int64)
            * 3600000
        )
        v = rng.integers(0, 500, size=n).astype(np.int64)
        exp = lttb_select(ts.astype(np.float64), v.astype(np.float64), 20)
        con2.register("series", pd.DataFrame({"ts": ts, "v": v}))
        got = np.array([r[0] for r in con2.execute(sql).fetchall()])
        assert len(exp) == len(got) and (np.sort(exp) == got).all(), (
            f"trial {trial}, n={n}"
        )
