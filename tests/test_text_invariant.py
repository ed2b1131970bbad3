"""The north rule's per-row invariant, tested directly: per-turn TEXT
EQUALITY under stable (conv_id, turn_idx, ts) ordering.

Every row-preserving stage the pipeline routes transcripts through —
predicate-pushdown slice, the one-shuffle window family (sessionize),
and above all the Arrow mapInPandas boundary (grouped_apply_stream,
the path compression and the sequential kernels ride) — must hand back
every turn's text byte-identical, with the multiset of rows unchanged
and the stable sort reproducing the single-node reference order.
Unicode rows (combining marks, CJK, emoji, NUL-adjacent controls) are
injected to stress the Arrow string codec, not just ASCII.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from tablecloth_time_spark.operators._grouped import grouped_apply_stream
from tablecloth_time_spark.operators.sessions import sessionize
from tablecloth_time_spark.operators.slice import slice_time
from tablecloth_time_spark.sources.transcripts import (
    TRANSCRIPTS_SCHEMA,
    generate_transcripts_pandas,
)

KEY = ["conv_id", "turn_idx", "ts"]

UNICODE_TEXTS = [
    "naïve café — ligature ﬁ, combining: é, zero-width​join",
    "日本語のテキストと中文混在、続きは한국어",
    "emoji soup 🚀🧪🔥 with skin tone 👍🏽 and flags 🇩🇪🇯🇵",
    "controls: tab\there, quote\"backslash\\ and  low byte",
]


@pytest.fixture(scope="module")
def ref_pdf():
    pdf = generate_transcripts_pandas(n_conv=80, seed=13, dup_ts_frac=0.08)
    # splice unicode payloads into real rows (keep schema/ordering keys)
    pdf = pdf.copy()
    for i, t in enumerate(UNICODE_TEXTS):
        pdf.loc[pdf.index[i * 7 + 3], "text"] = t
    return pdf


@pytest.fixture(scope="module")
def tdf(spark, ref_pdf):
    return spark.createDataFrame(ref_pdf, schema=TRANSCRIPTS_SCHEMA)


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf[["conv_id", "turn_idx", "ts", "text"]].copy()
    out["ts"] = pd.to_datetime(out["ts"]).astype("datetime64[us]")
    return out.sort_values(KEY, kind="stable").reset_index(drop=True)


def _assert_texts_identical(got: pd.DataFrame, ref: pd.DataFrame):
    g, r = _canon(got), _canon(ref)
    assert len(g) == len(r)
    for c in ("conv_id", "turn_idx", "ts", "text"):
        assert g[c].tolist() == r[c].tolist(), c


def test_arrow_boundary_preserves_text(tdf, ref_pdf):
    """grouped_apply_stream identity kernel: one shuffle + in-partition
    sort + mapInPandas — the exact path compression kernels take — must
    return every (conv_id, turn_idx, ts, text) row byte-identical."""
    schema = StructType(
        [f for f in tdf.schema.fields if f.name in ("conv_id", "turn_idx", "ts", "text")]
    )
    base = tdf.select("conv_id", "turn_idx", "ts", "text")
    out = grouped_apply_stream(
        base, ["conv_id"], ["turn_idx", "ts"], lambda g: g, schema
    ).toPandas()
    _assert_texts_identical(out, ref_pdf)


def test_slice_preserves_text(tdf, ref_pdf):
    lo, hi = ref_pdf["ts"].quantile(0.2), ref_pdf["ts"].quantile(0.8)
    got = slice_time(tdf, "ts", lo, hi).toPandas()
    ref = ref_pdf[(ref_pdf["ts"] >= lo) & (ref_pdf["ts"] <= hi)]
    assert len(ref) > 100
    _assert_texts_identical(got, ref)


def test_sessionize_carries_text_unchanged(tdf, ref_pdf):
    """The window-family shuffle (sessionize) adds a session id but must
    not touch, drop, or duplicate any turn row."""
    got = sessionize(
        tdf, "conv_id", "ts", gap=30, unit="minute", order_cols=["turn_idx"]
    ).toPandas()
    _assert_texts_identical(got, ref_pdf)


def test_stable_order_matches_single_node_reference(tdf, ref_pdf):
    """orderBy(conv_id, turn_idx, ts) on the distributed frame reproduces
    the pandas stable sort exactly — including the dup_ts_frac rows whose
    ts ties are broken by turn_idx."""
    got = tdf.orderBy(*KEY).select("conv_id", "turn_idx", "ts", "text").toPandas()
    ref = _canon(ref_pdf)
    assert got["text"].tolist() == ref["text"].tolist()
    assert got["conv_id"].tolist() == ref["conv_id"].tolist()
