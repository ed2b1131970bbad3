"""Sequence packing: group documents into fixed token-budget bins.

Training pipelines pack variable-length documents into fixed-size
context windows (budget B tokens) to avoid padding waste. Exact global
bin packing is NP-hard and inherently sequential — the public
large-scale recipe is greedy FIRST-FIT within independent SHARDS:

1. shard documents deterministically (hash of the id — same shards on
   any cluster size / partitioning),
2. within each shard, walk documents in a deterministic order (hash
   fraction, id) and first-fit them into open bins,
3. emit (shard, bin_idx, bin_tokens, doc list).

Packing quality is within a few percent of global first-fit-decreasing
for realistic length distributions, while the work is embarrassingly
parallel: one shuffle to co-locate shards, then a pure per-group pass.
Documents longer than the budget get a bin of their own (the caller
chunks them upstream if that is not acceptable).

Spark shape: groupBy(shard).applyInPandas — the greedy walk is a tight
python loop over one shard's (length, id) arrays; text NEVER enters the
kernel (lengths + ids only), so the shuffle carries a few bytes per doc.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tablecloth_time_spark.operators.sample import hash_fraction

PACK_SCHEMA = (
    "shard int, bin_idx bigint, doc_id long, n_tokens long, bin_fill long"
)


def pack_documents(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_shards: int = 256,
    salt: str = "",
) -> DataFrame:
    """Assign each document to a (shard, bin_idx) so that each bin's
    token total is <= budget (single overlong docs get their own bin).

    Returns one row per document: shard, bin_idx, doc_id, n_tokens, and
    bin_fill (the final token total of the document's bin, repeated on
    each member — the packing-efficiency numerator). Deterministic for a
    given (budget, n_shards, salt) regardless of cluster layout.
    """
    if budget < 1:
        raise ValueError(f"pack_documents: budget must be >= 1, got {budget}")
    if n_shards < 1:
        raise ValueError(f"pack_documents: n_shards must be >= 1, got {n_shards}")

    slim = df.select(
        (F.floor(hash_fraction(id_col, salt) * n_shards))
        .cast("int")
        .alias("shard"),
        hash_fraction(id_col, salt).alias("__order"),
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
    )

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__order", "doc_id"], kind="stable")
        ids = pdf["doc_id"].to_numpy()
        toks = pdf["n_tokens"].to_numpy()
        open_fill: list[int] = []  # token total per open bin
        assign = []
        for t in toks:
            t = int(t)
            placed = -1
            for b, fill in enumerate(open_fill):  # first fit
                if fill + t <= budget:
                    placed = b
                    break
            if placed < 0:
                open_fill.append(t)
                placed = len(open_fill) - 1
            else:
                open_fill[placed] += t
            assign.append(placed)
        fills = [open_fill[b] for b in assign]
        return pd.DataFrame(
            {
                "shard": pdf["shard"].to_numpy(),
                "bin_idx": assign,
                "doc_id": ids,
                "n_tokens": toks,
                "bin_fill": fills,
            }
        )

    return slim.groupBy("shard").applyInPandas(pack_shard, PACK_SCHEMA)


def packing_stats(packed: DataFrame, budget: int) -> DataFrame:
    """One-row efficiency summary: bins, docs, fill ratio (tokens packed
    / bins * budget) — the number a curation run reports per corpus."""
    bins = packed.select("shard", "bin_idx", "bin_fill").dropDuplicates(
        ["shard", "bin_idx"]
    )
    return bins.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("bin_fill").alias("tokens_packed"),
        F.round(
            F.sum("bin_fill") / (F.count(F.lit(1)) * F.lit(float(budget))), 6
        ).alias("fill_ratio"),
    )


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    rates: dict[str, float],
    id_col: str,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-domain downsampling toward a target mixture:
    keep a row iff its hash fraction < rates[domain] (domains absent from
    ``rates`` use ``default_rate``). Pure row-local expression — no
    shuffle, nests across rate changes per domain, reproducible anywhere.
    """
    for d, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"mixture_sample: rate for {d!r} must be in [0,1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"mixture_sample: default_rate must be in [0,1]")
    rate_expr = F.lit(float(default_rate))
    for d, r in rates.items():
        rate_expr = F.when(F.col(domain_col) == d, F.lit(float(r))).otherwise(
            rate_expr
        )
    return df.filter(hash_fraction(id_col, salt) < rate_expr)
