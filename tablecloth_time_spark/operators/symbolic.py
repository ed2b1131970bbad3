"""Symbolic time-series representation: PAA + SAX per series.

PAA (Piecewise Aggregate Approximation, Keogh et al. 2001) reduces each
series to ``n_segments`` mean values; SAX (Lin, Keogh, Wei, Lonardi 2003,
"A Symbolic Representation of Time Series") z-normalizes those
coefficients against the series' own mean/std and maps each to a letter
by the N(0,1) equiprobable breakpoints, giving a fixed-length word per
series. The word is the standard entry point for motif discovery,
discord (anomaly) search, and cheap series-level clustering/dedup — the
symbolic sibling of the engine's LTTB/M4 visual downsamplers
(reference adjust-frequency/down-sample family,
/root/reference/src/tablecloth/time/api/adjust_frequency.clj).

Distributed shape (no Python anywhere):

- ONE Exchange: a (keys) window assigns each row its rank and the series
  length, so ``segment = floor(rank * n_segments / n)`` — the discrete
  PAA index map (segment sizes differ by at most one row).
- The (keys, segment) aggregate REUSES the window's hash partitioning
  (same leading keys), so segment sums cost no second shuffle.
- Series totals for the z-normalization are window sums over the TINY
  coefficient frame (rows = series x n_segments), never over raw data.
- Breakpoint comparison and letter lookup are pure projections.

Exactness contract (how the DuckDB oracle matches byte-for-byte): when
``value_col`` is integral, every aggregate is an exact BIGINT sum, and
each derived float (paa = seg_sum/seg_n, mean = S1/n,
var = S2/n - mean*mean, z = (paa - mean)/sqrt(var)) is a short, fixed
IEEE op sequence over exact integers — the LTTB oracle's all-integer
determinism argument applies unchanged. Float inputs work but follow
the repo's usual ROUND-at-the-edges convention instead.
"""

from __future__ import annotations

from statistics import NormalDist

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sax_breakpoints(alphabet_size: int) -> list[float]:
    """The a-1 equiprobable N(0,1) breakpoints of the SAX paper's lookup
    table, computed from the stdlib NormalDist (deterministic rational
    approximation — identical doubles on every CPython)."""
    if not 2 <= alphabet_size <= 26:
        raise ValueError("alphabet_size must be in [2, 26]")
    nd = NormalDist()
    return [nd.inv_cdf(i / alphabet_size) for i in range(1, alphabet_size)]


def _letter(idx: Column) -> Column:
    # chr(97 + idx) without a UDF: substring into the literal alphabet
    return F.lit("abcdefghijklmnopqrstuvwxyz").substr(idx + 1, F.lit(1))


def paa_sax(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    n_segments: int = 16,
    alphabet_size: int = 4,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """PAA coefficients + SAX symbols for each key's series.

    Output: one row per (keys, segment) with ``seg_n`` (rows in the
    segment), ``paa`` (segment mean), ``z`` (z-normalized coefficient;
    0.0 for a constant series, matching the SAX convention that a flat
    series is all-median), and ``symbol`` (the letter).

    Series shorter than ``n_segments`` simply produce fewer segments
    (one per row); the word is correspondingly shorter.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w_rank = Window.partitionBy(*ks).orderBy(*order)
    w_all = Window.partitionBy(*ks)

    # integral inputs sum exactly in BIGINT (the byte-exact path);
    # everything else takes the double path
    integral = df.schema[value_col].dataType.simpleString() in (
        "tinyint", "smallint", "int", "bigint"
    )
    v = F.col(value_col).cast("long" if integral else "double")
    ranked = df.select(
        *ks,
        v.alias("__v"),
        (v * v).alias("__v2"),
        (F.row_number().over(w_rank) - F.lit(1)).alias("__rn"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )
    seg = F.floor(
        F.col("__rn") * F.lit(n_segments) / F.col("__n")
    ).cast("long")
    # (ks, segment) clustering is satisfied by the window's
    # HashPartitioning(ks) — no second Exchange (pinned in tests)
    segs = ranked.groupBy(*ks, seg.alias("segment")).agg(
        F.count(F.lit(1)).alias("seg_n"),
        F.sum("__v").alias("__s"),
        F.sum("__v2").alias("__s2"),
    )
    # series totals over the tiny coefficient frame (<= n_segments rows
    # per key): exact when the segment sums are exact
    w_key = Window.partitionBy(*ks)
    nd = F.sum("seg_n").over(w_key).cast("double")
    s1 = F.sum("__s").over(w_key).cast("double")
    s2 = F.sum("__s2").over(w_key).cast("double")
    mean = s1 / nd
    var = s2 / nd - mean * mean
    paa = F.col("__s").cast("double") / F.col("seg_n")
    z = F.when(var > 0, (paa - mean) / F.sqrt(var)).otherwise(F.lit(0.0))
    out = segs.select(
        *ks, "segment", "seg_n", paa.alias("paa"), z.alias("z")
    )
    bps = sax_breakpoints(alphabet_size)
    idx = sum(
        (F.col("z") > F.lit(b)).cast("int") for b in bps
    )
    return out.withColumn("symbol", _letter(idx))


def sax_words(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    n_segments: int = 16,
    alphabet_size: int = 4,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """One row per key: the SAX word (symbols concatenated in segment
    order) plus ``n_rows``. Exact-duplicate words across keys are the
    classic cheap candidate filter for series-level near-dup/motif
    grouping — feed them to the dedup family like any fingerprint."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    sym = paa_sax(
        df, ks, ts_col, value_col, n_segments, alphabet_size, order_cols
    )
    # groupBy(ks) reuses the coefficient frame's key partitioning
    return sym.groupBy(*ks).agg(
        F.sum("seg_n").alias("n_rows"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("segment", "symbol"))
                ),
                lambda s: s["symbol"],
            ),
            "",
        ).alias("word"),
    )
