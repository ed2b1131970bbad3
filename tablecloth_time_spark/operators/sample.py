"""Deterministic hash-based sampling, split assignment, stratified quotas.

Training-data curation needs samples that are (a) reproducible across
runs and clusters, (b) stable under re-partitioning, and (c) cheap at
100 TB. `rand()`-based sampling is none of these — the standard public
technique (used by every large-scale corpus pipeline) is to hash a
stable document id into a uniform [0,1) fraction and threshold it:

    keep iff  U(id) < rate,   U(id) = int(md5(id || salt)[:15]) / 16^15

Properties at scale:
- `deterministic_sample` / `assign_splits` are pure row-local
  expressions: NO shuffle, NO state — they ride the parquet scan inside
  whole-stage codegen and compose with predicate pushdown on other
  filters. Changing `rate` upward yields a strict superset of the
  previous sample (nested samples for scaling-law runs).
- `stratified_sample_exact` takes the top-n per stratum by hash order:
  one shuffle on the strata columns. For mega-strata, pre-thin with
  `deterministic_sample` at a generous rate first (documented below) so
  the per-stratum sort never sees the full stratum.
- The same md5 fraction is reproducible in any engine (DuckDB:
  ``CAST('0x' || substring(md5(id), 1, 15) AS BIGINT) / 16^15``), which
  is what makes these operators exactly oracle-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SCALE = float(16**15)  # 1152921504606846976


def hash_fraction(id_col: str | Column, salt: str = "") -> Column:
    """Uniform [0,1) fraction from md5 of the id (+salt), stable across
    runs, partitionings, and engines. Built on the one shared md5->int64
    idiom (``text.hash64_md5``: first 15 hex chars = 60 bits), rounded to
    double exactly the way a BIGINT->DOUBLE cast rounds."""
    from tablecloth_time_spark.functions.text import hash64_md5

    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = hash64_md5(F.concat(c.cast("string"), F.lit(salt)))
    return h.cast("double") / F.lit(_SCALE)


def sample_predicate(id_col: str | Column, rate: float, salt: str = "") -> Column:
    """Boolean keep-predicate for a deterministic `rate` sample."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"sample rate must be in [0, 1], got {rate}")
    return hash_fraction(id_col, salt) < F.lit(rate)


def deterministic_sample(
    df: DataFrame, id_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep a reproducible `rate` fraction of rows by id hash. Pure
    filter expression — no shuffle; samples at different rates nest."""
    return df.filter(sample_predicate(id_col, rate, salt))


def assign_splits(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float],
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Add a train/val/test-style assignment column. `splits` maps name
    -> weight (must sum to ~1); ids land in cumulative-threshold bins of
    the hash fraction, so every engine and every run agrees row-by-row."""
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    frac = hash_fraction(id_col, salt)
    expr = None
    cum = 0.0
    names = list(splits)
    for name in names[:-1]:
        cum += splits[name]
        cond = frac < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    expr = (
        F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn(split_col, expr)


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    n_per_stratum: int,
    salt: str = "",
    pre_thin_rate: float | None = None,
) -> DataFrame:
    """Exactly `n_per_stratum` rows per stratum (fewer if the stratum is
    smaller), chosen by hash order — a deterministic uniform draw without
    replacement. One shuffle on the strata columns.

    For 100 TB strata set `pre_thin_rate` to a generous deterministic
    pre-filter (e.g. 10x the expected quota fraction): the row-number
    window then sorts only the thinned stratum; the hash-order pick is
    unchanged as long as the quota survives the thinning (nested-sample
    property: the top-n by hash of the thinned set equals the top-n of
    the full set whenever all n winners hash below the thinning rate)."""
    if n_per_stratum < 1:
        raise ValueError(f"n_per_stratum must be >= 1, got {n_per_stratum}")
    out = df
    if pre_thin_rate is not None:
        out = deterministic_sample(out, id_col, pre_thin_rate, salt)
    w = Window.partitionBy(*strata_cols).orderBy(
        hash_fraction(id_col, salt), F.col(id_col)
    )
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )
