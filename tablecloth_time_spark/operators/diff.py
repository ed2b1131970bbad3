"""Tier snapshot diff: what changed between two materializations of the
same rollup tier.

The continuous-aggregate lifecycle (plans/continuous.py) maintains tier
state incrementally per snapshot; this operator is its audit twin — give
it two tier frames (yesterday's materialization and today's, or any two
snapshot reads through the TierStore seam) and it classifies every
(keys, bucket) point as ``added`` / ``removed`` / ``changed`` (value
columns differ) / ``unchanged``, carrying the old and new values
side-by-side. Typical uses: validating an incremental refresh against a
from-scratch rebuild, change-data-capture feeds off tier tables, and
late-data impact reports ("which hours moved when the backfill landed").

Distributed shape: ONE full-outer equi-join on (keys, bucket). Both
sides are TIER frames (rows ∝ distinct (key, bucket), not raw events),
so at 100 TB of raw data the join's inputs are the already-aggregated
tables; with tier tables stored bucket-range-partitioned (PLANS.md) the
join prunes to the compared bucket range before shuffling, and a
``buckets=`` predicate pushes that range explicitly.

Null semantics: a NULL value column on one side of a present pair is
compared with null-safe equality (``<=>``), so NULL -> 5 reports
``changed``, not ``added``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tier_diff(
    old: DataFrame,
    new: DataFrame,
    keys: str | list[str],
    value_cols: str | list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every grouping point of two tier frames.

    ``keys`` are the full grouping columns of the tier (series keys +
    bucket column); ``value_cols`` the aggregate columns to compare.
    Output: keys + ``old_<v>``/``new_<v>`` per value column +
    ``change``; rows whose values are null-safely equal are dropped
    unless ``include_unchanged``.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    vs = [value_cols] if isinstance(value_cols, str) else list(value_cols)
    o = old.select(
        *ks,
        F.lit(True).alias("__in_old"),
        *[F.col(v).alias(f"old_{v}") for v in vs],
    )
    n = new.select(
        *ks,
        F.lit(True).alias("__in_new"),
        *[F.col(v).alias(f"new_{v}") for v in vs],
    )
    j = o.join(n, on=ks, how="full_outer")
    same: Column = reduce(
        lambda a, b: a & b,
        [F.col(f"old_{v}").eqNullSafe(F.col(f"new_{v}")) for v in vs],
    )
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out = j.select(
        *ks,
        *[c for v in vs for c in (f"old_{v}", f"new_{v}")],
        change.alias("change"),
    )
    if not include_unchanged:
        out = out.filter(F.col("change") != "unchanged")
    return out
