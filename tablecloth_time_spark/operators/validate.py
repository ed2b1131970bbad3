"""Sortedness validation — the reference's pre-flight safety contract.

The reference trusts binary search only after ``is-sorted?`` /
``ensure-time-column`` (reference src/tablecloth/time/utils/binary_search.clj:8-66;
contract tests test/tablecloth/time/utils/binary_search_test.clj:6-80): a
vectorized shift+compare monotonicity check (any missing value -> not
sorted), plus a dataset-level helper that asserts the column exists and
optionally sorts.

The Spark analogues, both fully distributed:

- **logical per-key check** (``partition_by=`` given): within each key
  (e.g. conv_id), ordering rows by a sequence column (e.g. turn_idx), the
  time column must be monotone. One ``lag`` window per key — this is the
  invariant the tier-write path relies on for (conv_id, turn_idx, ts)
  ordering.
- **physical as-stored check** (no ``partition_by``): a Spark DataFrame has
  no global row order, but its *partitions* do. Each partition is scanned
  once by an Arrow-batched kernel emitting an O(1) summary (nulls,
  violations, first/last value); the driver stitches partition boundaries
  — O(num_partitions) driver work, never a global sort or single-window
  bottleneck. This matches the reference's "is this column, as stored,
  sorted" semantics.

Both paths: empty / single-row -> sorted (binary_search.clj:12-16); any
null -> NOT sorted (binary_search.clj:17-18).
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

__all__ = ["is_sorted", "ensure_time_column", "EnsuredTime"]


def _per_key_violations(
    df: DataFrame,
    time_col: str,
    partition_by: list[str],
    order_by: list[str],
    descending: bool,
) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    prev = F.lag(time_col).over(w)
    cur = F.col(time_col)
    out_of_order = (cur > prev) if descending else (cur < prev)
    return df.select(
        F.when(cur.isNull() | (prev.isNotNull() & out_of_order), F.lit(1))
        .otherwise(F.lit(0))
        .alias("__bad")
    ).filter("__bad = 1")


def _partition_summaries(df: DataFrame, time_col: str, descending: bool):
    """One O(1) summary row per physical partition (as-stored order)."""
    dtype = df.schema[time_col].dataType
    schema = StructType(
        [
            StructField("pid", LongType()),
            StructField("n", LongType()),
            StructField("nulls", LongType()),
            StructField("violations", LongType()),
            StructField("first", dtype),
            StructField("last", dtype),
        ]
    )
    narrow = df.select(
        F.spark_partition_id().cast("long").alias("__pid"), F.col(time_col).alias("__t")
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = nulls = violations = 0
        first = last = None
        pid = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["__pid"].iloc[0])
            col = pdf["__t"]
            isna = col.isna()
            n += len(col)
            nulls += int(isna.sum())
            vals = col[~isna]
            if len(vals) == 0:
                continue
            # vectorized shift+compare, the reference's kernel (numpy
            # elementwise works for datetime64, numeric, and object dates)
            a = vals.to_numpy()
            if len(a) > 1:
                bad = (a[1:] > a[:-1]) if descending else (a[1:] < a[:-1])
                violations += int(np.count_nonzero(bad))
            head = vals.iloc[0]
            if first is None:
                first = head
            elif last is not None:
                crossing = (last < head) if descending else (last > head)
                if crossing:
                    violations += 1
            last = vals.iloc[-1]
        if pid is None:
            return
        yield pd.DataFrame(
            {
                "pid": [pid],
                "n": [n],
                "nulls": [nulls],
                "violations": [violations],
                "first": [first],
                "last": [last],
            }
        )

    return narrow.mapInPandas(summarize, schema).collect()


def is_sorted(
    df: DataFrame,
    time_col: str,
    partition_by: str | list[str] | None = None,
    order_by: str | list[str] | None = None,
    direction: str = "ascending",
) -> bool:
    """Distributed ``is-sorted?`` (reference binary_search.clj:8-25).

    - ``partition_by`` given: per-key logical check — within each key,
      ordered by ``order_by`` (required), ``time_col`` must be monotone.
    - no ``partition_by``: physical as-stored check across the DataFrame's
      partitions (per-partition Arrow kernel + O(partitions) boundary
      stitch on the driver).

    Any null in ``time_col`` -> False; empty / single row -> True.
    Duplicates are allowed (non-strict monotonicity), matching the
    reference's ``>=``/``<=`` comparator.
    """
    if direction not in ("ascending", "descending"):
        raise ValueError(f"direction must be ascending|descending, got {direction!r}")
    if time_col not in df.columns:
        raise ValueError(f"time column {time_col!r} not found; columns: {df.columns}")
    descending = direction == "descending"

    if partition_by is not None:
        keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        if order_by is None:
            raise ValueError(
                "per-key is_sorted needs order_by (the sequence column that "
                "defines within-key row order, e.g. turn_idx)"
            )
        order = [order_by] if isinstance(order_by, str) else list(order_by)
        bad = _per_key_violations(df, time_col, keys, order, descending)
        return bad.limit(1).count() == 0

    if order_by is not None:
        raise ValueError(
            "order_by without partition_by is ambiguous: the physical "
            "as-stored check ignores it — sortWithinPartitions first, or "
            "pass partition_by for the per-key logical check"
        )
    summaries = sorted(_partition_summaries(df, time_col, descending), key=lambda r: r["pid"])
    if not summaries:
        return True
    total_nulls = sum(r["nulls"] for r in summaries)
    if total_nulls > 0:
        return False
    if sum(r["violations"] for r in summaries) > 0:
        return False
    prev_last = None
    for r in summaries:
        if r["first"] is None:
            continue
        if prev_last is not None:
            crossing = (prev_last < r["first"]) if descending else (prev_last > r["first"])
            if crossing:
                return False
        prev_last = r["last"]
    return True


def sortedness_report(
    df: DataFrame,
    time_col: str,
    partition_by: str | list[str],
    order_by: str | list[str],
    direction: str = "ascending",
) -> DataFrame:
    """DataFrame form of the per-key ``is-sorted?`` check (reference
    binary_search.clj:8-25): one row per key with ``n_rows``,
    ``n_nulls`` (NULL ``time_col`` values), ``n_violations``
    (adjacent non-null pairs out of order under ``order_by``), and
    ``is_sorted`` — the same verdict :func:`is_sorted` booleanizes,
    kept per-key so a 10^12-row validation run reports WHICH series
    violate the slice precondition instead of one global False.

    Null semantics match :func:`is_sorted`: any null timestamp makes
    the key unsorted (nulls have no order), and monotonicity is
    non-strict (duplicates allowed, the reference's >=/<= comparator).

    Plan: ONE Exchange — the lag window materializes predecessor
    timestamps and the per-key aggregate reuses the window's hash
    partitioning (pinned in tests/test_plan_shapes.py).
    """
    if direction not in ("ascending", "descending"):
        raise ValueError(
            f"direction must be ascending|descending, got {direction!r}"
        )
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    order = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order])
    cur = F.col(time_col)
    prev = F.lag(time_col).over(w)
    out_of_order = (cur > prev) if direction == "descending" else (cur < prev)
    marked = df.select(
        *keys,
        F.when(cur.isNull(), 1).otherwise(0).alias("__null"),
        F.when(
            cur.isNotNull() & prev.isNotNull() & out_of_order, 1
        ).otherwise(0).alias("__viol"),
    )
    return marked.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("__null").cast("long").alias("n_nulls"),
        F.sum("__viol").cast("long").alias("n_violations"),
        (
            (F.sum("__null") == 0) & (F.sum("__viol") == 0)
        ).alias("is_sorted"),
    )


@dataclass
class EnsuredTime:
    """Result of ensure_time_column (reference binary_search.clj:27-66's map)."""

    df: DataFrame
    time_col: str
    sorted: bool


def ensure_time_column(
    df: DataFrame,
    time_col: str,
    sorted: bool = False,  # noqa: A002 - mirrors the reference's :sorted? flag
    sort: bool = True,
    partition_by: str | list[str] | None = None,
    order_by: str | list[str] | None = None,
) -> EnsuredTime:
    """Pre-flight for time operations (reference binary_search.clj:27-66).

    1. Raises if ``time_col`` is missing.
    2. ``sorted=True``: trust the caller, skip the check (reference
       ``:sorted?`` hint — binary_search_test.clj:74-80).
    3. Otherwise run :func:`is_sorted`; if unsorted and ``sort=True``,
       establish the layout: with ``partition_by``, repartition on the keys
       + ``sortWithinPartitions(keys, order_by, time_col)`` (the tier-write
       layout — co-located keys, time-ordered within); without,
       ``repartitionByRange(time_col).sortWithinPartitions(time_col)``
       (globally range-ordered across partitions).
    4. ``sort=False`` leaves the frame untouched and reports
       ``sorted=False`` (binary_search_test.clj:63-72).
    """
    if time_col not in df.columns:
        raise ValueError(f"Time column not found: {time_col!r}; columns: {df.columns}")
    if sorted:
        return EnsuredTime(df, time_col, True)
    if partition_by is not None and order_by is None:
        # no within-key sequence column -> nothing meaningful to CHECK
        # (time ordered by time is tautologically monotone), so treat the
        # layout as not-known-sorted and establish it below when sort=True
        already = False
    else:
        already = is_sorted(df, time_col, partition_by=partition_by, order_by=order_by)
    if already or not sort:
        return EnsuredTime(df, time_col, already)
    if partition_by is not None:
        keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        order = (
            []
            if order_by is None
            else [order_by] if isinstance(order_by, str) else list(order_by)
        )
        out = df.repartition(*keys).sortWithinPartitions(*keys, *order, time_col)
    else:
        out = df.repartitionByRange(time_col).sortWithinPartitions(time_col)
    return EnsuredTime(out, time_col, True)
