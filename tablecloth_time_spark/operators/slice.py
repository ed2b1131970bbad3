"""slice — inclusive time-range row selection as a pushed-down filter.

The reference implements slice as binary search over a sorted epoch-millis
column (reference src/tablecloth/time/api/slice.clj:76-137). The distributed
analogue is a Catalyst range predicate: with tier tables written
sorted/partitioned on the time bucket, predicate pushdown + parquet
row-group min/max skipping gives the same "touch only the matching range"
behavior at cluster scale — no scan of non-matching files.

Semantic contract preserved from the reference:
- bounds are INCLUSIVE on both ends (duplicate timestamps at a bound are all
  included — the reference's duplicate-aware first/last binary search);
- ``from_key > to_key`` raises ValueError;
- string keys are parsed through an ISO-8601 cascade (date, datetime);
- a missing time column raises.

``:as-indices`` has no distributed analogue (no stable row ids) and is
provided only by the single-node oracle (oracle/timeops.py).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def parse_key(key) -> dt.datetime | dt.date:
    """Normalize a slice bound: ISO string / date / datetime / epoch millis int.

    Mirrors the reference's parse cascade (Instant -> ... -> LocalDate) with
    Python's fromisoformat; integers are interpreted as epoch milliseconds.
    """
    if isinstance(key, dt.datetime):
        return key
    if isinstance(key, dt.date):
        return key
    if isinstance(key, (int, float)):
        return dt.datetime.fromtimestamp(key / 1000.0, tz=dt.timezone.utc).replace(
            tzinfo=None
        )
    if isinstance(key, str):
        s = key.strip()
        try:
            if len(s) == 10:
                return dt.date.fromisoformat(s)
            return dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
        except ValueError as e:
            raise ValueError(f"unparseable slice key: {key!r}") from e
    raise ValueError(f"unsupported slice key type: {type(key).__name__}")


def _key_sort_value(k) -> dt.datetime:
    if isinstance(k, dt.datetime):
        return k if k.tzinfo is None else k.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return dt.datetime(k.year, k.month, k.day)


def slice_time(
    df: DataFrame,
    time_col: str | Column,
    from_key,
    to_key,
    validate: bool = False,
) -> DataFrame:
    """Inclusive [from, to] selection on a time column.

    Catalyst pushes the predicate to the scan (check with
    ``.explain('formatted')`` -> PushedFilters: [GreaterThanOrEqual(ts,..),
    LessThanOrEqual(ts,..)]), pruning parquet files and row groups by
    min/max stats — the distributed analogue of the reference's binary
    search on a sorted column.

    ``validate=True`` runs the reference's is-sorted? pre-flight
    (reference src/tablecloth/time/api/slice.clj:67-72 ->
    utils/binary_search.clj:8-25) and raises if the physical layout is not
    time-sorted. Filter CORRECTNESS never depends on sort order, but
    row-group min/max skipping does — an unsorted tier table silently
    degrades to a full scan, which is exactly what the reference's safety
    contract exists to catch.
    """
    name = time_col if isinstance(time_col, str) else None
    if name is not None and name not in df.columns:
        raise ValueError(f"time column {name!r} not found; columns: {df.columns}")
    if validate:
        if name is None:
            raise ValueError("validate=True requires time_col as a column NAME")
        from tablecloth_time_spark.operators.validate import is_sorted

        if not is_sorted(df, name):
            raise ValueError(
                f"slice_time: {name!r} is not sorted in the physical layout "
                "(nulls or out-of-order values); sort/write the tier table "
                "time-ordered, or pass validate=False to slice anyway"
            )
    c = F.col(name) if name is not None else time_col

    lo = parse_key(from_key)
    hi = parse_key(to_key)
    if _key_sort_value(lo) > _key_sort_value(hi):
        raise ValueError(f"slice from > to: {from_key!r} > {to_key!r}")
    # A date upper bound means "through the end of that day" only when the
    # column itself is date-typed; against timestamps we compare at the
    # given instant (midnight), matching the reference's key normalization.
    return df.filter((c >= F.lit(lo)) & (c <= F.lit(hi)))
