"""Pure pandas/numpy single-node reference implementation.

This is the "single-node reference implementation of tablecloth.time's
adjust-frequency/down-sample and slice test suites" the engine must match
bit-for-bit (BASELINE.json north_star). It keeps the reference's exact
semantics — binary-search slice with duplicate-aware inclusive bounds
(reference src/tablecloth/time/utils/binary_search.clj:75-100), epoch-
anchored calendar floors, ISO day-of-week, truncation-toward-zero epoch
weeks — implemented vectorized in numpy over int64 epoch-millis, never
distributed. Differential tests (tests/) run engine and oracle over
identical inputs and assert exact frame equality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from tablecloth_time_spark.functions.units import (
    is_calendar_unit,
    milliseconds_in,
    normalize_unit,
)

# ---------------------------------------------------------------------------
# millis pivot
# ---------------------------------------------------------------------------


def to_epoch_millis(s: pd.Series) -> np.ndarray:
    """datetime64 series -> int64 epoch millis."""
    return s.values.astype("datetime64[ms]").astype("int64")


def from_epoch_millis(ms: np.ndarray) -> pd.Series:
    return pd.Series(ms.astype("datetime64[ms]").astype("datetime64[us]"))


# ---------------------------------------------------------------------------
# flooring
# ---------------------------------------------------------------------------


def _epoch_month(s: pd.Series) -> np.ndarray:
    dt = pd.DatetimeIndex(s)
    return ((dt.year.values - 1970) * 12 + (dt.month.values - 1)).astype("int64")


def floor_to_month(s: pd.Series, k: int = 1) -> pd.Series:
    m = _epoch_month(s)
    m2 = m - _rem(m, k)
    years, months = 1970 + m2 // 12, m2 % 12 + 1
    return pd.Series(
        pd.to_datetime({"year": years, "month": months, "day": 1}).values
    )


def floor_to_quarter(s: pd.Series, k: int = 1) -> pd.Series:
    q = np.trunc(_epoch_month(s) / 3).astype("int64")
    m2 = 3 * (q - _rem(q, k))
    years, months = 1970 + m2 // 12, m2 % 12 + 1
    return pd.Series(pd.to_datetime({"year": years, "month": months, "day": 1}).values)


def floor_to_year(s: pd.Series, k: int = 1) -> pd.Series:
    dt = pd.DatetimeIndex(s)
    y = (dt.year.values - 1970).astype("int64")
    y2 = 1970 + (y - _rem(y, k))
    return pd.Series(pd.to_datetime({"year": y2, "month": 1, "day": 1}).values)


def _rem(a: np.ndarray, k: int) -> np.ndarray:
    """Truncation-toward-zero remainder (numpy % floors; fix negatives)."""
    r = np.remainder(a, k)
    return np.where(a < 0, np.where(r != 0, r - k, 0), r)


def down_to_nearest(s: pd.Series, interval: int, unit: str) -> pd.Series:
    """Floor to the lower multiple of (interval x unit); epoch-anchored."""
    u = normalize_unit(unit)
    if is_calendar_unit(u):
        if u == "month":
            return floor_to_month(s, interval)
        if u == "quarter":
            return floor_to_quarter(s, interval)
        return floor_to_year(s, interval)
    divisor = interval * milliseconds_in(u)
    ms = to_epoch_millis(s)
    return from_epoch_millis(ms - _rem(ms, divisor))


# ---------------------------------------------------------------------------
# field extractors
# ---------------------------------------------------------------------------


def field(s: pd.Series, name: str) -> np.ndarray:
    dt = pd.DatetimeIndex(s)
    key = name.strip().lower().replace("_", "-")
    if key == "year":
        return dt.year.values.astype("int64")
    if key == "month":
        return dt.month.values.astype("int64")
    if key == "day":
        return dt.day.values.astype("int64")
    if key == "hour":
        return dt.hour.values.astype("int64")
    if key == "minute":
        return dt.minute.values.astype("int64")
    if key == "second":
        return dt.second.values.astype("int64")
    if key == "day-of-week":
        return (dt.dayofweek.values + 1).astype("int64")  # ISO Monday=1
    if key == "day-of-year":
        return dt.dayofyear.values.astype("int64")
    if key == "week-of-year":
        return dt.isocalendar().week.values.astype("int64")
    if key == "quarter":
        return dt.quarter.values.astype("int64")
    if key == "epoch-day":
        return dt.values.astype("datetime64[D]").astype("int64")
    if key == "epoch-week":
        d = dt.values.astype("datetime64[D]").astype("int64")
        return np.trunc(d / 7).astype("int64")
    if key == "week-of-year-index":
        d = dt.values.astype("datetime64[D]").astype("int64")
        jan1 = (
            pd.to_datetime({"year": dt.year, "month": 1, "day": 1})
            .values.astype("datetime64[D]")
            .astype("int64")
        )
        return np.trunc(d / 7).astype("int64") - np.trunc(jan1 / 7).astype("int64")
    raise ValueError(f"unknown field {name!r}")


# ---------------------------------------------------------------------------
# binary-search slice (oracle-only :as-indices surface)
# ---------------------------------------------------------------------------


def find_lower_bound(arr: np.ndarray, target) -> int:
    """Index of FIRST element >= target (duplicate-aware insertion point)."""
    return int(np.searchsorted(arr, target, side="left"))


def find_upper_bound(arr: np.ndarray, target) -> int:
    """Index AFTER the LAST element <= target."""
    return int(np.searchsorted(arr, target, side="right"))


def slice_indices(ts: pd.Series, from_key, to_key) -> np.ndarray:
    """Inclusive [from, to] row indices via binary search over sorted millis."""
    ms = to_epoch_millis(ts)
    if np.any(np.diff(ms) < 0):
        raise ValueError("time column is not sorted ascending")
    lo = pd.Timestamp(from_key).to_datetime64().astype("datetime64[ms]").astype("int64")
    hi = pd.Timestamp(to_key).to_datetime64().astype("datetime64[ms]").astype("int64")
    if lo > hi:
        raise ValueError("slice from > to")
    return np.arange(find_lower_bound(ms, lo), find_upper_bound(ms, hi))


def slice_time(df: pd.DataFrame, time_col: str, from_key, to_key) -> pd.DataFrame:
    if time_col not in df.columns:
        raise ValueError(f"time column {time_col!r} not found")
    ts = df[time_col]
    ms = to_epoch_millis(ts)
    order = np.arange(len(ms))
    descending = len(ms) > 1 and ms[0] > ms[-1]
    if descending:
        order = order[::-1]
        ms = ms[::-1]
    sorter = None
    if np.any(np.diff(ms) < 0):
        sorter = np.argsort(ms, kind="stable")
        order, ms = order[sorter], ms[sorter]
    idx = slice_indices(pd.Series(ms.astype("datetime64[ms]")), from_key, to_key)
    picked = order[idx]
    if descending:
        picked = picked[::-1]
    return df.iloc[picked]


# ---------------------------------------------------------------------------
# shifts + rollup
# ---------------------------------------------------------------------------


def lag(s: pd.Series, k: int) -> pd.Series:
    return s.shift(k)


def lead(s: pd.Series, k: int) -> pd.Series:
    return s.shift(-k)


def rollup(
    df: pd.DataFrame,
    keys: list[str],
    ts_col: str,
    interval: int,
    unit: str,
    aggs: dict[str, tuple[str, str]],
    order_cols: list[str] | None = None,
    bucket_col: str = "bucket",
) -> pd.DataFrame:
    """groupBy(keys + time bucket) with the engine's mergeable agg kinds.

    first/last pick the value at the min/max of (order_cols...) within each
    group — the stable (conv_id, turn_idx, ts) ordering invariant.
    """
    order_cols = order_cols or [ts_col]
    work = df.copy()
    work[bucket_col] = down_to_nearest(work[ts_col], interval, unit).values
    work = work.sort_values(order_cols, kind="stable")
    g = work.groupby(keys + [bucket_col], sort=True)
    out: dict[str, pd.Series] = {}
    for name, (kind, src) in aggs.items():
        if kind == "count":
            out[name] = g.size()
        elif kind == "sum":
            out[name] = g[src].sum()
        elif kind == "min":
            out[name] = g[src].min()
        elif kind == "max":
            out[name] = g[src].max()
        elif kind == "avg":
            out[name] = g[src].sum().astype("float64") / g[src].count()
        elif kind == "first":
            out[name] = g[src].first()
        elif kind == "last":
            out[name] = g[src].last()
        else:
            raise ValueError(f"unknown aggregate kind {kind!r}")
    res = pd.DataFrame(out).reset_index()
    return res
