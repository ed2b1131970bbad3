"""lag/lead dataset operators — partitioned window shifts.

The reference shifts a column by k positions with nil fill, type-preserved
(reference src/tablecloth/time/column/api.clj:295-327, api.clj:171-267).
Distributed, "position" must be defined by an explicit ordering; the engine
uses (partition keys, order columns) — for transcripts that is
partitionBy(conv_id).orderBy(turn_idx), preserving the reference's
per-series shift semantics while scaling horizontally (each series shifts
independently inside its hash partition; one shuffle on the series key,
reused across all lags in the same select).

``add_lags``/``add_leads`` auto-name columns ``{src}_lag{k}`` /
``{src}_lead{k}`` and by default drop rows that are null in ANY of the new
columns (the reference's drop-missing default).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _window(partition_by: list[str] | None, order_by: list[str]):
    w = Window.orderBy(*order_by)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return w


def add_lag(
    df: DataFrame,
    src: str,
    k: int,
    target: str | None = None,
    order_by: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Add a k-lagged copy of ``src`` (k leading nulls per partition)."""
    target = target or f"{src}_lag{k}"
    order_by = order_by or [src]
    w = _window(partition_by, order_by)
    return df.withColumn(target, F.lag(src, k).over(w))


def add_lead(
    df: DataFrame,
    src: str,
    k: int,
    target: str | None = None,
    order_by: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Add a k-lead copy of ``src`` (k trailing nulls per partition)."""
    target = target or f"{src}_lead{k}"
    order_by = order_by or [src]
    w = _window(partition_by, order_by)
    return df.withColumn(target, F.lead(src, k).over(w))


def _multi_shift(
    df: DataFrame,
    src: str,
    ks,
    order_by: list[str],
    partition_by: list[str] | None,
    drop_missing: bool,
    fn,
    suffix: str,
) -> DataFrame:
    if isinstance(ks, Mapping):
        pairs = [(int(k), str(name)) for k, name in ks.items()]
    elif isinstance(ks, Iterable):
        pairs = [(int(k), f"{src}_{suffix}{int(k)}") for k in ks]
    else:
        raise ValueError("ks must be a sequence of ints or a {k: name} mapping")
    w = _window(partition_by, order_by)
    # one projection -> Catalyst computes every shift over ONE window
    # (single sort/shuffle), not one shuffle per lag
    out = df.select("*", *[fn(src, k).over(w).alias(name) for k, name in pairs])
    if drop_missing:
        out = out.na.drop(subset=[name for _, name in pairs])
    return out


def add_lags(
    df: DataFrame,
    src: str,
    ks,
    order_by: list[str] | None = None,
    partition_by: list[str] | None = None,
    drop_missing: bool = True,
) -> DataFrame:
    """Add multiple lag columns; drop rows null in any new column by default."""
    return _multi_shift(
        df, src, ks, order_by or [src], partition_by, drop_missing, F.lag, "lag"
    )


def add_leads(
    df: DataFrame,
    src: str,
    ks,
    order_by: list[str] | None = None,
    partition_by: list[str] | None = None,
    drop_missing: bool = True,
) -> DataFrame:
    """Add multiple lead columns; drop rows null in any new column by default."""
    return _multi_shift(
        df, src, ks, order_by or [src], partition_by, drop_missing, F.lead, "lead"
    )


def first_difference(
    df: DataFrame,
    src: str,
    target: str | None = None,
    order_by: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """x_t - x_{t-1} per partition (the notebook's manual diff recipe)."""
    target = target or f"{src}_diff"
    w = _window(partition_by, order_by or [src])
    return df.withColumn(target, F.col(src) - F.lag(src, 1).over(w))


def add_lag_time(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    src: str,
    width: int,
    unit: str = "hour",
    order_cols: list[str] | None = None,
    target: str | None = None,
) -> DataFrame:
    """Lag by DURATION, not row count: the key's most recent ``src`` value
    at least ``width`` units old at each row (null when none exists yet).

    Row-count lags are meaningless on irregular samples ("the previous
    sample" may be 2 seconds or 2 days old); this is the time-based form —
    the building block of pct-change-over-1h / week-over-week features.

    Spark-native shape: a RANGE window frame over epoch-millis,
    ``[unbounded preceding, ts - width]``, aggregated with max over an
    ordered struct ``(ms, order_cols..., value)`` — ``last()`` over a range
    frame is nondeterministic under timestamp ties, the struct max is not.
    Cost: the same one-shuffle windowed pass as any rolling aggregate.
    """
    from tablecloth_time_spark.functions.timeops import to_epoch_millis
    from tablecloth_time_spark.functions.units import (
        milliseconds_in,
        normalize_unit,
    )

    width_ms = width * milliseconds_in(normalize_unit(unit))
    order_cols = order_cols or []
    target = target or f"{src}_lag_{width}{normalize_unit(unit)}"
    w = (
        Window.partitionBy(*keys)
        .orderBy(to_epoch_millis(ts_col))
        .rangeBetween(Window.unboundedPreceding, -width_ms)
    )
    ordered = F.struct(
        to_epoch_millis(ts_col).alias("m"),
        *[F.col(c).alias(f"o{i}") for i, c in enumerate(order_cols)],
        F.col(src).alias("v"),
    )
    return df.withColumn(target, F.max(ordered).over(w).getField("v"))


def growth_rates(
    df: DataFrame,
    keys: str | list[str],
    bucket_col: str,
    value_col: str,
    periods: dict[str, int] | None = None,
    unit: str = "month",
) -> DataFrame:
    """Gap-safe calendar growth rates over a bucketed series: for each
    named offset (default MoM = 1, YoY = 12 in months), the value at
    EXACTLY that many calendar units earlier and the fractional change
    vs it — the month-over-month / year-over-year view every business
    rollup ends in.

    ``lag(k)`` over rows is WRONG on gappy series (a missing month
    silently shifts the comparison); instead each prior value comes from
    a RANGE frame pinned at exactly -k on the epoch-month (or
    epoch-quarter/year) integer index — one window sort shared by every
    offset, no self-join, and a hole where the prior bucket is absent
    (null growth, never a misaligned one). Input contract: one row per
    (keys, bucket) with ``bucket_col`` on the calendar floor
    (``down_to_nearest``/``rollup`` output).

    At 100 TB this is a single per-key Exchange over the BUCKETED frame
    (rows ∝ keys x periods present, already tiers-sized) — the raw fact
    table was reduced by the upstream rollup.

    Output: input columns + per period name: <name>_prev, <name>_growth
    ((v - prev)/prev; null when prev is null or zero).
    """
    from tablecloth_time_spark.functions.timeops import (
        epoch_month,
        epoch_quarter,
    )
    from tablecloth_time_spark.functions.units import normalize_unit

    ks = [keys] if isinstance(keys, str) else list(keys)
    u = normalize_unit(unit)
    # defaults are denominated in the GRID unit — 12 on a quarterly grid
    # would silently mean 3 years while still being labeled yoy
    default_periods = {
        "month": {"mom": 1, "yoy": 12},
        "quarter": {"qoq": 1, "yoy": 4},
        "year": {"yoy": 1},
    }
    pers = periods or default_periods.get(u, {})
    if u == "month":
        idx = epoch_month(bucket_col)
    elif u == "quarter":
        idx = epoch_quarter(bucket_col)
    elif u == "year":
        idx = F.year(bucket_col).cast("long")
    else:
        raise ValueError(
            f"growth_rates wants a calendar unit (month/quarter/year), "
            f"got {unit!r} — metric-grid differences are first_difference's job"
        )
    v = F.col(value_col).cast("double")
    w = Window.partitionBy(*ks).orderBy(idx)
    out = df
    cols = []
    for name, k in pers.items():
        if k < 1:
            raise ValueError(f"period {name!r} must be >= 1, got {k}")
        prev = F.first(v).over(w.rangeBetween(-k, -k))
        cols.append(prev.alias(f"{name}_prev"))
        cols.append(
            F.try_divide(v - prev, prev).alias(f"{name}_growth")
        )
    return out.select("*", *cols)
