"""Gap-fill / resample-to-regular-grid (the reference's planned upsample op).

Spec re-expressed from the reference's design (behavior from reference
development-plan.md:566-607): generate a regular time grid per series,
left-join observed values onto it, then fill methods
``ffill | bfill | linear | nearest | zero | none``.

Spark-first construction:
- the grid is ``sequence(floor(min_ts), floor(max_ts), interval)`` +
  ``explode`` — generated distributed, one row per series per grid step,
  never on the driver;
- the observed side is pre-bucketed with ``down_to_nearest`` and aggregated
  (first value per bucket) so the grid join is an equi-join on
  (series key, grid ts) — Catalyst picks broadcast or shuffle-hash join and
  AQE handles skewed series;
- ``ffill``/``bfill`` are pure window exprs (``last(v, ignorenulls=True)``
  over unbounded-preceding / ``first(v, True)`` over unbounded-following) —
  whole-stage codegen, no Python;
- ``linear``/``nearest`` need neighbor values on both sides, which window
  exprs can't express cheaply — they run as one Arrow-vectorized
  ``applyInPandas`` (numpy.interp) per series group, the engine's sanctioned
  slow path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tablecloth_time_spark.functions.timeops import down_to_nearest
from tablecloth_time_spark.functions.units import (
    is_calendar_unit,
    milliseconds_in,
    normalize_unit,
)

FILL_METHODS = ("none", "ffill", "bfill", "zero", "linear", "nearest")

# one calendar unit expressed in months (grid step for sequence())
_MONTHS_PER = {"month": 1, "quarter": 3, "year": 12}


def resample_to_regular_grid(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    interval: int,
    unit: str,
    method: str = "none",
    agg: str = "avg",
) -> DataFrame:
    """Regularize each series to an (interval x unit) grid and fill gaps.

    Returns columns: *keys, bucket (timestamp), value_col (filled per
    ``method``; null where unfillable). Observed buckets aggregate with
    ``agg`` in ('avg','sum','min','max','first','last') before gridding.

    Calendar units (month/quarter/year, any interval k) are supported: the
    grid steps by ``INTERVAL k*months MONTH`` — Spark's ``sequence`` over
    timestamps takes year-month intervals, and adding months to a
    calendar-floored boundary stays on the boundary, so grid points align
    exactly with ``down_to_nearest``'s calendar buckets (reference spec
    development-plan.md:566-585 allows any interval x unit). ``linear``
    interpolates over real elapsed time (epoch-millis x-axis), so unequal
    month lengths weight correctly.
    """
    method = method.lower()
    if method not in FILL_METHODS:
        raise ValueError(f"unknown fill method {method!r}; want one of {FILL_METHODS}")
    u = normalize_unit(unit)
    if is_calendar_unit(u):
        step = F.expr(f"INTERVAL {interval * _MONTHS_PER[u]} MONTH")
    else:
        step_ms = interval * milliseconds_in(u)
        step = F.expr(f"INTERVAL {step_ms * 1000} MICROSECOND")

    bucket = down_to_nearest(ts_col, interval, u).alias("bucket")
    agg_expr = {
        "avg": F.avg(value_col),
        "sum": F.sum(value_col),
        "min": F.min(value_col),
        "max": F.max(value_col),
        "first": F.min_by(value_col, ts_col),
        "last": F.max_by(value_col, ts_col),
    }[agg]
    observed = df.groupBy(*keys, bucket).agg(agg_expr.alias(value_col))

    # per-series grid: sequence is generated executor-side from the series'
    # own [min, max] — no driver collect, no cross-series blowup
    spans = observed.groupBy(*keys).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    grid = spans.select(
        *keys,
        F.explode(F.sequence("__lo", "__hi", step)).alias("bucket"),
    )
    joined = grid.join(observed, [*keys, "bucket"], "left")

    if method == "none":
        return joined
    if method == "zero":
        return joined.withColumn(value_col, F.coalesce(value_col, F.lit(0.0)))

    w = Window.partitionBy(*keys).orderBy("bucket")
    if method == "ffill":
        filled = F.last(value_col, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        )
        return joined.withColumn(value_col, filled)
    if method == "bfill":
        filled = F.first(value_col, ignorenulls=True).over(
            w.rowsBetween(0, Window.unboundedFollowing)
        )
        return joined.withColumn(value_col, filled)

    # linear / nearest: Arrow-vectorized per-series interpolation, batched
    # through grouped_apply_stream (per-batch Python crossings, not
    # per-series — millions of small series would otherwise pay a full
    # applyInPandas round-trip each)
    from tablecloth_time_spark.operators._grouped import grouped_apply_stream

    out_schema = joined.schema
    is_nearest = method == "nearest"

    def _interp(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["bucket"].values.astype("datetime64[ms]").astype("int64")
        y = pdf[value_col].values.astype("float64")
        mask = ~np.isnan(y)
        if mask.sum() == 0:
            return pdf
        xo, yo = x[mask], y[mask]
        if is_nearest:
            idx = np.searchsorted(xo, x, side="left")
            idx = np.clip(idx, 0, len(xo) - 1)
            left = np.clip(idx - 1, 0, len(xo) - 1)
            pick_left = (idx > 0) & (
                (x - xo[left]) <= (xo[np.clip(idx, 0, len(xo) - 1)] - x)
            )
            nearest = np.where(pick_left, yo[left], yo[idx])
            pdf[value_col] = nearest
        else:
            # numpy.interp clamps at the edges; keep leading/trailing gaps
            # null (interior-only interpolation, per the reference spec)
            interp = np.interp(x, xo, yo)
            interp[x < xo[0]] = np.nan
            interp[x > xo[-1]] = np.nan
            pdf[value_col] = interp
        return pdf

    return grouped_apply_stream(joined, keys, ["bucket"], _interp, out_schema)
