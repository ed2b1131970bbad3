"""Per-time-bucket data-quality profiling — the ingest-hygiene monitor.

A 100 TB pipeline's first production incident is usually data shape, not
code: a feed starts sending nulls, a unit change shifts magnitudes, a
producer duplicates ids. ``profile_rollup`` turns the raw table into a
tiny per-(bucket, column) stats frame a monitor can alert on, extending
the reference's ensure-time-column/validation pre-flights
(operators/validate.py; reference src/tablecloth/time/index.clj sorted /
existence checks) from "is the input usable" to "is the input HEALTHY
over time".

Plan: ONE hash aggregate per bucket computing (count, nulls, NaNs, min,
max, sum) for every profiled column — all mergeable, map-side combined,
rollup plan class. Distinct counts default to HLL++
(``approx_count_distinct``, mergeable sketch — the only distinct shape
that survives 100 TB in one pass); ``exact=True`` switches to
``count_distinct``, which Spark plans as one Expand over the profiled
columns (c replicas) — fine at audit scale, and what the byte-exact
driver oracle runs. The long (bucket, column) layout comes from
exploding a c-element struct array of the FINAL tiny frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tablecloth_time_spark.functions.timeops import down_to_nearest


def profile_rollup(
    df: DataFrame,
    ts_col: str,
    cols: list[str],
    interval: int,
    unit: str,
    keys: list[str] | None = None,
    exact: bool = False,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Numeric data-quality profile per (keys..., time bucket, column):
    ``n`` (rows in bucket), ``n_null``, ``n_nan``, ``min``/``max``/
    ``mean`` over finite values, ``n_distinct`` (approx by default,
    exact with ``exact=True``; null excluded, NaN counts as one value).

    ``cols`` must be castable to double (profile strings via a length/
    hash projection first). mean uses masked sum/count so a single NaN
    doesn't poison the bucket.
    """
    if not cols:
        raise ValueError("profile_rollup: need at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_rollup: columns not found: {missing}")
    keys = keys or []
    bucket = down_to_nearest(ts_col, interval, unit).alias(bucket_col)

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        v = F.col(c).cast("double")
        finite = v.isNotNull() & ~F.isnan(v)
        fv = F.when(finite, v)
        aggs += [
            F.sum(F.when(v.isNull(), 1).otherwise(0)).alias(f"__null{i}"),
            F.sum(F.when(v.isNotNull() & F.isnan(v), 1).otherwise(0)).alias(
                f"__nan{i}"
            ),
            F.min(fv).alias(f"__min{i}"),
            F.max(fv).alias(f"__max{i}"),
            F.sum(fv).alias(f"__sum{i}"),
            F.count(fv).alias(f"__cnt{i}"),
            (
                F.count_distinct(F.col(c))
                if exact
                else F.approx_count_distinct(F.col(c))
            ).alias(f"__dst{i}"),
        ]
    agg = df.groupBy(*keys, bucket).agg(*aggs)

    rows = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"__null{i}").cast("bigint").alias("n_null"),
            F.col(f"__nan{i}").cast("bigint").alias("n_nan"),
            F.col(f"__min{i}").alias("min"),
            F.col(f"__max{i}").alias("max"),
            F.try_divide(
                F.col(f"__sum{i}"), F.col(f"__cnt{i}").cast("double")
            ).alias("mean"),
            F.col(f"__dst{i}").cast("bigint").alias("n_distinct"),
        )
        for i, c in enumerate(cols)
    ]
    exploded = agg.select(
        *keys,
        bucket_col,
        F.col("__n").alias("n"),
        F.explode(F.array(*rows)).alias("__e"),
    )
    return exploded.select(
        *keys, bucket_col, "n",
        F.col("__e.column").alias("column"),
        F.col("__e.n_null").alias("n_null"),
        F.col("__e.n_nan").alias("n_nan"),
        F.col("__e.min").alias("min"),
        F.col("__e.max").alias("max"),
        F.col("__e.mean").alias("mean"),
        F.col("__e.n_distinct").alias("n_distinct"),
    )
