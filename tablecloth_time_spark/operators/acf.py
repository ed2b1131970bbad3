"""Autocorrelation function per series — the notebook's "core function we
need" (reference notebooks/chapter_02_time_series_graphics.clj:483-505).

r_k = sum_{t>k} (y_t - ybar)(y_{t-k} - ybar) / sum_t (y_t - ybar)^2

Pure JVM construction (r3 — previously an Arrow kernel): center each
series with a whole-partition window avg, build the k lagged products
with ``lag`` over the same sort, and reduce with ONE partial/final hash
aggregate per series — `sum` ignores the k null head products per lag,
and an all-null product column (k >= n) sums to null, exactly the
"undefined" cases. Plan: one shuffle (series key) + one sorted window
pass + map-side-combined aggregate; max_lag adds columns, not passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def acf(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    max_lag: int,
) -> DataFrame:
    """Returns (*keys string, lag int, acf double) for lags 1..max_lag.

    Null/NaN observations are dropped (the series compacts, matching the
    reference notebook's tc/drop-missing before acf); ``acf`` is null
    where undefined (fewer than k+1 points, or zero variance).
    """
    if max_lag < 1:
        raise ValueError(f"acf: max_lag must be >= 1, got {max_lag}")
    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull() & ~F.isnan(v)).select(
        *keys, F.col(order_col).alias("__o"), v.alias("__v")
    )
    w = Window.partitionBy(*keys).orderBy("__o")
    whole = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    yc = F.col("__v") - F.avg("__v").over(whole)
    b = base.select(*keys, "__o", yc.alias("__yc"))
    prods = b.select(
        *keys,
        (F.col("__yc") * F.col("__yc")).alias("__p0"),
        *[
            (F.col("__yc") * F.lag("__yc", k).over(w)).alias(f"__p{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    agg = prods.groupBy(*keys).agg(
        F.sum("__p0").alias("__denom"),
        *[F.sum(f"__p{k}").alias(f"__n{k}") for k in range(1, max_lag + 1)],
    )
    kv = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).cast("int").alias("lag"),
                    F.col(f"__n{k}").alias("num"),
                )
                for k in range(1, max_lag + 1)
            ]
        )
    ).alias("kv")
    return agg.select(
        *[F.col(k).cast("string").alias(k) for k in keys], "__denom", kv
    ).select(
        *keys,
        F.col("kv.lag").alias("lag"),
        F.when(
            F.col("__denom") > 0, F.col("kv.num") / F.col("__denom")
        ).alias("acf"),
    )
