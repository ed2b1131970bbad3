"""Visual downsampling: LTTB (sequential, shape-optimal) and M4
(hash-aggregate, error-free per pixel bucket) per series.

A dashboard cannot plot 10^8 points; it wants ~window-width points that
preserve the SHAPE of the series (peaks, troughs, trend reversals) better
than naive every-Nth or per-bucket averaging. LTTB (Steinarsson 2013,
"Downsampling Time Series for Visual Representation") is the standard:
split the series into n_out buckets, always keep the first and last
points, and from each middle bucket keep the point forming the largest
triangle with the previously kept point and the next bucket's centroid.

The selection is sequential per series (each choice depends on the
previous kept point), so it runs in the batched Arrow kernel
(``_grouped.grouped_apply_stream``): one shuffle + in-partition sort,
Python crossings per Arrow batch. Inside the kernel the loop is per
OUTPUT bucket — n_out iterations (plot width, typically 100-2000),
NOT per input row — with the area argmax fully numpy-vectorized inside
each bucket; input size only affects the vector lengths.

Scale: each series is downsampled independently (conv/user/metric key),
so the operator distributes like any grouped kernel; a single series'
points must fit one task, which holds by construction for per-key series
under the engine's day/conversation blocking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType

from tablecloth_time_spark.functions.timeops import down_to_nearest, to_epoch_millis
from tablecloth_time_spark.operators._grouped import grouped_apply_stream


def lttb_select(t: np.ndarray, v: np.ndarray, n_out: int) -> np.ndarray:
    """Indices of the LTTB-selected points for one series (t sorted asc)."""
    n = len(t)
    if n_out >= n:
        return np.arange(n)
    if n <= 2 or n_out < 3:
        # endpoints only — trimmed to the budget for degenerate n_out
        return np.arange(n) if n <= n_out else np.array([0, n - 1])[:max(n_out, 1)]
    # bucket boundaries over the middle n-2 points (first/last pinned)
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    out = np.empty(n_out, dtype=np.int64)
    out[0] = 0
    a = 0  # previously selected point
    for i in range(n_out - 2):  # per OUTPUT bucket, not per row
        lo, hi = edges[i], edges[i + 1]
        nlo, nhi = edges[i + 1], (n if i == n_out - 3 else edges[i + 2])
        # next bucket's centroid (last "bucket" is the final point)
        cx = t[nlo:nhi].mean() if nhi > nlo else t[n - 1]
        cy = v[nlo:nhi].mean() if nhi > nlo else v[n - 1]
        # triangle area vs previous point and centroid, vectorized
        area = np.abs(
            (t[a] - cx) * (v[lo:hi] - v[a]) - (t[a] - t[lo:hi]) * (cy - v[a])
        )
        a = lo + int(np.argmax(area)) if hi > lo else lo
        out[i + 1] = a
    out[n_out - 1] = n - 1
    # degenerate tiny-bucket edges (linspace rounding) can repeat an index
    return np.unique(out)


def lttb_downsample(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    n_out: int = 500,
) -> DataFrame:
    """Downsample each key's series to at most ``n_out`` shape-preserving
    points. Output: keys + ``ts_ms`` + ``value`` (the kept points, in
    order)."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    base = df.select(
        *ks,
        to_epoch_millis(ts_col).alias("ts_ms"),
        df[value_col].cast("double").alias("value"),
    )
    schema = StructType(
        [f for f in base.schema.fields if f.name in ks]
        + [StructField("ts_ms", LongType()), StructField("value", DoubleType())]
    )

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        t = g["ts_ms"].to_numpy(dtype=np.float64)
        v = g["value"].to_numpy(dtype=np.float64)
        idx = lttb_select(t, v, n_out)
        out = g.iloc[idx][[*ks, "ts_ms", "value"]]
        return out

    return grouped_apply_stream(base, ks, ["ts_ms"], kernel, schema)


def m4_downsample(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    interval: int,
    unit: str = "minute",
    bucket_col: str = "bucket",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """M4 visual aggregation (Jugel et al., VLDB 2014): per pixel-column
    time bucket keep the FOUR extremum points — first, last, min-value and
    max-value — which is exactly the point set an error-free line rendering
    at that pixel width needs.

    Unlike LTTB (sequential per series, Arrow kernel), M4 is a pure
    hash-aggregate: four lexicographic struct min/max aggregates in ONE
    groupBy pass — map-side combined, mergeable across tiers, no Python,
    no window sort. At 100 TB this is the downsampler to reach for first;
    LTTB is the higher-fidelity/higher-cost alternative.

    Output: one row per (keys, bucket) carrying (ts, value) of each of the
    four selected points; a renderer unions/dedups them client-side. Ties
    are pinned by (value, ts, *order_cols) lexicographic order so the
    result is reproducible and oracle-checkable.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    bucket = down_to_nearest(ts_col, interval, unit).alias(bucket_col)
    agg = df.groupBy(*ks, bucket).agg(
        *m4_agg_exprs(ts_col, value_col, order_cols)
    )
    return agg.select(*ks, bucket_col, *m4_point_exprs())


def m4_agg_exprs(
    ts_col: str, value_col: str, order_cols: list[str] | None = None
) -> list:
    """The four mergeable struct aggregates behind M4 — shared by the
    batch operator and the streaming window rollup (streaming/downsample).
    The ORIGINAL timestamp is ordered/carried at full precision; only the
    bucket floor (the caller's groupBy key) uses epoch-millis math."""
    oc = [F.col(c).alias(f"o{i}") for i, c in enumerate(order_cols or [])]
    t = F.col(ts_col)
    v = F.col(value_col).cast("double")
    # (ts, order..., value): min = first point, max = last point
    by_time = F.struct(t.alias("t"), *oc, v.alias("v"))
    # (value, ts, order...): min = min-value point (earliest on ties),
    # max = max-value point (latest on ties) — mirrored in the oracle SQL
    by_value = F.struct(v.alias("v"), t.alias("t"), *oc)
    return [
        F.min(by_time).alias("__first"),
        F.max(by_time).alias("__last"),
        F.min(by_value).alias("__min"),
        F.max(by_value).alias("__max"),
    ]


def m4_point_exprs() -> list:
    """Unpack the four aggregated structs into the (t_*, v_*) columns."""
    return [
        F.col("__first.t").alias("t_first"),
        F.col("__first.v").alias("v_first"),
        F.col("__last.t").alias("t_last"),
        F.col("__last.v").alias("v_last"),
        F.col("__min.t").alias("t_min"),
        F.col("__min.v").alias("v_min"),
        F.col("__max.t").alias("t_max"),
        F.col("__max.v").alias("v_max"),
    ]
