"""Benchmark forecasting methods (fpp3 chapter 5) over regular series.

The reference's notebook track works through Hyndman's fpp3 book
(reference notebooks/chapter_02_time_series_graphics.clj); chapter 5's
four benchmark methods are the canonical baselines every forecast is
judged against:

- MEAN:   yhat_{T+h} = mean(y_1..y_T)
- NAIVE:  yhat_{T+h} = y_T
- SNAIVE: yhat_{T+h} = y_{T+h-m(k+1)}, k = floor((h-1)/m) — the value
          from the same season of the last observed cycle
- DRIFT:  yhat_{T+h} = y_T + h * (y_T - y_1) / (T-1)

All four are pure DataFrame algebra — no model state, no Python:
mean/naive/drift come from ONE per-key hash aggregate (count, mean, and
first/last via lexicographic struct min/max — the same mergeable shape
the rollup tiers use), horizons explode from a ``sequence`` on that tiny
per-key frame, and SNAIVE equi-joins the horizon frame to the last
``season_length`` observations (row_number desc <= m — at 10^8 series
that tail frame is m rows per key, shuffled on the key like any rollup).

Input contract: one row per (keys, ts) on a REGULAR grid (compose with
``resample_to_regular_grid`` first for gappy series), which is the same
precondition fpp3's ``tsibble`` enforces. Only metric units step the
future timestamps in v1 (month/quarter/year grids via add_months are the
gap-fill module's calendar path; reuse on request).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tablecloth_time_spark.functions.timeops import to_epoch_millis
from tablecloth_time_spark.functions.units import milliseconds_in, normalize_unit

METHODS = ("mean", "naive", "snaive", "drift")


def benchmark_forecast(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    horizon: int,
    interval: int,
    unit: str,
    methods: tuple[str, ...] | list[str] = ("mean", "naive", "drift"),
    season_length: int | None = None,
    method_col: str = "method",
    h_col: str = "h",
    out_ts: str = "ts",
    out_col: str = "forecast",
) -> DataFrame:
    """Forecast ``horizon`` future steps per key with the requested
    benchmark methods, long output: (keys..., method, h, ts, forecast).

    ``interval``/``unit`` is the series' grid step (metric units only) and
    steps the future timestamps from each key's last observation. SNAIVE
    requires ``season_length`` (in steps); keys with fewer than
    ``season_length`` observations forecast only the seasons they have
    (missing season positions are absent, mirroring fpp3's NA behavior).
    DRIFT needs >= 2 observations (null forecast otherwise).
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    for m in methods:
        if m not in METHODS:
            raise ValueError(f"unknown method {m!r}; choose from {METHODS}")
    if "snaive" in methods and not season_length:
        raise ValueError("snaive requires season_length")
    step_ms = interval * milliseconds_in(normalize_unit(unit))

    v = F.col(value_col).cast("double")
    ms = to_epoch_millis(ts_col)
    ordered = F.struct(ms.alias("t"), v.alias("v"))
    stats = df.groupBy(*ks).agg(
        F.count(v).alias("__n"),
        F.avg(v).alias("__mean"),
        F.min(ordered).alias("__first"),
        F.max(ordered).alias("__last"),
    )
    hs = stats.withColumn(
        h_col, F.explode(F.sequence(F.lit(1), F.lit(horizon)))
    )
    future_ts = F.timestamp_millis(
        F.col("__last.t") + F.col(h_col) * F.lit(step_ms)
    ).alias(out_ts)

    def shaped(m: str, fc) -> DataFrame:
        return hs.select(
            *ks,
            F.lit(m).alias(method_col),
            F.col(h_col),
            future_ts,
            fc.cast("double").alias(out_col),
        )

    parts: list[DataFrame] = []
    if "mean" in methods:
        parts.append(shaped("mean", F.col("__mean")))
    if "naive" in methods:
        parts.append(shaped("naive", F.col("__last.v")))
    if "drift" in methods:
        slope = (F.col("__last.v") - F.col("__first.v")) / (F.col("__n") - 1)
        parts.append(
            shaped(
                "drift",
                F.when(
                    F.col("__n") >= 2, F.col("__last.v") + F.col(h_col) * slope
                ),
            )
        )
    if "snaive" in methods:
        m = int(season_length)
        tail = (
            df.select(*ks, ms.alias("__tms"), v.alias("__tv"))
            .withColumn("__rnd", F.row_number().over(
                Window.partitionBy(*ks).orderBy(F.col("__tms").desc())
            ))
            .filter(F.col("__rnd") <= m)
        )
        # future step h matches tail position m - (h-1) mod m
        # (rn_desc 1 = last observation; see module docstring for the
        # fpp3 index identity y_{T+h-m(k+1)})
        joined = hs.join(
            tail,
            [
                *[hs[k] == tail[k] for k in ks],
                tail["__rnd"]
                == F.lit(m) - (hs[h_col] - 1) % F.lit(m),
            ],
        )
        parts.append(
            joined.select(
                *[hs[k] for k in ks],
                F.lit("snaive").alias(method_col),
                hs[h_col],
                F.timestamp_millis(
                    F.col("__last.t") + hs[h_col] * F.lit(step_ms)
                ).alias(out_ts),
                F.col("__tv").cast("double").alias(out_col),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
