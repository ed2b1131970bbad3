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
- SES (fpp3 ch. 8, fixed alpha): yhat_{T+h} = l_T, the simple-
  exponential-smoothing level. The recurrence l_t = a*y_t + (1-a)*l_{t-1}
  with l_1 = y_1 has the closed form
      l_T = sum_{j=0..T-2} a*(1-a)^j * y_{T-j}  +  (1-a)^(T-1) * y_1,
  so the "sequential" smoother is really ONE weighted aggregate: weight
  each row by its distance from the series end (a row_number window) and
  sum — no recurrence, no Python, same single-shuffle shape as the rest.
  Weights underflow to exact 0.0 beyond ~1000/a steps back, which is the
  math's own statement that those observations don't matter.
- BROWN (Brown 1956 double exponential smoothing — the classic
  linear-trend benchmark): smooth the SES levels once more with the same
  alpha (s2_t = a*s1_t + (1-a)*s2_{t-1}, s2_1 = s1_1 = y_1), then
      level = 2*s1_T - s2_T,   trend = a/(1-a) * (s1_T - s2_T),
      yhat_{T+h} = level + h * trend.
  The chained recurrence ALSO collapses to one weighted aggregate:
  substituting the SES closed form into itself, the coefficient of the
  rn-th newest observation (rn = 1 is y_T) in s2_T is
      a^2 * rn * (1-a)^(rn-1),
  with the oldest row keeping the initialization mass
  (1-a)^(T-1) * (1 + a*(T-1)) — so Brown is the SAME single per-key
  shuffle as SES, just with a second weighted sum in the same pass.
  Requires alpha < 1 (the trend gain a/(1-a) diverges at 1; at alpha=1
  both smoothers degenerate to y_T anyway, which is NAIVE).
- THETA (Assimakopoulos & Nikolopoulos 2000, the M3 winner): by the
  Hyndman & Billah 2003 equivalence, the classical two-theta-line method
  (theta = 0 and 2) is SES with an added drift,
      yhat_{T+h} = l_T + ((h-1) + 1/a - (1-a)^T / a) * b/2,
  where l_T is the SES level above and b the OLS slope of y on the time
  index t = 1..T. Both pieces are aggregates over the same per-key pass
  (the weighted SES sum and ``regr_slope``), so theta costs the same
  single shuffle as SES. Needs T >= 2 (the slope); null forecast below.

All five are pure DataFrame algebra — no model state, no Python:
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
from tablecloth_time_spark.functions.units import (
    is_calendar_unit,
    milliseconds_in,
    months_in,
    normalize_unit,
)

METHODS = ("mean", "naive", "snaive", "drift", "ses", "theta", "brown")


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
    alpha: float = 0.3,
    method_col: str = "method",
    h_col: str = "h",
    out_ts: str = "ts",
    out_col: str = "forecast",
) -> DataFrame:
    """Forecast ``horizon`` future steps per key with the requested
    benchmark methods, long output: (keys..., method, h, ts, forecast).
    ``alpha`` is SES's smoothing parameter (0 < alpha <= 1).

    ``interval``/``unit`` is the series' grid step and steps the future
    timestamps from each key's last observation — metric units in
    epoch-millis arithmetic, calendar units (month/quarter/year, the grain
    of fpp3's own datasets) via ``add_months``, which assumes the series
    sits on calendar-floor timestamps (midnight bucket starts — what
    ``down_to_nearest``/``resample_to_regular_grid`` produce). SNAIVE requires
    ``season_length`` (in steps); keys with fewer than ``season_length``
    observations forecast only the seasons they have (missing season
    positions are absent, mirroring fpp3's NA behavior). DRIFT needs >= 2
    observations (null forecast otherwise).

    Rows with a NULL or NaN value are ignored entirely (a gap-filled grid
    with method='none' produces nulls; NaN is the same missing-sample
    convention as ``ar_forecast``/``holt_winters_forecast``/``acf``): T,
    y_1, y_T, the mean, and the snaive tail are all taken over the
    finite observations, keeping every method's numerator and denominator
    consistent — and keeping a stray NaN from poisoning the
    first/last struct-max tie-breaks (NaN sorts greatest).
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    for m in methods:
        if m not in METHODS:
            raise ValueError(f"unknown method {m!r}; choose from {METHODS}")
    if "snaive" in methods and not season_length:
        raise ValueError("snaive requires season_length")
    u = normalize_unit(unit)

    df = df.filter(
        F.col(value_col).isNotNull() & ~F.isnan(F.col(value_col).cast("double"))
    )
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
    if is_calendar_unit(u):
        months_per = months_in(u) * interval
        # add_months returns DateType; re-attach the last observation's
        # time-of-day so non-midnight calendar grids keep their clock time
        # (and backtest_accuracy's timestamp equi-join keeps matching)
        stepped_date = F.add_months(
            F.timestamp_millis(F.col("__last.t")).cast("date"),
            F.col(h_col) * F.lit(months_per),
        )
        future_ts = F.timestamp_millis(
            F.unix_millis(stepped_date.cast("timestamp"))
            + F.pmod(F.col("__last.t"), F.lit(86_400_000))
        )
    else:
        step_ms = interval * milliseconds_in(u)
        future_ts = F.timestamp_millis(
            F.col("__last.t") + F.col(h_col) * F.lit(step_ms)
        )
    hs = hs.withColumn(out_ts, future_ts)

    def shaped(m: str, fc) -> DataFrame:
        return hs.select(
            *ks,
            F.lit(m).alias(method_col),
            F.col(h_col),
            F.col(out_ts),
            fc.cast("double").alias(out_col),
        )

    def ses_level(with_slope: bool, with_s2: bool = False) -> DataFrame:
        """Per-key SES level l_T as ONE weighted aggregate (closed form,
        module docstring); with_slope adds the OLS slope of y on the
        ascending time index t = 1..T (regr_slope) and T for theta;
        with_s2 adds Brown's second-smoothing s2_T as a second weighted
        sum in the SAME aggregate pass."""
        w_desc = Window.partitionBy(*ks).orderBy(F.col("__sms").desc())
        whole = w_desc.rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        rn = F.row_number().over(w_desc)  # 1 = last observation
        n = F.count(F.lit(1)).over(whole)
        # closed-form SES weights (module docstring): the oldest row keeps
        # the full initialization mass (1-a)^(T-1), everything else decays
        # geometrically from the series end
        weight = F.when(
            rn == n, F.pow(F.lit(1.0 - alpha), n - 1)
        ).otherwise(F.lit(alpha) * F.pow(F.lit(1.0 - alpha), rn - 1))
        cols = [
            (weight * F.col("__sv")).alias("__w"),
            (n - rn + 1).cast("double").alias("__t"),
            F.col("__sv"),
        ]
        if with_s2:
            # Brown second-pass weights (module docstring): a^2 * rn *
            # (1-a)^(rn-1), oldest row (1-a)^(T-1) * (1 + a*(T-1))
            weight2 = F.when(
                rn == n,
                F.pow(F.lit(1.0 - alpha), n - 1)
                * (F.lit(1.0) + F.lit(alpha) * (n - 1)),
            ).otherwise(
                F.lit(alpha) * F.lit(alpha) * rn
                * F.pow(F.lit(1.0 - alpha), rn - 1)
            )
            cols.append((weight2 * F.col("__sv")).alias("__w2"))
        base = df.select(*ks, ms.alias("__sms"), v.alias("__sv")).select(
            *ks, *cols
        )
        aggs = [F.sum("__w").alias("__ses")]
        if with_s2:
            aggs.append(F.sum("__w2").alias("__ses2"))
        if with_slope:
            aggs += [
                F.regr_slope(F.col("__sv"), F.col("__t")).alias("__b"),
                F.count(F.lit(1)).alias("__T"),
            ]
        return base.groupBy(*ks).agg(*aggs)

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
    if ("ses" in methods or "theta" in methods) and not (0.0 < alpha <= 1.0):
        raise ValueError(f"ses/theta require 0 < alpha <= 1, got {alpha}")
    if "brown" in methods and not (0.0 < alpha < 1.0):
        raise ValueError(
            f"brown requires 0 < alpha < 1 (trend gain a/(1-a) diverges "
            f"at 1; alpha=1 degenerates to naive), got {alpha}"
        )
    if "ses" in methods:
        sj = hs.join(ses_level(with_slope=False), ks)
        parts.append(
            sj.select(
                *ks,
                F.lit("ses").alias(method_col),
                F.col(h_col),
                F.col(out_ts),
                F.col("__ses").cast("double").alias(out_col),
            )
        )
    if "theta" in methods:
        tj = hs.join(ses_level(with_slope=True), ks)
        # Hyndman & Billah 2003: classical theta == SES + drift, with the
        # drift multiplier (h-1) + 1/a - (1-a)^T / a and slope b/2.
        # Parenthesized exactly as the DuckDB oracle writes it (last-ULP
        # parity for the exact hash).
        drift_mult = (
            (F.col(h_col) - 1)
            + F.lit(1.0 / alpha)
            - F.pow(F.lit(1.0 - alpha), F.col("__T")) / F.lit(alpha)
        )
        fc = F.when(
            F.col("__T") >= 2,
            F.col("__ses") + drift_mult * (F.col("__b") / F.lit(2.0)),
        )
        parts.append(
            tj.select(
                *ks,
                F.lit("theta").alias(method_col),
                F.col(h_col),
                F.col(out_ts),
                fc.cast("double").alias(out_col),
            )
        )
    if "brown" in methods:
        bj = hs.join(ses_level(with_slope=False, with_s2=True), ks)
        # Brown 1956: level 2*s1 - s2, trend a/(1-a) * (s1 - s2).
        # Parenthesized exactly as the DuckDB oracle writes it (last-ULP
        # parity for the exact hash).
        fc = (
            F.lit(2.0) * F.col("__ses") - F.col("__ses2")
            + F.col(h_col)
            * (F.lit(alpha) / (F.lit(1.0) - F.lit(alpha)))
            * (F.col("__ses") - F.col("__ses2"))
        )
        parts.append(
            bj.select(
                *ks,
                F.lit("brown").alias(method_col),
                F.col(h_col),
                F.col(out_ts),
                fc.cast("double").alias(out_col),
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
                hs[out_ts],
                F.col("__tv").cast("double").alias(out_col),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def croston_forecast(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    interval: int,
    unit: str,
    alpha: float = 0.1,
    variant: str = "classic",
    out_col: str = "forecast",
) -> DataFrame:
    """Croston's method (Croston 1972) for INTERMITTENT series — demand
    streams that are mostly zero (sparse error bursts, per-user purchase
    days, slow-moving parts). Averaging or plain SES over such a series
    smears the zeros into a meaningless low level; Croston instead
    smooths two separate sequences over the DEMAND rows only:

        z_hat = SES(alpha) over the nonzero demand sizes
        p_hat = SES(alpha) over the inter-demand intervals (in grid
                steps of ``interval x unit``; defined from the 2nd
                demand on, initialized at the first interval)
        yhat  = z_hat / p_hat        demand per grid period, flat ahead

    ``variant="sba"`` applies the Syntetos-Boylan (2005) bias correction
    ``(1 - alpha/2) * z_hat / p_hat``.

    The input is the SPARSE representation — only rows with demand
    (value != 0) need exist; absent grid rows ARE the zeros, measured
    through the timestamp gaps. No gap-fill, no dense grid: exactly what
    a 100 TB mostly-zero stream wants.

    Both smoothers use the closed-form SES weighted sum (module
    docstring), and the interval sequence's reversed index is just the
    running count of non-null gaps in the same descending sort — so the
    whole method is ONE window pass over one per-key sort plus one hash
    aggregate. No recurrence, no Python.

    Output: one row per key — n_demands, z_hat, p_hat, ``out_col``.
    Keys with a single demand have no interval to smooth: null p_hat and
    forecast (the method is undefined there, not zero).
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"croston requires 0 < alpha <= 1, got {alpha}")
    if variant not in ("classic", "sba"):
        raise ValueError(f"variant must be 'classic' or 'sba', got {variant!r}")
    u = normalize_unit(unit)
    if is_calendar_unit(u):
        raise ValueError(
            "croston measures intervals in fixed-width grid steps; "
            "calendar units (month/quarter/year) are not supported"
        )
    step_ms = float(interval * milliseconds_in(u))

    v = F.col(value_col).cast("double")
    ms = to_epoch_millis(ts_col)
    d = df.filter(v.isNotNull() & (v != 0)).select(
        *ks, ms.alias("__ms"), v.alias("__v")
    )

    w_asc = Window.partitionBy(*ks).orderBy(F.col("__ms").asc())
    w_desc = Window.partitionBy(*ks).orderBy(F.col("__ms").desc())
    whole = w_desc.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    run_desc = w_desc.rowsBetween(Window.unboundedPreceding, 0)

    # materialize the gap first: it is a window expression itself (lag),
    # and window functions can't nest inside the count windows below
    d = d.withColumn(
        "__gap",
        (F.col("__ms") - F.lag("__ms").over(w_asc)) / F.lit(step_ms),
    )
    gap = F.col("__gap")
    rn = F.row_number().over(w_desc)  # 1 = newest demand
    n = F.count(F.lit(1)).over(whole)
    # reversed index within the interval subsequence: running count of
    # non-null gaps from the series end (newest interval = 1)
    rn_p = F.count(gap).over(run_desc)
    n_p = F.count(gap).over(whole)

    wz = F.when(
        rn == n, F.pow(F.lit(1.0 - alpha), n - 1)
    ).otherwise(F.lit(alpha) * F.pow(F.lit(1.0 - alpha), rn - 1))
    wp = F.when(
        rn_p == n_p, F.pow(F.lit(1.0 - alpha), n_p - 1)
    ).otherwise(F.lit(alpha) * F.pow(F.lit(1.0 - alpha), rn_p - 1))

    terms = d.select(
        *ks,
        (wz * F.col("__v")).alias("__wz"),
        F.when(gap.isNotNull(), wp * gap).alias("__wp"),
    )
    agg = terms.groupBy(*ks).agg(
        F.count(F.lit(1)).alias("n_demands"),
        F.sum("__wz").alias("z_hat"),
        F.sum("__wp").alias("p_hat"),
    )
    fc = F.col("z_hat") / F.col("p_hat")
    if variant == "sba":
        fc = (F.lit(1.0) - F.lit(alpha) / F.lit(2.0)) * fc
    return agg.withColumn(out_col, fc)


def backtest_accuracy(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    test_steps: int,
    interval: int,
    unit: str,
    methods: tuple[str, ...] | list[str] = ("mean", "naive", "drift"),
    season_length: int | None = None,
    alpha: float = 0.3,
    method_col: str = "method",
    holt_params: dict | None = None,
    ar_params: dict | None = None,
) -> DataFrame:
    """fpp3 §5.8 accuracy evaluation: hold out each key's last
    ``test_steps`` observations, forecast them from the remaining
    training prefix with the benchmark methods, and score per
    (keys, method):

    - MAE  = mean |e|, RMSE = sqrt(mean e^2), MAPE = mean |100 e / y|
    - MASE = MAE / Q, Q = in-sample one-step (seasonal-)naive MAE over
      the TRAINING data (scale m = season_length if snaive is among the
      methods, else 1), making scores comparable across series.

    Everything is window/aggregate algebra: one row_number window splits
    train/test, forecasts come from ``benchmark_forecast``, the join back
    to test actuals is a (keys, ts) equi-join of two key-partitioned
    frames, and the scale Q is one lag window + aggregate over train.
    Regular-grid input contract, like the forecaster.

    ``holt_params`` (e.g. ``{"alpha": 0.8, "beta": 0.2, "phi": 1.0}``)
    and ``ar_params`` (e.g. ``{"p": 2}``) additionally score
    ``holt_forecast`` / ``ar_forecast`` on the same train/test split —
    their long output unions straight into the benchmark frame, so they
    compete under identical MAE/RMSE/MAPE/MASE scoring.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    ms = to_epoch_millis(ts_col)
    scale_m = int(season_length) if (
        season_length and "snaive" in methods
    ) else 1

    w_desc = Window.partitionBy(*ks).orderBy(ms.desc())
    marked = df.withColumn("__rnd", F.row_number().over(w_desc))
    train = marked.filter(F.col("__rnd") > test_steps).drop("__rnd")
    test = marked.filter(F.col("__rnd") <= test_steps).select(
        *ks,
        ms.alias("__tms"),
        F.col(value_col).cast("double").alias("__actual"),
    )

    fc = benchmark_forecast(
        train, ks, ts_col, value_col, test_steps, interval, unit,
        methods=methods, season_length=season_length, alpha=alpha,
        method_col=method_col, out_ts="__fts", out_col="__fc",
    )
    if holt_params is not None:
        fc = fc.unionByName(
            holt_forecast(
                train, ks, ts_col, value_col, test_steps, interval, unit,
                method_col=method_col, out_ts="__fts", out_col="__fc",
                **holt_params,
            )
        )
    if ar_params is not None:
        fc = fc.unionByName(
            ar_forecast(
                train, ks, ts_col, value_col, test_steps, interval, unit,
                method_col=method_col, out_ts="__fts", out_col="__fc",
                **ar_params,
            )
        )
    joined = fc.join(
        test,
        [*[fc[k] == test[k] for k in ks],
         to_epoch_millis(fc["__fts"]) == test["__tms"]],
    ).select(
        *[fc[k] for k in ks],
        F.col(method_col),
        (F.col("__actual") - F.col("__fc")).alias("__e"),
        F.col("__actual"),
    )
    err = joined.groupBy(*ks, method_col).agg(
        F.avg(F.abs(F.col("__e"))).alias("mae"),
        F.sqrt(F.avg(F.col("__e") * F.col("__e"))).alias("rmse"),
        # MAPE is undefined on zero actuals (fpp3 §5.8): null them out of
        # the mean rather than raising under ANSI mode
        F.avg(
            F.abs(F.try_divide(100.0 * F.col("__e"), F.col("__actual")))
        ).alias("mape"),
    )
    # in-sample (seasonal-)naive MAE on train — the MASE denominator
    w_asc = Window.partitionBy(*ks).orderBy(ms.asc())
    v = F.col(value_col).cast("double")
    insample = train.select(
        *ks, F.abs(v - F.lag(v, scale_m).over(w_asc)).alias("__q")
    )
    q = insample.groupBy(*ks).agg(F.avg("__q").alias("__Q"))
    return err.join(q, ks).select(
        *ks, method_col, "mae", "rmse", "mape",
        # a flat training series has Q = 0 -> MASE undefined (null)
        F.try_divide(F.col("mae"), F.col("__Q")).alias("mase"),
    )


def holt_forecast(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    horizon: int,
    interval: int,
    unit: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    phi: float = 1.0,
    method_col: str = "method",
    h_col: str = "h",
    out_ts: str = "ts",
    out_col: str = "forecast",
) -> DataFrame:
    """Holt's linear-trend method (Holt 1957; fpp3 ch. 8.2) with the
    optional damped trend (Gardner & McKenzie 1985; ``phi < 1``) — the
    GENERAL two-parameter member whose equal-parameter special case is
    Brown's DES above. The recurrence

        l_t = a*y_t + (1-a)*(l_{t-1} + phi*b_{t-1})
        b_t = B*(l_t - l_{t-1}) + (1-B)*phi*b_{t-1}
        yhat_{T+h} = l_T + (phi + ... + phi^h) * b_T

    is a LINEAR state recursion s_t = F s_{t-1} + g y_t with the fixed
    2x2 companion matrix F = [[1-a, (1-a)phi], [-aB, phi(1-aB)]] and
    g = (a, aB), so it unrolls exactly:

        s_T = F^(T-2) s_2 + sum_{t=3..T} F^(T-t) g y_t,

    s_2 = (y_2, y_2 - y_1) (classical two-point initialization). By
    Cayley-Hamilton every power collapses to F^j = p_j F + q_j I where
    the SCALAR sequences (p_j, q_j) have closed forms picked driver-side
    from the discriminant of F's characteristic polynomial:

        real distinct l1 != l2:  p_j = (l1^j - l2^j)/(l1 - l2)
                                 q_j = (l1 l2^j - l2 l1^j)/(l1 - l2)
        complex r e^(+-i th):    p_j = r^(j-1) sin(j th)/sin th
                                 q_j = -r^j sin((j-1) th)/sin th
        repeated l:              p_j = j l^(j-1),  q_j = (1-j) l^j

    so the weight of the j-th-newest observation on (l_T, b_T) is the
    plain scalar expression p_j*(F g) + q_j*g — ONE row_number window
    over one per-key sort plus ONE hash aggregate, the exact shape of
    SES/Brown/Theta. No recurrence, no Python. Every |eigenvalue| <= 1
    for a in (0,1], B in [0,1], phi in (0,1] (|l1 l2| = phi(1-a),
    l1+l2 = (1-a) + phi(1-aB)), and all powers use NON-negative
    exponents of those decaying bases, so nothing overflows however long
    the series — the same property that makes the SES closed form safe.

    Input contract: regular grid, unique (key, ts) per row (compose with
    ``resample_to_regular_grid``), NULL values ignored — identical to
    ``benchmark_forecast``. Keys with T < 2 have no trend to initialize:
    null forecast. Output long: (keys..., method, h, ts, forecast) with
    method = 'holt' (phi = 1) or 'holt_damped', unionable with
    ``benchmark_forecast``.
    """
    import math

    ks = [keys] if isinstance(keys, str) else list(keys)
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"holt requires 0 < alpha <= 1, got {alpha}")
    if not (0.0 <= beta <= 1.0):
        raise ValueError(f"holt requires 0 <= beta <= 1, got {beta}")
    if not (0.0 < phi <= 1.0):
        raise ValueError(f"holt requires 0 < phi <= 1, got {phi}")
    u = normalize_unit(unit)

    tr = (1.0 - alpha) + phi * (1.0 - alpha * beta)
    det = phi * (1.0 - alpha)
    disc = tr * tr - 4.0 * det

    def pq(j):
        """(p_j, q_j) with F^j = p_j F + q_j I, as expressions of the
        integral non-negative column j (branch fixed driver-side)."""
        if disc > 1e-12:
            sq = math.sqrt(disc)
            l1, l2 = (tr + sq) / 2.0, (tr - sq) / 2.0
            p = (F.pow(F.lit(l1), j) - F.pow(F.lit(l2), j)) / F.lit(l1 - l2)
            q = (
                F.lit(l1) * F.pow(F.lit(l2), j)
                - F.lit(l2) * F.pow(F.lit(l1), j)
            ) / F.lit(l1 - l2)
        elif disc < -1e-12:
            r = math.sqrt(det)
            th = math.acos(tr / (2.0 * r))
            s = math.sin(th)
            p = F.pow(F.lit(r), j - 1) * F.sin(j * F.lit(th)) / F.lit(s)
            q = -F.pow(F.lit(r), j) * F.sin((j - 1) * F.lit(th)) / F.lit(s)
        else:
            lam = tr / 2.0
            p = F.when(j == F.lit(0), F.lit(0.0)).otherwise(
                j * F.pow(F.lit(lam), j - 1)
            )
            q = (F.lit(1.0) - j) * F.pow(F.lit(lam), j)
        return p, q

    # constant 2-vectors, computed once: g, Fg, and F applied to the two
    # initialization directions c2 = (1,1) (y_2's share of s_2) and
    # c1 = (0,1) (y_1's share, negated)
    g0, g1 = alpha, alpha * beta
    fg0 = (1.0 - alpha) * alpha + (1.0 - alpha) * phi * alpha * beta
    fg1 = -alpha * beta * alpha + phi * (1.0 - alpha * beta) * alpha * beta
    fc2_0 = (1.0 - alpha) * (1.0 + phi)
    fc2_1 = -alpha * beta + phi * (1.0 - alpha * beta)
    fc1_0 = (1.0 - alpha) * phi
    fc1_1 = phi * (1.0 - alpha * beta)

    v = F.col(value_col).cast("double")
    ms = to_epoch_millis(ts_col)
    d = df.filter(v.isNotNull()).select(*ks, ms.alias("__ms"), v.alias("__v"))

    w_desc = Window.partitionBy(*ks).orderBy(F.col("__ms").desc())
    whole = w_desc.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rn = F.row_number().over(w_desc)  # 1 = last observation
    n = F.count(F.lit(1)).over(whole)

    p_s, q_s = pq((rn - 1).cast("double"))  # sum rows: j = rn - 1
    p_i, q_i = pq((n - 2).cast("double"))  # init rows: j = T - 2
    wl = (
        F.when(rn == n, -(p_i * F.lit(fc1_0)))
        .when(rn == n - 1, p_i * F.lit(fc2_0) + q_i)
        .otherwise(p_s * F.lit(fg0) + q_s * F.lit(g0))
    )
    wb = (
        F.when(rn == n, -(p_i * F.lit(fc1_1) + q_i))
        .when(rn == n - 1, p_i * F.lit(fc2_1) + q_i)
        .otherwise(p_s * F.lit(fg1) + q_s * F.lit(g1))
    )
    terms = d.select(
        *ks,
        (wl * F.col("__v")).alias("__wl"),
        (wb * F.col("__v")).alias("__wb"),
        F.struct(F.col("__ms").alias("t"), F.col("__v").alias("v")).alias(
            "__o"
        ),
    )
    agg = terms.groupBy(*ks).agg(
        F.count(F.lit(1)).alias("__T"),
        F.sum("__wl").alias("__l"),
        F.sum("__wb").alias("__b"),
        F.max("__o").alias("__last"),
    )

    hs = agg.withColumn(h_col, F.explode(F.sequence(F.lit(1), F.lit(horizon))))
    if is_calendar_unit(u):
        months_per = months_in(u) * interval
        stepped_date = F.add_months(
            F.timestamp_millis(F.col("__last.t")).cast("date"),
            F.col(h_col) * F.lit(months_per),
        )
        future_ts = F.timestamp_millis(
            F.unix_millis(stepped_date.cast("timestamp"))
            + F.pmod(F.col("__last.t"), F.lit(86_400_000))
        )
    else:
        step_ms = interval * milliseconds_in(u)
        future_ts = F.timestamp_millis(
            F.col("__last.t") + F.col(h_col) * F.lit(step_ms)
        )

    if phi == 1.0:
        mult = F.col(h_col).cast("double")
        method = "holt"
    else:
        mult = F.lit(phi) * (
            F.lit(1.0) - F.pow(F.lit(phi), F.col(h_col))
        ) / F.lit(1.0 - phi)
        method = "holt_damped"
    fc = F.when(
        F.col("__T") >= 2, F.col("__l") + mult * F.col("__b")
    )
    return hs.select(
        *ks,
        F.lit(method).alias(method_col),
        F.col(h_col),
        future_ts.alias(out_ts),
        fc.cast("double").alias(out_col),
    )


def ar_forecast(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    horizon: int,
    interval: int,
    unit: str,
    p: int = 2,
    method_col: str = "method",
    h_col: str = "h",
    out_ts: str = "ts",
    out_col: str = "forecast",
) -> DataFrame:
    """AR(p) forecasts by Yule-Walker (fpp3 ch. 9's autoregression,
    method-of-moments fit): estimate the autoregressive coefficients
    from the series' own autocorrelations and iterate the recursion on
    mean deviations,

        d_{T+h} = phi_1 d_{T+h-1} + ... + phi_p d_{T+h-p},
        yhat_{T+h} = mu + d_{T+h}.

    ``p`` in {1, 2} uses the CLOSED-FORM Yule-Walker solutions

        p=1: phi_1 = r_1
        p=2: phi_1 = r_1 (1 - r_2) / (1 - r_1^2),
             phi_2 = (r_2 - r_1^2) / (1 - r_1^2)

    so the whole fit is ONE window pass (mean-centering + lag products —
    the ACF plan class) + ONE hash aggregate per key; the horizon
    recursion unrolls into ``horizon`` chained column expressions on the
    tiny per-key frame and posexplodes to long output. No Python, no
    linear solver. (Higher p needs the Durbin-Levinson kernel ``pacf``
    already uses over the tiny ACF frame — out of scope here, where the
    point is the pure-plan fit.)

    Input contract: regular grid, unique (key, ts), NULL/NaN values
    dropped (the series compacts, matching ``acf``). Keys with fewer
    than p+2 observations, zero variance, or a degenerate r_1^2 = 1 get
    null forecasts. Output long: (keys..., method='ar{p}', h, ts,
    forecast), unionable with ``benchmark_forecast``/``holt_forecast``.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    if p not in (1, 2):
        raise ValueError(
            f"ar_forecast supports p in {{1, 2}} (closed-form Yule-Walker);"
            f" got {p}. Higher orders go through the pacf kernel."
        )
    u = normalize_unit(unit)

    v = F.col(value_col).cast("double")
    ms = to_epoch_millis(ts_col)
    base = df.filter(v.isNotNull() & ~F.isnan(v)).select(
        *ks, ms.alias("__ms"), v.alias("__v")
    )
    w = Window.partitionBy(*ks).orderBy("__ms")
    whole = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_desc = Window.partitionBy(*ks).orderBy(F.col("__ms").desc())
    yc = F.col("__v") - F.avg("__v").over(whole)
    rn = F.row_number().over(w_desc)  # 1 = last observation
    prods = base.select(
        *ks,
        "__v",
        "__ms",
        rn.alias("__rn"),
        (yc * yc).alias("__p0"),
        *[
            (yc * F.lag(yc, k).over(w)).alias(f"__p{k}")
            for k in range(1, p + 1)
        ],
    )
    agg = prods.groupBy(*ks).agg(
        F.count(F.lit(1)).alias("__T"),
        F.avg("__v").alias("__mu"),
        F.max("__ms").alias("__last_ms"),
        F.sum("__p0").alias("__denom"),
        *[F.sum(f"__p{k}").alias(f"__n{k}") for k in range(1, p + 1)],
        F.max(F.when(F.col("__rn") == 1, F.col("__v"))).alias("__y1"),
        F.max(F.when(F.col("__rn") == 2, F.col("__v"))).alias("__y2"),
    )
    r1 = F.try_divide(F.col("__n1"), F.col("__denom"))
    if p == 1:
        phi1, phi2 = r1, F.lit(0.0)
    else:
        r2 = F.try_divide(F.col("__n2"), F.col("__denom"))
        one_minus = F.lit(1.0) - r1 * r1
        phi1 = F.try_divide(r1 * (F.lit(1.0) - r2), one_minus)
        phi2 = F.try_divide(r2 - r1 * r1, one_minus)
    frame = agg.select(
        *ks,
        "__T",
        "__mu",
        "__last_ms",
        phi1.alias("__f1"),
        phi2.alias("__f2"),
        (F.col("__y1") - F.col("__mu")).alias("__d0"),
        (F.col("__y2") - F.col("__mu")).alias("__dm1"),
    )
    # unroll the recursion: d_h named columns chained on the tiny frame
    names = []
    prev, prev2 = F.col("__d0"), F.col("__dm1")
    for h in range(1, horizon + 1):
        name = f"__dh{h}"
        frame = frame.withColumn(
            name, F.col("__f1") * prev + F.col("__f2") * prev2
        )
        prev2, prev = prev, F.col(name)
        names.append(name)

    hs = frame.select(
        *ks,
        "__T",
        "__mu",
        "__last_ms",
        F.posexplode(F.array(*[F.col(n) for n in names])).alias(
            "__pos", "__d"
        ),
    ).withColumn(h_col, (F.col("__pos") + 1).cast("int"))

    if is_calendar_unit(u):
        months_per = months_in(u) * interval
        stepped_date = F.add_months(
            F.timestamp_millis(F.col("__last_ms")).cast("date"),
            F.col(h_col) * F.lit(months_per),
        )
        future_ts = F.timestamp_millis(
            F.unix_millis(stepped_date.cast("timestamp"))
            + F.pmod(F.col("__last_ms"), F.lit(86_400_000))
        )
    else:
        step_ms = interval * milliseconds_in(u)
        future_ts = F.timestamp_millis(
            F.col("__last_ms") + F.col(h_col) * F.lit(step_ms)
        )
    fc = F.when(
        F.col("__T") >= p + 2, F.col("__mu") + F.col("__d")
    )
    return hs.select(
        *ks,
        F.lit(f"ar{p}").alias(method_col),
        F.col(h_col),
        future_ts.alias(out_ts),
        fc.cast("double").alias(out_col),
    )


def holt_winters_forecast(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    horizon: int,
    interval: int,
    unit: str,
    season_length: int,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.1,
    method_col: str = "method",
    h_col: str = "h",
    out_ts: str = "ts",
    out_col: str = "forecast",
) -> DataFrame:
    """Holt-Winters additive seasonal forecasts (Winters 1960; fpp3 ch.
    8.3) — the triple-exponential member that completes the family above
    (SES -> Brown -> Holt -> +seasonality). The state is (level, trend,
    m seasonals) with the classical initialization:

        l = mean(y[0:m]); b = (mean(y[m:2m]) - mean(y[0:m])) / m
        s_j = y_j - l for the first season

    then for t = m..T:  l_t = a*(y_t - s_{t-m}) + (1-a)*(l_{t-1}+b_{t-1});
    b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1};
    s_t = g*(y_t - l_{t-1} - b_{t-1}) + (1-g)*s_{t-m};
    yhat_{T+h} = l_T + h*b_T + s_{T+h-m*(floor((h-1)/m)+1)}.

    Unlike Holt's 2x2 companion matrix (whose powers have a two-term
    closed form — see holt_forecast), the (2+m)-dimensional state matrix
    has no practical closed-form power, so this one runs as the
    sanctioned Arrow kernel over ``grouped_apply_stream``: the input is
    the per-key BUCKETED series (tiny — one row per grid step, the same
    frames benchmark_forecast aggregates), never raw events, and the
    recurrence is a numpy loop over it. Null/NaN observations are
    dropped first (series compacts, like acf); a key with fewer than
    2*season_length valid points emits nothing (initialization needs two
    full seasons). Output matches the family: (keys..., method
    'holt_winters', h, ts, forecast); future timestamps step in metric
    millis or calendar months exactly like benchmark_forecast.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    m = int(season_length)
    if m < 2:
        raise ValueError(f"season_length must be >= 2, got {season_length}")
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    for name, p in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
        if not (0.0 < p < 1.0):
            raise ValueError(f"{name} must be in (0, 1), got {p}")
    u = normalize_unit(unit)
    calendar = is_calendar_unit(u)
    months_per = months_in(u) * interval if calendar else 0
    step_ms = 0 if calendar else interval * milliseconds_in(u)

    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from tablecloth_time_spark.operators._grouped import grouped_apply_stream

    slim = df.select(*ks, ts_col, value_col)
    key_fields = [f for f in slim.schema.fields if f.name in ks]
    ts_field = next(f for f in slim.schema.fields if f.name == ts_col)
    schema = StructType(
        key_fields
        + [
            StructField(method_col, StringType()),
            StructField(h_col, IntegerType()),
            StructField(out_ts, ts_field.dataType),
            StructField(out_col, DoubleType()),
        ]
    )
    empty = pd.DataFrame({f.name: pd.Series(dtype="object") for f in schema.fields})

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        y_all = pd.to_numeric(g[value_col], errors="coerce").to_numpy(
            dtype=np.float64
        )
        valid = ~np.isnan(y_all)
        y = y_all[valid]
        n = len(y)
        if n < 2 * m:
            return empty
        last_ts = pd.Timestamp(g[ts_col].to_numpy()[valid][-1])
        l = float(np.mean(y[:m]))
        b = float((np.mean(y[m : 2 * m]) - np.mean(y[:m])) / m)
        s = np.empty(n, dtype=np.float64)
        s[:m] = y[:m] - l
        for t in range(m, n):
            l_prev, b_prev = l, b
            l = alpha * (y[t] - s[t - m]) + (1.0 - alpha) * (l_prev + b_prev)
            b = beta * (l - l_prev) + (1.0 - beta) * b_prev
            s[t] = gamma * (y[t] - l_prev - b_prev) + (1.0 - gamma) * s[t - m]
        rows = []
        for h in range(1, horizon + 1):
            k_back = (h - 1) // m + 1
            s_h = s[n - 1 + h - m * k_back]
            if calendar:
                ts_h = last_ts + pd.DateOffset(months=h * months_per)
            else:
                ts_h = last_ts + pd.Timedelta(milliseconds=h * step_ms)
            rows.append(
                {
                    **{k: g[k].iloc[0] for k in ks},
                    method_col: "holt_winters",
                    h_col: h,
                    out_ts: ts_h,
                    out_col: float(l + h * b + s_h),
                }
            )
        return pd.DataFrame(rows)

    return grouped_apply_stream(slim, ks, [ts_col], kernel, schema)
