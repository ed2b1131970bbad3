"""Monitoring-style series math: counter rates, time-weighted means, EWMA,
gap detection, time-in-state tallies.

These are the operators a metrics/observability user of the reference's
resample recipe reaches for next (Prometheus ``rate``/``increase``,
TimescaleDB ``time_weight``): the reference stops at plain group-by
aggregates (README.md:20-36 recipe), so these extend SURVEY.md §2 with the
irregular-sampling-aware forms, all as pure window/aggregate expressions —
one Exchange on the key, whole-stage codegen, no Python.

Scale notes (100 TB):

- every operator here is ONE shuffle on the series key followed by an
  in-partition sorted pass (the same plan class as ``sessionize`` /
  ``asof_join``) or a partial/final hash aggregate — linear, AQE-friendly;
- ``ewma`` looks like a sequential recurrence but is expressible as prefix
  sums after the current-row decay factor cancels between numerator and
  denominator; segment-anchored exponents keep the weights finite, so it
  too is pure window expressions (see its docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tablecloth_time_spark.functions.timeops import down_to_nearest, to_epoch_millis
from tablecloth_time_spark.functions.units import milliseconds_in, normalize_unit


def _keys(keys: str | list[str]) -> list[str]:
    return [keys] if isinstance(keys, str) else list(keys)


def counter_rate(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    order_cols: list[str] | None = None,
    reset_aware: bool = True,
    delta_col: str = "delta",
    rate_col: str = "rate_per_s",
) -> DataFrame:
    """Per-sample increase and per-second rate of a (possibly resetting)
    cumulative counter.

    Prometheus ``increase``/``rate`` semantics on raw samples: the delta to
    the previous sample of the same key; when the counter went DOWN the
    counter is assumed to have reset to zero since the last sample, so the
    increase is the current value itself (``reset_aware=True``). The first
    sample of a key has no predecessor -> null delta/rate.

    Pure ``lag`` window exprs: one Exchange on ``keys``, one ordered pass.
    """
    ks = _keys(keys)
    order_cols = order_cols or []
    w = Window.partitionBy(*ks).orderBy(ts_col, *order_cols)
    v = F.col(value_col).cast("double")
    prev_v = F.lag(v).over(w)
    ms = to_epoch_millis(ts_col)
    dt_s = (ms - F.lag(ms).over(w)).cast("double") / F.lit(1000.0)
    raw = v - prev_v
    delta = (
        F.when(prev_v.isNull(), F.lit(None).cast("double"))
        .when(raw < 0, v)  # counter reset: everything since the reset
        .otherwise(raw)
        if reset_aware
        else raw
    )
    delta = delta.alias(delta_col)
    rate = (
        F.when(dt_s > 0, F.col(delta_col) / dt_s)
        .otherwise(F.lit(None).cast("double"))
        .alias(rate_col)
    )
    return df.withColumn(delta_col, delta).withColumn(rate_col, rate)


def counter_increase(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    interval: int,
    unit: str,
    order_cols: list[str] | None = None,
    reset_aware: bool = True,
    bucket_col: str = "bucket",
    increase_col: str = "increase",
) -> DataFrame:
    """Per-(keys, time bucket) total counter increase — Prometheus
    ``increase`` at rollup granularity, the tierable companion of
    :func:`counter_rate` (whose per-sample deltas these buckets sum).

    Reset semantics are counter_rate's: a sample lower than its
    predecessor means the counter restarted, so that sample contributes
    its own value. Each delta is attributed to the bucket CONTAINING the
    sample that observed it — growth across a bucket boundary lands in
    the later bucket (where it became visible), matching how a scrape-
    based monitor accounts it. A key's first sample has no predecessor
    and contributes nothing; a bucket holding only such samples reports
    NULL increase (unknown, not zero) with its sample count.

    Plan: ONE Exchange total (pinned) — the (keys, bucket) hash
    aggregate's clustering requirement is satisfied by the lag window's
    hash partitioning on ``keys`` alone, so Catalyst plans no second
    shuffle. The aggregate is mergeable, so these bucket increases
    cascade across retention tiers like any other tier (summing bucket
    increases IS the coarser bucket's increase — pinned in tests).
    """
    ks = _keys(keys)
    d = counter_rate(
        df, ks, ts_col, value_col, order_cols, reset_aware,
        delta_col="__delta", rate_col="__rate",
    )
    return d.groupBy(
        *ks, down_to_nearest(ts_col, interval, unit).alias(bucket_col)
    ).agg(
        F.sum("__delta").alias(increase_col),
        F.count(F.lit(1)).alias("n_samples"),
    )


def time_weighted_avg(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    interval: int,
    unit: str = "hour",
    order_cols: list[str] | None = None,
    bucket_col: str = "bucket",
    out_col: str = "twa",
) -> DataFrame:
    """Time-weighted average per (keys, bucket) under LOCF weighting.

    Irregular samples make a plain ``avg`` lie (a value held for 50 minutes
    counts the same as one held for 10 seconds). This is the
    TimescaleDB-``time_weight('LOCF')``-style correction over the observed
    span of each bucket: each sample's weight is the time until the NEXT
    sample in the bucket, the last sample gets weight 0, and

        twa = sum(v_i * (t_{i+1} - t_i)) / (t_last - t_first)

    A single-sample bucket (no span) degenerates to its value — pinned as
    first-by-(``__ms``, *order_cols) via struct-min, so zero-span buckets
    with duplicate timestamps but distinct values stay deterministic (pass
    the same tie-break columns the window ordering uses).

    Shape: one window pass for ``lead`` within (keys, bucket) + one
    partial/final hash aggregate — the weights never leave the executors.
    """
    ks = _keys(keys)
    order_cols = order_cols or []
    bucket = down_to_nearest(ts_col, interval, unit).alias(bucket_col)
    base = df.select(*ks, F.col(value_col).cast("double").alias("__v"), bucket,
                     to_epoch_millis(ts_col).alias("__ms"), *order_cols)
    w = Window.partitionBy(*ks, bucket_col).orderBy("__ms", *order_cols)
    weighted = base.select(
        *ks,
        bucket_col,
        "__v",
        "__ms",
        *order_cols,
        (F.lead("__ms").over(w) - F.col("__ms")).cast("double").alias("__w"),
    )
    agg = weighted.groupBy(*ks, bucket_col).agg(
        F.sum(F.col("__v") * F.col("__w")).alias("__num"),
        F.sum("__w").alias("__den"),
        F.min(
            F.struct(F.col("__ms"), *[F.col(c) for c in order_cols], F.col("__v"))
        ).alias("__first"),
    )
    return agg.select(
        *ks,
        bucket_col,
        F.when(F.col("__den") > 0, F.col("__num") / F.col("__den"))
        .otherwise(F.col("__first").getField("__v"))
        .alias(out_col),
    )


def detect_gaps(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    threshold: int,
    unit: str = "minute",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Gaps in a series: pairs of consecutive samples of the same key more
    than ``threshold`` units apart.

    Output: one row per gap — (keys..., gap_start, gap_end, gap_s). This is
    the query a retention/backfill pipeline runs to find missing spans
    before gap-filling them (operators/gapfill.py); a pure ``lag`` window +
    filter, so at 100 TB it costs one shuffle on the key and the filter
    discards in-threshold rows executor-side.
    """
    ks = _keys(keys)
    order_cols = order_cols or []
    thresh_ms = threshold * milliseconds_in(normalize_unit(unit))
    w = Window.partitionBy(*ks).orderBy(ts_col, *order_cols)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    with_prev = df.select(
        *ks,
        prev_ts.alias("gap_start"),
        F.col(ts_col).alias("gap_end"),
        (to_epoch_millis(ts_col) - to_epoch_millis(prev_ts)).alias("__gap_ms"),
    )
    return with_prev.filter(F.col("__gap_ms") > thresh_ms).select(
        *ks,
        "gap_start",
        "gap_end",
        (F.col("__gap_ms").cast("double") / 1000.0).alias("gap_s"),
    )


def ewma(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    value_col: str,
    halflife: int,
    unit: str = "minute",
    order_cols: list[str] | None = None,
    out_col: str = "ewma",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Time-decay exponentially weighted moving average per key (adjusted
    form): for each sample,

        ewma_i = sum_{j<=i} 0.5^((t_i - t_j)/halflife) * x_j
                 / sum_{j<=i} 0.5^((t_i - t_j)/halflife)

    The recurrence LOOKS inherently sequential, but the current-row factor
    cancels between numerator and denominator:

        0.5^((t_i - t_j)/h) = 0.5^(t_i/h) * 2^(t_j/h)

    so ewma_i = sum(2^(u_j) x_j) / sum(2^(u_j)) over j<=i with u = t/h —
    plain prefix sums, i.e. a window aggregate. 2^(u_j) overflows for long
    series, so the exponent is anchored per 512-halflife SEGMENT: within a
    segment w = 2^(u - 512*seg) stays in [1, 2^512]; a row's total is its
    within-segment prefix sum plus the TWO most recent closed segments'
    sums, each rescaled by 2^(-512*seg_gap). Two hops, not one: adjacent
    segments' CONTENTS can be arbitrarily close in time (a sample at the
    end of segment k sits 2 halflives from one at the start of k+1), so a
    one-hop carry mis-weights null-row means at boundaries and an
    all-null segment's zero-mass close would displace the real history.
    With both hops kept, everything older sits >= 512 halflives behind
    the older kept segment's mass — dropping it perturbs the mean by
    < 2^-512 relative (sub-ULP) for any series shorter than 2^460 rows
    (the same truncation pandas' segmented ewm performs numerically).
    The whole operator is therefore ONE Exchange on the key plus
    in-partition sorted window passes — no Python, no Arrow crossing.

    Null and NaN values contribute to neither sum (missing data, pandas
    ewm semantics), so such a row reports the previous sample's mean
    (weights rescale by a common factor, leaving the ratio unchanged) —
    matching pandas' NaN carry — except in one documented corner: when
    the whole non-null history is so many segments back that its rescale
    factor 2^(-512*seg_gap) underflows float64 to exactly 0
    (seg_gap*512 + log2(carried weight) < -1074 — possible from ~1025
    halflives, guaranteed beyond 2560), the row reports null rather than
    a fabricated stale mean.
    For VALID samples the distinction is invisible: any history ≥512
    halflives old is sub-ULP next to the row's own weight either way.

    Output: input keys + ``ts_ms`` (epoch millis) + ``value`` + ``out_col``
    (+ any ``carry_cols``, passed through untouched so callers can keep
    row identity / sibling features without a post-join).
    """
    ks = _keys(keys)
    order_cols = order_cols or []
    carry = [c for c in (carry_cols or []) if c not in (*ks, "ts_ms", "value")]
    base = df.select(
        *ks,
        to_epoch_millis(ts_col).alias("ts_ms"),
        F.col(value_col).cast("double").alias("value"),
        *dict.fromkeys([*order_cols, *carry]),
    )
    halflife_ms = int(halflife * milliseconds_in(normalize_unit(unit)))
    seg_w = 512.0  # halflives per anchor segment: 2^dloc <= 2^512 never
    # overflows, one-segment carry is exact below 1 ULP (see docstring)
    seg_ms = 512 * halflife_ms

    # segments anchor at ABSOLUTE epoch multiples of 512 halflives, so seg
    # and the local exponent come from exact integer div/mod (no per-key
    # min pass, full double precision in dloc), and seg is monotone in
    # ts_ms — every window below can share ONE (keys, seg, ts) sort
    seg = F.floor(F.col("ts_ms") / F.lit(seg_ms))
    dloc = (F.col("ts_ms") - seg * F.lit(seg_ms)).cast("double") / F.lit(
        float(halflife_ms)
    )
    w = F.pow(F.lit(2.0), dloc)
    # NaN is missing like null (pandas ewm semantics; acf/ccf filter the
    # same way) — and must be masked out of __wx too, or one NaN sample
    # poisons every later prefix sum of its key
    valid = F.col("value").isNotNull() & ~F.isnan(F.col("value"))
    stepped = base.select(
        "*",
        seg.alias("__seg"),
        F.when(valid, w * F.col("value")).alias("__wx"),
        F.when(valid, w).alias("__wd"),
    )

    order = [F.col("ts_ms"), *[F.col(c) for c in order_cols]]
    # ordering by (seg, ts) is the same physical order as (ts) — seg is
    # ts div constant — but spelling seg first lets Catalyst prove all
    # four window specs are served by the single post-Exchange sort
    wk_ord = Window.partitionBy(*ks).orderBy(F.col("__seg"), *order)
    wseg = Window.partitionBy(*ks, "__seg")
    wseg_pfx = wseg.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    is_last_in_seg = (
        F.lead("__seg", 1).over(wk_ord).isNull()
        | (F.lead("__seg", 1).over(wk_ord) != F.col("__seg"))
    )
    scored = stepped.select(
        "*",
        F.sum("__wx").over(wseg_pfx).alias("__numpfx"),
        F.sum("__wd").over(wseg_pfx).alias("__denpfx"),
        # struct so (seg, num, den) travel atomically through the
        # ignorenulls last() — an all-null-value segment still closes
        # with den=0 instead of letting num/den resolve to different
        # segments
        F.when(
            is_last_in_seg,
            F.struct(
                F.col("__seg").alias("s"),
                F.coalesce(F.sum("__wx").over(wseg), F.lit(0.0)).alias("n"),
                F.coalesce(F.sum("__wd").over(wseg), F.lit(0.0)).alias("d"),
            ),
        ).alias("__close"),
    )
    # TWO-hop carry: a row needs the TWO most recent closed segments, not
    # one. With a single hop, a null-value row whose previous segment has
    # small local mass (samples early in the segment, w ~ 2^0) mis-reports
    # the carried mean by O(1) whenever the pre-previous segment holds
    # late-in-segment mass (w ~ 2^512) — segment boundaries don't imply
    # 512 halflives between the CONTENTS of adjacent segments. And an
    # all-null segment closes with zero mass, turning the next segment's
    # carry into a spurious null. Capturing, at each closing row, that
    # row's own one-hop __prev (the close of the segment before it) gives
    # every row (S_B1, S_B0) for the last two closed segments B1 > B0 over
    # the SAME sort; mass older than B0 is >= 512 halflives behind B0's
    # kept mass, so the dropped tail is < 2^-512 of the kept totals
    # everywhere — the bound the docstring promises. (Regression: the r4
    # review's 511/513/1025-minute corner — one-hop reported 100.0 where
    # the exact carry is 80.0.)
    prev1 = scored.select(
        "*",
        F.last("__close", ignorenulls=True)
        .over(wk_ord.rowsBetween(Window.unboundedPreceding, -1))
        .alias("__prev"),
    )
    closing2 = prev1.select(
        "*",
        F.when(
            F.col("__close").isNotNull(),
            F.struct(
                F.col("__close").alias("c1"), F.col("__prev").alias("c0")
            ),
        ).alias("__close2"),
    )
    carried = closing2.select(
        "*",
        F.last("__close2", ignorenulls=True)
        .over(wk_ord.rowsBetween(Window.unboundedPreceding, -1))
        .alias("__prev2"),
    )

    def hop(c):
        rescale = F.pow(
            F.lit(2.0), (c["s"] - F.col("__seg")).cast("double") * F.lit(seg_w)
        )
        return c["n"] * rescale, c["d"] * rescale

    n1, d1 = hop(F.col("__prev2")["c1"])
    n0, d0 = hop(F.col("__prev2")["c0"])
    num = (
        F.coalesce(F.col("__numpfx"), F.lit(0.0))
        + F.coalesce(n1, F.lit(0.0))
        + F.coalesce(n0, F.lit(0.0))
    )
    den = (
        F.coalesce(F.col("__denpfx"), F.lit(0.0))
        + F.coalesce(d1, F.lit(0.0))
        + F.coalesce(d0, F.lit(0.0))
    )
    out_cols = [f.name for f in base.schema.fields if f.name in (*ks, "ts_ms", "value", *carry)]
    return carried.select(
        *out_cols, F.when(den > F.lit(0.0), num / den).alias(out_col)
    )


def ewma_rows(
    df: DataFrame,
    keys: str | list[str],
    order_cols: list[str],
    value_col: str,
    alpha: float | None = None,
    span: float | None = None,
    halflife_rows: float | None = None,
    out_col: str = "ewma",
) -> DataFrame:
    """Row-index exponentially weighted moving average per key — pandas
    ``ewm(alpha/span/halflife, adjust=True, ignore_na=False).mean()``
    parity, as a PURE window plan (one Exchange, one sorted pass, no
    Python). Exactly one of ``alpha`` / ``span`` / ``halflife_rows``
    selects the decay (pandas' parameterization: alpha = 2/(span+1) =
    1 - 2^(-1/halflife_rows)), with 0 < alpha < 1.

        ewma_i = sum_{j<=i} (1-alpha)^(i-j) * x_j
                 / sum_{j<=i} (1-alpha)^(i-j)      over valid j

    The same decay-factor cancellation as time-decay :func:`ewma` applies
    with the ROW POSITION as the exponent: b^(i-j) = b^i * b^(-j), and
    b^i cancels between numerator and denominator, leaving prefix sums of
    b^(-j)-weighted values. b^(-j) overflows for long series, so the
    exponent anchors per S-row segment with S chosen from the decay rate
    itself:

        S = clamp(floor(150 * ln 2 / -ln(1-alpha)), 1, 2^40)

    which makes the largest within-segment weight b^(-(S-1)) ~ 2^150
    (never overflows) AND the per-segment decay b^S ~ 2^-150 (so the
    two-hop carried history truncation is sub-ULP). The carry itself is
    the ewma() machinery verbatim: per-segment prefix sums + the two most
    recent closed segments' totals rescaled by b^(S*seg_gap). For a VALID
    sample, everything older than both kept segments is >= 2S+1 rows
    back — relative weight < 2^-300 of the row's own — so the truncation
    is invisible; a null-value row reports the carried (previous) mean,
    with the same many-segments-of-nulls staleness corner ewma()
    documents.

    Nulls and NaNs are missing data: they keep their row position (the
    pandas ``ignore_na=False`` default — later weights still step by
    position) but contribute to neither sum. ``adjust=False`` is not
    offered: its recurrence seeds on the first value and renormalizes
    around missing data in a way that is no longer a ratio of prefix
    sums; the adjusted form is the one with clean masked-sum semantics.
    """
    import math as _math

    ks = _keys(keys)
    given = [p is not None for p in (alpha, span, halflife_rows)]
    if sum(given) != 1:
        raise ValueError(
            "ewma_rows: pass exactly one of alpha / span / halflife_rows"
        )
    if span is not None:
        if span < 1:
            raise ValueError(f"ewma_rows: span must be >= 1, got {span}")
        alpha = 2.0 / (span + 1.0)
    elif halflife_rows is not None:
        if halflife_rows <= 0:
            raise ValueError(
                f"ewma_rows: halflife_rows must be > 0, got {halflife_rows}"
            )
        alpha = 1.0 - 2.0 ** (-1.0 / halflife_rows)
    if not (0.0 < alpha < 1.0):
        raise ValueError(f"ewma_rows: need 0 < alpha < 1, got {alpha}")
    b = 1.0 - alpha
    if b >= 1.0:  # alpha below ~1.1e-16 rounds 1-alpha to exactly 1.0
        raise ValueError(
            f"ewma_rows: alpha={alpha} underflows 1-alpha to 1.0 — no decay"
        )
    seg_rows = max(1, min(int(150.0 * _math.log(2.0) / -_math.log(b)), 2**40))

    base = df.select(
        "*", F.col(value_col).cast("double").alias("__x")
    )
    wk = Window.partitionBy(*ks).orderBy(*order_cols)
    # 0-based row position; exact integer div/mod anchor per segment
    pos = F.row_number().over(wk) - F.lit(1)
    seg = F.floor(pos / F.lit(seg_rows))
    dloc = (pos - seg * F.lit(seg_rows)).cast("double")
    w = F.pow(F.lit(1.0 / b), dloc)
    valid = F.col("__x").isNotNull() & ~F.isnan(F.col("__x"))
    stepped = base.select(
        "*",
        seg.alias("__seg"),
        F.when(valid, w * F.col("__x")).alias("__wx"),
        F.when(valid, w).alias("__wd"),
    )

    wk_ord = Window.partitionBy(*ks).orderBy(F.col("__seg"), *order_cols)
    wseg = Window.partitionBy(*ks, "__seg")
    wseg_pfx = wseg.orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    is_last_in_seg = (
        F.lead("__seg", 1).over(wk_ord).isNull()
        | (F.lead("__seg", 1).over(wk_ord) != F.col("__seg"))
    )
    scored = stepped.select(
        "*",
        F.sum("__wx").over(wseg_pfx).alias("__numpfx"),
        F.sum("__wd").over(wseg_pfx).alias("__denpfx"),
        F.when(
            is_last_in_seg,
            F.struct(
                F.col("__seg").alias("s"),
                F.coalesce(F.sum("__wx").over(wseg), F.lit(0.0)).alias("n"),
                F.coalesce(F.sum("__wd").over(wseg), F.lit(0.0)).alias("d"),
            ),
        ).alias("__close"),
    )
    prev1 = scored.select(
        "*",
        F.last("__close", ignorenulls=True)
        .over(wk_ord.rowsBetween(Window.unboundedPreceding, -1))
        .alias("__prev"),
    )
    closing2 = prev1.select(
        "*",
        F.when(
            F.col("__close").isNotNull(),
            F.struct(
                F.col("__close").alias("c1"), F.col("__prev").alias("c0")
            ),
        ).alias("__close2"),
    )
    carried = closing2.select(
        "*",
        F.last("__close2", ignorenulls=True)
        .over(wk_ord.rowsBetween(Window.unboundedPreceding, -1))
        .alias("__prev2"),
    )

    def hop(c):
        # b^(S * seg_gap): seg_gap >= 1, so the base is b^S ~ 2^-150 —
        # magnitude <= 1, arbitrarily many segments can't overflow
        rescale = F.pow(
            F.lit(b),
            (F.col("__seg") - c["s"]).cast("double") * F.lit(float(seg_rows)),
        )
        return c["n"] * rescale, c["d"] * rescale

    n1, d1 = hop(F.col("__prev2")["c1"])
    n0, d0 = hop(F.col("__prev2")["c0"])
    num = (
        F.coalesce(F.col("__numpfx"), F.lit(0.0))
        + F.coalesce(n1, F.lit(0.0))
        + F.coalesce(n0, F.lit(0.0))
    )
    den = (
        F.coalesce(F.col("__denpfx"), F.lit(0.0))
        + F.coalesce(d1, F.lit(0.0))
        + F.coalesce(d0, F.lit(0.0))
    )
    drop = ["__x", "__seg", "__wx", "__wd", "__numpfx", "__denpfx",
            "__close", "__prev", "__close2", "__prev2"]
    return carried.select(
        "*", F.when(den > F.lit(0.0), num / den).alias(out_col)
    ).drop(*drop)


def macd(
    df: DataFrame,
    keys: str | list[str],
    order_cols: list[str],
    value_col: str,
    fast_span: int = 12,
    slow_span: int = 26,
    signal_span: int = 9,
) -> DataFrame:
    """MACD (Appel): fast EMA - slow EMA, plus the signal line (EMA of
    the MACD) and the histogram — three :func:`ewma_rows` passes that all
    share ONE (key, order) sort, so the whole indicator is still a single
    Exchange. EMAs here are the adjusted form (pandas default), the
    convention ta-lib calls "EMA with SMA-free warmup"."""
    fast = ewma_rows(df, keys, order_cols, value_col, span=fast_span,
                     out_col="__fast")
    slow = ewma_rows(fast, keys, order_cols, value_col, span=slow_span,
                     out_col="__slow")
    line = slow.select(
        "*", (F.col("__fast") - F.col("__slow")).alias("macd")
    )
    sig = ewma_rows(line, keys, order_cols, "macd", span=signal_span,
                    out_col="macd_signal")
    return sig.select(
        "*", (F.col("macd") - F.col("macd_signal")).alias("macd_hist")
    ).drop("__fast", "__slow")


def state_durations(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    state_col: str,
    interval: int,
    unit: str = "hour",
    order_cols: list[str] | None = None,
    bucket_col: str = "bucket",
    duration_col: str = "duration_ms",
    max_hold: int | None = None,
    max_hold_unit: str = "hour",
) -> DataFrame:
    """Time spent in each state per (keys, time bucket) — the
    TimescaleDB-``state_agg``-style view of a discrete status column
    (transcript roles/tools, device states, job phases) under LOCF
    semantics: a state holds from its sample until the key's next sample.

    ``max_hold`` caps how long one sample's state can be held: a key that
    goes silent for months would otherwise tally its last state across the
    whole gap AND explode that single segment into gap/interval bucket
    rows (a 3-year gap at minute buckets is ~1.6M rows from one sample).
    Pass the staleness horizon your domain trusts; None means unbounded.

    Buckets use floor division on epoch millis — identical to
    ``down_to_nearest`` for post-epoch timestamps (the engine's data
    domain); pre-1970 buckets would floor toward -inf instead of
    truncating toward zero.

    Construction is pure window + aggregate algebra:
    1. ``lead(ts)`` per key over one sort gives each sample's half-open
       segment [ts, next_ts) — the key's LAST sample has no successor and
       contributes no duration (its state is still open);
    2. each segment explodes to the buckets it overlaps (``sequence``,
       executor-side, like interval_join) and clips to bucket bounds;
    3. one map-side-combined hash aggregate sums per (keys, bucket, state).

    Durations are additive (sums), so state tallies cascade across
    retention tiers like any rollup. Null states are kept as a real state
    value only if present in the data (group-by semantics drop null keys
    into their own group per SQL). Per-bucket fractions = duration_ms /
    sum over the bucket (a tiny window on the output if needed).
    """
    if interval < 1:
        raise ValueError(f"interval must be >= 1, got {interval}")
    ks = _keys(keys)
    oc = order_cols or []
    width_ms = interval * milliseconds_in(normalize_unit(unit))
    ms = to_epoch_millis(ts_col)
    w = Window.partitionBy(*ks).orderBy(ms.asc(), *[F.col(c) for c in oc])
    end = F.lead(ms).over(w)
    if max_hold is not None:
        hold_ms = max_hold * milliseconds_in(normalize_unit(max_hold_unit))
        # least() skips nulls — gate on the successor existing so the cap
        # does not resurrect the key's OPEN final segment
        end = F.when(end.isNotNull(), F.least(end, ms + F.lit(hold_ms)))
    seg = df.select(
        *ks,
        F.col(state_col).alias("__state"),
        ms.alias("__s"),
        end.alias("__e"),
    ).filter(F.col("__e").isNotNull() & (F.col("__e") > F.col("__s")))
    exploded = seg.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col("__s") / width_ms),
                F.floor((F.col("__e") - 1) / width_ms),
            )
        ),
    )
    b_lo = F.col("__b") * width_ms
    covered = F.least(F.col("__e"), b_lo + width_ms) - F.greatest(
        F.col("__s"), b_lo
    )
    return (
        exploded.groupBy(
            *ks,
            F.timestamp_millis(b_lo).alias(bucket_col),
            F.col("__state").alias(state_col),
        )
        .agg(F.sum(covered).alias(duration_col))
    )


def slo_burn_rate(
    df: DataFrame,
    keys: str | list[str],
    ts_col: str,
    error_col: str,
    slo: float = 0.999,
    short: tuple[int, str] = (5, "minute"),
    long: tuple[int, str] = (1, "hour"),
    threshold: float = 14.4,
) -> DataFrame:
    """Multi-window SLO burn-rate alerting (the Google SRE Workbook
    recipe): per sample, the trailing error RATIO over a short and a
    long window, each divided by the error budget (1 - slo) to give a
    BURN RATE — "how many times faster than sustainable are we spending
    the budget". A breach fires only when BOTH windows exceed
    ``threshold`` (short alone = blip, long alone = stale residue; the
    14.4x default is the workbook's 1h/5m page pair for a 99.9% SLO:
    2% of a 30-day budget in one hour).

    Both window ratios ride the SAME per-key time sort as two RANGE
    frames ([ts - w, ts] inclusive, tie rows are frame PEERS so the
    result is deterministic under duplicate timestamps) — one Exchange
    total, the ``rolling`` plan class. ``error_col`` may be boolean or
    0/1 numeric. Null error values count toward neither errors nor
    total (consistent ratio).

    At 100 TB, feed a pre-aggregated tier (e.g. per-minute counts via
    ``rollup``, passing the counts through ``sum``-weighted semantics is
    then a two-line wrapper) or the raw stream — range frames cost the
    same one shuffle either way; the frame buffers only ``width`` worth
    of rows per key.

    Output: input columns + err_short, err_long (ratios), burn_short,
    burn_long, is_breach.
    """
    ks = _keys(keys)
    if not (0.0 < slo < 1.0):
        raise ValueError(f"slo must be in (0, 1), got {slo}")
    budget = 1.0 - slo

    def width_ms(width: int, unit: str) -> int:
        return width * milliseconds_in(normalize_unit(unit))

    short_ms, long_ms = width_ms(*short), width_ms(*long)
    if not (0 < short_ms < long_ms):
        raise ValueError(
            f"short window must be positive and narrower than long "
            f"(got short={short!r} -> {short_ms} ms, "
            f"long={long!r} -> {long_ms} ms) — the two-window semantics "
            f"invert otherwise"
        )

    def frame(ms: int):
        return (
            Window.partitionBy(*ks)
            .orderBy(to_epoch_millis(ts_col))
            .rangeBetween(-ms, 0)
        )

    e = F.col(error_col).cast("double")
    w_s, w_l = frame(short_ms), frame(long_ms)
    err_s = F.sum(e).over(w_s) / F.count(e).over(w_s)
    err_l = F.sum(e).over(w_l) / F.count(e).over(w_l)
    out = df.select(
        "*",
        err_s.alias("err_short"),
        err_l.alias("err_long"),
        (err_s / F.lit(budget)).alias("burn_short"),
        (err_l / F.lit(budget)).alias("burn_long"),
    )
    return out.withColumn(
        "is_breach",
        F.coalesce(
            (F.col("burn_short") > threshold)
            & (F.col("burn_long") > threshold),
            F.lit(False),
        ),
    )
