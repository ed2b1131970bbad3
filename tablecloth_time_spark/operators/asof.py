"""As-of (nearest-predecessor) join — the time-series join Spark lacks.

For each left row, attach the LATEST right row with ``right_ts <= left_ts``
(direction='backward'; 'forward' mirrors to the earliest successor) within
the same key. This is pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` /
kdb ``aj`` semantics, re-expressed for a cluster.

Scale-first shape — union + ordered window, NOT a range join:

- a naive ``l JOIN r ON l.key = r.key AND r.ts <= l.ts`` explodes to
  O(|l| x matching |r|) intermediate rows before the per-row argmax; at
  10^12 turns that intermediate is unpayable.
- here both sides are tagged and UNIONED (one shuffle on the key), sorted
  within the key by (ts, side), and the matched right row travels as ONE
  struct carried forward with ``last(struct, ignorenulls=True)`` over an
  unbounded-preceding running frame — atomic, so right rows with NULL
  payload fields never mix with older rows' fields. Cost: one Exchange +
  one sort — the same plan class as any windowed aggregate, linear in
  |l| + |r|, AQE/salting-compatible.
- ties: a right row AT the left row's timestamp matches (inclusive), so
  right sorts before left at equal ts.
- ``tolerance``: matches farther than the tolerance (in ``unit``) are
  nulled out — the carried right_ts makes this a pure post-filter.

The forward direction reuses the backward kernel on negated epoch-millis
(order reversal), so both directions share one tested code path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tablecloth_time_spark.functions.timeops import to_epoch_millis
from tablecloth_time_spark.functions.units import milliseconds_in, normalize_unit

_SIDE = "__asof_side"  # 0 = right, 1 = left (right first at equal ts)
_ORD = "__asof_ord"
_RTS = "__asof_right_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance: int | None = None,
    unit: str = "minute",
    right_prefix: str = "",
    right_order_cols: list[str] | None = None,
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right columns
    (null where no match). Right payload columns may be prefixed with
    ``right_prefix`` to avoid collisions; the matched right timestamp is
    always emitted as ``<right_prefix>matched_ts``.

    The matched right row is carried as ONE struct (not per-column
    ``last``), so a right row whose payload fields are partly NULL is
    matched atomically — no mixing of fields from different right rows
    (pandas ``merge_asof`` semantics). ``right_order_cols`` breaks ties
    among right rows sharing the same (key, right_ts): the LAST row in
    that ordering wins; without it, equal-timestamp right rows are picked
    nondeterministically.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if direction == "nearest":
        return _asof_nearest(
            left, right, on, left_ts, right_ts, tolerance, unit,
            right_prefix, right_order_cols,
        )
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys and c != right_ts]
    collide = [
        right_prefix + c
        for c in payload + ["matched_ts"]
        if right_prefix + c in left.columns
    ]
    if collide:
        raise ValueError(
            f"right columns {collide} collide with left; pass right_prefix="
        )

    sign = 1 if direction == "backward" else -1

    def ordval(ts_col: str) -> Column:
        return (to_epoch_millis(ts_col) * F.lit(sign)).alias(_ORD)

    lt = left.select(
        *left.columns, ordval(left_ts), F.lit(1).alias(_SIDE)
    )
    # a null right timestamp can never be an as-of match, but it would sort
    # FIRST (asc nulls-first) and last(payload, ignorenulls) would leak its
    # payload into left rows that have no real predecessor (while the
    # carried matched_ts, being null, is skipped) — drop such rows up front
    tie = list(right_order_cols or [])
    tie_names = [f"__asof_tie{i}" for i in range(len(tie))]
    # the whole right row travels as ONE struct: the carry then matches a
    # right row atomically even when some of its payload fields are NULL
    # (per-column last(ignorenulls) would fill those fields from OLDER
    # right rows — field-mixing pandas merge_asof never does)
    pay_struct = F.struct(
        F.col(right_ts).alias("__mts"),
        *[F.col(c).alias(f"__v{i}") for i, c in enumerate(payload)],
    )
    rt = right.filter(F.col(right_ts).isNotNull()).select(
        *keys,
        ordval(right_ts),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(n) for c, n in zip(tie, tie_names)],
        pay_struct.alias(_RTS),
    )
    # align schemas for the union: left lacks right payload, right lacks
    # left payload — fill with typed nulls via unionByName(allowMissing)
    both = lt.unionByName(rt, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(_ORD, _SIDE, *tie_names)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last(_RTS, ignorenulls=True).over(w).alias(_RTS)
    out = both.select(
        *[c for c in left.columns], F.col(_SIDE), matched
    ).filter(F.col(_SIDE) == 1)

    mts = F.col(_RTS).getField("__mts")
    vals = [F.col(_RTS).getField(f"__v{i}") for i in range(len(payload))]
    if tolerance is not None:
        tol_ms = tolerance * milliseconds_in(normalize_unit(unit))
        dist = (to_epoch_millis(left_ts) - to_epoch_millis(mts)) * F.lit(sign)
        in_tol = dist <= tol_ms
        return out.select(
            *[c for c in left.columns],
            F.when(in_tol, mts).alias(right_prefix + "matched_ts"),
            *[
                F.when(in_tol, v).alias(right_prefix + c)
                for c, v in zip(payload, vals)
            ],
        )
    return out.select(
        *[c for c in left.columns],
        mts.alias(right_prefix + "matched_ts"),
        *[v.alias(right_prefix + c) for c, v in zip(payload, vals)],
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    tolerance: int | None,
    unit: str,
    right_prefix: str,
    right_order_cols: list[str] | None,
) -> DataFrame:
    """direction='nearest': the closer of the predecessor and successor
    matches per left row (pandas merge_asof nearest semantics; an
    equal-distance tie takes the BACKWARD match — documented,
    deterministic; distances compare at full microsecond precision).

    Single union pass: ONE Exchange on the key, then two in-partition
    sorts of the same partitioning — the backward carry over
    (ts, right-first) ascending and the forward carry over a
    (ts, left-first) ordering whose following frame sees equal-ts right
    rows — so neither the right side nor the backward payload shuffles
    twice. The per-row pick is a pure conditional projection.
    """
    from tablecloth_time_spark.functions.timeops import to_epoch_micros

    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys and c != right_ts]
    collide = [
        right_prefix + c
        for c in payload + ["matched_ts"]
        if right_prefix + c in left.columns
    ]
    if collide:
        raise ValueError(
            f"right columns {collide} collide with left; pass right_prefix="
        )

    tie = list(right_order_cols or [])
    tie_names = [f"__asof_tie{i}" for i in range(len(tie))]
    pay_struct = F.struct(
        F.col(right_ts).alias("__mts"),
        *[F.col(c).alias(f"__v{i}") for i, c in enumerate(payload)],
    )
    # order at FULL microsecond precision — the ms pivot would place a
    # same-millisecond-but-earlier right row in the following frame and
    # the distance comparison (also in us) would then disagree with the
    # window's notion of before/after
    lt = left.select(
        *left.columns,
        to_epoch_micros(left_ts).alias(_ORD),
        F.lit(1).alias(_SIDE),
    )
    rt = right.filter(F.col(right_ts).isNotNull()).select(
        *keys,
        to_epoch_micros(right_ts).alias(_ORD),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(n) for c, n in zip(tie, tie_names)],
        pay_struct.alias(_RTS),
    )
    both = lt.unionByName(rt, allowMissingColumns=True)

    # backward: right(0) sorts BEFORE left(1) at equal ts -> equal-ts right
    # is inside the preceding frame (inclusive match); among equal-ts rights
    # the LAST in tie order wins (same contract as the directional kernel)
    w_b = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_ORD).asc(), F.col(_SIDE).asc(), *[F.col(n).asc() for n in tie_names])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: order left(1) BEFORE right(0) at equal ts so the following
    # frame still sees an equal-ts right row; tie DESC makes first() pick
    # the last-in-tie-order right among equals — mirroring the reversed
    # directional kernel
    w_f = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_ORD).asc(), F.col(_SIDE).desc(), *[F.col(n).desc() for n in tie_names])
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    b_match = F.last(_RTS, ignorenulls=True).over(w_b)
    f_match = F.first(_RTS, ignorenulls=True).over(w_f)
    out = both.select(
        *left.columns,
        F.col(_SIDE),
        b_match.alias("__nb"),
        f_match.alias("__nf"),
    ).filter(F.col(_SIDE) == 1)

    lus = to_epoch_micros(left_ts)
    b_ts = F.col("__nb").getField("__mts")
    f_ts = F.col("__nf").getField("__mts")
    db = lus - to_epoch_micros(b_ts)
    df_ = to_epoch_micros(f_ts) - lus
    if tolerance is not None:
        tol_us = 1000 * tolerance * milliseconds_in(normalize_unit(unit))
        b_ok = b_ts.isNotNull() & (db <= tol_us)
        f_ok = f_ts.isNotNull() & (df_ <= tol_us)
    else:
        b_ok = b_ts.isNotNull()
        f_ok = f_ts.isNotNull()
    take_b = b_ok & (~f_ok | (db <= df_))
    take_f = f_ok & ~take_b

    def pick(field: str) -> Column:
        return (
            F.when(take_b, F.col("__nb").getField(field))
            .when(take_f, F.col("__nf").getField(field))
        )

    return out.select(
        *left.columns,
        pick("__mts").alias(right_prefix + "matched_ts"),
        *[
            pick(f"__v{i}").alias(right_prefix + c)
            for i, c in enumerate(payload)
        ],
    )
