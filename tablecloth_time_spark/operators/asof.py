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
    """direction='nearest': the closer of the backward and forward matches
    per left row (pandas merge_asof nearest semantics; an equal-distance
    tie takes the BACKWARD match — documented, deterministic).

    Composed from the two tested directional kernels — two union+window
    passes (two Exchanges on the key), still linear and join-free; the
    per-row pick is a pure conditional projection.
    """
    b = asof_join(
        left, right, on, left_ts, right_ts, "backward", tolerance, unit,
        right_prefix="__nb_", right_order_cols=right_order_cols,
    )
    bf = asof_join(
        b, right, on, left_ts, right_ts, "forward", tolerance, unit,
        right_prefix="__nf_", right_order_cols=right_order_cols,
    )
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys and c != right_ts]
    lms = to_epoch_millis(left_ts)
    db = lms - to_epoch_millis(F.col("__nb_matched_ts"))
    df_ = to_epoch_millis(F.col("__nf_matched_ts")) - lms
    take_b = F.col("__nf_matched_ts").isNull() | (
        F.col("__nb_matched_ts").isNotNull() & (db <= df_)
    )

    def pick(col: str) -> Column:
        return F.when(take_b, F.col("__nb_" + col)).otherwise(
            F.col("__nf_" + col)
        )

    return bf.select(
        *left.columns,
        pick("matched_ts").alias(right_prefix + "matched_ts"),
        *[pick(c).alias(right_prefix + c) for c in payload],
    )
