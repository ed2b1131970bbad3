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
  within the key by (ts, side), and each right payload column is carried
  forward with ``last(col, ignorenulls=True)`` over an unbounded-preceding
  running frame. Cost: one Exchange + one sort — the same plan class as
  any windowed aggregate, linear in |l| + |r|, AQE/salting-compatible.
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
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right columns
    (null where no match). Right payload columns may be prefixed with
    ``right_prefix`` to avoid collisions; the matched right timestamp is
    always emitted as ``<right_prefix>matched_ts``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
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
    rt = right.filter(F.col(right_ts).isNotNull()).select(
        *keys,
        ordval(right_ts),
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias(_RTS),
        *[F.col(c).alias(right_prefix + c) for c in payload],
    )
    # align schemas for the union: left lacks right payload, right lacks
    # left payload — fill with typed nulls via unionByName(allowMissing)
    both = lt.unionByName(rt, allowMissingColumns=True)

    w = (
        Window.partitionBy(*keys)
        .orderBy(_ORD, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(right_prefix + c, ignorenulls=True).over(w).alias(right_prefix + c)
        for c in payload
    ]
    matched_ts = F.last(_RTS, ignorenulls=True).over(w).alias(_RTS)
    out = both.select(
        *[c for c in left.columns], F.col(_SIDE), matched_ts, *carried
    ).filter(F.col(_SIDE) == 1)

    mts = F.col(_RTS)
    if tolerance is not None:
        tol_ms = tolerance * milliseconds_in(normalize_unit(unit))
        dist = (to_epoch_millis(left_ts) - to_epoch_millis(mts)) * F.lit(sign)
        in_tol = dist <= tol_ms
        out = out.select(
            *[c for c in left.columns],
            F.when(in_tol, mts).otherwise(F.lit(None)).alias(_RTS),
            *[
                F.when(in_tol, F.col(right_prefix + c))
                .otherwise(F.lit(None))
                .alias(right_prefix + c)
                for c in payload
            ],
        )
    else:
        out = out.select(
            *[c for c in left.columns], mts.alias(_RTS), *[right_prefix + c for c in payload]
        )
    return out.withColumnRenamed(_RTS, right_prefix + "matched_ts")
