"""Business-day (working-day) calendar arithmetic as pure integer codegen.

The reference's calendar surface stops at ISO fields and calendar floors
(reference src/tablecloth/time/column/api.clj field extractors /
floor-to-*); business-day arithmetic is the natural next ask of the same
users (settlement dates, SLA clocks, trading calendars). numpy ships it
driver-side as ``busday_offset``/``busday_count`` — this module is the
distributed column form, and the pytest oracle is numpy itself.

Design: every function reduces a date to an integer *business-day index*
and back with closed-form div/mod arithmetic — no lookup table, no join,
no Python, no Exchange; the expressions ride the scan inside whole-stage
codegen and are bit-reproducible in any engine with integer division
(the driver oracle re-derives them in DuckDB).

The index (Mon-Fri week, the only week shape exposed for now):

    days  = epoch days (1970-01-01 = day 0, a Thursday)
    dow0  = (days + 3) mod 7          # Mon=0 .. Sun=6
    week  = (days + 3) div 7          # Monday-aligned week number
    bidx  = 5*week + min(dow0, 4)     # Sat/Sun collapse onto Friday

so ``bidx`` increments by exactly 1 per business day and *rolls backward*
on weekends (a Saturday/Sunday shares its Friday's index — numpy's
``roll='backward'``). The inverse is exact:

    date(bidx) = 7*(bidx div 5) + (bidx mod 5) - 3   # epoch days

Holidays: ``is_business_day`` and ``business_days_between`` accept a
small literal holiday list (exchange calendars are ~10 dates/year); the
dates become an inlined integer array probed with ``array_contains`` /
counted with a bounded ``filter``+``size`` over the literal — constant
work per row, still no shuffle. ``add_business_days`` is weekend-only
(documented): a holiday-aware offset has no closed form (each skipped
holiday can expose another) and would need an iterative kernel; callers
who need it compose ``add_business_days`` + a verification pass.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH = dt.date(1970, 1, 1)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _epoch_days(col: Column | str) -> Column:
    return F.datediff(_c(col).cast("date"), F.lit("1970-01-01").cast("date"))


def _holiday_days(holidays: list[str | dt.date] | None) -> list[int]:
    """Literal holiday dates -> sorted unique epoch-day ints (driver-side)."""
    out = set()
    for h in holidays or []:
        d = dt.date.fromisoformat(h) if isinstance(h, str) else h
        out.add((d - _EPOCH).days)
    return sorted(out)


def _dow0(days: Column) -> Column:
    """Monday=0 .. Sunday=6 from epoch days (day 0 was a Thursday)."""
    return F.pmod(days + F.lit(3), F.lit(7))


def _bidx(days: Column) -> Column:
    """Business-day index from epoch days — the single source of truth
    for the Monday-week arithmetic (5*week + min(dow0, 4))."""
    week = F.floor((days + F.lit(3)) / F.lit(7)).cast("bigint")
    return (week * F.lit(5) + F.least(_dow0(days), F.lit(4))).cast("bigint")


def business_day_index(col: Column | str) -> Column:
    """Monotone business-day counter (Mon-Fri), backward-rolled on
    weekends: consecutive business days differ by exactly 1, and a
    Saturday/Sunday reports its preceding Friday's index."""
    return _bidx(_epoch_days(col))


def business_day_from_index(idx: Column) -> Column:
    """Inverse of :func:`business_day_index` restricted to business days:
    the ``idx``-th business day since the epoch, as a date."""
    days = (
        F.floor(idx / F.lit(5)).cast("bigint") * F.lit(7)
        + F.pmod(idx, F.lit(5))
        - F.lit(3)
    )
    return F.date_add(F.lit("1970-01-01").cast("date"), days.cast("int"))


def is_business_day(
    col: Column | str, holidays: list[str | dt.date] | None = None
) -> Column:
    """True when the date falls Mon-Fri and is not a listed holiday."""
    days = _epoch_days(col)
    cond = _dow0(days) <= F.lit(4)
    hol = _holiday_days(holidays)
    if hol:
        cond = cond & ~F.array_contains(
            F.array(*[F.lit(h) for h in hol]), days
        )
    return cond


def add_business_days(
    col: Column | str, n: int | Column, roll: str = "backward"
) -> Column:
    """Date ``n`` business days away (Mon-Fri week; holiday lists are not
    supported here — see module docstring). A weekend start first rolls
    to its Friday (``roll='backward'``, the index's native convention) or
    to the following Monday (``roll='forward'``), exactly numpy
    ``busday_offset(..., roll=...)``; a business-day start is unchanged.
    ``n`` may be negative or a column."""
    if roll not in ("backward", "forward"):
        raise ValueError(f"roll must be 'backward' or 'forward', got {roll!r}")
    idx = business_day_index(col)
    if roll == "forward":
        days = _epoch_days(col)
        idx = idx + F.when(_dow0(days) >= F.lit(5), F.lit(1)).otherwise(
            F.lit(0)
        )
    n_col = F.lit(n) if isinstance(n, int) else n
    return business_day_from_index(idx + n_col)


def next_business_day(col: Column | str) -> Column:
    """The first business day strictly after the date."""
    return add_business_days(col, 1, roll="backward")


def prev_business_day(col: Column | str) -> Column:
    """The last business day strictly before the date (Friday for a
    Saturday, Sunday, or Monday input)."""
    return add_business_days(col, -1, roll="forward")


def business_days_between(
    start: Column | str,
    end: Column | str,
    holidays: list[str | dt.date] | None = None,
) -> Column:
    """Count of valid (business, non-holiday) days between two dates —
    exact numpy ``busday_count`` semantics: for ``end >= start`` the
    count is over the half-open ``[start, end)``; for a reversed pair
    numpy counts over ``(end, start]`` and negates (NOT the negated
    half-open count — the two differ by the endpoints' own validity,
    verified against numpy across both shapes in tests).

    Identity: with ``V[0, d)`` = valid days before ``d`` (derived from
    the business-day index plus a bounded literal-holiday correction),

        e >= s:  V(e) - V(s)
        e <  s:  V(e) - V(s) + valid(e) - valid(s)
    """
    s_days = _epoch_days(start)
    e_days = _epoch_days(end)
    # weekday-holiday epoch days only — a weekend holiday never changes
    # any count, so drop it driver-side
    hol = [h for h in _holiday_days(holidays) if (h + 3) % 7 <= 4]

    def upto(days: Column) -> Column:
        """Business days in [0, d) up to the constant epoch offset that
        cancels in differences: bidx(d) + (1 if d is a weekend else 0)."""
        return _bidx(days) + F.when(
            _dow0(days) <= F.lit(4), F.lit(0)
        ).otherwise(F.lit(1))

    def hol_before(days: Column) -> Column:
        arr = F.array(*[F.lit(h) for h in hol])
        return F.size(F.filter(arr, lambda h: h < days)).cast("bigint")

    def valid(days: Column) -> Column:
        c = _dow0(days) <= F.lit(4)
        if hol:
            c = c & ~F.array_contains(
                F.array(*[F.lit(h) for h in hol]), days
            )
        return F.when(c, F.lit(1)).otherwise(F.lit(0)).cast("bigint")

    v_diff = upto(e_days) - upto(s_days)
    if hol:
        v_diff = v_diff - (hol_before(e_days) - hol_before(s_days))
    rev_fix = F.when(
        e_days < s_days, valid(e_days) - valid(s_days)
    ).otherwise(F.lit(0))
    return (v_diff + rev_fix).cast("bigint")
