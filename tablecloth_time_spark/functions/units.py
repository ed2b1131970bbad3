"""Time-unit canonicalization and the metric/calendar split.

Semantics match the reference's unit utilities (behavior studied at
reference src/tablecloth/time/utils/units.clj:4-42): singular and plural
unit names normalize to one canonical form; *metric* units have a fixed
millisecond length and floor via integer modulo in epoch-millis space;
*calendar* units (months/quarters/years) have variable length and floor
via epoch-month / epoch-quarter / epoch-year integer arithmetic.
"""

from __future__ import annotations

# canonical unit -> milliseconds (metric units only)
UNIT_MS: dict[str, int] = {
    "millisecond": 1,
    "second": 1_000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
    "week": 604_800_000,
}

METRIC_UNITS = frozenset(UNIT_MS)
CALENDAR_UNITS = frozenset({"month", "quarter", "year"})

_ALIASES: dict[str, str] = {}
for _u in list(UNIT_MS) + list(CALENDAR_UNITS):
    _ALIASES[_u] = _u
    _ALIASES[_u + "s"] = _u
_ALIASES.update(
    {
        "ms": "millisecond",
        "millis": "millisecond",
        "sec": "second",
        "secs": "second",
        "s": "second",
        "min": "minute",
        "mins": "minute",
        "m": "minute",
        "h": "hour",
        "hr": "hour",
        "hrs": "hour",
        "d": "day",
        "w": "week",
        "mo": "month",
        "q": "quarter",
        "y": "year",
        "yr": "year",
        "yrs": "year",
    }
)


def normalize_unit(unit: str) -> str:
    """Canonicalize a unit name; raises ValueError for unknown units."""
    key = unit.strip().lower()
    if key not in _ALIASES:
        raise ValueError(f"unsupported time unit: {unit!r}")
    return _ALIASES[key]


def is_metric_unit(unit: str) -> bool:
    return normalize_unit(unit) in METRIC_UNITS


def is_calendar_unit(unit: str) -> bool:
    return normalize_unit(unit) in CALENDAR_UNITS


def milliseconds_in(unit: str) -> int:
    """Milliseconds per one canonical metric unit; errors on calendar units."""
    u = normalize_unit(unit)
    if u not in UNIT_MS:
        raise ValueError(f"{unit!r} is a calendar unit with no fixed millisecond length")
    return UNIT_MS[u]


MONTHS_PER: dict[str, int] = {"month": 1, "quarter": 3, "year": 12}


def months_in(unit: str) -> int:
    """Months per one canonical calendar unit; errors on metric units."""
    u = normalize_unit(unit)
    if u not in MONTHS_PER:
        raise ValueError(f"{unit!r} is not a calendar unit")
    return MONTHS_PER[u]
