"""Time-zone discovery utilities (driver-side; no executor involvement).

Parity surface for the reference's zones API (behavior studied at reference
src/tablecloth/time/zones.clj:10-68): sorted zone ids, substring search with
space->underscore normalization, and an info map with offset / DST flag /
display name. Pure Python ``zoneinfo`` — these inform job configuration
(e.g. a with_tz/force_tz argument), never run per row.
"""

from __future__ import annotations

import datetime as dt
from zoneinfo import ZoneInfo, available_timezones


def available_time_zones() -> list[str]:
    """All zone ids, sorted."""
    return sorted(available_timezones())


def find_time_zones(query: str) -> list[str]:
    """Case-insensitive substring search; spaces match underscores
    ('new york' finds 'America/New_York')."""
    q = query.strip().lower().replace(" ", "_")
    return [z for z in available_time_zones() if q in z.lower()]


def time_zone_info(zone_id: str, at: dt.datetime | None = None) -> dict:
    """Info map for a zone: id, utc offset (seconds), dst flag, display name.

    Offset/DST are evaluated at ``at`` (default: 2020-01-01 UTC, a fixed
    instant so results are deterministic for tests).
    """
    z = ZoneInfo(zone_id)
    at = at or dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)
    local = at.astimezone(z)
    return {
        "id": zone_id,
        "offset_seconds": int(local.utcoffset().total_seconds()),
        "dst": bool(local.dst() and local.dst().total_seconds() != 0),
        "display_name": local.tzname(),
    }


def common_time_zones() -> list[str]:
    """Region/City zones only (excludes Etc/*, aliases like 'UTC')."""
    return [
        z
        for z in available_time_zones()
        if "/" in z and not z.startswith(("Etc/", "SystemV/"))
    ]
