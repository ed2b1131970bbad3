"""Tagged time-literal printing and parsing — the engine's analog of the
reference's time-literals wiring (``src/tablecloth/time/time_literals.clj:1-17``,
which registers the public juxt ``time-literals`` EDN readers/printers so
java.time values round-trip as ``#time/date "2024-05-05"`` etc.).

A distributed engine has no REPL printer to install, so the same surface
is exposed as COLUMN functions: ``to_time_literal`` renders a typed
column into its tagged-literal string and ``parse_time_literal`` turns a
tagged-literal string column back into the typed value. Payload strings
follow java.time ``toString`` exactly (golden-tested against a JDK 17
probe), so literals produced here are readable by the reference's EDN
readers and vice versa:

- ``date``            2024-05-05                      <-> DateType
- ``instant``         2024-05-05T10:15:00Z            <-> TimestampType
  (seconds always printed; fraction trimmed in 3-digit groups)
- ``date-time``       2024-05-05T10:15[:30[.123]]     <-> TimestampNTZ
  (``:ss`` omitted when zero and no fraction — LocalDateTime.toString)
- ``time``            10:15[:30[.120]]                <-> BIGINT millis-of-day
  (Spark 4.1's TIME type is still flag-gated, so the engine's carrier
  is millis-of-day; fraction beyond millis is truncated on parse)
- ``year``            2024                            <-> INT
- ``year-month``      2024-05                         <-> DateType (1st of month)
- ``month``           JUNE                            <-> INT 1-12
- ``day-of-week``     MONDAY                          <-> INT ISO 1-7
- ``duration``        PT25H1M1.123S                   <-> BIGINT millis
  (normalized to H/M/S with per-component sign — Duration.toString)
- ``period``          P1Y2M3D / P0D                   <-> STRUCT<years,months,days>
  (components kept as-is, not normalized — Period.toString)
- ``month-day``       --12-03                         <-> STRUCT<month,day>
- ``zone``            Europe/Berlin                   <-> STRING
- ``zoned-date-time`` 2024-05-05T10:15+02:00[Europe/Berlin]
                                      <-> STRUCT<instant timestamp, zone string>
- ``offset-date-time`` 2024-05-05T10:15:30-05:30 ('Z' at zero offset)
                                      <-> STRUCT<instant timestamp, offset_min int>
- ``offset-time``     10:15+01:00     <-> STRUCT<time_ms bigint, offset_min int>

Everything is built from codegen expressions (regexp / conditional
concat / integer arithmetic) — no UDFs, so literal rendering of a
trillion-row column is whole-stage-codegen all the way down. Instants
assume the engine's pinned UTC session (``session.py``); malformed
payloads parse to null (``try_cast`` semantics), never raise.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "TAGS",
    "to_time_literal",
    "parse_time_literal",
    "literal_tag",
    "literal_payload",
    "fmt_duration_iso",
    "fmt_period_iso",
    "parse_duration_iso",
    "parse_period_iso",
]

TAGS = (
    "date",
    "instant",
    "date-time",
    "time",
    "year",
    "year-month",
    "month",
    "month-day",
    "day-of-week",
    "duration",
    "period",
    "zone",
    "zoned-date-time",
    "offset-date-time",
    "offset-time",
)

_MONTHS = [
    "JANUARY", "FEBRUARY", "MARCH", "APRIL", "MAY", "JUNE", "JULY",
    "AUGUST", "SEPTEMBER", "OCTOBER", "NOVEMBER", "DECEMBER",
]
_DOWS = [
    "MONDAY", "TUESDAY", "WEDNESDAY", "THURSDAY", "FRIDAY",
    "SATURDAY", "SUNDAY",
]


def _tagged(tag: str, payload: Column) -> Column:
    # concat null-propagates (null payload -> null literal), so no
    # isNotNull guard — a `when` here would reference the entire render
    # subtree twice, doubling the generated code (see _full_render)
    return F.concat(F.lit(f'#time/{tag} "'), payload, F.lit('"'))


def _micros_of_second(ts: Column) -> Column:
    # date_format 'SSSSSS' would render in the session zone; fraction of
    # second is zone-invariant, so take it from the micros remainder
    # (pmod: pre-epoch instants must still yield 0..999999)
    return F.pmod(F.unix_micros(ts.cast("timestamp")), F.lit(1_000_000))


def _full_render(ts: Column, pattern: str, micros_src: Column) -> Column:
    """'<pattern-render>.ffffff' at full micros precision — ONE date_format
    + ONE micros expression. All trimming happens downstream on this
    STRING via an anchored-regexp chain in which each step references the
    previous exactly once. The obvious `when`-chain formulation instead
    repeats the heavy input subtree (for zoned renders, a whole
    convert_timezone) in every branch, and when-branches are excluded from
    Spark's runtime subexpression elimination — measured 93 KB of
    generated Java and ~2 s of Janino compile per zoned-literal query;
    this shape is 6 KB / <0.2 s with identical output (JDK goldens)."""
    return F.concat(
        F.date_format(ts, pattern),
        F.lit("."),
        F.lpad(micros_src.cast("string"), 6, "0"),
    )


def _trim_frac_groups(s: Column) -> Column:
    """java.time trims the fraction in 3-digit groups: drop a zero micros
    group, then a zero millis group ('.' included). Both regexps are
    $-anchored, so each replaces at most once."""
    return F.regexp_replace(F.regexp_replace(s, "000$", ""), r"\.000$", "")


def _trim_opt_seconds(s: Column) -> Column:
    """Drop a ':00' seconds group (LocalDateTime/LocalTime omit zero
    seconds when no fraction follows). Runs AFTER _trim_frac_groups, so a
    surviving fraction means the string ends in a digit group with no
    colon — minutes can never match the $-anchored ':00'."""
    return F.regexp_replace(_trim_frac_groups(s), ":00$", "")


def _fmt_date(c: Column) -> Column:
    return F.date_format(c, "yyyy-MM-dd")


def _fmt_local_dt(c: Column, micros_src: Column | None = None) -> Column:
    """LocalDateTime.toString: seconds omitted when zero and no fraction.

    ``micros_src``: where to read the (zone-invariant) fraction-of-second
    from — pass the original instant when ``c`` is a derived local time so
    the heavy conversion subtree is referenced once, not twice."""
    src = c if micros_src is None else micros_src
    return _trim_opt_seconds(
        _full_render(c, "yyyy-MM-dd'T'HH:mm:ss", _micros_of_second(src))
    )


def _fmt_instant(c: Column) -> Column:
    # Instant.toString always prints seconds; UTC session pinned
    ts = c.cast("timestamp")
    return F.concat(
        _trim_frac_groups(
            _full_render(ts, "yyyy-MM-dd'T'HH:mm:ss", _micros_of_second(ts))
        ),
        F.lit("Z"),
    )


def _fmt_time(c: Column) -> Column:
    return _trim_opt_seconds(
        _full_render(c, "HH:mm:ss", _micros_of_second(c))
    )


def _trim_frac(ms: Column) -> Column:
    """'.5' / '.12' / '.123' / '' from 0-999 millis — trailing zeros cut."""
    p = F.lpad(ms.cast("string"), 3, "0")
    return (
        F.when(ms == 0, F.lit(""))
        .when(ms % 100 == 0, F.concat(F.lit("."), p.substr(1, 1)))
        .when(ms % 10 == 0, F.concat(F.lit("."), p.substr(1, 2)))
        .otherwise(F.concat(F.lit("."), p))
    )


def fmt_duration_iso(millis: Column | str) -> Column:
    """java.time ``Duration.toString``: normalized to H/M/S, zero -> PT0S,
    negative totals put the sign on every printed component
    (-3661s -> PT-1H-1M-1S)."""
    m = F.col(millis) if isinstance(millis, str) else millis
    m = m.cast("long")
    sign = F.when(m < 0, F.lit("-")).otherwise(F.lit(""))
    a = F.abs(m)
    h = (a / 3_600_000).cast("long")
    mi = (a % 3_600_000 / 60_000).cast("long")
    sms = a % 60_000
    s_int = (sms / 1000).cast("long")
    s_part = F.concat(sign, s_int.cast("string"), _trim_frac(sms % 1000), F.lit("S"))
    return F.concat(
        F.lit("PT"),
        F.when(h > 0, F.concat(sign, h.cast("string"), F.lit("H"))).otherwise(F.lit("")),
        F.when(mi > 0, F.concat(sign, mi.cast("string"), F.lit("M"))).otherwise(F.lit("")),
        F.when((sms > 0) | ((h == 0) & (mi == 0)), s_part).otherwise(F.lit("")),
    )


def fmt_period_iso(years: Column, months: Column, days: Column) -> Column:
    """java.time ``Period.toString``: components as stored (never
    normalized), all-zero -> P0D."""
    y, mo, d = (c.cast("int") for c in (years, months, days))
    zero = (y == 0) & (mo == 0) & (d == 0)
    part = lambda c, u: F.when(  # noqa: E731
        c != 0, F.concat(c.cast("string"), F.lit(u))
    ).otherwise(F.lit(""))
    return F.when(zero, F.lit("P0D")).otherwise(
        F.concat(F.lit("P"), part(y, "Y"), part(mo, "M"), part(d, "D"))
    )


def _fmt_offset(offset_min: Column) -> Column:
    return F.when(offset_min == 0, F.lit("Z")).otherwise(
        F.concat(
            F.when(offset_min < 0, F.lit("-")).otherwise(F.lit("+")),
            F.lpad((F.abs(offset_min) / 60).cast("long").cast("string"), 2, "0"),
            F.lit(":"),
            F.lpad((F.abs(offset_min) % 60).cast("string"), 2, "0"),
        )
    )


def _fmt_zoned(ts: Column, zone: Column) -> Column:
    """ZonedDateTime.toString from a UTC instant + zone-id string: local
    wall time + offset ('Z' at zero) + '[zone]' for region ids (no
    bracket when the zone IS an offset like '+02:00' or 'Z')."""
    # from_utc_timestamp = convert_timezone(UTC -> zone) without the
    # timestamp_ntz cast pair; the offset expression references this
    # subtree 4x (see _fmt_offset), so its per-reference codegen size is
    # what dominates the zoned render's generated source
    utc = ts.cast("timestamp")
    local = F.from_utc_timestamp(utc, zone)
    offset_min = ((local.cast("long") - utc.cast("long")) / 60).cast("long")
    is_offset_zone = zone.rlike(r"^[+\-Z]")
    return F.concat(
        # fraction-of-second is zone-invariant (IANA offsets are whole
        # seconds), so read it from the raw instant — the convert_timezone
        # subtree is referenced once for the wall-time render, not twice
        _fmt_local_dt(local, micros_src=ts),
        _fmt_offset(offset_min),
        F.when(is_offset_zone, F.lit("")).otherwise(
            F.concat(F.lit("["), zone, F.lit("]"))
        ),
    )


def to_time_literal(
    col: Column | str,
    tag: str,
    zone: Column | str | None = None,
    offset_min: Column | str | None = None,
) -> Column:
    """Render a typed column as its ``#time/<tag> "<payload>"`` literal.

    Expected input per tag: date-ish for ``date``/``year-month``/``year``/
    ``month``/``month-day``/``day-of-week``; timestamp for ``instant``
    (UTC), ``zoned-date-time`` (plus ``zone``) and ``offset-date-time``
    (plus ``offset_min``); timestamp_ntz for ``date-time``/``time``
    (``offset-time`` adds ``offset_min``); BIGINT millis for ``duration``;
    STRUCT<years,months,days> for ``period``; STRING for ``zone``."""
    c = F.col(col) if isinstance(col, str) else col
    z = F.col(zone) if isinstance(zone, str) else zone
    om = F.col(offset_min) if isinstance(offset_min, str) else offset_min
    if tag == "date":
        payload = _fmt_date(c)
    elif tag == "instant":
        payload = _fmt_instant(c)
    elif tag == "date-time":
        payload = _fmt_local_dt(c)
    elif tag == "time":
        payload = _fmt_time(c)
    elif tag == "year":
        # date-ish input; for a bare int year use F.lit/cast + _tagged
        payload = F.year(c).cast("string")
    elif tag == "year-month":
        payload = F.date_format(c, "yyyy-MM")
    elif tag == "month":
        payload = F.element_at(F.lit(_MONTHS), F.month(c).cast("int"))
    elif tag == "day-of-week":
        payload = F.element_at(F.lit(_DOWS), (F.dayofweek(c) + 5) % 7 + 1)
    elif tag == "duration":
        payload = fmt_duration_iso(c)
    elif tag == "period":
        payload = fmt_period_iso(c["years"], c["months"], c["days"])
    elif tag == "month-day":
        payload = F.concat(F.lit("--"), F.date_format(c, "MM-dd"))
    elif tag == "zone":
        payload = c
    elif tag == "zoned-date-time":
        if z is None:
            raise ValueError("zoned-date-time literal needs zone=")
        payload = _fmt_zoned(c, z)
    elif tag == "offset-date-time":
        if om is None:
            raise ValueError("offset-date-time literal needs offset_min=")
        om = om.cast("long")
        local = F.timestamp_micros(
            F.unix_micros(c.cast("timestamp")) + om * 60_000_000
        ).cast("timestamp_ntz")
        payload = F.concat(_fmt_local_dt(local, micros_src=c), _fmt_offset(om))
    elif tag == "offset-time":
        if om is None:
            raise ValueError("offset-time literal needs offset_min=")
        payload = F.concat(_fmt_time(c), _fmt_offset(om.cast("long")))
    else:
        raise ValueError(f"unknown time-literal tag {tag!r}; one of {TAGS}")
    return _tagged(tag, payload)


_LIT_RE = r'^#time/([a-z-]+) "(.*)"$'


def literal_tag(lit: Column | str) -> Column:
    """The tag name of a tagged literal string (null when not a literal)."""
    c = F.col(lit) if isinstance(lit, str) else lit
    t = F.regexp_extract(c, _LIT_RE, 1)
    return F.when(t != "", t)


def literal_payload(lit: Column | str) -> Column:
    c = F.col(lit) if isinstance(lit, str) else lit
    p = F.regexp_extract(c, _LIT_RE, 2)
    return F.when(literal_tag(c).isNotNull(), p)


def _with_seconds(p: Column) -> Column:
    """Insert ':00' seconds into 'yyyy-MM-ddTHH:mm'-prefixed payloads so
    Spark's string->timestamp cast (which requires seconds) accepts the
    seconds-omitted java.time prints."""
    return F.regexp_replace(
        p, r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2})(?=$|[Z+\-.\[])", r"$1:00"
    )


def _try_ts(p: Column, target: str) -> Column:
    # a JVM-printed literal may carry a 7-9 digit (nano) fraction, which
    # Spark's string->timestamp cast rejects — truncate to micros first
    trimmed = F.regexp_replace(_with_seconds(p), r"(\.\d{6})\d+", r"$1")
    return trimmed.try_cast(target)


def parse_duration_iso(p: Column) -> Column:
    """ISO-8601 duration string -> BIGINT millis (null when malformed).
    Accepts the full Duration.parse surface: optional leading '-',
    optional D component, per-component signs, fractional seconds
    (truncated to millis)."""
    rx = (
        r"^(-?)P(?:(-?\d+)D)?(?:T(?:(-?\d+)H)?(?:(-?\d+)M)?"
        r"(?:(-?\d+)(?:\.(\d{1,9}))?S)?)?$"
    )
    ok = p.rlike(rx) & (p != "P") & ~p.rlike(r"T$") & (p != "-P")
    g = lambda i: F.regexp_extract(p, rx, i)  # noqa: E731
    num = lambda i: F.coalesce(g(i).try_cast("long"), F.lit(0))  # noqa: E731
    frac_ms = F.coalesce(
        F.rpad(g(6), 3, "0").substr(1, 3).try_cast("long"), F.lit(0)
    )
    # fraction sign follows the seconds component's sign (PT-1.5S)
    sec_neg = g(5).startswith("-")
    total = (
        num(2) * 86_400_000
        + num(3) * 3_600_000
        + num(4) * 60_000
        + num(5) * 1000
        + F.when(sec_neg, -frac_ms).otherwise(frac_ms)
    )
    total = F.when(g(1) == "-", -total).otherwise(total)
    return F.when(ok, total)


def parse_period_iso(p: Column) -> Column:
    """ISO-8601 period string -> STRUCT<years,months,days> (weeks folded
    into days exactly as ``Period.parse``; null when malformed)."""
    rx = r"^(-?)P(?:(-?\d+)Y)?(?:(-?\d+)M)?(?:(-?\d+)W)?(?:(-?\d+)D)?$"
    ok = p.rlike(rx) & (p != "P") & (p != "-P")
    g = lambda i: F.regexp_extract(p, rx, i)  # noqa: E731
    num = lambda i: F.coalesce(g(i).try_cast("int"), F.lit(0))  # noqa: E731
    neg = g(1) == "-"
    flip = lambda c: F.when(neg, -c).otherwise(c)  # noqa: E731
    return F.when(
        ok,
        F.struct(
            flip(num(2)).alias("years"),
            flip(num(3)).alias("months"),
            flip(num(4) * 7 + num(5)).alias("days"),
        ),
    )


def _parse_time_millis(p: Column) -> Column:
    rx = r"^(\d{2}):(\d{2})(?::(\d{2}))?(?:\.(\d{1,9}))?$"
    ok = p.rlike(rx)
    g = lambda i: F.regexp_extract(p, rx, i)  # noqa: E731
    num = lambda i: F.coalesce(g(i).try_cast("long"), F.lit(0))  # noqa: E731
    frac_ms = F.coalesce(F.rpad(g(4), 3, "0").substr(1, 3).try_cast("long"), F.lit(0))
    millis = num(1) * 3_600_000 + num(2) * 60_000 + num(3) * 1000 + frac_ms
    return F.when(ok & (num(1) < 24) & (num(2) < 60) & (num(3) < 60), millis)


def _off_to_min(off: Column) -> Column:
    """'Z' / '+HH:MM' / '-HH:MM' -> signed minutes."""
    mag = F.substring(off, 2, 2).cast("int") * 60 + F.substring(off, 5, 2).cast(
        "int"
    )
    return F.when(off == "Z", F.lit(0)).otherwise(
        F.when(off.startswith("-"), -mag).otherwise(mag)
    )


def _parse_offset_dt(p: Column) -> Column:
    rx = (
        r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}(?::\d{2}(?:\.\d{1,9})?)?)"
        r"(Z|[+\-]\d{2}:\d{2})$"
    )
    local = F.regexp_extract(p, rx, 1)
    off = F.regexp_extract(p, rx, 2)
    return F.when(
        p.rlike(rx),
        F.struct(
            _try_ts(F.concat(local, off), "timestamp").alias("instant"),
            _off_to_min(off).alias("offset_min"),
        ),
    )


def _parse_offset_time(p: Column) -> Column:
    rx = r"^(\d{2}:\d{2}(?::\d{2}(?:\.\d{1,9})?)?)(Z|[+\-]\d{2}:\d{2})$"
    t = F.regexp_extract(p, rx, 1)
    off = F.regexp_extract(p, rx, 2)
    return F.when(
        p.rlike(rx),
        F.struct(
            _parse_time_millis(t).alias("time_ms"),
            _off_to_min(off).alias("offset_min"),
        ),
    )


def _parse_month_day(p: Column) -> Column:
    rx = r"^--(\d{2})-(\d{2})$"
    mo = F.regexp_extract(p, rx, 1).try_cast("int")
    d = F.regexp_extract(p, rx, 2).try_cast("int")
    ok = (
        p.rlike(rx)
        & mo.between(1, 12)
        & d.between(1, F.element_at(F.lit(_MONTH_DAYS), mo))
    )
    return F.when(ok, F.struct(mo.alias("month"), d.alias("day")))


# leap-maximal day counts — MonthDay.parse accepts --02-29 (java validates
# against a leap year since the day must be valid for SOME year)
_MONTH_DAYS = [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def _parse_zoned(p: Column) -> Column:
    rx = (
        r"^(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}(?::\d{2}(?:\.\d{1,9})?)?)"
        r"(Z|[+\-]\d{2}:\d{2})(?:\[([^\]]+)\])?$"
    )
    local = F.regexp_extract(p, rx, 1)
    off = F.regexp_extract(p, rx, 2)
    zone = F.regexp_extract(p, rx, 3)
    instant = _try_ts(F.concat(local, off), "timestamp")
    return F.when(
        p.rlike(rx),
        F.struct(
            instant.alias("instant"),
            F.when(zone != "", zone).otherwise(off).alias("zone"),
        ),
    )


def parse_time_literal(lit: Column | str, tag: str) -> Column:
    """Parse a ``#time/<tag> "..."`` literal string into the typed value
    for ``tag`` (see module table). Null when the string is not a
    literal, carries a different tag, or the payload is malformed."""
    c = F.col(lit) if isinstance(lit, str) else lit
    p = F.when(literal_tag(c) == tag, literal_payload(c))
    if tag == "date":
        return p.try_cast("date")
    if tag == "instant":
        return _try_ts(p, "timestamp")
    if tag == "date-time":
        return _try_ts(p, "timestamp_ntz")
    if tag == "time":
        return _parse_time_millis(p)
    if tag == "year":
        return F.when(p.rlike(r"^-?\d{1,9}$"), p.try_cast("int"))
    if tag == "year-month":
        return F.when(
            p.rlike(r"^\d{4}-\d{2}$"), F.concat(p, F.lit("-01")).try_cast("date")
        )
    if tag == "month":
        return F.nullif(F.array_position(F.lit(_MONTHS), p).try_cast("int"), F.lit(0))
    if tag == "day-of-week":
        return F.nullif(F.array_position(F.lit(_DOWS), p).try_cast("int"), F.lit(0))
    if tag == "duration":
        return parse_duration_iso(p)
    if tag == "period":
        return parse_period_iso(p)
    if tag == "month-day":
        return _parse_month_day(p)
    if tag == "zone":
        return p
    if tag == "zoned-date-time":
        return _parse_zoned(p)
    if tag == "offset-date-time":
        return _parse_offset_dt(p)
    if tag == "offset-time":
        return _parse_offset_time(p)
    raise ValueError(f"unknown time-literal tag {tag!r}; one of {TAGS}")
