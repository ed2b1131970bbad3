"""Golden-value tests for the timeops expression library.

Input/expected pairs re-derive the reference's hand-verified bucket tables
(reference test/tablecloth/time/column/api_test.clj — floors at
k in {1,2,3,4,5,6,10}, field extractors incl. leap years and ISO
boundaries) and FIXTURES.md F2/F4. Every case is asserted THREE ways:
engine (Spark expr) == oracle (pandas) == hardcoded golden value.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tablecloth_time_spark.functions import timeops as T
from tablecloth_time_spark.oracle import timeops as O

TS = pd.Timestamp


def run_expr(spark, expr_fn, values):
    pdf = pd.DataFrame({"ts": pd.to_datetime(values)})
    df = spark.createDataFrame(pdf)
    out = df.select(expr_fn("ts").alias("out")).toPandas()["out"]
    return list(out)


# --- floor_to_month -------------------------------------------------------

MONTH_CASES = [
    # (input, k, expected) — k-month boundaries anchored at 1970-01
    ("2024-05-17 13:45:00", 1, "2024-05-01"),
    ("2024-05-17 13:45:00", 3, "2024-04-01"),  # months since epoch 652 -> 651? no:
    ("2024-06-30", 6, "2024-01-01"),
    ("2024-07-01", 6, "2024-07-01"),
    ("1970-02-15", 3, "1970-01-01"),
    ("1971-01-01", 1, "1971-01-01"),
]


@pytest.mark.parametrize("inp,k,exp", MONTH_CASES)
def test_floor_to_month(spark, inp, k, exp):
    # derive expected independently: epoch-month arithmetic
    t = TS(inp)
    m = (t.year - 1970) * 12 + t.month - 1
    m2 = m - m % k
    check = TS(year=1970 + m2 // 12, month=m2 % 12 + 1, day=1)
    assert TS(exp) == check, f"golden value self-check failed for {inp}, k={k}"
    got = run_expr(spark, lambda c: T.floor_to_month(c, k).cast("timestamp"), [inp])[0]
    assert TS(got) == TS(exp)
    ora = O.floor_to_month(pd.Series(pd.to_datetime([inp])), k)[0]
    assert TS(ora) == TS(exp)


QUARTER_CASES = [
    ("2024-05-17", 1, "2024-04-01"),
    ("2024-05-17", 2, "2024-01-01"),
    ("2024-08-01", 2, "2024-07-01"),
    ("2024-11-30", 4, "2024-01-01"),
    ("1970-03-31", 1, "1970-01-01"),
    ("2025-02-01", 3, "2024-10-01"),  # q=220 -> 219 (=3*73) -> month 657
]


@pytest.mark.parametrize("inp,k,exp", QUARTER_CASES)
def test_floor_to_quarter(spark, inp, k, exp):
    got = run_expr(spark, lambda c: T.floor_to_quarter(c, k).cast("timestamp"), [inp])[0]
    assert TS(got) == TS(exp)
    ora = O.floor_to_quarter(pd.Series(pd.to_datetime([inp])), k)[0]
    assert TS(ora) == TS(exp)


YEAR_CASES = [
    ("2024-05-17", 1, "2024-01-01"),
    ("2024-05-17", 5, "2020-01-01"),
    ("2024-05-17", 10, "2020-01-01"),
    ("1979-12-31", 10, "1970-01-01"),
    ("1980-01-01", 10, "1980-01-01"),
]


@pytest.mark.parametrize("inp,k,exp", YEAR_CASES)
def test_floor_to_year(spark, inp, k, exp):
    got = run_expr(spark, lambda c: T.floor_to_year(c, k).cast("timestamp"), [inp])[0]
    assert TS(got) == TS(exp)
    ora = O.floor_to_year(pd.Series(pd.to_datetime([inp])), k)[0]
    assert TS(ora) == TS(exp)


# --- down_to_nearest (metric + calendar) ----------------------------------

DTN_CASES = [
    ("2024-05-17 13:45:37.894", 500, "millisecond", "2024-05-17 13:45:37.500"),
    ("2024-05-17 13:45:37.894", 30, "second", "2024-05-17 13:45:30"),
    ("2024-05-17 13:45:37", 15, "minute", "2024-05-17 13:45:00"),
    ("2024-05-17 13:45:37", 6, "hour", "2024-05-17 12:00:00"),
    ("2024-05-17 13:45:37", 1, "day", "2024-05-17 00:00:00"),
    ("2024-05-17 13:45:37", 7, "day", "2024-05-16 00:00:00"),  # epoch-anchored
    # weeks anchor at 1970-01-01 (Thursday): 2024-05-17 is a Friday;
    # 2 weeks = 1209600000 ms
    ("2024-05-17 13:45:37", 2, "week", "2024-05-09 00:00:00"),
    ("2024-05-17 13:45:37", 3, "month", "2024-04-01"),
    ("2024-05-17 13:45:37", 2, "quarter", "2024-01-01"),
    ("2024-05-17 13:45:37", 5, "year", "2020-01-01"),
]


@pytest.mark.parametrize("inp,iv,unit,exp", DTN_CASES)
def test_down_to_nearest(spark, inp, iv, unit, exp):
    got = run_expr(spark, lambda c: T.down_to_nearest(c, iv, unit), [inp])[0]
    assert TS(got) == TS(exp), f"{inp} {iv} {unit}"
    ora = O.down_to_nearest(pd.Series(pd.to_datetime([inp])), iv, unit)[0]
    assert TS(ora) == TS(exp)


def test_down_to_nearest_epoch_week_anchor(spark):
    # 1970-01-01 itself is a week boundary
    got = run_expr(spark, lambda c: T.down_to_nearest(c, 1, "week"), ["1970-01-04"])[0]
    assert TS(got) == TS("1970-01-01")


# --- field extractors (FIXTURES.md F4 anchors) ----------------------------

FIELD_CASES = [
    ("1970-01-01", "day-of-week", 4),  # Thursday
    ("1970-01-05", "day-of-week", 1),  # Monday
    ("1970-12-28", "week-of-year", 53),
    ("2000-02-29", "day-of-year", 60),
    ("2000-12-31", "day-of-year", 366),
    ("2024-06-15 14:30:45", "year", 2024),
    ("2024-06-15 14:30:45", "month", 6),
    ("2024-06-15 14:30:45", "day", 15),
    ("2024-06-15 14:30:45", "hour", 14),
    ("2024-06-15 14:30:45", "minute", 30),
    ("2024-06-15 14:30:45", "second", 45),
    ("2024-06-15 14:30:45", "day-of-week", 6),
    ("2024-06-15 14:30:45", "day-of-year", 167),
    ("2024-06-15 14:30:45", "week-of-year", 24),
    ("2024-06-15 14:30:45", "quarter", 2),
    ("1970-01-01", "epoch-day", 0),
    ("1969-12-31", "epoch-day", -1),
    ("1970-01-08", "epoch-week", 1),
    ("1970-01-07", "epoch-week", 0),
    ("2024-01-01", "week-of-year-index", 0),
    ("2024-01-08", "week-of-year-index", 1),
]


@pytest.mark.parametrize("inp,fieldname,exp", FIELD_CASES)
def test_field_extractors(spark, inp, fieldname, exp):
    got = run_expr(spark, lambda c: T.field_expr(fieldname, c), [inp])[0]
    assert got == exp, f"spark {fieldname}({inp}) = {got}, want {exp}"
    ora = O.field(pd.Series(pd.to_datetime([inp])), fieldname)[0]
    assert ora == exp, f"oracle {fieldname}({inp}) = {ora}, want {exp}"


# --- computed fields -------------------------------------------------------


def test_hour_fractional_and_phases(spark):
    vals = run_expr(spark, T.hour_fractional, ["2024-06-15 13:30:00"])
    assert vals[0] == 13.5
    assert run_expr(spark, T.daily_phase, ["2024-06-15 12:00:00"])[0] == 0.5
    # Monday 00:00 -> weekly phase 0
    assert run_expr(spark, T.weekly_phase, ["2024-06-10 00:00:00"])[0] == 0.0
    # Jan 1 -> yearly phase 0
    assert run_expr(spark, T.yearly_phase, ["2024-01-01"])[0] == 0.0
    assert run_expr(spark, T.date_string, ["2024-06-15 13:30:00"])[0] == "2024-06-15"
    assert run_expr(spark, T.year_week_string, ["2024-01-08"])[0] == "2024-W01"


def test_unknown_field_raises(spark):
    with pytest.raises(ValueError, match="unknown time field"):
        T.field_expr("bogus", "ts")


# --- ceil / round / arithmetic ---------------------------------------------


def test_ceil_round(spark):
    assert TS(
        run_expr(spark, lambda c: T.ceil_to_nearest(c, 15, "minute"), ["2024-05-17 13:01:00"])[0]
    ) == TS("2024-05-17 13:15:00")
    # aligned input unchanged
    assert TS(
        run_expr(spark, lambda c: T.ceil_to_nearest(c, 15, "minute"), ["2024-05-17 13:15:00"])[0]
    ) == TS("2024-05-17 13:15:00")
    assert TS(
        run_expr(spark, lambda c: T.ceil_to_nearest(c, 1, "month"), ["2024-05-17"])[0]
    ) == TS("2024-06-01")
    assert TS(
        run_expr(spark, lambda c: T.round_to_nearest(c, 1, "hour"), ["2024-05-17 13:31:00"])[0]
    ) == TS("2024-05-17 14:00:00")
    assert TS(
        run_expr(spark, lambda c: T.round_to_nearest(c, 1, "hour"), ["2024-05-17 13:29:00"])[0]
    ) == TS("2024-05-17 13:00:00")


def test_plus_minus_between(spark):
    assert TS(
        run_expr(spark, lambda c: T.plus_time(c, 90, "minute"), ["2024-05-17 13:00:00"])[0]
    ) == TS("2024-05-17 14:30:00")
    assert TS(
        run_expr(spark, lambda c: T.plus_time(c, 2, "month"), ["2024-01-31"])[0]
    ) == TS("2024-03-31")
    assert TS(
        run_expr(spark, lambda c: T.minus_time(c, 1, "year"), ["2024-02-29"])[0]
    ) == TS("2023-02-28")
    pdf = pd.DataFrame(
        {
            "a": pd.to_datetime(["2024-01-01 00:00:00"]),
            "b": pd.to_datetime(["2024-01-02 12:00:00"]),
        }
    )
    df = spark.createDataFrame(pdf)
    row = df.select(
        T.between_time("a", "b", "hour").alias("h"),
        T.between_time("a", "b", "day").alias("d"),
    ).collect()[0]
    assert row["h"] == 36 and row["d"] == 1


def test_predicates(spark):
    pdf = pd.DataFrame({"ts": pd.to_datetime(["2024-04-01", "2024-03-31", "2024-12-31"])})
    df = spark.createDataFrame(pdf)
    rows = df.select(
        T.is_month_start("ts").alias("ms"),
        T.is_month_end("ts").alias("me"),
        T.is_quarter_start("ts").alias("qs"),
        T.is_quarter_end("ts").alias("qe"),
        T.is_year_end("ts").alias("ye"),
    ).collect()
    assert [r["ms"] for r in rows] == [True, False, False]
    assert [r["me"] for r in rows] == [False, True, True]
    assert [r["qs"] for r in rows] == [True, False, False]
    assert [r["qe"] for r in rows] == [False, True, True]
    assert [r["ye"] for r in rows] == [False, False, True]


def test_convert_time_roundtrip(spark):
    pdf = pd.DataFrame({"ts": pd.to_datetime(["2024-05-17 13:45:37.894"])})
    df = spark.createDataFrame(pdf)
    row = df.select(
        T.convert_time("ts", "epoch-milliseconds").alias("ms"),
        T.from_epoch_millis(T.convert_time("ts", "epoch-milliseconds")).alias("back"),
        T.convert_time("ts", "epoch-days").alias("ed"),
    ).collect()[0]
    assert row["ms"] == int(TS("2024-05-17 13:45:37.894").value // 1_000_000)
    assert TS(row["back"]) == TS("2024-05-17 13:45:37.894")
    assert row["ed"] == (TS("2024-05-17") - TS("1970-01-01")).days
    with pytest.raises(ValueError, match="unsupported time conversion"):
        T.convert_time("ts", "duration")


def test_parse_resolver_styles(spark):
    """java.time ResolverStyle semantics (reference parse.clj:10-32):
    strict rejects invalid dates, smart clamps day-of-month, lenient
    carries fields over arithmetically."""
    df = spark.createDataFrame(
        pd.DataFrame(
            {"s": ["2019-02-31", "2019-04-31", "2019-13-05", "2019-02-28", "junk"]}
        )
    )
    rows = df.select(
        "s",
        T.parse_temporal("s", "yyyy-MM-dd").alias("strict"),
        T.parse_temporal("s", "yyyy-MM-dd", resolver_style="smart").alias("smart"),
        T.parse_temporal("s", "yyyy-MM-dd", resolver_style="lenient").alias("lenient"),
    ).collect()
    got = {r["s"]: r for r in rows}

    def d(x):
        return None if x is None else str(x)[:10]

    assert d(got["2019-02-31"]["strict"]) is None
    assert d(got["2019-02-31"]["smart"]) == "2019-02-28"
    assert d(got["2019-02-31"]["lenient"]) == "2019-03-03"
    assert d(got["2019-04-31"]["smart"]) == "2019-04-30"
    assert d(got["2019-04-31"]["lenient"]) == "2019-05-01"
    assert d(got["2019-13-05"]["smart"]) is None
    assert d(got["2019-13-05"]["lenient"]) == "2020-01-05"
    for style in ("strict", "smart", "lenient"):
        assert d(got["2019-02-28"][style]) == "2019-02-28"
        assert got["junk"][style] is None
    with pytest.raises(ValueError, match="strict|fmt"):
        T.parse_temporal("s", resolver_style="smart")
    with pytest.raises(ValueError, match="date-only"):
        T.parse_temporal("s", "yyyy-MM-dd HH:mm", resolver_style="smart")


def test_convert_time_epoch_to_epoch_scaling(spark):
    """Reference golden: epoch-days -> epoch-hours is exact *24 numeric
    rescaling (test/tablecloth/time/column/api_test.clj:46-57)."""
    df = spark.createDataFrame(
        pd.DataFrame({"d": pd.to_datetime(["1970-01-01", "1970-01-03", "1969-12-30"])})
    )
    rows = df.select(
        T.convert_time("d", "epoch-days").alias("ed"),
        T.convert_time(
            T.convert_time("d", "epoch-days"), "epoch-hours", source_unit="epoch-days"
        ).alias("eh"),
    ).collect()
    for r in rows:
        assert r["eh"] == r["ed"] * 24
    assert sorted(r["ed"] for r in rows) == [-2, 0, 2]
    # finer -> coarser truncates toward zero like epoch_week
    row = spark.range(1).select(
        T.epoch_rescale(F.lit(49), "epoch-hours", "epoch-days").alias("a"),
        T.epoch_rescale(F.lit(-49), "epoch-hours", "epoch-days").alias("b"),
        T.epoch_rescale(F.lit(3), "epoch-days", "epoch-millis").alias("c"),
    ).collect()[0]
    assert (row["a"], row["b"], row["c"]) == (2, -2, 3 * 86_400_000)


def test_convert_time_explicit_zone_berlin(spark):
    """Reference golden: LocalDate 1970-01-01 in Europe/Berlin ->
    -3,600,000 epoch-millis (test/tablecloth/time/column/api_test.clj:21-28);
    UTC default stays 0 (api_test.clj:12-19)."""
    df = spark.createDataFrame(
        pd.DataFrame({"d": pd.to_datetime(["1970-01-01", "1970-01-02"]).date})
    )
    rows = (
        df.select(
            T.convert_time("d", "epoch-milliseconds").alias("utc_ms"),
            T.convert_time("d", "epoch-milliseconds", zone="Europe/Berlin").alias(
                "berlin_ms"
            ),
        )
        .orderBy("utc_ms")
        .collect()
    )
    assert [r["utc_ms"] for r in rows] == [0, 86_400_000]
    assert [r["berlin_ms"] for r in rows] == [-3_600_000, 86_400_000 - 3_600_000]
    # epoch -> calendar-local date round-trips through the same zone
    back = spark.range(1).select(
        T.convert_time(
            F.lit(-3_600_000), "date", source_unit="epoch-millis", zone="Europe/Berlin"
        ).alias("d")
    ).collect()[0]["d"]
    assert str(back) == "1970-01-01"


def test_epoch_rescale_exact_at_int64_scale(spark):
    """Division must not route through float64: at nano-epoch magnitude the
    double ulp is 256ns, which rounded 1754999999999999999 UP across the
    second boundary before truncation (regression)."""
    row = spark.range(1).select(
        T.epoch_rescale(
            F.lit(1754999999999999999), "epoch-ns", "epoch-s"
        ).alias("s"),
        T.epoch_rescale(
            F.lit(-1754999999999999999), "epoch-ns", "epoch-s"
        ).alias("sn"),
        T.convert_time(
            F.lit(1754999999999999999), "timestamp", source_unit="epoch-ns"
        ).cast("string").alias("ts"),
    ).collect()[0]
    assert row["s"] == 1754999999
    assert row["sn"] == -1754999999  # truncation toward zero
    assert row["ts"].startswith("2025-08-12 11:59:59.999999")


def test_convert_time_pre1970_floors(spark):
    """temporal->epoch floors (calendar semantics), matching to_epoch_days /
    unix_seconds: 1969-12-31 12:00 is epoch-day -1, not 0 (regression —
    the first rescale-based implementation truncated toward zero)."""
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "ts": pd.to_datetime(
                    ["1969-12-31 12:00:00.000", "1969-12-31 23:59:59.500"]
                )
            }
        )
    )
    rows = (
        df.select(
            "ts",
            T.convert_time("ts", "epoch-days").alias("ed"),
            T.convert_time("ts", "epoch-seconds").alias("es"),
            T.convert_time("ts", "epoch-hours").alias("eh"),
            T.to_epoch_days("ts").alias("ed_ref"),
        )
        .orderBy("ts")
        .collect()
    )
    noon, almost = rows
    assert noon["ed"] == -1 and noon["ed"] == noon["ed_ref"]
    assert noon["es"] == -43_200 and noon["eh"] == -12
    assert almost["ed"] == -1 and almost["es"] == -1 and almost["eh"] == -1


def test_parse_resolver_rejects_two_digit_year(spark):
    with pytest.raises(ValueError, match="4-digit year"):
        T.parse_temporal("s", "yy-MM-dd", resolver_style="smart")
    with pytest.raises(ValueError, match="ambiguous"):
        T.parse_temporal("s", "yyyy-Md", resolver_style="smart")
    # separator-free fixed-width stays supported
    got = spark.createDataFrame(pd.DataFrame({"s": ["20190231"]})).select(
        T.parse_temporal("s", "yyyyMMdd", resolver_style="smart").alias("d")
    ).collect()[0]["d"]
    assert str(got)[:10] == "2019-02-28"


def test_convert_time_column_dtype_checked(spark):
    """Numeric source without source_unit must raise (the old silent
    long-as-seconds mis-cast); temporal + source_unit is contradictory."""
    df = spark.createDataFrame(
        pd.DataFrame({"ms": [86_400_000], "ts": pd.to_datetime(["1970-01-02"])})
    )
    with pytest.raises(ValueError, match="ambiguous"):
        T.convert_time_column(df, "ms", "timestamp")
    with pytest.raises(ValueError, match="temporal"):
        T.convert_time_column(df, "ts", "epoch-days", source_unit="epoch-millis")
    row = df.select(
        T.convert_time_column(df, "ms", "timestamp", source_unit="epoch-millis").alias(
            "ts2"
        ),
        T.convert_time_column(df, "ms", "epoch-days", source_unit="epoch-millis").alias(
            "ed"
        ),
    ).collect()[0]
    assert TS(row["ts2"]) == TS("1970-01-02")
    assert row["ed"] == 1


class TestOriginAnchoredBuckets:
    """down_to_nearest(origin=...) — TimescaleDB time_bucket origin parity."""

    def test_weekly_monday_aligned(self, spark):
        # 2024-01-01 is a Monday; epoch-anchored weeks start Thursday
        df = spark.sql(
            "SELECT timestamp'2024-03-06 15:00:00' AS ts"  # a Wednesday
        )
        [r] = df.select(
            T.down_to_nearest("ts", 1, "week", origin="2024-01-01").alias("b")
        ).collect()
        assert str(r["b"]) == "2024-03-04 00:00:00"  # the preceding Monday

    def test_pre_origin_floors_toward_minus_inf(self, spark):
        df = spark.sql("SELECT timestamp'2023-12-30 12:00:00' AS ts")
        [r] = df.select(
            T.down_to_nearest("ts", 1, "week", origin="2024-01-01").alias("b")
        ).collect()
        assert str(r["b"]) == "2023-12-25 00:00:00"  # Monday before origin

    def test_aligned_value_unchanged(self, spark):
        df = spark.sql("SELECT timestamp'2024-01-15 00:00:00' AS ts")
        [r] = df.select(
            T.down_to_nearest("ts", 1, "week", origin="2024-01-01").alias("b")
        ).collect()
        assert str(r["b"]) == "2024-01-15 00:00:00"

    def test_origin_matches_duckdb_time_bucket(self, spark):
        import datetime as _dt

        import duckdb

        rows = [
            (_dt.datetime(2024, 1, 1) + _dt.timedelta(hours=7 * i + 3),)
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "ts timestamp")
        got = sorted(
            str(r["b"])
            for r in df.select(
                T.down_to_nearest(
                    "ts", 90, "minute", origin="2024-01-01 00:30:00"
                ).alias("b")
            ).collect()
        )
        exp = sorted(
            str(t[0])
            for t in duckdb.sql(
                "SELECT time_bucket(INTERVAL '90 minutes', ts,"
                " TIMESTAMP '2024-01-01 00:30:00') FROM (SELECT unnest(["
                + ",".join(f"TIMESTAMP '{r[0]}'" for r in rows)
                + "]) AS ts)"
            ).fetchall()
        )
        assert got == exp

    def test_origin_calendar_unit_raises(self, spark):
        with pytest.raises(ValueError, match="metric units"):
            T.down_to_nearest("ts", 1, "month", origin="2024-01-01")


def test_down_to_nearest_zone_dst_goldens(spark):
    """Zone-aware bucketing (reference floor-to-* {:zone}): local-calendar
    boundaries across the Berlin DST transitions, verified against a
    zoneinfo oracle."""
    import datetime as dt
    from zoneinfo import ZoneInfo

    from tablecloth_time_spark.functions.timeops import down_to_nearest

    berlin = ZoneInfo("Europe/Berlin")
    utc_instants = [
        dt.datetime(2024, 3, 31, 12, 0),   # DST spring-forward day (CEST)
        dt.datetime(2024, 3, 30, 22, 30),  # 23:30 local, day before
        dt.datetime(2024, 3, 31, 23, 30),  # 01:30 local APRIL 1 (CEST)
        dt.datetime(2024, 10, 27, 12, 0),  # DST fall-back day (CET)
        dt.datetime(2024, 6, 15, 8, 45),   # plain summer instant
    ]
    df = spark.createDataFrame([(t,) for t in utc_instants], ["ts"])
    out = df.select(
        "ts",
        down_to_nearest("ts", 1, "day", zone="Europe/Berlin").alias("day_b"),
        down_to_nearest("ts", 1, "month", zone="Europe/Berlin").alias("mon_b"),
    ).collect()

    def oracle(t_utc, unit):
        loc = t_utc.replace(tzinfo=dt.timezone.utc).astimezone(berlin)
        if unit == "day":
            fl = loc.replace(hour=0, minute=0, second=0, microsecond=0)
        else:
            fl = loc.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
        # UTC instant of the local boundary; fold=0 = the EARLIER
        # (daylight) occurrence of an ambiguous fall-back time —
        # matching Spark's to_utc_timestamp (java.time atZone)
        return fl.astimezone(dt.timezone.utc).replace(tzinfo=None)

    for r in out:
        assert r["day_b"] == oracle(r["ts"], "day"), r["ts"]
        assert r["mon_b"] == oracle(r["ts"], "month"), r["ts"]
    # spot goldens: Berlin local midnight is 23:00 UTC under CET,
    # 22:00 UTC under CEST
    got = {r["ts"]: (r["day_b"], r["mon_b"]) for r in out}
    assert got[dt.datetime(2024, 6, 15, 8, 45)][0] == dt.datetime(2024, 6, 14, 22, 0)
    assert got[dt.datetime(2024, 3, 31, 23, 30)][1] == dt.datetime(2024, 3, 31, 22, 0)
    assert got[dt.datetime(2024, 3, 30, 22, 30)][0] == dt.datetime(2024, 3, 29, 23, 0)


def test_down_to_nearest_zone_default_unchanged(spark):
    """zone=None keeps the pinned-UTC behavior bit-for-bit, and zone='UTC'
    equals it; as_timestamp=False with zone raises."""
    import datetime as dt

    from tablecloth_time_spark.functions.timeops import down_to_nearest

    df = spark.createDataFrame(
        [(dt.datetime(2024, 5, 7, 13, 29, 11),)], ["ts"]
    )
    r = df.select(
        down_to_nearest("ts", 1, "day").alias("plain"),
        down_to_nearest("ts", 1, "day", zone="UTC").alias("z_utc"),
    ).collect()[0]
    assert r["plain"] == r["z_utc"] == dt.datetime(2024, 5, 7)
    import pytest as _pt

    with _pt.raises(ValueError, match="as_timestamp"):
        down_to_nearest("ts", 1, "day", as_timestamp=False, zone="UTC")


def test_down_to_nearest_zone_ambiguous_boundary(spark):
    """Hourly zoned bucket during the Berlin fall-back (2024-10-27): the
    local 02:00 boundary is ambiguous; Spark resolves it to the EARLIER
    (CEST, +02:00) offset, so the 01:30 UTC instant (= 02:30 CET, second
    pass of the repeated hour) buckets to 00:00 UTC — pins the documented
    earlier-offset contract."""
    import datetime as dt

    from tablecloth_time_spark.functions.timeops import down_to_nearest

    df = spark.createDataFrame([(dt.datetime(2024, 10, 27, 1, 30),)], ["ts"])
    r = df.select(
        down_to_nearest("ts", 1, "hour", zone="Europe/Berlin").alias("b")
    ).collect()[0]
    assert r["b"] == dt.datetime(2024, 10, 27, 0, 0)
