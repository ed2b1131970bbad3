"""Zones utilities, with_tz/force_tz, and the parse cascade.

Golden values mirror the reference's zones_test.clj shape and the
convert-time zone tests (UTC vs Europe/Berlin offsets)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from tablecloth_time_spark.functions import timeops as T
from tablecloth_time_spark.functions import zones as Z


def test_available_time_zones_sorted_nonempty():
    zs = Z.available_time_zones()
    assert len(zs) > 300
    assert zs == sorted(zs)
    assert "UTC" in zs and "Europe/Berlin" in zs


def test_find_time_zones_space_normalization():
    assert "America/New_York" in Z.find_time_zones("new york")
    assert Z.find_time_zones("no_such_zone_xyz") == []


def test_time_zone_info():
    utc = Z.time_zone_info("UTC")
    assert utc["offset_seconds"] == 0 and utc["dst"] is False
    berlin_winter = Z.time_zone_info(
        "Europe/Berlin", dt.datetime(2020, 1, 1, tzinfo=dt.timezone.utc)
    )
    assert berlin_winter["offset_seconds"] == 3600
    berlin_summer = Z.time_zone_info(
        "Europe/Berlin", dt.datetime(2020, 7, 1, tzinfo=dt.timezone.utc)
    )
    assert berlin_summer["offset_seconds"] == 7200 and berlin_summer["dst"]


def test_common_time_zones_excludes_etc():
    cz = Z.common_time_zones()
    assert all(not z.startswith("Etc/") for z in cz)
    assert "Europe/Berlin" in cz


def test_with_tz_force_tz_roundtrip(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"ts": [pd.Timestamp("2020-01-15 12:00:00")]}),
        schema="ts timestamp",
    )
    row = df.select(
        T.with_tz("ts", "Europe/Berlin").alias("wall"),
        T.force_tz("ts", "Europe/Berlin").alias("instant"),
        T.with_tz(T.force_tz("ts", "Europe/Berlin"), "Europe/Berlin").alias(
            "roundtrip"
        ),
    ).collect()[0]
    # same instant viewed in Berlin winter = +1h wall clock
    assert row["wall"] == dt.datetime(2020, 1, 15, 13, 0)
    # same wall clock interpreted as Berlin = instant 1h earlier in UTC
    assert row["instant"] == dt.datetime(2020, 1, 15, 11, 0)
    assert row["roundtrip"] == dt.datetime(2020, 1, 15, 12, 0)


def test_parse_cascade(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "s": [
                    "2020-03-01 10:30:00",
                    "2020-03-01T10:30:00",
                    "2020-03-01",
                    "garbage",
                    None,
                ]
            }
        ),
        schema="s string",
    )
    vals = [r["p"] for r in df.select(T.parse_temporal("s").alias("p")).collect()]
    assert vals[0] == dt.datetime(2020, 3, 1, 10, 30)
    assert vals[1] == dt.datetime(2020, 3, 1, 10, 30)
    assert vals[2] == dt.datetime(2020, 3, 1, 0, 0)
    assert vals[3] is None and vals[4] is None


def test_parse_with_format(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"s": ["01/15/2020 07:45", "bad"]}), schema="s string"
    )
    vals = [
        r["p"]
        for r in df.select(
            T.parse_temporal("s", "MM/dd/yyyy HH:mm").alias("p")
        ).collect()
    ]
    assert vals[0] == dt.datetime(2020, 1, 15, 7, 45)
    assert vals[1] is None
