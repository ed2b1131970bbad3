"""Gap-fill (FIXTURES.md F6 stocks fixture) + rolling time-window tests."""

from __future__ import annotations

import pandas as pd
import pytest

from tablecloth_time_spark.operators.gapfill import resample_to_regular_grid
from tablecloth_time_spark.operators.rolling import rolling

STOCKS = pd.DataFrame(
    {
        "symbol": ["AAPL"] * 5 + ["MSFT"] * 5,
        "date": pd.to_datetime(
            ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-05", "2024-01-08",
             "2024-01-01", "2024-01-02", "2024-01-04", "2024-01-05", "2024-01-08"]
        ),
        "close": [180.0, 182.5, 181.0, 183.0, 185.0,
                  330.0, 332.0, 331.5, 333.0, 334.5],
    }
)


@pytest.fixture(scope="module")
def stocks_df(spark):
    return spark.createDataFrame(STOCKS)


def _grid(df, symbol):
    rows = [r for r in df.orderBy("bucket").collect() if r["symbol"] == symbol]
    return [(r["bucket"].date().isoformat(), r["close"]) for r in rows]


def test_grid_none_has_nulls(stocks_df):
    out = resample_to_regular_grid(
        stocks_df, ["symbol"], "date", "close", 1, "day", method="none"
    )
    aapl = _grid(out, "AAPL")
    assert len(aapl) == 8  # 01..08 daily grid
    assert aapl[3] == ("2024-01-04", None)  # gap on the 4th
    assert aapl[0] == ("2024-01-01", 180.0)


def test_ffill(stocks_df):
    out = resample_to_regular_grid(
        stocks_df, ["symbol"], "date", "close", 1, "day", method="ffill"
    )
    aapl = dict(_grid(out, "AAPL"))
    assert aapl["2024-01-04"] == 181.0  # carried from the 3rd
    assert aapl["2024-01-06"] == 183.0 and aapl["2024-01-07"] == 183.0
    msft = dict(_grid(out, "MSFT"))
    assert msft["2024-01-03"] == 332.0


def test_bfill(stocks_df):
    out = resample_to_regular_grid(
        stocks_df, ["symbol"], "date", "close", 1, "day", method="bfill"
    )
    aapl = dict(_grid(out, "AAPL"))
    assert aapl["2024-01-04"] == 183.0  # next obs on the 5th
    assert aapl["2024-01-06"] == 185.0


def test_zero(stocks_df):
    out = resample_to_regular_grid(
        stocks_df, ["symbol"], "date", "close", 1, "day", method="zero"
    )
    aapl = dict(_grid(out, "AAPL"))
    assert aapl["2024-01-04"] == 0.0


def test_linear(stocks_df):
    out = resample_to_regular_grid(
        stocks_df, ["symbol"], "date", "close", 1, "day", method="linear"
    )
    aapl = dict(_grid(out, "AAPL"))
    assert aapl["2024-01-04"] == pytest.approx(182.0)  # midpoint 181 -> 183
    # 3-day gap 05->08: 06 and 07 interpolate at 1/3 and 2/3
    assert aapl["2024-01-06"] == pytest.approx(183.0 + 2.0 / 3)
    assert aapl["2024-01-07"] == pytest.approx(183.0 + 4.0 / 3)


def test_nearest(stocks_df):
    out = resample_to_regular_grid(
        stocks_df, ["symbol"], "date", "close", 1, "day", method="nearest"
    )
    aapl = dict(_grid(out, "AAPL"))
    assert aapl["2024-01-04"] in (181.0, 183.0)  # tie — either neighbor ok
    assert aapl["2024-01-06"] == 183.0  # closer to the 5th
    assert aapl["2024-01-07"] == 185.0  # closer to the 8th


def test_rolling_2day_window(stocks_df):
    out = rolling(
        stocks_df, ["symbol"], "date", 2, "day",
        {"roll_sum": ("sum", "close"), "roll_n": ("count", "close")},
    )
    rows = {
        (r["symbol"], r["date"].date().isoformat()): (r["roll_sum"], r["roll_n"])
        for r in out.collect()
    }
    # AAPL 01-03: window [01-01, 01-03] -> 180 + 182.5 + 181
    assert rows[("AAPL", "2024-01-03")] == (543.5, 3)
    # AAPL 01-05: window [01-03, 01-05] -> 181 + 183
    assert rows[("AAPL", "2024-01-05")] == (364.0, 2)
    # AAPL 01-08: window [01-06, 01-08] -> 185 alone
    assert rows[("AAPL", "2024-01-08")] == (185.0, 1)


def test_rolling_differential_on_transcripts(spark, transcripts_df, transcripts_pdf):
    from pyspark.sql import functions as F

    eng = rolling(
        transcripts_df.withColumn("n_chars", F.length("text").cast("double")),
        ["conv_id"], "ts", 1, "hour", {"r_sum": ("sum", "n_chars")},
    ).toPandas()
    pdf = transcripts_pdf.copy()
    pdf["n_chars"] = pdf["text"].str.len().astype("float64")
    pdf = pdf.sort_values(["conv_id", "ts"], kind="stable")

    # oracle matches RANGE-frame semantics: for each row, sum over ALL rows
    # with ts in [t-1h, t] — including later-positioned duplicate-ts rows
    import numpy as np

    def _roll(g):
        ms = g["ts"].values.astype("datetime64[ms]").astype("int64")
        vals = g["n_chars"].values
        csum = np.concatenate([[0.0], np.cumsum(vals)])
        lo = np.searchsorted(ms, ms - 3_600_000, side="left")
        hi = np.searchsorted(ms, ms, side="right")
        g = g.copy()
        g["r_sum"] = csum[hi] - csum[lo]
        return g

    ora = pdf.groupby("conv_id", group_keys=False)[["ts", "n_chars", "conv_id", "turn_idx"]].apply(_roll)
    key = ["conv_id", "turn_idx"]
    eng = eng.sort_values(key, kind="stable").reset_index(drop=True)
    ora = ora.sort_values(key, kind="stable").reset_index(drop=True)
    pd.testing.assert_series_equal(eng["r_sum"], ora["r_sum"], check_exact=False)


# --- calendar-unit grids (month/quarter/k-year) -------------------------
# Reference spec (development-plan.md:566-585) allows any interval x unit;
# r2 punted on calendar units. Grid steps by INTERVAL k months via Spark
# sequence(); buckets align with down_to_nearest's calendar floors.

MONTHLY = pd.DataFrame(
    {
        "series": ["beer"] * 3 + ["gas"] * 2,
        # mid-month observation dates must floor onto the month grid
        "date": pd.to_datetime(
            ["2023-01-15", "2023-02-01", "2023-05-20",
             "2023-03-10", "2023-06-01"]
        ),
        "y": [10.0, 20.0, 50.0, 7.0, 13.0],
    }
)


@pytest.fixture(scope="module")
def monthly_df(spark):
    return spark.createDataFrame(MONTHLY)


def _cal_grid(df, series):
    rows = [r for r in df.orderBy("bucket").collect() if r["series"] == series]
    return [(r["bucket"].date().isoformat(), r["y"]) for r in rows]


def test_monthly_grid_none(monthly_df):
    out = resample_to_regular_grid(
        monthly_df, ["series"], "date", "y", 1, "month", method="none"
    )
    beer = _cal_grid(out, "beer")
    # Jan..May inclusive, one row per month, observations floored to month start
    assert [b for b, _ in beer] == [
        "2023-01-01", "2023-02-01", "2023-03-01", "2023-04-01", "2023-05-01"
    ]
    assert beer[0][1] == 10.0 and beer[1][1] == 20.0 and beer[4][1] == 50.0
    assert beer[2][1] is None and beer[3][1] is None


def test_monthly_grid_ffill(monthly_df):
    out = resample_to_regular_grid(
        monthly_df, ["series"], "date", "y", 1, "month", method="ffill"
    )
    beer = dict(_cal_grid(out, "beer"))
    assert beer["2023-03-01"] == 20.0 and beer["2023-04-01"] == 20.0
    gas = dict(_cal_grid(out, "gas"))
    assert [k for k in sorted(gas)] == ["2023-03-01", "2023-04-01", "2023-05-01", "2023-06-01"]
    assert gas["2023-04-01"] == 7.0 and gas["2023-05-01"] == 7.0


def test_monthly_grid_linear_weights_real_time(monthly_df):
    out = resample_to_regular_grid(
        monthly_df, ["series"], "date", "y", 1, "month", method="linear"
    )
    beer = dict(_cal_grid(out, "beer"))
    # x-axis is epoch millis: Feb 1 -> May 1 spans 28+31+30 = 89 days
    # Mar 1 at 28/89, Apr 1 at 59/89 between y=20 and y=50
    assert beer["2023-03-01"] == pytest.approx(20.0 + 30.0 * 28 / 89)
    assert beer["2023-04-01"] == pytest.approx(20.0 + 30.0 * 59 / 89)


def test_quarterly_grid(monthly_df):
    out = resample_to_regular_grid(
        monthly_df, ["series"], "date", "y", 1, "quarter", method="zero"
    )
    beer = _cal_grid(out, "beer")
    # Q1 has Jan+Feb obs (avg), Q2 has May
    assert [b for b, _ in beer] == ["2023-01-01", "2023-04-01"]
    assert beer[0][1] == pytest.approx(15.0)
    assert beer[1][1] == pytest.approx(50.0)
    gas = _cal_grid(out, "gas")
    assert [b for b, _ in gas] == ["2023-01-01", "2023-04-01"]


def test_two_year_grid(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "series": ["x"] * 2,
                "date": pd.to_datetime(["2020-06-01", "2026-02-01"]),
                "y": [1.0, 9.0],
            }
        )
    )
    out = resample_to_regular_grid(
        df, ["series"], "date", "y", 2, "year", method="ffill"
    )
    grid = _cal_grid(out, "x")
    # k=2 year floors anchor at 1970: 2020, 2022, 2024, 2026
    assert [b for b, _ in grid] == [
        "2020-01-01", "2022-01-01", "2024-01-01", "2026-01-01"
    ]
    assert [v for _, v in grid] == [1.0, 1.0, 1.0, 9.0]


def test_monthly_grid_nearest(monthly_df):
    out = resample_to_regular_grid(
        monthly_df, ["series"], "date", "y", 1, "month", method="nearest"
    )
    beer = dict(_cal_grid(out, "beer"))
    # Mar 1: 28d after Feb obs, 61d before May obs -> Feb value
    assert beer["2023-03-01"] == 20.0
    # Apr 1: 59d after Feb, 30d before May -> May value
    assert beer["2023-04-01"] == 50.0


def test_rolling_rows_last3(stocks_df):
    """Archived row-count rolling window (reference dev-plan §8.1):
    trailing 3-row frame truncated at the series start — window holds
    1, 2, then 3 rows; counts rows, not time (the 3-day gap between
    01-05 and 01-08 does not shrink the frame)."""
    from tablecloth_time_spark.operators.rolling import rolling_rows

    out = rolling_rows(
        stocks_df, ["symbol"], ["date"], 3,
        {"r_avg": ("avg", "close"), "r_n": ("count", "close")},
    )
    rows = {
        (r["symbol"], r["date"].date().isoformat()): (r["r_avg"], r["r_n"])
        for r in out.collect()
    }
    assert rows[("AAPL", "2024-01-01")] == (180.0, 1)  # truncated prefix
    assert rows[("AAPL", "2024-01-02")] == (pytest.approx((180 + 182.5) / 2), 2)
    assert rows[("AAPL", "2024-01-03")] == (pytest.approx((180 + 182.5 + 181) / 3), 3)
    # across the time gap the frame still holds exactly 3 rows
    assert rows[("AAPL", "2024-01-08")][1] == 3


def test_rolling_rows_min_periods(stocks_df):
    from tablecloth_time_spark.operators.rolling import rolling_rows

    out = rolling_rows(
        stocks_df, ["symbol"], ["date"], 3,
        {"r_avg": ("avg", "close")}, min_periods=3,
    )
    rows = {
        (r["symbol"], r["date"].date().isoformat()): r["r_avg"]
        for r in out.collect()
    }
    assert rows[("AAPL", "2024-01-01")] is None
    assert rows[("AAPL", "2024-01-02")] is None
    assert rows[("AAPL", "2024-01-03")] == pytest.approx((180 + 182.5 + 181) / 3)


def test_rolling_rows_rejects_bad_window(stocks_df):
    from tablecloth_time_spark.operators.rolling import rolling_rows

    with pytest.raises(ValueError, match="window must be >= 1"):
        rolling_rows(stocks_df, ["symbol"], ["date"], 0, {"r": ("avg", "close")})


def test_gapfill_zoned_daily_grid_dst_golden(spark):
    """A Europe/Berlin daily grid steps 24 LOCAL hours: 23 UTC hours into
    the spring-forward day, 25 out of the fall-back day; every grid point
    is the UTC instant of a Berlin local midnight, and ffill crosses the
    transitions like any other gap."""
    from tablecloth_time_spark.operators.gapfill import (
        resample_to_regular_grid,
    )

    # observations straddling the 2024-03-31 spring-forward (Berlin):
    # one before, a 3-day gap, one after
    pdf = pd.DataFrame(
        {
            "k": [1, 1],
            "ts": pd.to_datetime(
                ["2024-03-29 12:00:00", "2024-04-02 09:00:00"]  # UTC
            ),
            "v": [10.0, 20.0],
        }
    )
    out = (
        resample_to_regular_grid(
            spark.createDataFrame(pdf), ["k"], "ts", "v", 1, "day",
            method="ffill", zone="Europe/Berlin",
        )
        .toPandas()
        .sort_values("bucket", kind="stable")
        .reset_index(drop=True)
    )
    buckets = pd.to_datetime(out["bucket"])
    # local midnights as UTC instants: 23:00 UTC while CET, 22:00 in CEST
    exp = pd.to_datetime(
        [
            "2024-03-28 23:00:00",  # Mar 29 local midnight (CET)
            "2024-03-29 23:00:00",  # Mar 30
            "2024-03-30 23:00:00",  # Mar 31 (the 23h local day)
            "2024-03-31 22:00:00",  # Apr 1 local midnight (CEST)
            "2024-04-01 22:00:00",  # Apr 2
        ]
    )
    assert list(buckets) == list(exp)
    gaps_h = buckets.diff().dropna().dt.total_seconds().to_numpy() / 3600
    assert list(gaps_h) == [24.0, 24.0, 23.0, 24.0]
    # ffill carries the pre-gap value across the transition
    assert list(out["v"]) == [10.0, 10.0, 10.0, 10.0, 20.0]


def test_gapfill_zoned_fall_back_25h_day(spark):
    """The fall-back day (2024-10-27 Berlin) is 25 UTC hours wide on the
    zoned daily grid."""
    from tablecloth_time_spark.operators.gapfill import (
        resample_to_regular_grid,
    )

    pdf = pd.DataFrame(
        {
            "k": [1, 1],
            "ts": pd.to_datetime(["2024-10-26 10:00:00", "2024-10-29 10:00:00"]),
            "v": [1.0, 2.0],
        }
    )
    out = (
        resample_to_regular_grid(
            spark.createDataFrame(pdf), ["k"], "ts", "v", 1, "day",
            method="none", zone="Europe/Berlin",
        )
        .toPandas()
        .sort_values("bucket", kind="stable")
        .reset_index(drop=True)
    )
    gaps_h = (
        pd.to_datetime(out["bucket"]).diff().dropna().dt.total_seconds() / 3600
    )
    assert 25.0 in list(gaps_h)
    # observed buckets joined onto the zoned grid (no orphan rows)
    assert out["v"].notna().sum() == 2


def test_gapfill_zoned_monthly_grid(spark):
    """Zone-aware CALENDAR grid: Berlin month starts as UTC instants,
    joining exactly onto the zoned monthly buckets."""
    from tablecloth_time_spark.operators.gapfill import (
        resample_to_regular_grid,
    )

    pdf = pd.DataFrame(
        {
            "k": [1, 1],
            "ts": pd.to_datetime(["2024-01-15", "2024-05-20"]),
            "v": [1.0, 5.0],
        }
    )
    out = (
        resample_to_regular_grid(
            spark.createDataFrame(pdf), ["k"], "ts", "v", 1, "month",
            method="none", zone="Europe/Berlin",
        )
        .toPandas()
        .sort_values("bucket", kind="stable")
        .reset_index(drop=True)
    )
    exp = pd.to_datetime(
        [
            "2023-12-31 23:00:00",  # Jan 1 local midnight, CET
            "2024-01-31 23:00:00",
            "2024-02-29 23:00:00",
            "2024-03-31 22:00:00",  # Apr 1, CEST
            "2024-04-30 22:00:00",
        ]
    )
    assert list(pd.to_datetime(out["bucket"])) == list(exp)
    assert out["v"].notna().sum() == 2


def test_gapfill_zone_rejects_subdaily_grid(spark):
    """A sub-daily LOCAL grid is ill-defined across spring-forward
    (duplicate UTC buckets) — zone= requires a >= 1 day step."""
    from tablecloth_time_spark.operators.gapfill import (
        resample_to_regular_grid,
    )

    pdf = pd.DataFrame(
        {"k": [1], "ts": [pd.Timestamp("2024-03-31 00:30:00")], "v": [1.0]}
    )
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="at least one day"):
        resample_to_regular_grid(
            df, ["k"], "ts", "v", 1, "hour", zone="Europe/Berlin"
        )
    # daily and calendar zoned grids remain fine
    resample_to_regular_grid(
        df, ["k"], "ts", "v", 1, "day", zone="Europe/Berlin"
    ).collect()
