"""Classical decomposition vs an independent numpy re-derivation of the
public fpp3 §3.4 algorithm (centered m-MA / 2xm-MA trend, zero-sum
seasonal indices, remainder)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from tablecloth_time_spark.operators.decompose import classical_decomposition


def ref_decompose(y: np.ndarray, m: int):
    n = len(y)
    trend = np.full(n, np.nan)
    h = m // 2
    if m % 2:
        for i in range(h, n - h):
            trend[i] = np.mean(y[i - h : i + h + 1])
    else:
        w = np.concatenate(([0.5], np.ones(m - 1), [0.5])) / m
        for i in range(h, n - h):
            trend[i] = np.dot(w, y[i - h : i + h + 1])
    detr = y - trend
    seasons = np.arange(n) % m
    s_raw = np.array(
        [np.nanmean(detr[seasons == j]) for j in range(m)]
    )
    s = s_raw - s_raw.mean()
    seasonal = s[seasons]
    return trend, seasonal, y - trend - seasonal


def _series_df(spark, y: np.ndarray, m: int, key: str = "a"):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (key, base + dt.timedelta(days=i), float(v), int(i % m))
        for i, v in enumerate(y)
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, y double, season int")


def _check(spark, y, m):
    df = _series_df(spark, y, m)
    out = (
        classical_decomposition(df, ["k"], "ts", "y", m, season_col="season")
        .orderBy("ts")
        .collect()
    )
    t_ref, s_ref, r_ref = ref_decompose(y, m)
    for i, row in enumerate(out):
        if np.isnan(t_ref[i]):
            assert row["trend"] is None and row["remainder"] is None
        else:
            assert row["trend"] == pytest.approx(t_ref[i], abs=1e-9)
            assert row["remainder"] == pytest.approx(r_ref[i], abs=1e-9)
        assert row["seasonal"] == pytest.approx(s_ref[i], abs=1e-9)
    # seasonal indices sum to ~zero over one period
    assert sum(r["seasonal"] for r in out[:m]) == pytest.approx(0.0, abs=1e-9)


def test_odd_period_weekly(spark):
    rng = np.random.RandomState(7)
    n, m = 70, 7
    seasonal = np.tile([5, -3, 0, 2, -1, -2, -1], n // m)
    y = 0.5 * np.arange(n) + seasonal + rng.normal(0, 0.5, n)
    _check(spark, y, m)


def test_even_period_quarterly(spark):
    """Even m uses the 2xm-MA (half-weight endpoints) — the fpp3 beer
    production shape (m=4)."""
    rng = np.random.RandomState(11)
    n, m = 48, 4
    seasonal = np.tile([10.0, -4.0, -8.0, 2.0], n // m)
    y = 100 + 0.25 * np.arange(n) + seasonal + rng.normal(0, 1.0, n)
    _check(spark, y, m)


def test_pure_signal_recovers_exact_components(spark):
    """With a noiseless linear trend + periodic signal, the classical
    estimate recovers the seasonal pattern exactly (MA of a linear trend
    is the trend; detrended equals the zero-sum seasonal everywhere)."""
    n, m = 35, 7
    season = np.array([4.0, -1.0, -3.0, 2.0, 1.0, -2.0, -1.0])
    y = 10 + 2.0 * np.arange(n) + np.tile(season, n // m)
    df = _series_df(spark, y, m)
    out = classical_decomposition(df, ["k"], "ts", "y", m, season_col="season")
    rows = out.orderBy("ts").collect()
    for i, row in enumerate(rows):
        assert row["seasonal"] == pytest.approx(season[i % m], abs=1e-9)
        if row["remainder"] is not None:
            assert row["remainder"] == pytest.approx(0.0, abs=1e-9)


def test_rejects_bad_period(spark):
    df = _series_df(spark, np.arange(10.0), 2)
    with pytest.raises(ValueError, match="period must be >= 2"):
        classical_decomposition(df, ["k"], "ts", "y", 1, season_col="season")


def test_global_series_no_keys(spark):
    """Empty key list = one global series (crossJoin path for the
    adjustment)."""
    n, m = 21, 7
    y = np.tile([3.0, 0.0, -1.0, 1.0, -2.0, 0.0, -1.0], 3) + 50
    df = _series_df(spark, y, m).drop("k")
    out = classical_decomposition(df, [], "ts", "y", m, season_col="season")
    rows = out.orderBy("ts").collect()
    t_ref, s_ref, _ = ref_decompose(y, m)
    for i, row in enumerate(rows):
        assert row["seasonal"] == pytest.approx(s_ref[i], abs=1e-9)


def test_decomposition_strength(spark):
    """fpp3 ch.4 feature pair: a strongly seasonal sawtooth + linear trend
    scores high on both; white noise scores near zero on both; numpy
    re-derivation pins the exact values."""
    from tablecloth_time_spark.operators.decompose import (
        decomposition_strength,
    )

    rng = np.random.default_rng(13)
    m, n = 7, 84
    t0 = dt.datetime(2024, 1, 1)
    season = np.tile(np.array([10, -4, -6, 2, 8, -12, 2], dtype=float), n // m)
    structured = 0.5 * np.arange(n) + season + rng.normal(0, 0.3, n)
    noise = rng.normal(0, 5, n)
    rows = [
        (k, t0 + dt.timedelta(days=i), float(v), i % m)
        for k, series in (("structured", structured), ("noise", noise))
        for i, v in enumerate(series)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "y", "season"])
    dec = classical_decomposition(
        df, ["k"], "ts", "y", m, season_col=F.col("season")
    )
    got = {
        r["k"]: r
        for r in decomposition_strength(dec, ["k"]).collect()
    }
    assert got["structured"]["trend_strength"] > 0.95
    assert got["structured"]["seasonal_strength"] > 0.95
    assert got["noise"]["trend_strength"] < 0.3
    assert got["noise"]["seasonal_strength"] < 0.4

    # exact pin vs numpy over the same complete-case rows
    for key, series in (("structured", structured), ("noise", noise)):
        tr, se, re_ = ref_decompose(series, m)
        mask = ~np.isnan(tr)
        vr = np.var(re_[mask], ddof=1)
        ts_ = max(0.0, 1 - vr / np.var((tr + re_)[mask], ddof=1))
        ss = max(0.0, 1 - vr / np.var((se + re_)[mask], ddof=1))
        assert got[key]["trend_strength"] == pytest.approx(ts_, rel=1e-9)
        assert got[key]["seasonal_strength"] == pytest.approx(ss, rel=1e-9)
        assert got[key]["n"] == int(mask.sum())


def test_decomposition_strength_undefined_is_null(spark):
    """Constant series: zero-variance denominators must yield NULL
    strengths, not 0.0 (review fix: greatest() skips nulls)."""
    from tablecloth_time_spark.operators.decompose import (
        decomposition_strength,
    )

    n, m = 28, 7
    rows = [
        ("const", dt.datetime(2024, 1, 1) + dt.timedelta(days=i), 5.0, i % m)
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "y", "season"])
    dec = classical_decomposition(
        df, ["k"], "ts", "y", m, season_col=F.col("season")
    )
    r = decomposition_strength(dec, ["k"]).collect()[0]
    assert r["trend_strength"] is None
    assert r["seasonal_strength"] is None
