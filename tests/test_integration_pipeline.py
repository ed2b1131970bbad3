"""End-to-end composition: the operators must CHAIN, not just pass their
unit oracles — slice -> tier rollup -> regular-grid gap-fill -> benchmark
forecast -> accuracy backtest over the synthetic transcripts table, with
cross-stage invariants checked at each seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tablecloth_time_spark.operators.forecast import (
    backtest_accuracy,
    benchmark_forecast,
)
from tablecloth_time_spark.operators.gapfill import resample_to_regular_grid
from tablecloth_time_spark.operators.rollup import rollup
from tablecloth_time_spark.operators.slice import slice_time


@pytest.fixture(scope="module")
def hourly_series(spark, transcripts_df):
    """Hourly turn counts per conversation over a sliced range, zero-filled
    onto a regular grid — the engine's canonical resample recipe output."""
    sliced = slice_time(transcripts_df, "ts", "2025-01-01", "2025-02-15")
    hourly = rollup(
        sliced, ["conv_id"], "ts", 1, "hour",
        {"n_turns": ("count", "turn_idx")},
        order_cols=["ts", "turn_idx"],
    )
    grid = resample_to_regular_grid(
        hourly, ["conv_id"], "bucket", "n_turns", 1, "hour", method="zero",
        agg="sum",
    )
    grid.cache().count()
    return sliced, hourly, grid


def test_grid_is_regular_and_conserves_counts(spark, hourly_series):
    sliced, hourly, grid = hourly_series
    # zero-fill adds grid rows but must not change total turns
    assert (
        grid.agg(F.sum("n_turns")).collect()[0][0]
        == hourly.agg(F.sum("n_turns")).collect()[0][0]
        == sliced.count()
    )
    # every series is a dense hourly grid: rows == span_hours + 1
    spans = grid.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("rows"),
        (
            (F.unix_millis(F.max("bucket")) - F.unix_millis(F.min("bucket")))
            / 3_600_000
        ).alias("span_h"),
    )
    irregular = spans.filter(F.col("rows") != F.col("span_h") + 1).count()
    assert irregular == 0


def test_forecast_composes_on_gapfilled_grid(spark, hourly_series):
    _, _, grid = hourly_series
    # keep conversations long enough to hold out an 8h test tail
    # (fixture conversations span up to ~32 grid hours)
    longest = grid.groupBy("conv_id").count().filter("count >= 20")
    series = grid.join(longest.select("conv_id"), "conv_id")
    n_keys = longest.count()
    assert n_keys > 0, "fixture needs at least one 20h conversation"

    fc = benchmark_forecast(
        series, "conv_id", "bucket", "n_turns", horizon=6, interval=1,
        unit="hour", methods=("mean", "naive", "drift"),
    )
    assert fc.count() == n_keys * 3 * 6
    # forecast timestamps continue each series' grid: h=1 is exactly one
    # hour after the series' max bucket
    last = series.groupBy("conv_id").agg(F.max("bucket").alias("last_b"))
    misaligned = (
        fc.filter("h = 1")
        .join(last, "conv_id")
        .filter(
            F.unix_millis("ts")
            != F.unix_millis("last_b") + F.lit(3_600_000)
        )
        .count()
    )
    assert misaligned == 0

    acc = backtest_accuracy(
        series, "conv_id", "bucket", "n_turns", test_steps=8, interval=1,
        unit="hour", methods=("mean", "naive", "drift"),
    )
    rows = acc.collect()
    assert len(rows) == n_keys * 3
    # a zero-filled count series always has a defined scale (gaps exist),
    # and every score is finite and non-negative
    for r in rows:
        assert r["mae"] is not None and r["mae"] >= 0
        assert r["rmse"] >= r["mae"] - 1e-9  # RMSE >= MAE always
