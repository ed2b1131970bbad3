"""run_pipeline.py incremental/expire modes (in-process, no spark-submit).

The full-mode spark-submit path is covered end-to-end by tests/test_submit.py;
these cover the other two driver modes through the same argparse entry.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from scripts.run_pipeline import main as pipeline_main
from tablecloth_time_spark.plans.snapshots import SnapshotTable


@pytest.fixture()
def snap_source(spark, transcripts_df, tmp_path):
    src = SnapshotTable(spark, str(tmp_path / "src"))
    # RAW input_hint schema (no text_len): the pipeline's prepare hook must
    # derive it, same as full mode does
    src.append(transcripts_df)
    return src, str(tmp_path)


def test_incremental_mode(spark, snap_source, capsys):
    src, base = snap_source
    pipeline_main(
        [
            "incremental",
            "--source-table", src.root,
            "--output", f"{base}/agg",
            "--tiers", "minute,hour",
        ]
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["run"]["status"] == "completed"
    assert report["run"]["tiers"]["minute"] > report["run"]["tiers"]["hour"] > 0

    # second invocation with no new snapshot is a noop
    pipeline_main(
        [
            "incremental",
            "--source-table", src.root,
            "--output", f"{base}/agg",
            "--tiers", "minute,hour",
        ]
    )
    report2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report2["run"]["status"] == "noop"


def test_expire_mode(spark, snap_source, transcripts_df, capsys):
    src, base = snap_source
    pipeline_main(
        [
            "incremental",
            "--source-table", src.root,
            "--output", f"{base}/agg",
            "--tiers", "minute,hour",
        ]
    )
    capsys.readouterr()
    max_date = transcripts_df.agg(F.max(F.to_date("ts"))).collect()[0][0]
    pipeline_main(
        [
            "expire",
            "--source-table", src.root,
            "--output", f"{base}/agg",
            "--tiers", "minute,hour",
            "--retention", "minute=5",
            "--as-of", str(max_date),
        ]
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # transcripts span ~30+ days; a 5-day minute retention drops partitions
    assert report["expired"]["minute"]
    assert "hour" not in report["expired"]  # no retention -> kept forever
    import datetime as dt

    horizon = max_date - dt.timedelta(days=5)
    remaining = spark.read.parquet(f"{base}/agg/tiers/minute")
    assert remaining.filter(F.to_date("bucket") < str(horizon)).count() == 0
    assert remaining.count() > 0

    # expire without --retention is refused, not a silent noop
    with pytest.raises(SystemExit, match="retention"):
        pipeline_main(
            [
                "expire",
                "--source-table", src.root,
                "--output", f"{base}/agg",
                "--tiers", "minute,hour",
                "--as-of", str(max_date),
            ]
        )


def test_status_mode(spark, snap_source, capsys):
    """status prints the manifest summary without a SparkSession and
    errors clearly when no manifest exists."""
    src, base = snap_source
    pipeline_main(
        [
            "incremental",
            "--source-table", src.root,
            "--output", f"{base}/agg2",
            "--tiers", "minute,hour",
        ]
    )
    capsys.readouterr()
    pipeline_main(["status", "--output", f"{base}/agg2"])
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["mode"] == "status"
    assert report["n_runs"] == 1
    assert report["incomplete_runs"] == []
    run = report["runs"][0]
    assert run["status"] == "completed"
    assert run["tiers"]["minute"]["rows_out"] > run["tiers"]["hour"]["rows_out"]
    assert run["tiers"]["minute"]["dirty_partitions"] > 0

    with pytest.raises(SystemExit, match="no manifest"):
        pipeline_main(["status", "--output", f"{base}/nowhere"])
