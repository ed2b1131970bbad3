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
    src.append(transcripts_df.withColumn("text_len", F.length("text").cast("long")))
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
    # default TIER_UNITS have no retention in run_pipeline's DEFAULT setup;
    # expire still runs and reports (possibly empty) per-tier drops
    pipeline_main(
        [
            "expire",
            "--source-table", src.root,
            "--output", f"{base}/agg",
            "--tiers", "minute,hour",
            "--as-of", str(max_date),
        ]
    )
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "expired" in report
