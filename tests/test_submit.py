"""End-to-end spark-submit --py-files test (north-star deployment shape).

Runs scripts/run_pipeline.py under a real spark-submit from a NEUTRAL cwd,
with the package supplied ONLY via the dist zip — proving the artifact is
self-contained. Output tiers must equal the in-process rollup exactly.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pandas as pd
import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or os.path.join(
    os.path.dirname(sys.modules["pyspark"].__file__)
    if "pyspark" in sys.modules
    else "",
    "bin",
    "spark-submit",
)


@pytest.mark.slow
def test_spark_submit_full_pipeline(spark, transcripts_df, tmp_path):
    from scripts.package import build

    zip_path = build(str(tmp_path / "dist"))
    src_dir = str(tmp_path / "input")
    out_dir = str(tmp_path / "out")
    transcripts_df.write.parquet(src_dir)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "run_pipeline.py"),
            "full",
            "--input", src_dir,
            "--output", out_dir,
            "--tiers", "minute,hour,day",
            "--compress-tier", "minute",
            "--salt", "4",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # neutral cwd: repo not importable from here
        timeout=480,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    report = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert set(report["tiers"]) == {"minute", "hour", "day"}
    assert report["compression"]["ratio"] is not None

    # written tiers equal the in-process cascade bit-for-bit
    from tablecloth_time_spark.operators.rollup import rollup

    batch = transcripts_df.withColumn("text_len", F.length("text").cast("long"))
    for tier, (iv, unit) in {"minute": (1, "minute"), "day": (1, "day")}.items():
        got = (
            spark.read.parquet(f"{out_dir}/tiers/{tier}")
            .toPandas()
            .sort_values(["conv_id", "bucket"], kind="stable")
            .reset_index(drop=True)
        )
        exp = (
            rollup(
                batch, ["conv_id"], "ts", iv, unit,
                {
                    "n_turns": ("count", "turn_idx"),
                    "sum_chars": ("sum", "text_len"),
                    "min_turn": ("min", "turn_idx"),
                    "max_turn": ("max", "turn_idx"),
                    "first_role": ("first", "role"),
                    "last_role": ("last", "role"),
                },
                order_cols=["ts", "turn_idx"],
            )
            .toPandas()
            .sort_values(["conv_id", "bucket"], kind="stable")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
        )
        assert report["tiers"][tier] == len(exp)


def test_committed_dist_zip_is_current():
    """The committed dist/tablecloth_time_spark.zip must match the working
    tree byte-for-byte — r4 review caught it lagging 5 library files (a
    deploy would have ImportError'd on ccf and rejected method='ses').
    Regenerate with `python scripts/package.py` whenever the package
    changes."""
    import zipfile
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    zip_path = repo / "dist" / "tablecloth_time_spark.zip"
    assert zip_path.exists(), "dist zip missing — run scripts/package.py"
    z = zipfile.ZipFile(zip_path)
    names = set(z.namelist())
    stale = []
    pkg = repo / "tablecloth_time_spark"
    for src in sorted(pkg.rglob("*.py")):
        rel = src.relative_to(repo).as_posix()
        if "__pycache__" in rel:
            continue
        if rel not in names:
            stale.append(f"missing from zip: {rel}")
        elif z.read(rel) != src.read_bytes():
            stale.append(f"outdated in zip: {rel}")
    extra = [
        n for n in names
        if n.endswith(".py") and not (repo / n).exists()
    ]
    stale += [f"deleted on disk but still in zip: {n}" for n in extra]
    assert not stale, "\n".join(
        ["dist zip is stale — run scripts/package.py:"] + stale
    )
