"""Scaling-efficiency evidence for the BASELINE.json north rule.

No multi-node cluster exists in this sandbox, so per the driver protocol the
"N -> 4N executors" criterion is evidenced by running the SAME job on the
SAME input at two parallelism levels on one host: local[8] (N) and
local[32] (4N), shuffle partitions scaled with cores, fresh JVM per level,
each level's process tree pinned (taskset) to exactly N CPUs so JVM task
threads and Arrow Python workers share the same N cores an N-core
executor fleet would give them.

Job under measurement = the engine's headline pipeline on the synthetic
transcripts table (BASELINE.json input_hint shape):
  1. full retention-tier rollup cascade (second/minute/hour/day),
  2. Gorilla/DoD block compression of the minute tier.
Input generation + cache materialization are excluded from the timed
region; only the distributed compute is measured.

Usage:
  python scripts/bench_scaling.py              # both levels + report
  python scripts/bench_scaling.py --worker 8   # one level, JSON to stdout

Writes BENCH/BASELINE.md and prints one JSON summary line.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_CONV = int(os.environ.get("SCALING_N_CONV", "360000"))
REPLICATE = int(os.environ.get("SCALING_REPLICATE", "3"))
CORES_LO = int(os.environ.get("SCALING_CORES_LO", "8"))
CORES_HI = int(os.environ.get("SCALING_CORES_HI", "32"))
MANUAL_MARKER = "<!-- MANUAL -->"
INPUT_DIR = os.environ.get("SCALING_INPUT_DIR", "/tmp/tts_scaling_input")
# > 0 adds ONE conversation holding this share of ALL turns (the
# BENCH/SKEW.md mega-thread fixture at headline scale). Run skewed pairs
# with SCALING_REPLICATE=1 so the mega thread stays a single conversation
# (the worker's conv_id replication would split it into REPLICATE
# same-sized threads and dilute the skew). Skewed runs print the JSON
# summary but do NOT rewrite the BASELINE.md header (hand-recorded in the
# manual pair table instead).
MEGA_SHARE = float(os.environ.get("SCALING_MEGA_SHARE", "0"))
MEGA_DAYS = int(os.environ.get("SCALING_MEGA_DAYS", "30"))


def input_path() -> str:
    tag = f"_mega{MEGA_SHARE}" if MEGA_SHARE > 0 else ""
    return os.path.join(INPUT_DIR, f"transcripts_{N_CONV}{tag}.parquet")


def ensure_input() -> str:
    """Generate the shared input parquet once (pandas+pyarrow, no Spark):
    both parallelism levels must read IDENTICAL bytes."""
    path = input_path()
    if os.path.exists(path):
        return path
    import pyarrow as pa
    import pyarrow.parquet as pq

    from tablecloth_time_spark.sources.transcripts import (
        generate_transcripts_pandas,
    )

    os.makedirs(INPUT_DIR, exist_ok=True)
    chunk = 60000
    tmp = path + ".tmp"
    writer = None
    n_base = 0
    for off in range(0, N_CONV, chunk):
        pdf = generate_transcripts_pandas(
            n_conv=min(chunk, N_CONV - off), seed=42 + off
        )
        pdf["conv_id"] = pdf["conv_id"] + f"_{off}"
        # Spark cannot read TIMESTAMP(NANOS) parquet; values are ms-precision
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        n_base += len(pdf)
        tbl = pa.Table.from_pandas(pdf, preserve_index=False)
        if writer is None:
            writer = pq.ParquetWriter(tmp, tbl.schema)
        writer.write_table(tbl)
    if MEGA_SHARE > 0:
        # ONE conversation holding MEGA_SHARE of all turns over MEGA_DAYS
        # days (the BENCH/SKEW.md fixture shape, deterministic)
        import numpy as np
        import pandas as pd

        mega_n = int(n_base * MEGA_SHARE / (1 - MEGA_SHARE))
        rng = np.random.default_rng(7)
        gap_mean = max(1, int(MEGA_DAYS * 86_400_000 / mega_n))
        gaps = rng.integers(
            max(1, gap_mean // 2), gap_mean * 2, size=mega_n
        ).astype("int64")
        ts0 = pd.Timestamp("2025-01-01").value // 1_000_000
        mega = pd.DataFrame(
            {
                "conv_id": "mega_thread",
                "turn_idx": np.arange(mega_n, dtype="int32"),
                "role": np.tile(
                    ["user", "assistant", "tool"], mega_n // 3 + 1
                )[:mega_n],
                "text": "mega turn payload " * 3,
                "tool": None,
                "ts": pd.to_datetime(
                    ts0 + np.cumsum(gaps), unit="ms"
                ).astype("datetime64[us]"),
            }
        )
        writer.write_table(
            pa.Table.from_pandas(
                mega, schema=writer.schema, preserve_index=False
            )
        )
    writer.close()
    os.replace(tmp, path)
    return path


def worker(cores: int) -> None:
    from pyspark.sql import functions as F

    from tablecloth_time_spark.operators.compress import compress_series
    from tablecloth_time_spark.operators.rollup import rollup_cascade
    from tablecloth_time_spark.session import get_session

    spark = get_session(
        f"scaling-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={
            # bigger Arrow batches: fewer JVM<->Python crossings in the
            # compression kernel (each batch has fixed transfer overhead)
            "spark.sql.execution.arrow.maxRecordsPerBatch": "50000",
        },
    )
    base = (
        spark.read.parquet(input_path())
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("text_len", F.length("text").cast("long"))
    )
    # replicate with distinct conv_ids: 3x the series at zero generation
    # cost, so per-stage fixed scheduling latency (~100ms/stage) is noise
    # against real work at BOTH parallelism levels
    from functools import reduce as _reduce

    df = _reduce(
        lambda a, b: a.unionByName(b),
        [
            base.withColumn("conv_id", F.concat("conv_id", F.lit(f"#{i}")))
            for i in range(REPLICATE)
        ],
    )
    # round-robin, NOT hash-by-conv_id: every downstream stage exchanges on
    # its own keys ((conv, bucket) for the rollup, (conv, block) for the
    # compress kernel), so conv-keyed input layout buys no shuffle back —
    # and under mega-thread skew it single-handedly breaks scaling: one
    # conversation holding 10% of all turns lands in ONE cache partition,
    # a map-stage straggler that costs more the wider the level (measured:
    # the r5 skewed pair read cascade 0.70 with conv-hash layout, 2.5x
    # average partition at 16 partitions vs 1.4x at 4).
    df = df.repartition(cores * 2)
    df.cache()
    n_turns = df.count()  # materialize OUTSIDE the timed region

    aggs = {
        "n_turns": ("count", "turn_idx"),
        "sum_chars": ("sum", "text_len"),
        "min_turn": ("min", "turn_idx"),
        "max_turn": ("max", "turn_idx"),
        "first_role": ("first", "role"),
        "last_role": ("last", "role"),
    }

    from functools import reduce

    def pipeline() -> dict:
        t0 = time.perf_counter()
        tiers = rollup_cascade(
            df, ["conv_id"], "ts", aggs, order_cols=["ts", "turn_idx"]
        )
        counts = reduce(
            lambda a, b: a.unionAll(b),
            [t.groupBy().count() for t in tiers.values()],
        )
        tier_points = counts.agg(F.sum("count")).collect()[0][0]
        t_cascade = time.perf_counter() - t0

        minute = tiers["minute"].withColumn(
            "rate", F.col("n_turns").cast("double")
        )
        t0 = time.perf_counter()
        blocks = compress_series(
            minute,
            ts_col="bucket",
            value_cols={"n_turns": "int", "sum_chars": "int", "rate": "float"},
            key_col="conv_id",
            block_unit="day",
        )
        stats = blocks.agg(
            F.sum("n_points").alias("pts"),
            F.sum("raw_bytes").alias("raw"),
            F.sum("enc_bytes").alias("enc"),
        ).collect()[0]
        t_compress = time.perf_counter() - t0
        return {
            "tier_points": tier_points,
            "cascade_sec": round(t_cascade, 3),
            "compress_sec": round(t_compress, 3),
            "compress_points": int(stats["pts"]),
            "compression_ratio": round(stats["raw"] / stats["enc"], 3),
            "total_sec": round(t_cascade + t_compress, 3),
        }

    def reset_caches() -> None:
        # drop the cascade's internal partial cache so every measured run
        # includes the full raw scan; re-materialize only the input
        spark.catalog.clearCache()
        df.cache()
        df.count()

    # warmup run: whole-stage-codegen compile, JVM JIT, Python worker pool
    # spin-up + imports — one-time costs that amortize to zero at the 100 TB
    # target, excluded from the throughput measurement
    pipeline()

    # best-of-3: single-host wall-clock on this sandbox swings up to ~2x
    # under invisible host contention; the minimum is the closest estimate
    # of the uncontended rate at each level
    runs = []
    for _ in range(3):
        reset_caches()
        runs.append(pipeline())
    best = min(runs, key=lambda r: r["total_sec"])

    print(json.dumps({"cores": cores, "n_turns": n_turns, **best}))
    spark.stop()


def run_level(cores: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores))
    cmd = [sys.executable, os.path.abspath(__file__), "--worker", str(cores)]
    # Pin the WHOLE process tree (JVM task threads + Arrow Python workers)
    # to exactly `cores` CPUs. Without this, local[N]'s Python workers are
    # extra processes beyond the JVM's N task threads — a Python-kernel
    # stage at local[8] quietly consumes ~2N host cores, which deflates
    # the measured 8->32 speedup and makes the two levels incomparable.
    # An executor fleet with N total cores runs its Python workers INSIDE
    # those N cores, so the pinned run is the faithful N-vs-4N analogue.
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}", *cmd]
    out = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=1800,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"worker local[{cores}] failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return

    ensure_input()
    lo = run_level(CORES_LO)
    hi = run_level(CORES_HI)

    def pps(r):
        return r["tier_points"] / r["cascade_sec"]

    def cps(r):
        return r["compress_points"] / r["compress_sec"]

    def tps(r):
        return (r["tier_points"] + r["compress_points"]) / r["total_sec"]

    ratio = CORES_HI / CORES_LO
    eff_cascade = (pps(hi) / pps(lo)) / ratio
    eff_total = (tps(hi) / tps(lo)) / ratio
    summary = {
        "metric": "scaling_efficiency",
        "n_conv": N_CONV,
        "mega_share": MEGA_SHARE,
        "n_turns": lo["n_turns"],
        "levels": {f"local[{CORES_LO}]": lo, f"local[{CORES_HI}]": hi},
        "points_per_sec": {
            f"local[{CORES_LO}]": round(tps(lo), 1),
            f"local[{CORES_HI}]": round(tps(hi), 1),
        },
        "efficiency_cascade": round(eff_cascade, 3),
        "efficiency_total": round(eff_total, 3),
        "target": 0.8,
    }

    if MEGA_SHARE > 0:
        # skewed-input pair: print the summary, leave the header (the
        # unskewed headline) intact; record the row in the manual table
        print(json.dumps(summary))
        return

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    report = os.path.join(REPO, "BENCH", "BASELINE.md")
    # everything below the marker is hand-maintained analysis — carry it
    manual_tail = ""
    if os.path.exists(report):
        prev = open(report).read()
        if MANUAL_MARKER in prev:
            manual_tail = MANUAL_MARKER + prev.split(MANUAL_MARKER, 1)[1]
    with open(report, "w") as f:
        f.write(
            f"""# BENCH — scaling-efficiency evidence (north rule)

Same job, same input, two parallelism levels on one 32-core host (fresh
JVM each; the sandbox stand-in for N vs 4N executors per the driver
protocol). Job = retention-tier rollup cascade (second/minute/hour/day)
+ Gorilla/DoD minute-tier block compression over the synthetic
transcripts table ({N_CONV:,} conversations, {lo['n_turns']:,} turns,
input_hint shape, seed=42). Input generation/caching excluded from the
timed region.

| level | cascade sec | tier points | compress sec | points/sec (total) |
|---|---|---|---|---|
| local[{CORES_LO}] (N) | {lo['cascade_sec']} | {lo['tier_points']:,} | {lo['compress_sec']} | {tps(lo):,.0f} |
| local[{CORES_HI}] (4N) | {hi['cascade_sec']} | {hi['tier_points']:,} | {hi['compress_sec']} | {tps(hi):,.0f} |

- **Scaling efficiency (cascade): {eff_cascade:.3f}**
- **Scaling efficiency (cascade + compression): {eff_total:.3f}**
- Target (BASELINE.json north rule): >= 0.8
- Single-run caveat: this section records ONE pair. Host-contention
  weather moves either leg by up to ~1.5x, so an efficiency far from
  1/ratio in EITHER direction (including >1.0, which would mean
  super-linear scaling) is a degraded-leg reading, not signal; the
  round-representative figure is the median over the reproduction
  table in the manual section below.
- Compression ratio (minute tier, ts + 2 int series + 1 float series):
  {lo['compression_ratio']}x

Raw per-level JSON:

```json
{json.dumps(lo, indent=2)}
```

```json
{json.dumps(hi, indent=2)}
```
"""
        )
        if manual_tail:
            f.write("\n" + manual_tail)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
