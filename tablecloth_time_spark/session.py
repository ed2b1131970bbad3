"""SparkSession factory with the engine's required configuration.

The reference pins UTC for ``convert-time`` and its tests pass
``{:zone "UTC"}`` everywhere (reference src/tablecloth/time/column/api.clj:42-43,
test/tablecloth/time/column/api_test.clj:11-28); the engine makes that global:
``spark.sql.session.timeZone=UTC`` so TimestampType reproduces the reference's
UTC-default calendar-local semantics.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_session(
    app_name: str = "tablecloth_time_spark",
    master: str | None = None,
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession configured for the engine.

    - UTC session timezone (reference semantics; also required for DuckDB
      oracle comparison — DuckDB parquet timestamps are UTC-naive).
    - AQE on (runtime coalesce + skew handling backstop; explicit salting
      in operators/rollup.py is the primary skew strategy).
    - Arrow enabled for all pandas-UDF boundaries.
    - shuffle partitions sized to cores (local mode), not the 200 default.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if master is None:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 4)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
