"""Single-node pandas/numpy oracle — the engine's differential-test target."""

from tablecloth_time_spark.oracle import timeops as oracle_timeops  # noqa: F401
