"""Pipeline plans: snapshot-incremental continuous aggregates, retention,
checkpoint manifests — the orchestration layer over the operator library."""

from tablecloth_time_spark.plans.continuous import ContinuousAggregate, TierSpec
from tablecloth_time_spark.plans.snapshots import SnapshotTable

__all__ = ["ContinuousAggregate", "SnapshotTable", "TierSpec"]
