"""Batched per-group pandas execution: mapInPandas over co-sorted groups.

``DataFrame.groupBy(...).applyInPandas(fn)`` pays a full Spark round-trip
per GROUP — ruinous when groups are small and plentiful (millions of
per-conversation series). This utility gets the same per-group semantics
at per-BATCH cost: one shuffle co-locates each group, an in-partition sort
makes groups contiguous (and rows ordered), and a mapInPandas stream
applies ``fn`` to each complete group inside whole Arrow batches. A group
that spans an Arrow batch boundary is held back (``pending``) until its
remaining rows arrive — correctness does not depend on batch size.

Used by gapfill's interpolation kernels; operators/compress.py uses the
same pattern with a fully-numpy kernel inlined.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def stream_nparts(spark, npartitions: int | None = None) -> int:
    """Partition count for Arrow-kernel stages: at least 4 task WAVES.

    With exactly one partition per core, the JVM Arrow serializer and the
    Python worker of each task alternate in lockstep and any imbalance
    lands on the critical path (measured 3.5x slower on an 18M-row
    identity round-trip at 32 cores). Several waves pipeline JVM I/O with
    Python compute and let AQE/scheduling absorb stragglers. Shared by
    grouped_apply_stream and operators/compress.compress_series.
    """
    return npartitions or max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        spark.sparkContext.defaultParallelism * 4,
    )


def grouped_apply_stream(
    df: DataFrame,
    group_cols: list[str],
    sort_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema,
    npartitions: int | None = None,
) -> DataFrame:
    """Apply ``fn`` once per (group_cols) group; rows arrive sorted by
    ``sort_cols`` within each group. ``schema`` is the output schema.

    (A ``whole_batch`` slab mode existed while the ewma Arrow kernel
    needed cross-group vectorization; the r4 pure-window ewma retired its
    only caller, so the mode was removed rather than kept untested.)"""
    spark = df.sparkSession
    nparts = stream_nparts(spark, npartitions)
    part = df.repartition(nparts, *group_cols).sortWithinPartitions(
        *group_cols, *sort_cols
    )

    def apply_groups(pdf: pd.DataFrame) -> pd.DataFrame | None:
        # dropna=False: a null group key is a real group (Spark groupBy /
        # window semantics); the default would silently drop its rows
        outs = [
            fn(g)
            for _, g in pdf.groupby(list(group_cols), sort=False, dropna=False)
        ]
        outs = [o for o in outs if o is not None and len(o)]
        return pd.concat(outs, ignore_index=True) if outs else None

    def stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pending: pd.DataFrame | None = None
        for pdf in batches:
            if pending is not None and len(pending):
                pdf = pd.concat([pending, pdf], ignore_index=True)
                pending = None
            if not len(pdf):
                continue
            tail = np.ones(len(pdf), dtype=bool)
            for c in group_cols:
                last = pdf[c].iloc[-1]
                if pd.isna(last):  # NaN != NaN — null-safe tail comparison
                    tail &= pdf[c].isna().to_numpy()
                else:
                    tail &= (pdf[c] == last).to_numpy()
            not_tail = np.flatnonzero(~tail)
            cut = int(not_tail[-1]) + 1 if len(not_tail) else 0
            pending = pdf.iloc[cut:]
            if cut:
                out = apply_groups(pdf.iloc[:cut])
                if out is not None:
                    yield out
        if pending is not None and len(pending):
            out = apply_groups(pending)
            if out is not None:
                yield out

    return part.mapInPandas(stream, schema)
