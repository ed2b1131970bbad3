"""tablecloth_time_spark — a from-scratch, PySpark-native time-series engine.

Re-expresses the query semantics of scicloj/tablecloth.time (reference at
/root/reference, studied behaviorally only) as a distributed rollup +
downsample + gap-fill + retention pipeline over tables of multi-turn
transcripts, built Spark-first:

- every time computation is a Catalyst column expression (the reference's
  "millis pivot" — int64 epoch-millis arithmetic — maps 1:1 onto
  ``unix_millis``/``timestamp_millis`` whole-stage-codegen exprs);
- range selection ("slice") is a pushed-down filter, the distributed
  analogue of the reference's binary search over a sorted column;
- resampling ("adjust-frequency") is the documented composition
  bucket-column -> groupBy -> agg, executed as Spark partial/final hash
  aggregation with optional explicit salting for skewed series keys;
- the slow path (linear interpolation, ACF, Gorilla/delta-of-delta codecs)
  is Arrow-vectorized pandas UDFs — never per-row Python.

Package layout:
  functions/   pure Catalyst column-expression library (timeops, text,
               units, zones, tagged time-literals)
  operators/   dataset-level operators (slice, shifts, add_time_columns,
               rollup tiers, gap-fill, rolling, ACF, Gorilla/delta-of-delta
               compression, dedup, similarity, multimodal plumbing)
  sources/     synthetic transcripts generator
  plans/       snapshot-log table format (Iceberg-like incremental reads
               without the Iceberg jar), continuous-aggregate maintenance,
               checkpoint manifest, retention expiry
  oracle/      single-node pandas/numpy reference implementation used for
               bit-for-bit differential testing
  streaming/   Structured Streaming rollup (watermark + windowed agg)
"""

__version__ = "0.1.0"

from tablecloth_time_spark.session import get_session  # noqa: F401
from tablecloth_time_spark.operators.slice import slice_time  # noqa: F401
from tablecloth_time_spark.operators.rollup import (  # noqa: F401
    rollup,
    rollup_cascade,
    rollup_tiers_long,
)
from tablecloth_time_spark.operators.asof import asof_join  # noqa: F401
from tablecloth_time_spark.operators.sessions import (  # noqa: F401
    session_stats,
    sessionize,
)
from tablecloth_time_spark.operators.validate import (  # noqa: F401
    ensure_time_column,
    is_sorted,
)
from tablecloth_time_spark.operators.gapfill import (  # noqa: F401
    resample_to_regular_grid,
)
from tablecloth_time_spark.operators.rolling import rolling  # noqa: F401
from tablecloth_time_spark.operators.counters import (  # noqa: F401
    counter_rate,
    detect_gaps,
    ewma,
    time_weighted_avg,
)
from tablecloth_time_spark.operators.intervals import interval_join  # noqa: F401
from tablecloth_time_spark.operators.rollup import ohlc  # noqa: F401
from tablecloth_time_spark.operators.stats import (  # noqa: F401
    distinct_rollup,
    percentile_rollup,
    topk_per_bucket,
)
from tablecloth_time_spark.operators.downsample import lttb_downsample  # noqa: F401
