from tablecloth_time_spark.streaming.rollup import (
    streaming_rollup,
    streaming_rollup_to_sink,
    streaming_sessionize,
)
from tablecloth_time_spark.streaming.stateful import streaming_counter_rate

__all__ = [
    "streaming_rollup",
    "streaming_rollup_to_sink",
    "streaming_sessionize",
    "streaming_counter_rate",
]
