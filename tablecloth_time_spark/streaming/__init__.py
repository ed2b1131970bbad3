from tablecloth_time_spark.streaming.rollup import (
    streaming_rollup,
    streaming_rollup_to_sink,
)

__all__ = ["streaming_rollup", "streaming_rollup_to_sink"]
