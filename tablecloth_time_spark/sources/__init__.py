"""Sources: synthetic transcripts generator + snapshot-log table format."""

from tablecloth_time_spark.sources.transcripts import (  # noqa: F401
    TRANSCRIPTS_SCHEMA,
    generate_transcripts_pandas,
    generate_transcripts,
)
