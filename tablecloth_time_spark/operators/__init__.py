"""Dataset-level operators composed from the functions/ expression library."""

from tablecloth_time_spark.operators.slice import slice_time, parse_key  # noqa: F401
from tablecloth_time_spark.operators.shift import (  # noqa: F401
    add_lag,
    add_lags,
    add_lead,
    add_leads,
)
from tablecloth_time_spark.operators.time_columns import add_time_columns  # noqa: F401
from tablecloth_time_spark.operators.rollup import rollup, AGG_BUILDERS  # noqa: F401
