"""Pure Catalyst column-expression library (no UDFs anywhere in here)."""

from tablecloth_time_spark.functions.units import (  # noqa: F401
    CALENDAR_UNITS,
    METRIC_UNITS,
    UNIT_MS,
    is_calendar_unit,
    is_metric_unit,
    milliseconds_in,
    normalize_unit,
)
from tablecloth_time_spark.functions import timeops  # noqa: F401
from tablecloth_time_spark.functions import literals  # noqa: F401
