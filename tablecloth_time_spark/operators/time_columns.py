"""add_time_columns — derive N named fields from one datetime column.

One ``select`` projection; Catalyst collapses all field expressions into a
single whole-stage-codegen stage with zero shuffles (the reference realizes
lazy per-field readers; the Spark plan fuses identically). Field names
accept both vector form (field names become column names) and mapping form
{field -> output name}; unknown fields raise, matching the reference's
dataset API contract (reference src/tablecloth/time/api.clj:117-169).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import DataFrame

from tablecloth_time_spark.functions.timeops import ALL_FIELDS, field_expr


def add_time_columns(df: DataFrame, time_col: str, fields) -> DataFrame:
    """Add derived time columns.

    fields: list of field names (output column = field name with '-'
    replaced by '_'), or mapping {field: output_name}, or the string
    'all' for every known field.
    """
    if time_col not in df.columns:
        raise ValueError(f"time column {time_col!r} not found")
    if fields == "all":
        fields = sorted(ALL_FIELDS)
    if isinstance(fields, Mapping):
        pairs = [(f, str(name)) for f, name in fields.items()]
    elif isinstance(fields, Iterable) and not isinstance(fields, str):
        pairs = [(f, str(f).replace("-", "_")) for f in fields]
    else:
        raise ValueError("fields must be a list, mapping, or 'all'")
    exprs = [field_expr(f, time_col).alias(name) for f, name in pairs]
    return df.select("*", *exprs)
