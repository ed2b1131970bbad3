"""Autocorrelation function per series — the notebook's "core function we
need" (reference notebooks/chapter_02_time_series_graphics.clj:483-505).

r_k = sum_{t>k} (y_t - ybar)(y_{t-k} - ybar) / sum_t (y_t - ybar)^2

Per-series Arrow kernel: the series must be materialized in order to
correlate against itself at every lag, so this is inherently the slow path
— but each group is one numpy vector op, batched through
``grouped_apply_stream`` so Python crossings are per Arrow batch, not per
series.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from tablecloth_time_spark.operators._grouped import grouped_apply_stream


def acf(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    value_col: str,
    max_lag: int,
) -> DataFrame:
    """Returns (*keys, lag int, acf double) for lags 1..max_lag."""
    schema = ", ".join(
        [f"`{k}` string" for k in keys] + ["lag int", "acf double"]
    )

    def _acf(pdf: pd.DataFrame) -> pd.DataFrame:
        y = pdf[value_col].values.astype("float64")
        y = y[~np.isnan(y)]
        n = len(y)
        lags = np.arange(1, max_lag + 1)
        if n < 2:
            vals = np.full(len(lags), np.nan)
        else:
            yc = y - y.mean()
            denom = float(np.dot(yc, yc))
            vals = np.array(
                [
                    np.dot(yc[k:], yc[:-k]) / denom if k < n and denom > 0 else np.nan
                    for k in lags
                ]
            )
        out = {k: [str(pdf[k].iloc[0])] * len(lags) for k in keys}
        out["lag"] = lags.astype("int32")
        out["acf"] = vals
        return pd.DataFrame(out)

    return grouped_apply_stream(df, keys, [order_col], _acf, schema)
