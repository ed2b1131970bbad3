"""Guards on the __spark_entry__ driver contract plumbing.

The negative-zero canonicalization (_nz / _nz_sql) must stay in lock-step
on both engine sides, and the baked _NZ_FLOAT_COLS dict must track the
oracle SQL (regenerate with scripts/gen_nz_cols.py when queries change).
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"


def test_nz_wrapper_clears_negative_zero(spark):
    def q(spark_, sf_dir_):
        return spark_.range(1).select(
            F.lit(-0.0).alias("d"),
            F.lit(-0.0).cast("float").alias("f"),
            F.lit(float("nan")).alias("nan_d"),
            F.lit(None).cast("double").alias("null_d"),
            F.lit(-1.5).alias("neg"),
            F.lit("x").alias("s"),
        )

    row = E._nz(q)(spark, SF_SMALL).collect()[0]
    assert math.copysign(1.0, row["d"]) == 1.0
    assert math.copysign(1.0, float(row["f"])) == 1.0
    assert math.isnan(row["nan_d"])
    assert row["null_d"] is None
    assert row["neg"] == -1.5
    assert row["s"] == "x"
    # schema is untouched
    assert dict(E._nz(q)(spark, SF_SMALL).dtypes) == dict(q(spark, SF_SMALL).dtypes)


def test_nz_sql_clears_negative_zero():
    con = duckdb.connect()
    sql = "SELECT -0.0::DOUBLE AS d, -0.0::REAL AS f, 'x' AS s"
    out = con.execute(
        E._nz_sql(sql, [("d", "DOUBLE"), ("f", "REAL")])
    ).fetchdf()
    assert math.copysign(1.0, out["d"][0]) == 1.0
    assert math.copysign(1.0, float(out["f"][0])) == 1.0
    assert str(out["d"].dtype) == "float64" and str(out["f"].dtype) == "float32"
    assert out["s"][0] == "x"


@pytest.mark.skipif(not os.path.isdir(SF_SMALL), reason="driver testdata absent")
def test_nz_float_cols_in_sync_with_oracles():
    """The baked _NZ_FLOAT_COLS must equal a fresh DESCRIBE derivation —
    a stale dict would leave a new rounded column un-canonicalized on the
    DuckDB side only, recreating the r3 level_shifts hash mismatch."""
    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
        ),
    )
    from gen_nz_cols import derive

    assert derive(SF_SMALL) == E._NZ_FLOAT_COLS


def test_every_oracle_has_a_query():
    qs, sqls = E._raw_queries(), E._raw_oracle_sql()
    assert set(sqls) <= set(qs)
    assert set(E._NZ_FLOAT_COLS) <= set(sqls)
