"""Self-check mimicking the driver's correctness gate — BYTE-exact.

Runs every __spark_entry__.queries() entry on Spark and its oracle_sql()
on DuckDB over the same sf dir, then compares row count, column names,
dtypes, and order-insensitive values (sorted by all columns).

Float columns are compared at the BYTE level (IEEE-754 bit patterns via
numpy views), with both-NaN as the only non-bitwise equality — the
driver's value hash is byte-level, so a tolerance here can (and in r2/r3
did) report green while the driver sees red: r3's level_shifts slipped
through because the old cells_equal treated -0.0 == 0.0 and allowed a
1e-12 tolerance. Numeric dtypes must match exactly (the r2 DECIMAL vs
BIGINT gap); datetimes are canonicalized to datetime64[us] and compared
as int64 with both-NaT equal.

Usage: python scripts/check_contract.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from tablecloth_time_spark.session import get_session  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def col_mismatch(g: pd.Series, w: pd.Series) -> str | None:
    """First mismatch in a column pair, or None. Byte-exact for floats."""
    gk, wk = g.dtype.kind, w.dtype.kind
    if gk == "f" or wk == "f":
        if g.dtype != w.dtype:
            return f"float dtype mismatch: spark={g.dtype} duckdb={w.dtype}"
        x, y = g.to_numpy(), w.to_numpy()
        bits = {"float32": "uint32", "float64": "uint64"}[str(g.dtype)]
        neq = (x.view(bits) != y.view(bits)) & ~(np.isnan(x) & np.isnan(y))
        if neq.any():
            i = int(np.argmax(neq))
            return f"row={i}: spark={x[i]!r} duckdb={y[i]!r} (byte-level)"
        return None
    if gk in "iu" or wk in "iu":
        if g.dtype != w.dtype:
            return f"int dtype mismatch: spark={g.dtype} duckdb={w.dtype}"
        neq = g.to_numpy() != w.to_numpy()
        if neq.any():
            i = int(np.argmax(neq))
            return f"row={i}: spark={g.iloc[i]!r} duckdb={w.iloc[i]!r}"
        return None
    if gk == "M" or wk == "M":
        if g.dtype != w.dtype:
            return f"datetime dtype mismatch: spark={g.dtype} duckdb={w.dtype}"
        x, y = g.to_numpy().view("int64"), w.to_numpy().view("int64")
        neq = x != y
        if neq.any():
            i = int(np.argmax(neq))
            return f"row={i}: spark={g.iloc[i]!r} duckdb={w.iloc[i]!r}"
        return None
    # object / bool / string columns: exact equality, both-null equal
    for i, (a, b) in enumerate(zip(g.tolist(), w.tolist())):
        if a is None and b is None:
            continue
        try:
            if pd.isna(a) and pd.isna(b):
                continue
        except (TypeError, ValueError):
            pass
        if not (a == b):
            return f"row={i}: spark={a!r} duckdb={b!r}"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_session("contract-check", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, sqls = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(fn(spark, sf_dir).toPandas())
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"[FAIL] {name}: spark error: {e}")
            continue
        if name not in sqls:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            want = canon(con.execute(sqls[name]).fetchdf())
        except Exception as e:
            failures.append((name, f"duckdb error: {e}"))
            print(f"[FAIL] {name}: duckdb error: {e}")
            continue
        if list(got.columns) != list(want.columns):
            failures.append((name, f"columns {list(got.columns)} != {list(want.columns)}"))
            print(f"[FAIL] {name}: columns {list(got.columns)} vs {list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append((name, f"rows {len(got)} != {len(want)}"))
            print(f"[FAIL] {name}: rows {len(got)} vs {len(want)}")
            continue
        bad = None
        for c in got.columns:
            msg = col_mismatch(got[c], want[c])
            if msg:
                bad = f"col={c} {msg}"
                break
        if bad:
            failures.append((name, bad))
            print(f"[FAIL] {name}: {bad}")
        else:
            print(f"[ OK ] {name}: {len(got)} rows, {len(got.columns)} cols")

    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
