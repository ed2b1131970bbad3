"""Regenerate __spark_entry__._NZ_FLOAT_COLS — the float/double output
columns per oracle query that the -0.0 canonicalization (_nz / _nz_sql)
rewrites on the DuckDB side.

Runs DESCRIBE over every raw oracle SQL (views registered at sf0.001,
types are SF-independent) and prints the dict literal to paste into
__spark_entry__.py. tests/test_entry_contract.py re-derives the same dict
and asserts the baked copy is in sync.

Usage: python scripts/gen_nz_cols.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

FLOAT_TYPES = {"DOUBLE": "DOUBLE", "FLOAT": "REAL", "REAL": "REAL"}


def derive(sf_dir: str) -> dict[str, list[tuple[str, str]]]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    out: dict[str, list[tuple[str, str]]] = {}
    for name, sql in E._raw_oracle_sql().items():
        desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        cols = [
            (cname, FLOAT_TYPES[ctype])
            for cname, ctype, *_ in desc
            if ctype in FLOAT_TYPES
        ]
        if cols:
            out[name] = cols
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = derive(sf_dir)
    print("_NZ_FLOAT_COLS: dict[str, list[tuple[str, str]]] = {")
    for name, cols in out.items():
        body = ", ".join(f'("{c}", "{t}")' for c, t in cols)
        print(f'    "{name}": [{body}],')
    print("}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
