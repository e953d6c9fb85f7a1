"""Build a NULL-injected copy of a testdata SF directory.

The driver fixtures carry no NULLs, so any query whose Spark and DuckDB
sides disagree about NULL semantics (DISTINCT counting, join keys,
serialization, LIMIT ties under engine-default NULL ordering) passes the
oracle gate while silently diverging on real data.  This tool
deterministically NULLs a small fraction of nullable cells (hash of the
row key — reproducible, engine-independent) and writes parquet twins, so
`python -m tools.parity --sf <out>` becomes a NULL-robustness sweep.

CLI: python -m tools.nullify [--src /root/testdata/sf0.001] [--out /tmp/sfnull]
"""

from __future__ import annotations

import argparse
import hashlib
import os

import duckdb

# table -> [(column, permille nulled)]; key column(s) stay intact so row
# identity survives
PLAN = {
    "events": [("user_id", 20), ("value", 20), ("props", 50), ("event_type", 10)],
    "documents": [("lang", 20), ("source", 20), ("n_chars", 20)],
    "embeddings": [("label", 20)],
    "customer": [("c_acctbal", 10), ("c_mktsegment", 10)],
    "orders": [("o_totalprice", 10)],
    "lineitem": [("l_returnflag", 5)],
    "supplier": [("s_acctbal", 10)],
    "part": [("p_retailprice", 10)],
    "nation": [],
    "region": [],
}

KEYS = {
    "events": "event_id", "documents": "doc_id", "embeddings": "vec_id",
    "customer": "c_custkey", "orders": "o_orderkey",
    "lineitem": "l_orderkey * 16 + l_linenumber", "supplier": "s_suppkey",
    "part": "p_partkey", "nation": "n_nationkey", "region": "r_regionkey",
}


def _null_expr(col: str, key: str, permille: int, salt: str) -> str:
    # deterministic per (key, column): md5-derived integer mod 1000
    h = (
        f"CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR) || '{salt}:{col}'),"
        " 2, 15)) AS BIGINT) % 1000"
    )
    return f"CASE WHEN ({h}) < {permille} THEN NULL ELSE {col} END AS {col}"


def build(src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, cols in PLAN.items():
        path = f"{src}/{table}.parquet"
        nulled = {c: p for c, p in cols}
        all_cols = [
            r[0]
            for r in con.sql(f"DESCRIBE SELECT * FROM '{path}'").fetchall()
        ]
        select = ", ".join(
            _null_expr(c, KEYS[table], nulled[c], table) if c in nulled else c
            for c in all_cols
        )
        con.sql(
            f"COPY (SELECT {select} FROM '{path}') TO '{out}/{table}.parquet'"
            " (FORMAT PARQUET)"
        )
    print(f"wrote NULL-injected tables to {out}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/sfnull")
    args = ap.parse_args()
    build(args.src, args.out)


if __name__ == "__main__":
    main()
