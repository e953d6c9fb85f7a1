"""Perturbed-corpus twin builder — one entry point for the four
robustness sweeps (round-6 verdict item: unify the ad-hoc twin
scripts).

The driver fixtures are clean: no NULLs, ASCII text, post-1970
timestamps, non-empty tables.  Real corpora are none of those, and a
query whose Spark and DuckDB sides disagree only on dirty data passes
the oracle gate while silently diverging in production.  Each mode
deterministically dirties ONE hazard and writes a full parquet twin of
a testdata SF directory, so the same parity harness becomes a
robustness sweep:

    python -m tools.perturb --mode null     [--src ...] [--out ...]
    python -m tools.perturb --mode unicode
    python -m tools.perturb --mode pre1970
    python -m tools.perturb --mode empty
    python -m tools.parity --sf <out>       # the sweep itself

Modes:
- ``null``     — NULLs a small deterministic fraction of nullable cells
                 (md5 of the row key: reproducible, engine-independent);
                 key columns stay intact so row identity survives.
- ``unicode``  — prefixes 1/4 of documents with CJK / emoji / RTL /
                 combining text (and fixes n_chars to match).
- ``pre1970``  — shifts 1/7 of events 59 years back, planting negative
                 epochs (the reference's date math is 1970-naive;
                 ours must not be).
- ``empty``    — zero-row twins of every table with intact schemas
                 (fits and stats must degrade gracefully, not throw).

Used by tests/test_null_robustness.py, test_unicode_robustness.py,
test_pre1970_robustness.py, test_empty_input.py.
"""

from __future__ import annotations

import argparse
import os
import shutil

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

MODES = ("null", "unicode", "pre1970", "empty")

# --- null mode -------------------------------------------------------------
# table -> [(column, permille nulled)]; key column(s) stay intact so row
# identity survives
NULL_PLAN = {
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

NULL_KEYS = {
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


def _build_null_table(con, table: str, src: str, dst: str) -> None:
    nulled = dict(NULL_PLAN[table])
    all_cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
    select = ", ".join(
        _null_expr(c, NULL_KEYS[table], nulled[c], table) if c in nulled else c
        for c in all_cols
    )
    con.sql(f"COPY (SELECT {select} FROM '{src}') TO '{dst}' (FORMAT PARQUET)")


# --- unicode mode ----------------------------------------------------------

_UNICODE_INJECT = """
COPY (
  SELECT doc_id,
         CASE doc_id % 12
           WHEN 0 THEN '数据 处理 straße ' || text
           WHEN 5 THEN 'café naïve 🚀 émoji ' || text
           WHEN 9 THEN 'مرحبا بالعالم ' || text
           ELSE text END AS text,
         lang, source,
         CASE doc_id % 12
           WHEN 0 THEN length('数据 处理 straße ') + n_chars
           WHEN 5 THEN length('café naïve 🚀 émoji ') + n_chars
           WHEN 9 THEN length('مرحبا بالعالم ') + n_chars
           ELSE n_chars END AS n_chars
  FROM '{src}'
) TO '{dst}' (FORMAT PARQUET)
"""

# --- pre1970 mode ----------------------------------------------------------

_PRE1970_SHIFT = """
COPY (
  SELECT event_id,
         CASE WHEN event_id % 7 = 3 THEN ts - INTERVAL 59 YEAR
              ELSE ts END AS ts,
         user_id, event_type, value, props
  FROM '{src}'
) TO '{dst}' (FORMAT PARQUET)
"""


def build(mode: str, src: str = "/root/testdata/sf0.001", out: str = "") -> str:
    """Write the ``mode`` twin of every table in ``src`` to ``out``;
    returns ``out``.  Untouched tables are byte-copied so the twin is a
    complete, drop-in SF directory."""
    if mode not in MODES:
        raise ValueError(f"unknown mode {mode!r}; pick one of {MODES}")
    out = out or f"/tmp/sf_{mode}"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        s, d = f"{src}/{t}.parquet", f"{out}/{t}.parquet"
        if mode == "empty":
            con.sql(f"COPY (SELECT * FROM '{s}' WHERE false) TO '{d}' (FORMAT PARQUET)")
        elif mode == "null":
            _build_null_table(con, t, s, d)
        elif mode == "unicode" and t == "documents":
            con.sql(_UNICODE_INJECT.format(src=s, dst=d))
        elif mode == "pre1970" and t == "events":
            con.sql(_PRE1970_SHIFT.format(src=s, dst=d))
        else:
            shutil.copy(s, d)
    return out


def oracle_views(out: str) -> duckdb.DuckDBPyConnection:
    """A DuckDB connection with the twin's tables registered as views —
    the oracle side of a robustness sweep."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(out, t)}.parquet')"
        )
    return con


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=MODES, required=True)
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    out = build(args.mode, args.src, args.out)
    print(f"wrote {args.mode} twin to {out}")


if __name__ == "__main__":
    main()
