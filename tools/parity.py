"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column-name
set, and order-insensitively canonicalized values — strict equality, no
epsilon — mirroring the driver's hash comparison as closely as we can
without knowing its exact hash.

CLI:  python -m tools.parity [--sf /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import datetime as dt
import math
import os
import sys
from decimal import Decimal

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

NULL = "∅"


def _canon_cell(v) -> str:
    import numpy as np
    import pandas as pd

    if v is None:
        return NULL
    if isinstance(v, float) or isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return NULL
        return repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return NULL
        return v.isoformat()
    if isinstance(v, dt.datetime):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, dt.date):
        # render as midnight ISO so DATE == midnight TIMESTAMP — the
        # driver's pandas bridge converts both to Timestamp, so this is
        # the comparison the external gate actually performs
        return dt.datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if v is pd.NaT:
        return NULL
    return str(v)


def canon_rows(pdf) -> list[tuple[str, ...]]:
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)]
    rows = []
    for row in pdf.itertuples(index=False, name=None):
        rows.append(tuple(NULL if v is pd.NaT or v is None else _canon_cell(v) for v in row))
    rows.sort()
    return rows


def duckdb_connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon_rows_native(cols: list[str], rows) -> list[tuple[str, ...]]:
    """Canonicalize native-typed rows (Spark collect() / DuckDB
    fetchall()) — unlike the pandas path, an int column with NULLs stays
    int instead of widening to float64, so NULL-bearing results compare
    on their true values."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def _diff_msg(path: str, cols, srows, orows) -> str:
    ndiff = sum(1 for a, b in zip(srows, orows) if a != b)
    example = next((a, b) for a, b in zip(srows, orows) if a != b)
    return (
        f"[{path}] value mismatch in {ndiff}/{len(srows)} rows; cols={cols};"
        f" first diff:\n  spark : {example[0]}\n  oracle: {example[1]}"
    )


def compare_one(name: str, spark, con, sf_dir: str, queries, oracles) -> tuple[bool, str]:
    """Compare Spark vs DuckDB through BOTH materialization paths.

    native  — Spark collect() vs DuckDB fetchall(): full NULL fidelity
              (an int column with NULLs stays int on both sides).
    bridge  — Spark toPandas() vs DuckDB .df(): mirrors the external
              driver, which hashes through pandas.  This is the path
              that exposes asymmetric type widening — e.g. an uncast
              DuckDB SUM(BIGINT) is HUGEINT, which .df() renders as
              float64 (0.0) while Spark's long stays int64 (0); the
              native path is structurally blind to that class (the r8
              timeseries_rate / skew_key_histogram driver reds).
    Both must agree for a pass.
    """
    sdf = queries[name](spark, sf_dir).persist()
    try:
        srows_raw = sdf.collect()
        s_cols = list(sdf.columns)
        if name not in oracles:
            return True, f"rows-only ({len(srows_raw)} rows)"
        cur = con.execute(oracles[name])
        o_cols = [d[0] for d in cur.description]
        orows_raw = cur.fetchall()
        if sorted(s_cols) != sorted(o_cols):
            return False, (
                f"column mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
            )
        if len(srows_raw) != len(orows_raw):
            return False, (
                f"row count mismatch: spark={len(srows_raw)} oracle={len(orows_raw)}"
            )
        s_cols_sorted = sorted(s_cols)
        srows = canon_rows_native(s_cols, srows_raw)
        orows = canon_rows_native(o_cols, orows_raw)
        if srows != orows:
            return False, _diff_msg("native", s_cols_sorted, srows, orows)
        # bridge path only when the cheap checks pass: toPandas and the
        # oracle re-execution are the expensive half
        s_pdf = sdf.toPandas()
    finally:
        sdf.unpersist()
    o_pdf = con.execute(oracles[name]).df()
    srows_b = canon_rows(s_pdf)
    orows_b = canon_rows(o_pdf)
    if srows_b != orows_b:
        return False, _diff_msg("bridge", s_cols_sorted, srows_b, orows_b)
    return True, f"OK ({len(srows)} rows, native+bridge)"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as se
    from logpump_spark.session import get_spark

    spark = get_spark("parity", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    queries, oracles = se.queries(), se.oracle_sql()
    names = args.names or sorted(queries)
    con = duckdb_connect(args.sf)

    n_fail = 0
    for name in names:
        if name not in queries:
            print(f"FAIL {name}: unknown query")
            n_fail += 1
            continue
        try:
            ok, msg = compare_one(name, spark, con, args.sf, queries, oracles)
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            ok, msg = False, f"EXCEPTION {type(e).__name__}: {e}"
        status = "ok  " if ok else "FAIL"
        print(f"{status} {name}: {msg}")
        n_fail += 0 if ok else 1
    print(f"\n{len(names) - n_fail}/{len(names)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
