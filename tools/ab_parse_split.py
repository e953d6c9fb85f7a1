"""Bounded parse-plane C2-storm experiment (r13 verdict task 6).

Background (BASELINE.md "Full-run spread on the JIT-class ids"): the
24-column parse projection compiles as hundreds of 0.5-1.2 s C2
methods; ~1/4-1/3 of fresh JVMs degrade for seconds at decade scale,
and r8 exhausted the JVM-knob space (compiler threads, code cache,
method-split thresholds, warmup).  The one untried lever is PLAN
SHAPE: split the parse projection into two narrower stages — stage A
materializes the shared intermediates (header map, positional parts,
SQL tail, Context tail) behind a round-robin exchange; stage B does
the 24 field extractions over the materialized columns — so each
stage is a separate, roughly half-size codegen compile unit.

Protocol (measurement discipline: storms are per-JVM state, so
in-process interleaving contaminates): ONE fresh JVM per (variant,
rep) via subprocess, decade corpus (sf0.1 events x10, scale_probe's
offset scheme) built once, variants alternated, walls reported raw so
the BAND (not just the median) is visible — the storm is the tail.

Run: python -m tools.ab_parse_split [--reps 10] [--k 10]
One JSON line per run, then a summary line; BASELINE.md records the
verdict either way.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _parse_records_split(df, record_col="record", filename_col="filename"):
    """parse_records with the projection split in two behind a
    round-robin exchange: stage A = split_record + header_map ONCE into
    materialized columns; stage B = the 24 field extractions.  Output
    semantics identical to parser.parse_records (same expressions over
    the same intermediates)."""
    from pyspark.sql import functions as F

    from logpump_spark.techlog import parser as P

    rec = F.col(record_col)
    header_part, sql_text, context_text = P.split_record(rec)
    parts = F.split(header_part, ",")
    m = P.header_map(header_part)
    keep = [c for c in df.columns if c not in (record_col, filename_col)]
    par = df.sparkSession.sparkContext.defaultParallelism
    mid = df.select(
        *keep,
        F.col(filename_col).alias("_fn"),
        m.alias("_m"),
        parts.alias("_p"),
        sql_text.alias("_sql"),
        context_text.alias("_ctx"),
    ).repartition(par)

    def hv(go_key: str):
        return F.coalesce(F.element_at(F.col("_m"), go_key), F.lit(""))

    def pos(i: int):
        return F.coalesce(
            F.trim(F.try_element_at(F.col("_p"), F.lit(i))), F.lit("")
        )

    cols = [
        F.col("_fn").alias("Timestamp"),
        pos(1).alias("LogTimestamp"),
        pos(2).alias("Component"),
        P.parse_uint(pos(3), P._U8_MAX).cast("smallint").alias("Severity"),
        hv("level").alias("Level"),
        hv("process").alias("Process"),
        hv("p:processName").alias("ProcessName"),
        P.parse_uint(hv("OSThread"), P._U32_MAX).alias("OSThread"),
        P.parse_uint(hv("t:clientID"), P._U32_MAX).alias("ClientID"),
        hv("t:applicationName").alias("ApplicationName"),
        hv("t:computerName").alias("ComputerName"),
        P.parse_uint(hv("t:connectID"), P._U32_MAX).alias("ConnectID"),
        P.parse_uint(hv("SessionID"), (1 << 63) - 1).alias("SessionID"),
        hv("Usr").alias("User"),
        hv("DBMS").alias("DBMS"),
        hv("DataBase").alias("Database"),
        P.parse_uint(hv("Trans"), P._U32_MAX).alias("Trans"),
        P.parse_uint(hv("dbpid"), P._U32_MAX).alias("DBPID"),
        F.col("_sql").alias("SQL"),
        P.parse_int32(hv("Rows")).alias("Rows"),
        P.parse_int32(hv("RowsAffected")).alias("RowsAffected"),
        F.col("_ctx").alias("Context"),
        hv("Event").alias("EventType"),
        hv("File").alias("File"),
        F.current_timestamp().alias("InsertedAt"),
    ]
    return mid.select(*keep, *cols)


def _run_one(sf_dir: str, variant: str) -> None:
    from logpump_spark.session import get_spark

    if variant == "split":
        from logpump_spark.techlog import parser as P

        P.parse_records = _parse_records_split
    spark = get_spark(f"ab_parse_{variant}")
    if variant == "base":
        # r14 made the split shape parse_records' DEFAULT; the fused
        # ("base") arm must pin the conf off or a rerun of this probe
        # silently compares split vs split
        spark.conf.set("logpump.parse.splitProjection", "false")
    from logpump_spark.queries.parse_q import parse_scaled

    t0 = time.perf_counter()
    parse_scaled(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    print(json.dumps({"variant": variant, "wall": round(wall, 3)}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--run-one", choices=["base", "split"])
    ap.add_argument("--scaled-dir")
    args = ap.parse_args()

    if args.run_one:
        _run_one(args.scaled_dir, args.run_one)
        return

    from logpump_spark.session import get_spark
    from tools.scale_probe import build_scaled

    tmp = tempfile.mkdtemp(prefix="ab_parse_")
    try:
        spark = get_spark("ab_parse_build")
        build_scaled(spark, args.sf, tmp, args.k)
        spark.stop()

        walls: dict[str, list[float]] = {"base": [], "split": []}
        for rep in range(args.reps):
            for variant in ("base", "split"):
                out = subprocess.run(
                    [
                        sys.executable, "-m", "tools.ab_parse_split",
                        "--run-one", variant, "--scaled-dir", tmp,
                    ],
                    capture_output=True, text=True, cwd=REPO,
                )
                line = [
                    ln for ln in out.stdout.splitlines() if ln.startswith("{")
                ][-1]
                wall = json.loads(line)["wall"]
                walls[variant].append(wall)
                print(json.dumps({"rep": rep, "variant": variant, "wall": wall}))
                sys.stdout.flush()
        summary = {
            v: {
                "walls": ws,
                "median": round(statistics.median(ws), 3),
                "min": min(ws),
                "max": max(ws),
            }
            for v, ws in walls.items()
        }
        print(json.dumps({"k": args.k, "summary": summary}))
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
