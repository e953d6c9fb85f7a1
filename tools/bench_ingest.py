"""Ingest-throughput benchmark for the 1C parse pipeline.

Generates a synthetic corpus of hourly tech-log files (FIXTURES.md §2
grammar), runs the full batch pipeline (wholetext -> assemble -> parse ->
TechLogRow), and reports rows/s and MB/s.  This is the engine-vs-reference
comparison point: the reference is one goroutine per file feeding a
single batcher capped at 100-row INSERTs (SURVEY.md §6 — its config
guarantees only >= 5 rows/s steady-state); the Spark pipeline parallelizes
across files/cores with no per-batch cap.

Run: python -m tools.bench_ingest [--files 32] [--records 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RECORD_TMPL = (
    "{mm:02d}:{ss:02d}.{us:06d}-{dur},DBMSSQL,0,process=rphost,"
    "p:processName=srv{srv:02d},OSThread={thr},t:clientID={cli},"
    "t:applicationName=1CV8C,t:computerName=WS-{ws:02d},t:connectID={conn},"
    "SessionID={sess},Usr=user{usr},DBMS=DBMSSQL,DataBase=erp_prod,Trans=1,"
    "dbpid=5544,Rows={rows},RowsAffected=0,"
    "Sql='SELECT * FROM _Document{doc} WHERE _Date >= 2025-05-26 07:00:00 "
    "AND _Ref = \\'{ref}\\'',Context='Документ.Продажа{doc}\n"
    "Форма.Запись()\nМодуль.Провести()'\n"
)


def generate(corpus_dir: str, n_files: int, records_per_file: int) -> int:
    total = 0
    for i in range(n_files):
        name = f"2505{i % 28 + 1:02d}{i % 24:02d}.log"
        with open(os.path.join(corpus_dir, name), "w", encoding="utf-8") as f:
            for r in range(records_per_file):
                s = (i * 1_000_003 + r * 7919) % 3_600_000_000
                f.write(
                    RECORD_TMPL.format(
                        mm=(s // 60_000_000) % 60,
                        ss=(s // 1_000_000) % 60,
                        us=s % 1_000_000,
                        dur=s % 10_000_000,
                        srv=i % 10,
                        thr=4000 + r % 500,
                        cli=r % 300,
                        ws=r % 50,
                        conn=r % 100,
                        sess=1000 + r % 5000,
                        usr=r % 200,
                        rows=r % 1000,
                        doc=r % 97,
                        ref=f"ref{r % 1009}",
                    )
                )
                total += 1
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=32)
    ap.add_argument("--records", type=int, default=20000)
    args = ap.parse_args()

    from logpump_spark.session import get_spark
    from logpump_spark.techlog.pipeline import techlog_pipeline

    corpus = tempfile.mkdtemp(prefix="techlog_bench_")
    try:
        n_gen = generate(corpus, args.files, args.records)
        n_bytes = sum(
            os.path.getsize(os.path.join(corpus, f)) for f in os.listdir(corpus)
        )
        spark = get_spark("bench_ingest")
        spark.range(1000).selectExpr("sum(id)").collect()  # warmup

        # materialize EVERY output column through a noop sink — a count()
        # would let Catalyst prune the parse work away and flatter the
        # number; this measures what a real sink would receive.  Best of
        # 2 full runs: first executions of the giant codegen'd parse
        # projection pay a 2-10x C2 compile storm on this box (see
        # bench.py), so a single cold run measures HotSpot, not the
        # engine.
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            rows, rejects = techlog_pipeline(spark, corpus)
            rows.write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
        wall = min(walls)
        n_rows = rows.count()
        n_rej = rejects.count()

        print(
            json.dumps(
                {
                    "metric": "techlog_ingest_throughput",
                    "value": round(n_rows / wall, 1),
                    "unit": "rows/sec",
                    "rows": n_rows,
                    "rejects": n_rej,
                    "generated": n_gen,
                    "mb": round(n_bytes / 1e6, 1),
                    "mb_per_sec": round(n_bytes / 1e6 / wall, 1),
                    "wall_sec": round(wall, 2),
                    "files": args.files,
                }
            )
        )
    finally:
        shutil.rmtree(corpus, ignore_errors=True)


if __name__ == "__main__":
    main()
