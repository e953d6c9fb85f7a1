"""r13 A/B: block-assignment materialization strategies for the
segmented window family, measured on the k=64 hot twin.

Variants (monkeypatch the single shared seam, skewguard.ranged_blocks):
  v0_lazy   — r12 behavior: two independently-planned range exchanges
              (correctness rested on sampler determinism)
  v1_lc     — localCheckpoint(eager=False): one materialized assignment
  v2_persist— persist(MEMORY_AND_DISK): one cached assignment via
              CacheManager substitution

Run: python -m tools.ab_blocks [--k 64] [--reps 3]
Prints one JSON line per (shape, variant) and a summary medians line.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from logpump_spark.operators import skewguard
    from logpump_spark.operators.funnel import (
        sequence_count_adjacent,
        window_funnel_strict,
    )
    from logpump_spark.operators.segwin import moving_rows_frame
    from logpump_spark.operators.sessionize import sessionize
    from logpump_spark.session import get_spark
    from tools.scale_probe import build_hot_events

    spark = get_spark("ab_blocks")
    hot_dir = tempfile.mkdtemp(prefix="ab_blocks_")
    try:
        build_hot_events(spark, args.sf, hot_dir, args.k)
        ev = spark.read.parquet(f"{hot_dir}/events.parquet")

        types = [
            F.col("event_type") == "click",
            F.col("event_type") == "view",
            F.col("event_type") == "purchase",
        ]

        def s_sessionize(e):
            return sessionize(e)

        def s_funnel(e):
            return window_funnel_strict(e, types)

        def s_seqcount(e):
            return sequence_count_adjacent(e, types[0], types[1])

        def s_moving(e):
            base = e.select(
                "user_id", "event_id", "ts",
                F.floor(F.col("value") * 10000).cast("long").alias("qv"),
            )
            return moving_rows_frame(base, "qv", frame_rows=7)

        shapes = {
            "sessionize": s_sessionize,
            "funnel_strict": s_funnel,
            "seq_count": s_seqcount,
            "moving_seg": s_moving,
        }

        base_rb = skewguard.ranged_blocks

        def make_variant(mode):
            def rb(df, key_col, order, blk_col, materialize=True):
                n_blocks = skewguard.BLOCK_OVERSUBSCRIPTION * skewguard.cap_shards(df)
                ranged = df.repartitionByRange(
                    n_blocks, F.col(key_col).asc(), *order
                ).withColumn(blk_col, F.spark_partition_id())
                if mode == "v0_lazy":
                    return ranged
                if mode == "v1_lc":
                    return ranged.localCheckpoint(eager=False)
                if mode == "v2_persist":
                    return ranged.persist(StorageLevel.MEMORY_AND_DISK)
                raise ValueError(mode)

            return rb

        variants = ["v0_lazy", "v1_lc", "v2_persist"]
        results: dict[str, dict[str, list[float]]] = {
            s: {v: [] for v in variants} for s in shapes
        }

        # warmup (JIT) once per shape with the production path
        for fn in shapes.values():
            fn(ev).write.format("noop").mode("overwrite").save()

        for rep in range(args.reps):
            for name, fn in shapes.items():
                for v in variants:
                    skewguard.ranged_blocks = make_variant(v)
                    # sessionize/segwin/seglead import the NAME at module
                    # load; patch their references too
                    import logpump_spark.operators.seglead as sl
                    import logpump_spark.operators.segwin as sw
                    import logpump_spark.operators.sessionize as sz

                    sl.ranged_blocks = skewguard.ranged_blocks
                    sw.ranged_blocks = skewguard.ranged_blocks
                    sz.ranged_blocks = skewguard.ranged_blocks
                    t0 = time.perf_counter()
                    fn(ev).write.format("noop").mode("overwrite").save()
                    wall = time.perf_counter() - t0
                    results[name][v].append(round(wall, 3))
                    spark.catalog.clearCache()
                    gc.collect()
                    spark._jvm.System.gc()
        skewguard.ranged_blocks = base_rb
        import logpump_spark.operators.seglead as sl
        import logpump_spark.operators.segwin as sw
        import logpump_spark.operators.sessionize as sz

        sl.ranged_blocks = sw.ranged_blocks = sz.ranged_blocks = base_rb

        med = {
            s: {v: sorted(ts)[len(ts) // 2] for v, ts in by_v.items()}
            for s, by_v in results.items()
        }
        print(json.dumps({"k": args.k, "raw": results}))
        print(json.dumps({"k": args.k, "medians": med}))
    finally:
        shutil.rmtree(hot_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
