"""r16 A/B: plain per-type LAG vs the segmented inter-arrival rebuild
(operators/timeseries.py:inter_arrival_gaps) for timeseries_gaps.

Interleaved single-JVM arms (ambient drift cancels): each rep times
the FULL timeseries_gaps aggregate (count/p50/p95/max per type) to the
noop sink, once with ``hot_key_threshold=None`` (plain window — the
historical plan) and once with ``hot_key_threshold=1`` (segmented
route forced).  Run on the decade corpus to see the shape that
matters: per-type volume 10x, type count fixed, so the plain route's
parallelism stays |types|.

Run: python -m tools.ab_gaps [--k 10] [--reps 5] [--dir DIR]
``--dir`` reuses an existing scaled corpus (skips the build).
Prints one JSON line with all reps and medians.
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
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--dir", default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from logpump_spark.operators.timeseries import inter_arrival_gaps
    from logpump_spark.session import get_spark
    from logpump_spark.tables import load
    from tools.scale_probe import build_scaled

    spark = get_spark("ab_gaps")
    tmp = None
    if args.dir:
        data_dir = args.dir
    else:
        tmp = tempfile.mkdtemp(prefix="ab_gaps_")
        build_scaled(spark, args.sf, tmp, args.k)
        data_dir = tmp

    def run(threshold):
        ev = load(spark, data_dir, "events")
        gaps = inter_arrival_gaps(ev, hot_key_threshold=threshold)
        out = gaps.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.floor(F.expr("percentile(gap_us, 0.5)")).cast("long").alias("p50"),
            F.floor(F.expr("percentile(gap_us, 0.95)")).cast("long").alias("p95"),
            F.max("gap_us").alias("mx"),
        )
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        gc.collect()
        spark._jvm.System.gc()
        return dt

    try:
        # warmup both arms (codegen compile)
        run(None)
        run(1)
        plain, seg = [], []
        for _ in range(args.reps):
            plain.append(round(run(None), 3))
            seg.append(round(run(1), 3))
        med = lambda xs: sorted(xs)[len(xs) // 2]
        print(
            json.dumps(
                {
                    "k": args.k,
                    "plain": plain,
                    "segmented": seg,
                    "plain_med": med(plain),
                    "seg_med": med(seg),
                    "ratio_seg_over_plain": round(med(seg) / med(plain), 3),
                }
            )
        )
    finally:
        if tmp:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
