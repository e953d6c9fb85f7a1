"""Scaling-curve probe: how do the heavy operators' runtimes grow when
the data grows?

Builds a k-times replica of the sf0.1 tables in a temp dir (ids offset
per replica so keys stay distinct; per-key group sizes stay constant, so
the workload grows in BREADTH — the way a real corpus grows), then times
a representative operator set at 1x and at kx and reports the ratio.
A ratio near k is linear scaling (scan/projection/group-by dominated);
materially above k means a super-linear stage that would not survive
100 TB.

Run: python -m tools.scale_probe [--k 4] [--sf /root/testdata/sf0.1]
Prints one JSON line: {"k": k, "queries": {name: {"t1": s, "tk": s,
"ratio": r}}, ...}.
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

# breadth-scaling probes: projections, group-bys, windows, one broadcast
# similarity scan — none are pair-quadratic by construction, so the
# EXPECTED ratio is ~k (deviations flag engine overheads, not design)
PROBES = [
    "q1_pricing_summary",     # lineitem scan + hash agg
    "sessionize_events",      # events window (per-user sizes constant)
    "freq_heavy_hitters",     # events CMS build (bounded shuffle)
    "timeseries_anomaly",     # events daily agg + per-key window
    "text_quality_gopher",    # documents single projection
    "text_repetition",        # documents bigram explode + two-level agg
    "corpus_vocab",           # documents explode + top-k
    "sim_topk",               # embeddings broadcast-query corpus scan
    # r5 probes
    "agg_hll_distinct",       # events scan; register shuffle stays 512/group
    "text_pmi_pairs",         # documents bigram explode + vocab-bounded joins
    "sketch_kmv_overlap",     # documents scan; per-source K-sample bounded
    "cdc_scd2",               # events per-user window (group sizes constant)
    # r6 probes
    "quantile_timing",        # events scan; <= ~2900 bins/group regardless of rows
    "topk_weighted",          # weighted CMS build (bounded shuffle)
    "funnel_strict_order",    # one user-key sort, two window passes
    "shuffle_epoch",          # pure hash partition + per-shard sort
    "sample_dsir",            # bounded 1024-bucket feature table, 2 corpus passes
    "curation_domain_stats",  # one |domains| shuffle + broadcast total
    "cdc_upsert_apply",       # change agg + one full-outer key join
]

_OFFSETS = {
    "lineitem": ("l_orderkey", 10**9),
    "orders": ("o_orderkey", 10**9),
    "events": ("event_id", 10**8),
    "documents": ("doc_id", 10**7),
    "embeddings": ("vec_id", 10**6),
}
_EXTRA_OFFSETS = {
    # second id column to keep per-key group sizes constant as rows grow
    "events": ("user_id", 10**5),
}


def build_scaled(spark, sf_dir: str, out_dir: str, k: int) -> None:
    from pyspark.sql import functions as F

    from logpump_spark.tables import TABLE_NAMES, load

    for name in TABLE_NAMES:
        df = load(spark, sf_dir, name)
        if name in _OFFSETS:
            idc, step = _OFFSETS[name]
            parts = []
            for i in range(k):
                part = df.withColumn(idc, F.col(idc) + F.lit(i * step))
                if name in _EXTRA_OFFSETS:
                    c2, s2 = _EXTRA_OFFSETS[name]
                    part = part.withColumn(c2, F.col(c2) + F.lit(i * s2))
                parts.append(part)
            scaled = parts[0]
            for p in parts[1:]:
                scaled = scaled.unionByName(p)
        else:
            scaled = df  # dims stay as-is
        scaled.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")


def _time(queries, name, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    import __spark_entry__ as se
    from logpump_spark.session import get_spark

    spark = get_spark("scale_probe")
    queries = se.queries()
    out_dir = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        build_scaled(spark, args.sf, out_dir, args.k)
        results = {}
        for name in PROBES:
            _time(queries, name, spark, args.sf)  # warm (JIT, code paths)
            t1 = _time(queries, name, spark, args.sf)
            tk = _time(queries, name, spark, out_dir)
            results[name] = {
                "t1": round(t1, 3),
                "tk": round(tk, 3),
                "ratio": round(tk / t1, 2) if t1 > 0 else None,
            }
        print(json.dumps({"k": args.k, "sf": args.sf, "queries": results}))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
