"""IVF nlist crossover probe (r13 — the r12 verdict's one `weak`).

Question: at what corpus size does the sqrt-rule nlist
(``similarity.ivf_n_cells``: clamp(isqrt(n), 8, 4096)) beat the
fixture's fixed nlist=8?  r12 rejected the sqrt rule at probe scale
because the Lloyd fit dominated; r13's sampled fit
(``fit_stride`` ~ n / (64 * n_cells)) bounds the fit, so the crossover
is re-measured with the fit/scan SPLIT stated per scale.

Method: replicate the sf0.1 embeddings table (vec_id offset per
replica, same scheme as scale_probe) to n = {1x, 10x, 50x, 100x}; at
each scale time
  - fit wall: ``fit_ivf`` alone (driver-side Lloyd loop; deterministic)
  - total wall: ``ivf_topk`` end-to-end (10-query panel, k=5)
  - scan wall: total - fit
  - recall@5 vs the brute-force ground truth at that scale
for two configs: fixed (nlist=8, nprobe=2, full fit) — the registry
fixture — and rule (nlist=isqrt(n), nprobe=2, sampled fit).

Run: python -m tools.ivf_crossover [--scales 1 10 50 100]
Prints one JSON line; SCALING.md records the table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=int, nargs="*", default=[1, 10, 50, 100])
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from logpump_spark.llmdata.similarity import (
        brute_force_topk,
        fit_ivf,
        ivf_n_cells,
        ivf_topk,
    )
    from logpump_spark.session import get_spark
    from logpump_spark.tables import load

    spark = get_spark("ivf_crossover")
    base = load(spark, args.sf, "embeddings")
    query_ids = list(range(10))
    # replica id offset derived from the measured max id, not a hard
    # 10**6: a base table with max vec_id >= 1e6 would otherwise collide
    # replica ids and silently corrupt the recall/crossover numbers
    id_span = int(base.agg(F.max("vec_id")).first()[0]) + 1

    results = []
    for s in args.scales:
        parts = [base]
        for i in range(1, s):
            parts.append(
                base.withColumn("vec_id", F.col("vec_id") + F.lit(i * id_span))
            )
        emb = parts[0]
        for p in parts[1:]:
            emb = emb.unionByName(p)
        emb = emb.localCheckpoint()  # freeze the corpus; probe what follows
        n = emb.count()

        truth = {
            (r.query_id, r.neighbor_id)
            for r in brute_force_topk(emb, query_ids, k=5)
            .select("query_id", "neighbor_id")
            .collect()
        }

        def run(tag, n_cells, nprobe, stride):
            t0 = time.perf_counter()
            fit_ivf(emb, n_cells, 2, fit_stride=stride)
            fit_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            got = {
                (r.query_id, r.neighbor_id)
                for r in ivf_topk(
                    emb, query_ids, k=5, n_cells=n_cells, nprobe=nprobe,
                    fit_stride=stride,
                )
                .select("query_id", "neighbor_id")
                .collect()
            }
            total_s = time.perf_counter() - t0
            recall = len(got & truth) / max(1, len(truth))
            return {
                "config": tag,
                "n_cells": n_cells,
                "nprobe": nprobe,
                "fit_stride": stride,
                "fit_s": round(fit_s, 3),
                "total_s": round(total_s, 3),
                "scan_s": round(total_s - fit_s, 3),
                "recall_at_5": round(recall, 3),
            }

        rule_cells = ivf_n_cells(n)
        rule_stride = max(1, n // (64 * rule_cells))
        row = {
            "scale": s,
            "n": n,
            "fixed8": run("fixed8", 8, 2, 1),
            "rule": run("rule", rule_cells, 2, rule_stride),
        }
        results.append(row)
        print(json.dumps(row))
        sys.stdout.flush()

    print(json.dumps({"crossover_table": results}))


if __name__ == "__main__":
    main()
