"""Warm-JVM decade A/B of the parse projection shapes (r14 verdict
"What's wrong" item 2): what does the split shape's round-robin
exchange COST once compilation is amortized?

The r14 fresh-JVM A/B (tools/ab_parse_split.py) justified making the
split two-codegen-stage shape the batch default by measuring the C2
compile STORM band: fused entered the storm in 4/10 fresh JVMs
(21.4-39.3 s) vs 0/10 split.  That measured the per-JVM-lifetime
stall the split shape avoids — but the stated cluster-side trade ("one
extra corpus-sized shuffle per parse; shuffle-bound deployments flip
the conf off") had no number behind it.  This probe supplies it.

Protocol (ONE warm JVM — the opposite isolation choice from the storm
probe, deliberately: storms are per-JVM compile state, so excluding
them means compiling BOTH shapes up front and only timing later runs):

1. Build the decade corpus (sf0.1 events x k, scale_probe's offset
   scheme) once; record its total record-payload bytes (the exchange
   carries ~these bytes).
2. Warm up: run each shape once, untimed — both codegen shapes
   compile here; any storm lands here and is excluded by design.
3. Interleave fused/split x --reps, clearCache + gc between runs
   (ab_blocks discipline), noop sink.
4. Report per-variant walls + medians, the warm tax
   (split_median - fused_median), and tax normalized per GB of record
   payload — the number SCALING.md's flip-off heuristic needs.

Shapes are flipped via the session conf logpump.parse.splitProjection
(the r14 production toggle itself, not a monkeypatch), so this
measures exactly what a user's conf flip would.

Run: python -m tools.ab_parse_warm [--reps 5] [--k 10]
"""

from __future__ import annotations

import argparse
import gc
import json
import statistics
import tempfile
import time


def _timed_parse(spark, sf_dir: str, split: bool) -> float:
    from logpump_spark.queries.parse_q import parse_scaled

    spark.conf.set("logpump.parse.splitProjection", str(split).lower())
    t0 = time.perf_counter()
    parse_scaled(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from logpump_spark.session import get_spark
    from tools.scale_probe import build_scaled

    tmp = tempfile.mkdtemp(prefix="ab_parse_warm_")
    try:
        spark = get_spark("ab_parse_warm")
        build_scaled(spark, args.sf, tmp, args.k)

        # the exchange's payload: the synthesized record bytes stage A
        # materializes (plus the narrow intermediates derived from them)
        from logpump_spark.queries.parse_q import _record_col
        from logpump_spark.tables import load

        rec_bytes = (
            load(spark, tmp, "events")
            .select(F.sum(F.length(_record_col())).alias("b"))
            .first()["b"]
        )

        # warmup: compile BOTH codegen shapes; storms land here
        for split in (False, True):
            w = _timed_parse(spark, tmp, split)
            print(json.dumps({"phase": "warmup", "split": split, "wall": round(w, 2)}))

        walls = {"fused": [], "split": []}
        for rep in range(args.reps):
            for name, split in (("fused", False), ("split", True)):
                spark.catalog.clearCache()
                gc.collect()
                w = _timed_parse(spark, tmp, split)
                walls[name].append(round(w, 3))
                print(json.dumps({"rep": rep, "variant": name, "wall": round(w, 3)}))
        med = {v: statistics.median(ws) for v, ws in walls.items()}
        tax = round(med["split"] - med["fused"], 3)
        out = {
            "k": args.k,
            "walls": walls,
            "median": {v: round(m, 3) for v, m in med.items()},
            "warm_tax_sec": tax,
            "record_payload_bytes": rec_bytes,
        }
        if rec_bytes:
            out["warm_tax_sec_per_gb"] = round(tax / (rec_bytes / 1e9), 3)
        print(json.dumps(out))
    finally:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
