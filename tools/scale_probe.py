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
    # r7 probes: the heaviest new TPC-H join shapes (per-order group
    # sizes stay constant under the orderkey-offset replication)
    "tpch_q13_cust_distribution",  # outer join + two-level agg
    "tpch_q21_waiting_supplier",   # semi/anti joins on the order key
    "tpch_q9_product_profit",      # supply CTE + 5-way star join
    "funnel_strict_dedup",         # chained per-key agg loop + violation scans
    # r7 third batch: interval sweeps + distribution-rank stats
    "interval_max_concurrent",     # two-stage prefix scan (hour-bucket carry)
    "interval_length_sum",         # per-user boundary sweep (sizes constant)
    "agg_mannwhitney",             # distinct-value distribution + running sum
    "timeseries_lttb",             # per-user bucket means + argmax join
    "timeseries_decay",            # one grouped pass + per-type endpoint window
    "seq_match_window",            # anchor-carry window + per-user flag fold
    # r8 probes
    "skew_key_histogram",          # grouped count + bounded hist + TakeOrdered
    "funnel_steps_capped",         # prefix window + chained per-key agg
    "timeseries_lttb_exact",       # daily agg below a per-series pandas pass
    # r10 probes: the heaviest of the 85 ids bench first timed this
    # round — each a family the breadth sweep had no representative for
    "parse_context",               # parse plane, Context tail extraction
    "sim_neardup",                 # capped within-cell cosine pairs
    "dedup_simhash",               # 64-bit simhash + banded buckets
    "dedup_edit_distance",         # bucketed levenshtein pairs
    "sql_recursive_cte",           # engine-owned UnionLoop fixpoint
    "join_skew_salted",            # deterministic salt + two-stage fold
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


def _isolate(spark) -> None:
    """Per-probe isolation (r13, bench.py's pattern): now that the
    segmented family MATERIALIZES its block assignment
    (skewguard.ranged_blocks localCheckpoint), un-collected checkpoint
    blocks from earlier shapes linger until Python GC runs
    ContextCleaner — measured inflating a late shape 2-3x in a
    multi-shape sweep (union_length 16.4 s accumulated vs 7.6 s
    isolated on the same code)."""
    import gc

    spark.catalog.clearCache()
    gc.collect()
    spark._jvm.System.gc()


def _time(queries, name, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    _isolate(spark)
    return wall


# ---------------------------------------------------------------------------
# Hot-user skew probe (--mode hot).  The user-key window family
# (strict funnel, sequenceCount, ROWS-frame moving average, running
# distinct, sessionization) sorts WITHIN user partitions — per-key work
# is single-task by construction, so one user owning a huge share of
# events turns into one straggler task however many executors exist.
# This probe plants exactly that: two k-times twins of events at the
# SAME total row count — "breadth" (keys stay uniform; the existing
# build_scaled scheme) and "hot" (every replica's rows reassigned to
# one user) — and reports t_hot / t_breadth per shape.  SCALING.md §7
# records the measured penalty and the guard options.


def build_hot_events(spark, sf_dir: str, out_dir: str, k: int, hot_user: int = 42):
    from pyspark.sql import functions as F

    from logpump_spark.tables import TABLE_NAMES, load

    for name in TABLE_NAMES:
        df = load(spark, sf_dir, name)
        if name == "events":
            idc, step = _OFFSETS[name]
            parts = [df]
            for i in range(1, k):
                parts.append(
                    df.withColumn(idc, F.col(idc) + F.lit(i * step)).withColumn(
                        "user_id", F.lit(hot_user).cast("long")
                    )
                )
            scaled = parts[0]
            for p in parts[1:]:
                scaled = scaled.unionByName(p)
            scaled.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        # other tables: omit — the hot probes read only events


def _hot_shapes():
    """The user-key window shapes, over a raw events table (no user_id
    filter, unlike the registry queries — the probe must HIT the hot
    key)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from logpump_spark.operators.funnel import (
        sequence_count_adjacent,
        window_funnel,
        window_funnel_strict,
    )

    types = [
        F.col("event_type") == "click",
        F.col("event_type") == "view",
        F.col("event_type") == "purchase",
    ]

    def funnel(ev):
        # r12: defaults count-gate into the segmented lead path
        # (operators/seglead.py) when a key exceeds HOT_KEY_THRESHOLD
        return window_funnel_strict(ev, types)

    def funnel_strict_plain(ev):
        # r12 control: the pre-rebuild single-window lead chain
        return window_funnel_strict(ev, types, hot_key_threshold=None)

    # r11: capped twins of the strict funnel / sequenceCount / moving
    # average (the r10 verdict's remaining stragglers) — same N=10_000
    # rationale as funnel_capped below: invisible on breadth data,
    # binding on the hot user
    def funnel_strict_capped(ev):
        return window_funnel_strict(ev, types, max_events_per_user=10_000)

    def seqcount_capped(ev):
        return sequence_count_adjacent(
            ev, types[0], types[1], max_events_per_user=10_000
        )

    def moving_avg_capped(ev):
        from logpump_spark.operators.skewguard import first_n_per_key

        w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
        return first_n_per_key(ev, 10_000).select(
            "user_id", "event_id", F.avg("value").over(w).alias("m7")
        )

    def moving_avg_segmented(ev):
        # r11: the production segmented ROWS-frame operator (the exact
        # quantized form win_moving_avg ships) — transparent hot-key
        # parallelization, vs the cap's semantic truncation above
        from logpump_spark.operators.segwin import moving_rows_frame

        base = ev.select(
            "user_id", "event_id", "ts",
            F.floor(F.col("value") * 10000).cast("long").alias("qv"),
        )
        out = moving_rows_frame(base, "qv", frame_rows=7)
        return out.select(
            "user_id", "event_id",
            (F.col("frame_sum").cast("double") / (F.col("frame_n") * 10000)
             ).alias("m7"),
        )

    # capped/uncapped twins of the SAME operator (window_funnel) so the
    # r10 straggler-penalty table can state what the opt-in
    # max_events_per_user cap buys at a given skew, not infer it across
    # different operators.  N=10_000: far above any organic per-user
    # volume at sf0.1 (so breadth results are unchanged), far below the
    # hot user's k-times share (so the cap BINDS on the straggler).
    def funnel_uncapped(ev):
        return window_funnel(ev, types)

    def funnel_capped(ev):
        return window_funnel(ev, types, max_events_per_user=10_000)

    def seqcount(ev):
        # r12: defaults count-gate into the segmented lead(1) path
        return sequence_count_adjacent(ev, types[0], types[1])

    def seqcount_plain(ev):
        return sequence_count_adjacent(
            ev, types[0], types[1], hot_key_threshold=None
        )

    def moving_avg(ev):
        w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
        return ev.select(
            "user_id", "event_id", F.avg("value").over(w).alias("m7")
        )

    def running_distinct(ev):
        # r12: the production operator — its 25M default threshold
        # stays PLAIN on every probe twin (measured: segmented is the
        # availability path, not a latency win; see segwin.py)
        from logpump_spark.operators.segwin import running_distinct as op

        return op(ev, "event_type", out_col="nd")

    def running_distinct_seg(ev):
        # forced-segmented control: states the measured cost of the
        # bounded-availability route at the probe's key sizes
        from logpump_spark.operators.segwin import running_distinct as op

        return op(ev, "event_type", out_col="nd", hot_key_threshold=1_000_000)

    def running_distinct_plain(ev):
        from logpump_spark.operators.segwin import running_distinct as op

        return op(ev, "event_type", out_col="nd", hot_key_threshold=None)

    def sessionize(ev):
        # the exact operator production runs — measuring a hand-rolled
        # twin would silently drift if the gap/tie-break ever changed.
        # r11: defaults now count-gate into the segmented prefix-sum
        # path when a key exceeds HOT_KEY_THRESHOLD rows
        from logpump_spark.operators.sessionize import sessionize as op

        return op(ev)

    def sessionize_plain(ev):
        # r11 control: the pre-rebuild single-window formulation, so
        # the sweep states what the segmented path buys directly
        from logpump_spark.operators.sessionize import sessionize as op

        return op(ev, hot_key_threshold=None)

    def union_length(ev):
        # r7: the intervalLengthSum sweep — per-(user, type) sessions
        # swept per user; same user-key window family, same hot-key
        # exposure as sessionize
        from logpump_spark.operators.intervals import interval_union_length
        from logpump_spark.operators.sessionize import sessionize as sess_op

        keyed = ev.withColumn(
            "uk", F.concat_ws("|", F.col("user_id"), F.col("event_type"))
        )
        iv = (
            sess_op(keyed, user_col="uk")
            .groupBy("user_id", "event_type", "session_no")
            .agg(
                F.unix_micros(F.min("ts")).alias("s_us"),
                F.unix_micros(F.max("ts")).alias("e_us"),
            )
        )
        return interval_union_length(iv)

    def key_histogram(ev):
        # r8: the skew_key_histogram pre-flight itself — a grouped count
        # with map-side partials, so the hot key folds locally and the
        # DETECTOR must run flat under the very skew it detects
        counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
        total = counts.agg(F.sum("cnt").alias("total"))
        return (
            counts.groupBy((F.length(F.bin("cnt")) - 1).cast("long").alias("k"))
            .agg(F.count(F.lit(1)).alias("n_keys"), F.sum("cnt").alias("rows_held"))
            .crossJoin(F.broadcast(total))
        )

    return {
        "funnel_strict": funnel,
        "funnel_strict_plain": funnel_strict_plain,
        "funnel_strict_capped_10k": funnel_strict_capped,
        "funnel_uncapped": funnel_uncapped,
        "funnel_capped_10k": funnel_capped,
        "sequence_count": seqcount,
        "sequence_count_plain": seqcount_plain,
        "sequence_count_capped_10k": seqcount_capped,
        "moving_avg_rows7": moving_avg,
        "moving_avg_capped_10k": moving_avg_capped,
        "moving_avg_segmented": moving_avg_segmented,
        "running_distinct": running_distinct,
        "running_distinct_seg": running_distinct_seg,
        "running_distinct_plain": running_distinct_plain,
        "sessionize": sessionize,
        "sessionize_plain": sessionize_plain,
        "union_length": union_length,
        "key_histogram": key_histogram,
    }


def run_hot_probe(spark, sf_dir: str, k: int, only=None) -> dict:
    breadth_dir = tempfile.mkdtemp(prefix="scale_breadth_")
    hot_dir = tempfile.mkdtemp(prefix="scale_hot_")
    try:
        build_scaled(spark, sf_dir, breadth_dir, k)
        build_hot_events(spark, sf_dir, hot_dir, k)
        ev_b = spark.read.parquet(f"{breadth_dir}/events.parquet")
        ev_h = spark.read.parquet(f"{hot_dir}/events.parquet")
        n_total = ev_h.count()
        from pyspark.sql import functions as F

        n_hot = ev_h.filter(F.col("user_id") == 42).count()
        results = {}
        shapes = _hot_shapes()
        if only:
            unknown = set(only) - shapes.keys()
            if unknown:
                raise SystemExit(
                    f"unknown hot shapes {sorted(unknown)}; "
                    f"valid: {sorted(shapes)}"
                )
            shapes = {n: s for n, s in shapes.items() if n in set(only)}
        for name, shape in shapes.items():

            def timed(ev):
                t0 = time.perf_counter()
                shape(ev).write.format("noop").mode("overwrite").save()
                wall = time.perf_counter() - t0
                _isolate(spark)
                return wall

            timed(ev_b)  # warm
            tb = timed(ev_b)
            th = timed(ev_h)
            results[name] = {
                "t_breadth": round(tb, 3),
                "t_hot": round(th, 3),
                "penalty": round(th / tb, 2) if tb > 0 else None,
            }
        return {
            "k": k,
            "rows": n_total,
            "hot_user_rows": n_hot,
            "hot_share": round(n_hot / n_total, 3),
            "shapes": results,
        }
    finally:
        shutil.rmtree(breadth_dir, ignore_errors=True)
        shutil.rmtree(hot_dir, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--mode", choices=["breadth", "hot"], default="breadth")
    ap.add_argument(
        "--only", nargs="*", default=None,
        help="restrict the probe set: breadth mode accepts any queries() "
        "registry id (default: the PROBES list); hot mode accepts "
        "_hot_shapes() keys (default: all shapes)",
    )
    args = ap.parse_args()

    import __spark_entry__ as se
    from logpump_spark.session import get_spark

    spark = get_spark("scale_probe")

    if args.mode == "hot":
        print(json.dumps(run_hot_probe(spark, args.sf, args.k, args.only)))
        return
    queries = se.queries()
    if args.only:
        unknown = set(args.only) - queries.keys()
        if unknown:
            raise SystemExit(
                f"unknown registry ids {sorted(unknown)} (breadth mode "
                f"probes any queries() id; see PROBES for the default set)"
            )
    out_dir = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        build_scaled(spark, args.sf, out_dir, args.k)
        results = {}
        for name in (args.only if args.only else PROBES):
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
