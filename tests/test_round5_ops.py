"""Behavioral/plan properties for the round-5 operators, beyond the
DuckDB oracle parity that tests/test_oracle_parity.py already enforces:
plan shape for the TPC-H joins, sketch accuracy + mergeability for HLL,
and internal-consistency invariants for argmax/pivot/ip/chat/pref."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from logpump_spark.queries.coverage3_q import (
    agg_argmax,
    agg_hll_distinct,
    chat_assemble,
    fn_ip_suite,
    pivot_wide,
    pref_pairs,
)
from logpump_spark.queries.tpch_q import (
    tpch_q3_shipping,
    tpch_q5_nation_volume,
    tpch_q6_revenue_delta,
    tpch_q18_big_orders,
)
from logpump_spark.tables import load

from .conftest import SF_SMALL


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ----- TPC-H plan shape --------------------------------------------------


def test_q3_broadcasts_customer_segment(spark):
    df = tpch_q3_shipping(spark, SF_SMALL)
    df.collect()
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    # the top-10 must be TakeOrdered, not a global sort of all orders
    assert "TakeOrderedAndProject" in plan


def test_q5_broadcasts_all_dims(spark):
    df = tpch_q5_nation_volume(spark, SF_SMALL)
    df.collect()
    plan = _plan(df)
    # region/nation/supplier all ride broadcast joins
    assert plan.count("BroadcastHashJoin") >= 2


def test_q6_pushes_filters_and_prunes(spark):
    df = tpch_q6_revenue_delta(spark, SF_SMALL)
    explained = df._jdf.queryExecution().toString()
    assert "PushedFilters" in explained
    read_schema = explained.split("ReadSchema")[-1]
    assert "l_extendedprice" in read_schema
    assert "l_returnflag" not in read_schema  # pruned


def test_q4_exists_becomes_semi_join(spark):
    # Catalyst must decorrelate the EXISTS into a left semi join — never
    # a per-row subquery loop
    from logpump_spark.queries.tpch_q import tpch_q4_priority

    df = tpch_q4_priority(spark, SF_SMALL)
    df.collect()
    plan = _plan(df)
    assert "LeftSemi" in plan


def test_q22_anti_join_and_broadcast_scalar(spark):
    from logpump_spark.queries.tpch_q import tpch_q22_global_sales

    df = tpch_q22_global_sales(spark, SF_SMALL)
    df.collect()
    plan = _plan(df)
    assert "LeftAnti" in plan
    assert "BroadcastExchange" in plan  # the 1-row average side


def test_q18_takeordered(spark):
    df = tpch_q18_big_orders(spark, SF_SMALL)
    df.collect()
    assert "TakeOrderedAndProject" in _plan(df)


# ----- HLL sketch --------------------------------------------------------


def test_interval_bucketed_is_sweep_not_pair_join(spark):
    # r12: the containment AGGREGATE is a two-stage boundary sweep — the
    # only join in the plan is the broadcast of the bounded hour-carry
    # table; a fact-fact join (sort-merge/shuffled-hash/NLJ) here means
    # the pair-materializing rewrite crept back and cost goes quadratic
    # under densification (SCALING.md §10)
    from logpump_spark.queries.mining_q import join_interval_bucketed

    df = join_interval_bucketed(spark, SF_SMALL)
    df.collect()
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastHashJoin" in plan  # the carry join, nothing else


def test_hll_estimate_within_error_bound(spark):
    # The checked result carries the RAW estimate plus m_used (registers
    # hit) so the standard small-range correction stays applicable by
    # the consumer without any cross-engine ln() in the value-hashed
    # columns.  Apply it here: below 2.5m, linear counting from the
    # empty-register count is the estimator; above, the raw HLL is.
    rows = {r["event_type"]: r for r in agg_hll_distinct(spark, SF_SMALL).collect()}
    assert rows
    m = 512
    for r in rows.values():
        assert r["m_used"] <= m
        if r["n_hll"] <= 2.5 * m and r["m_used"] < m:
            est = m * math.log(m / (m - r["m_used"]))  # linear counting
        else:
            est = r["n_hll"]
        # ~1.04/sqrt(512) = 4.6% standard error; allow 3 sigma
        assert abs(est - r["n_exact"]) <= max(10, 0.15 * r["n_exact"]), (r, est)


def test_hll_registers_merge(spark):
    # register tables built on disjoint halves OR-merge (max per bucket)
    # to exactly the registers of the whole — the mergeability that lets
    # shards aggregate without rescanning rows
    ev = load(spark, SF_SMALL, "events")
    from logpump_spark.llmdata.dedup import md5_hash60

    key = F.floor(F.col("value") * 100).cast("long").cast("string")
    h = md5_hash60(key)
    base = ev.select(
        (F.col("event_id") % 2).alias("half"),
        (h % 512).alias("bucket"),
        F.shiftrightunsigned(h, 9).alias("h2"),
    )
    rho = F.when(F.col("h2") == 0, F.lit(52)).otherwise(
        F.bit_count(F.col("h2").bitwiseAND(-F.col("h2")) - 1) + 1
    )
    whole = {
        r["bucket"]: r["rho"]
        for r in base.groupBy("bucket").agg(F.max(rho).alias("rho")).collect()
    }
    halves = (
        base.groupBy("half", "bucket").agg(F.max(rho).alias("rho"))
        .groupBy("bucket").agg(F.max("rho").alias("rho"))
        .collect()
    )
    assert {r["bucket"]: r["rho"] for r in halves} == whole


# ----- argmax / pivot / ip / chat / pref ---------------------------------


def test_argmax_picks_actual_extreme_rows(spark):
    res = {r["event_type"]: r for r in agg_argmax(spark, SF_SMALL).collect()}
    ev = load(spark, SF_SMALL, "events")
    qv = F.floor(F.col("value") * 10000).cast("long")
    for et, r in res.items():
        top = (
            ev.filter(F.col("event_type") == et)
            .orderBy(qv.desc(), F.col("event_id").desc())
            .select("user_id").first()["user_id"]
        )
        assert r["top_user"] == top
        assert math.isclose(r["max_value"] * 10000 % 1, 0, abs_tol=1e-9)


def test_pivot_rows_sum_to_group_counts(spark):
    res = pivot_wide(spark, SF_SMALL).collect()
    ev = load(spark, SF_SMALL, "events")
    counts = {
        r["cohort"]: r["n"]
        for r in ev.groupBy((F.col("user_id") % 10).alias("cohort"))
        .agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert len(res) == len(counts)
    for r in res:
        total = sum(r[c] for c in r.asDict() if c.startswith("n_"))
        assert total == counts[r["cohort"]]


def test_ip_roundtrip_always_ok(spark):
    rows = fn_ip_suite(spark, SF_SMALL).collect()
    assert rows
    assert all(r["roundtrip_ok"] for r in rows)
    for r in rows[:20]:
        assert r["ip_str"].count(".") == 3
        assert 0 <= r["ip_parsed"] < 1 << 32


def test_chat_assemble_conserves_turns(spark):
    res = chat_assemble(spark, SF_SMALL)
    total_turns = res.agg(F.sum("n_turns")).first()[0]
    assert total_turns == load(spark, SF_SMALL, "events").count()
    assert res.filter(F.col("dialog_len") <= 0).count() == 0


def test_triangles_match_bruteforce(spark):
    # the degree-oriented count must equal the naive triple-join count
    # (orientation changes the plan, never the result)
    from logpump_spark.queries.mining_q import _TRI_HI, _TRI_LO, graph_triangles
    from logpump_spark.llmdata.dedup import ordered_pair_structs

    row = graph_triangles(spark, SF_SMALL).first()
    li = load(spark, SF_SMALL, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_TRI_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_TRI_HI).cast("timestamp"))
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    pair_structs = ordered_pair_structs(
        F.col("ss"), lambda a, b: F.struct(a.alias("sa"), b.alias("sb"))
    )
    e = (
        ps.groupBy("l_partkey")
        .agg(F.sort_array(F.collect_set("l_suppkey")).alias("ss"))
        .filter(F.size("ss") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.sa", "p.sb")
        .distinct()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    brute = (
        e1.join(e2, (F.col("e2.sa") == F.col("e1.sa")) & (F.col("e2.sb") > F.col("e1.sb")))
        .join(e3, (F.col("e3.sa") == F.col("e1.sb")) & (F.col("e3.sb") == F.col("e2.sb")))
        .count()
    )
    assert row["n_triangles"] == brute
    assert row["n_edges"] == e.count()


def test_kmv_estimates_track_exact(spark):
    # where the sample saw overlap, the theta estimate should be in the
    # right order of magnitude of the exact overlap; union estimate >=
    # intersection estimate always
    from logpump_spark.queries.mining_q import sketch_kmv_overlap

    rows = sketch_kmv_overlap(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["est_union"] >= r["est_intersection"]
        assert r["n_common_sample"] >= 0
        if r["exact_common"] == 0:
            assert r["n_common_sample"] == 0  # no false sample overlap


def test_hll_sliding_tracks_exact(spark):
    # trailing-window estimates from merged daily registers must track
    # the exact trailing distinct within raw-HLL error at this
    # cardinality (150 users -> linear-counting regime, so allow the
    # small-range band); counts must be monotone within a warm-up week
    from logpump_spark.queries.mining_q import agg_hll_sliding

    rows = agg_hll_sliding(spark, SF_SMALL).collect()
    assert rows
    m = 512
    for r in rows:
        if r["n_hll"] <= 2.5 * m and r["m_used"] < m:
            est = m * math.log(m / (m - r["m_used"]))
        else:
            est = r["n_hll"]
        assert abs(est - r["n_exact"]) <= max(10, 0.15 * r["n_exact"]), (r, est)


def test_pit_join_conserves_purchases(spark):
    # every purchase is attributed exactly once (left join + interval
    # tiling => no drops, no double-counting)
    from logpump_spark.queries.mining_q import join_scd2_pointintime

    rows = join_scd2_pointintime(spark, SF_SMALL).collect()
    total = sum(r["n_purchases"] for r in rows)
    ev = load(spark, SF_SMALL, "events")
    assert total == ev.filter(F.col("event_type") == "purchase").count()
    assert all(r["status"] != "purchase" for r in rows)


def test_phash_identical_content_collides(spark):
    # images with identical source dimensions carry identical formula
    # pixels, so their dHashes MUST collide; the reported cluster size
    # must equal the actual per-hash group count
    from logpump_spark.queries.training_q import multimodal_phash

    rows = multimodal_phash(spark, SF_SMALL).collect()
    assert rows
    by_dims: dict[tuple, set] = {}
    by_hash: dict[int, int] = {}
    for r in rows:
        by_dims.setdefault((r["src_width"], r["src_height"]), set()).add(r["dhash"])
        by_hash[r["dhash"]] = by_hash.get(r["dhash"], 0) + 1
    for dims, hashes in by_dims.items():
        assert len(hashes) == 1, f"same-content images diverged: {dims}"
    for r in rows:
        assert r["n_same_hash"] == by_hash[r["dhash"]]


def test_bloom_no_false_negatives(spark):
    # the Bloom invariant: every true duplicate MUST be a bloom hit
    # (false positives allowed, false negatives never)
    from logpump_spark.queries.mining_q import dedup_bloom_probe

    rows = dedup_bloom_probe(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["n_bloom_hits"] >= r["n_true_dups"]
        assert r["n_bloom_hits"] <= r["n_docs"]


def test_pmi_counts_consistent(spark):
    # a bigram cannot occur more often than either of its words
    from logpump_spark.queries.mining_q import text_pmi_pairs

    rows = text_pmi_pairs(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["c12"] <= r["c1"] and r["c12"] <= r["c2"]
        assert r["lift"] > 0


def test_rollup_incremental_merge_equals_full(spark):
    # merge(state(base), state(delta)) must equal the rollup computed in
    # one pass over everything — the algebraic property that makes the
    # operator an incremental-maintenance primitive
    from logpump_spark.queries.coverage3_q import rollup_incremental

    merged = rollup_incremental(spark, SF_SMALL)
    ev = load(spark, SF_SMALL, "events")
    qv = F.floor(F.col("value") * 10000).cast("long")
    full = (
        ev.groupBy("event_type", F.to_date("ts").cast("string").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(qv).cast("double") / 10000).alias("sum_value"),
            (F.min(qv).cast("double") / 10000).alias("min_value"),
            (F.max(qv).cast("double") / 10000).alias("max_value"),
        )
        .orderBy("event_type", "day")
    )
    assert merged.collect() == full.collect()


def test_cond_suite_single_aggregation(spark):
    # all four conditional aggregates must ride ONE grouped pass — one
    # hash exchange, no per-condition rescan
    from logpump_spark.queries.coverage3_q import agg_cond_suite

    df = agg_cond_suite(spark, SF_SMALL)
    df.collect()
    # AQE's toString echoes the pre-adaptive plan too — count only the
    # final plan section
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("FileScan parquet") == 1


def test_scd2_intervals_tile_and_single_shuffle(spark):
    # intervals per user must be contiguous-by-construction (valid_to of
    # row i == valid_from of row i+1), exactly one interval open, and no
    # zero-length or same-status-adjacent intervals; both window passes
    # must reuse ONE user_id exchange
    from logpump_spark.queries.analytics_q import cdc_scd2

    df = cdc_scd2(spark, SF_SMALL)
    rows = df.collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for ivs in by_user.values():
        assert sum(1 for r in ivs if r["is_current"]) == 1
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["status"] != b["status"]
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1


def test_attribution_credits_preceding_event(spark):
    from logpump_spark.queries.analytics_q import attribution_last_touch

    rows = attribution_last_touch(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["touch_type"] != "purchase"
        if r["touch_us"] is not None:
            assert r["touch_us"] <= r["purchase_us"]


def test_pref_pairs_margin_nonnegative_and_distinct(spark):
    rows = pref_pairs(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r["margin"] >= 0
        assert r["n_docs"] >= 2
        if r["margin"] > 0:
            assert r["chosen_id"] != r["rejected_id"]
