"""Driver-facing query registry.

Each submodule exposes ``SPARK_QUERIES`` (name -> callable(spark, sf_dir)
-> DataFrame) and ``ORACLE_SQL`` (name -> DuckDB SQL over the same parquet
views).  ``all_queries()`` / ``all_oracles()`` merge them for
``__spark_entry__``.  Queries without an oracle entry get the driver's
weaker rows-only check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    analytics_q,
    coverage2_q,
    coverage3_q,
    coverage_q,
    curation2_q,
    curation_q,
    functions2_q,
    functions3_q,
    functions_q,
    intervals_q,
    llm_q,
    mining_q,
    parse_q,
    pq_q,
    quality_q,
    relational2_q,
    relational_q,
    sketch_q,
    sources_q,
    streaming_q,
    timeseries_q,
    tpch_q,
    training_q,
    windows_q,
)

_MODULES = (
    curation_q,
    analytics_q,
    timeseries_q,
    quality_q,
    pq_q,
    parse_q,
    windows_q,
    functions_q,
    relational_q,
    streaming_q,
    llm_q,
    coverage_q,
    coverage2_q,
    relational2_q,
    functions2_q,
    functions3_q,
    curation2_q,  # r4 additions
    training_q,  # late-r4 additions
    sources_q,  # latest-r4 additions
    sketch_q,  # r4 tail: count-min heavy hitters
    tpch_q,  # r5: TPC-H Q3/Q5/Q6/Q10/Q18 classic shapes
    coverage3_q,  # r5: HLL sketch, argMax, pivot, IP suite, chat/pref assembly
    mining_q,  # r5: triangles, PMI collocations, KMV overlap sketch
    intervals_q,  # r7: maxIntersections / intervalLengthSum sweep family
)

# Order matters: the driver's CORRECTNESS gate verifies the FIRST 50
# registry entries per round.  Round-7 window — the closing rotation:
# after round 6 went 50/50 green, exactly 43 ids lack a current
# driver-green row (41 never checked + records_explode / parse_scaled,
# whose latest driver rows are the stale r03 TIMESTAMP_NTZ errors —
# both parity-green locally since r03, and their 8 sibling parse ids
# went driver-green in r06).  All 43 are in this window, plus the 3
# round-7 TPC-H additions (Q13/Q16/Q21) and 4 core-query regression
# re-checks to fill the 50.  After this round every registry id has a
# driver-green row at least once.
# Still unverified after this window (rotate ALL of these in r8): the
# seventeen later round-7 ids added after the window filled —
# tpch_q7_volume_shipping, tpch_q8_market_share, tpch_q9_product_profit,
# tpch_q19_discounted_revenue, tpch_q20_dominant_supplier,
# tpch_q12_shipmode, funnel_strict_dedup, timeseries_rate,
# timeseries_twa, interval_max_concurrent, interval_length_sum,
# seq_next_node, timeseries_lttb, agg_mannwhitney, agg_assoc_suite,
# timeseries_decay, seq_match_window (all parity-green locally at
# sf0.01 plus the null/unicode/empty/pre1970 twins).
_WINDOW_PRIORITY = [
    # stale-red since the r03 NTZ incident — highest priority
    "records_explode", "parse_scaled",
    # round-6 additions (§2.K), never driver-checked
    "tpch_q2_min_cost", "tpch_q11_important_stock", "tpch_q15_top_supplier",
    "funnel_strict_order", "seq_count", "topk_weighted", "agg_uniq_upto",
    "quantile_timing", "shuffle_epoch", "curation_domain_stats",
    "agg_minmax_map", "sample_dsir", "fn_encoding_suite",
    "cdc_upsert_apply", "sim_ivf_recall", "win_moving_avg",
    "join_asof_tolerance",
    # §2.H round-2 additions, never driver-checked
    "dedup_components", "sim_srp_lsh", "text_tfidf", "sample_stratified",
    "topk_per_group", "funnel_steps", "retention_cohort",
    "timeseries_fill", "timeseries_anomaly", "unpivot_stack",
    "text_quality_gopher", "text_repetition", "text_pii_scrub",
    # §2.I round-4 additions, never driver-checked
    "text_decontaminate", "corpus_vocab", "quality_decile_by_lang",
    "dedup_canonical", "sample_topp", "join_skew_salted",
    "pack_sequences", "split_assign", "sample_temperature", "seq_match",
    "multimodal_resize",
    # round-7 additions: the remaining canonical warehouse shapes
    "tpch_q13_cust_distribution", "tpch_q16_supplier_cnt",
    "tpch_q21_waiting_supplier",
    # formerly the registry's one rows-only id; upgraded this round to
    # exact percentiles + rank-contract flags under a full value oracle
    "agg_approx_percentile",
    # core-query regression re-checks (driver-green r01/r05; re-pin the
    # backbone while the window has room)
    "q1_pricing_summary", "join_inner", "dedup_exact",
]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = merged.keys() & mod.SPARK_QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query ids across modules: {overlap}")
        merged.update(mod.SPARK_QUERIES)
    missing = [n for n in _WINDOW_PRIORITY if n not in merged]
    if missing:
        raise ValueError(f"window priority ids not registered: {missing}")
    prioritized = {n: merged[n] for n in _WINDOW_PRIORITY}
    prioritized.update((n, f) for n, f in merged.items() if n not in prioritized)
    return prioritized


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLE_SQL)
    return merged
