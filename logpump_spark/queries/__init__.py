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
    curation2_q,  # r4 additions — in the window tail this round
    training_q,  # late-r4 additions — in the window tail this round
    sources_q,  # latest-r4 additions — rotate into the window next round
    sketch_q,  # r4 tail: count-min heavy hitters
    tpch_q,  # r5: TPC-H Q3/Q5/Q6/Q10/Q18 classic shapes
    coverage3_q,  # r5: HLL sketch, argMax, pivot, IP suite, chat/pref assembly
    mining_q,  # r5: triangles, PMI collocations, KMV overlap sketch
)

# Order matters: the driver's CORRECTNESS gate verifies the FIRST 50
# registry entries per round.  Round-6 window, in priority order:
#   1      agg_sum_map — the only red r05 row (driver-canonicalizer
#          crash on array cells), now serialized via array_join; must
#          re-verify green.
#   2-40   the 39 round-5 additions (SURVEY §2.J) — never driver-checked
#          (added after the r05 window rotated); all local-parity green
#          at sf0.01 + sf0.1.  Includes fn_array2_suite, whose cumsum
#          was rewritten O(n) this round, and quality_benford /
#          timeseries_islands / agg_hll_sliding, which took advisor
#          fixes this round.
#   41-48  the r03-broken-then-fixed parse plane — never driver-green
#          since the Spark-4.1 NTZ incident.
#   49-50  dedup_minhash_lsh / dedup_simhash — full value oracles never
#          driver-checked (r02 rows-only check predates them).
# Still unverified after this window (rotate in r7): the ~24 §2.H/§2.I
# P-status ids (dedup_components, sim_srp_lsh, text_tfidf,
# sample_stratified, topk_per_group, funnel_steps, retention_cohort,
# timeseries_fill, timeseries_anomaly, unpivot_stack,
# text_quality_gopher, text_repetition, text_pii_scrub,
# text_decontaminate, corpus_vocab, quality_decile_by_lang,
# dedup_canonical, sample_topp, join_skew_salted, pack_sequences,
# split_assign, sample_temperature, seq_match, multimodal_resize)
# plus the seven round-6 additions (TPC-H Q2/Q11/Q15, strict-order
# funnel, weighted top-k, uniqUpTo, quantileTiming — tpch_q2_min_cost
# sits at position 51 as the first r7 candidate).
_WINDOW_PRIORITY = [
    # the one red row from r05, fixed this round
    "agg_sum_map",
    # round-5 additions (§2.J), never driver-checked
    "tpch_q3_shipping", "tpch_q5_nation_volume", "tpch_q6_revenue_delta",
    "tpch_q10_returns", "tpch_q18_big_orders", "tpch_q4_priority",
    "tpch_q14_promo", "tpch_q17_small_qty", "tpch_q22_global_sales",
    "agg_hll_distinct", "agg_argmax", "pivot_wide", "fn_ip_suite",
    "chat_assemble", "pref_pairs", "rollup_incremental", "agg_cond_suite",
    "agg_quantile_weighted", "agg_hll_native", "graph_triangles",
    "text_pmi_pairs", "sketch_kmv_overlap", "dedup_bloom_probe",
    "agg_hll_sliding", "join_scd2_pointintime", "sample_kcenter",
    "join_interval_bucketed", "cdc_scd2", "attribution_last_touch",
    "timeseries_mad", "timeseries_islands", "multimodal_phash",
    "multimodal_audio_fp", "quality_benford", "fn_array2_suite",
    "win_pct_of_total", "fn_try_suite", "setop_bag_ops",
    "win_running_distinct",
    # the r03-broken-then-fixed parse plane
    "parse_record_split", "parse_header_positional", "parse_kv_map",
    "parse_sql_quoted", "parse_context", "parse_full_entry",
    "xform_event_time", "xform_duration",
    # full-oracle dedup ids whose r02 check was rows-only
    "dedup_minhash_lsh", "dedup_simhash",
    # round-6 additions
    "tpch_q2_min_cost",
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
