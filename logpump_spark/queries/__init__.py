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
# registry entries per round.  Round-5 window, in priority order:
#   1-45   the 45 round-4-tail ids that have never had a driver
#          CORRECTNESS row (local-parity green at sf0.001/0.01/0.1 via
#          tests/test_oracle_parity.py, but never externally checked) —
#          scans, aggregates, dedup variants, graph, timeseries, CDC,
#          training assembly, VARIANT/hash/URL scalar suites
#   46-47  q1_pricing_summary + join_inner long-green canaries
#   48-50  sim_pq_adc / embed_quantize_sq8 / sessionize_events — in the
#          round-4 window, but no CORRECTNESS_r04.json was produced, so
#          re-listed as a hedge (code changed in r4: PQ wiring, SQ8
#          numpy encode, NTZ-safe sessionize).
# The remaining round-4-window ids (parse plane, windows, similarity)
# rotate back in round 6 if r04 artifacts never materialize.
#
# Round-6 rotation candidates (local-parity green at sf0.01 AND sf0.1,
# never driver-verified): the 29 round-5 additions —
#   tpch_q3_shipping, tpch_q4_priority, tpch_q5_nation_volume,
#   tpch_q6_revenue_delta, tpch_q10_returns, tpch_q14_promo,
#   tpch_q17_small_qty, tpch_q18_big_orders, tpch_q22_global_sales,
#   agg_hll_distinct, agg_hll_sliding, agg_hll_native, agg_argmax,
#   pivot_wide, fn_ip_suite, chat_assemble, pref_pairs,
#   rollup_incremental, agg_cond_suite, agg_quantile_weighted,
#   graph_triangles, text_pmi_pairs, sketch_kmv_overlap,
#   dedup_bloom_probe, cdc_scd2, join_scd2_pointintime,
#   attribution_last_touch, timeseries_mad, timeseries_islands,
#   multimodal_phash, multimodal_audio_fp, sample_kcenter
# — plus whatever the r05 CORRECTNESS artifact shows as still
# unverified from the r4 window.
_WINDOW_PRIORITY = [
    # scans / sources
    "scan_csv", "scan_jsonl", "scan_orc",
    # relational / SQL surface
    "sql_recursive_cte", "join_null_safe", "win_ntile", "win_cume_dist",
    "trending_topk",
    # aggregate suites
    "agg_bool", "agg_mode", "agg_sum_map", "agg_entropy", "agg_ttest",
    "agg_regr", "agg_skew_kurt", "agg_bitmap_distinct",
    "agg_quantile_hist", "freq_heavy_hitters",
    # scalar suites
    "fn_url_suite", "fn_variant", "fn_hash_suite", "udtf_sentences",
    # timeseries / CDC
    "timeseries_ewma", "timeseries_ohlc", "timeseries_gaps",
    "cdc_latest_wins", "xform_zorder_key", "stream_dedup",
    # dedup / graph / similarity
    "dedup_edit_distance", "dedup_semantic", "dedup_substring",
    "dedup_cluster_stats", "graph_pagerank", "sim_hardneg",
    "embed_label_purity",
    # text / corpus curation
    "text_lm_score", "text_boilerplate", "text_oov_rate",
    "corpus_merge", "corpus_overlap", "curation_pipeline", "chunk_docs",
    # training assembly
    "training_prepare", "split_leakage_check", "multimodal_frames",
    # canaries (driver-green r1-r3)
    "q1_pricing_summary", "join_inner",
    # round-4-window hedges (changed in r4, r04 artifacts missing)
    "sim_pq_adc", "embed_quantize_sq8", "sessionize_events",
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
