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
    coverage_q,
    curation2_q,
    curation_q,
    functions2_q,
    functions3_q,
    functions_q,
    llm_q,
    parse_q,
    pq_q,
    quality_q,
    relational2_q,
    relational_q,
    sketch_q,
    sources_q,
    streaming_q,
    timeseries_q,
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
)

# Round-5 rotation candidates (local-parity green at sf0.001/0.01/0.1,
# never driver-verified — put these in the next window's head):
#   text_lm_score, scan_csv, scan_jsonl, scan_orc, sql_recursive_cte,
#   chunk_docs, training_prepare, text_boilerplate, embed_label_purity,
#   multimodal_frames, corpus_merge, agg_sum_map, dedup_edit_distance,
#   trending_topk, xform_zorder_key, win_ntile, timeseries_ewma,
#   freq_heavy_hitters, dedup_semantic, corpus_overlap,
#   curation_pipeline, stream_dedup, agg_mode, fn_url_suite,
#   dedup_substring, graph_pagerank, timeseries_ohlc,
#   dedup_cluster_stats, agg_quantile_hist, text_oov_rate,
#   join_null_safe, agg_bool, timeseries_gaps, cdc_latest_wins,
#   sim_hardneg, split_leakage_check, agg_ttest, agg_entropy,
#   fn_variant, agg_regr, fn_hash_suite, udtf_sentences, agg_skew_kurt,
#   agg_bitmap_distinct, win_cume_dist

# Order matters: the driver's CORRECTNESS gate verifies the FIRST 50
# registry entries per round.  Round-4 window, in priority order:
#   1-15   never-driver-verified curation/analytics/timeseries/quality
#   16     sim_pq_adc (new this round)
#   17-27  parse plane (all err in r3: Spark 4.1 TIMESTAMP_NTZ, fixed)
#   28-30  win_lag / win_range_frame / fn_date_suite (same r3 err)
#   31-37  ids whose IMPLEMENTATION changed this round (np_cosine
#          scoring, md5-based MinHash/SimHash now fully oracle-checked,
#          multimodal decode fallbacks) — changed code gets re-verified
#   38-39  q1_pricing_summary + join_inner long-green canaries
#   40-45  the six ids added later in round 4 (never driver-verified)
#   46-50  the five training-assembly ids added latest in round 4
#          (never driver-verified; displaced r1-green scalar/window ids
#          that stay covered by local parity on Spark 4.1)
_WINDOW_PRIORITY = [
    "dedup_components", "text_tfidf", "sample_stratified", "sim_srp_lsh",
    "topk_per_group", "sessionize_events", "funnel_steps", "retention_cohort",
    "timeseries_fill", "timeseries_anomaly", "unpivot_stack",
    "text_quality_gopher", "text_repetition", "text_pii_scrub",
    "embed_quantize_sq8",
    "sim_pq_adc",
    "parse_full_entry", "parse_header_positional", "parse_kv_map",
    "parse_sql_quoted", "parse_context", "xform_filename_date",
    "xform_event_time", "xform_duration", "filter_valid_rows",
    "records_explode", "parse_scaled",
    "win_lag", "win_range_frame", "fn_date_suite",
    "sim_topk", "sim_ivf_topk", "sim_neardup", "dedup_minhash_lsh",
    "dedup_simhash", "multimodal_decode", "multimodal_audio",
    "q1_pricing_summary", "join_inner",
    "text_decontaminate", "corpus_vocab", "quality_decile_by_lang",
    "dedup_canonical", "sample_topp", "join_skew_salted",
    "pack_sequences", "split_assign", "sample_temperature", "seq_match",
    "multimodal_resize",
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
