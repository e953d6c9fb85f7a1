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
# registry entries per round.  `python -m tools.staleness` prints the
# per-id latest driver-green round so each rotation can target the
# stalest cohort mechanically.  Round-11 window: the seven ids whose
# code changed this round lead (the segmented-prefix-sum sessionize
# rebuild, the skewguard extraction that rewired the funnel/seq
# family, and win_moving_avg's segmented ROWS-frame re-expression),
# then the staleness rotation the r10 verdict ordered: all 14 ids whose
# most recent driver-green row dates to ROUND 3, plus 29 of the 35
# round-5 ids (oldest-first by the staleness tool's listing).  After
# this round the staleness floor rises from r3 to r5; the remaining
# 6 r5 ids (timeseries_gaps, timeseries_ohlc, training_prepare,
# trending_topk, udtf_sentences, win_ntile) are the r12 window's
# scheduled rotation.
_WINDOW_PRIORITY = [
    # r11 code changes — segmented sessionize + shared skew guard +
    # segmented ROWS-frame moving average
    "sessionize_events", "interval_length_sum", "funnel_steps",
    "funnel_steps_capped", "funnel_strict_order", "seq_count",
    "win_moving_avg",
    # last driver-green r3: the full remaining cohort
    "agg_by_day", "agg_collect", "agg_histogram", "agg_min_max_by",
    "filter_valid_rows", "route_group_by_key", "setop_union_by_name",
    "sink_insert_schema", "sort_time", "stream_interval_join",
    "stream_sliding", "stream_tumbling", "xform_filename_date",
    "xform_project_sink",
    # last driver-green r5: 29 of 35 (staleness-tool order;
    # timeseries_gaps yielded its slot to win_moving_avg)
    "agg_bitmap_distinct", "agg_bool", "agg_entropy", "agg_mode",
    "agg_quantile_hist", "agg_regr", "agg_skew_kurt", "agg_ttest",
    "cdc_latest_wins", "chunk_docs", "corpus_merge", "corpus_overlap",
    "curation_pipeline", "dedup_semantic", "dedup_substring",
    "embed_label_purity", "embed_quantize_sq8", "fn_hash_suite",
    "fn_url_suite", "fn_variant", "freq_heavy_hitters", "graph_pagerank",
    "join_null_safe", "scan_orc", "sim_hardneg", "sql_recursive_cte",
    "text_boilerplate", "text_oov_rate", "timeseries_ewma",
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
    # the driver gate checks exactly the FIRST 50 registry entries; a
    # 51st priority id would silently fall outside the round's window
    if len(_WINDOW_PRIORITY) != 50 or len(set(_WINDOW_PRIORITY)) != 50:
        raise ValueError(
            f"window priority must be 50 unique ids, got "
            f"{len(_WINDOW_PRIORITY)} ({len(set(_WINDOW_PRIORITY))} unique)"
        )
    prioritized = {n: merged[n] for n in _WINDOW_PRIORITY}
    prioritized.update((n, f) for n, f in merged.items() if n not in prioritized)
    return prioritized


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLE_SQL)
    return merged
