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
# stalest cohort mechanically.  Round-12 window: the five ids whose
# code changed this round lead (the densifier trio's corpus-derived
# partition vocabularies — sim_neardup sub-cell sign bits,
# dedup_semantic derived k, join_interval_bucketed's boundary-sweep
# rewrite — plus the exact segmented lead path under
# funnel_strict_order and seq_count), then the staleness rotation the
# r11 verdict ordered: the 6 remaining ROUND-5 ids, all 36 remaining
# round-6 ids (join_interval_bucketed's r6 slot is covered by its
# changed-id seat), and the 2 oldest round-7 ids.  After this round
# the staleness floor rises from r5 to r7.
_WINDOW_PRIORITY = [
    # r12 code changes — densifier vocabulary scaling + segmented leads
    # + the seq_next_node / running-distinct operator rewires
    "sim_neardup", "dedup_semantic", "join_interval_bucketed",
    "funnel_strict_order", "seq_count", "seq_next_node",
    "win_running_distinct",
    # last driver-green r5: the full remaining cohort
    "timeseries_gaps", "timeseries_ohlc", "training_prepare",
    "trending_topk", "udtf_sentences", "win_ntile",
    # last driver-green r6: the full remaining cohort (staleness order)
    "agg_argmax", "agg_cond_suite", "agg_hll_distinct", "agg_hll_native",
    "agg_hll_sliding", "agg_quantile_weighted", "agg_sum_map",
    "dedup_bloom_probe", "fn_ip_suite", "fn_try_suite", "graph_triangles",
    "join_scd2_pointintime", "multimodal_audio_fp", "multimodal_phash",
    "parse_context", "parse_header_positional", "parse_kv_map",
    "parse_sql_quoted", "pivot_wide", "pref_pairs", "quality_benford",
    "rollup_incremental", "sample_kcenter", "setop_bag_ops",
    "text_pmi_pairs", "timeseries_islands", "timeseries_mad",
    "tpch_q14_promo", "tpch_q17_small_qty", "tpch_q18_big_orders",
    "tpch_q22_global_sales", "tpch_q4_priority", "win_pct_of_total",
    "xform_duration", "xform_event_time",
    # oldest r7 ids fill the remaining seats
    "agg_approx_percentile", "agg_minmax_map",
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
