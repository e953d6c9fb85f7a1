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
# stalest cohort mechanically.  Round-16 window (the r15 verdict's
# item 1): every id whose code the r15 optimization commits rewrote
# leads — their builder-side parity is green but the DRIVER's oracle
# has not yet touched the new code — then the ids this round's own
# optimizations target, then the stalest cohort (the full r10
# remainder and the head of r11) to fill 50.
_WINDOW_PRIORITY = [
    # r15-rewritten ids (driver-oracle coverage lags the changes)
    "dedup_components", "dedup_canonical", "dedup_cluster_stats",
    "dedup_simhash", "dedup_substring", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "timeseries_mad", "graph_pagerank",
    "graph_triangles", "funnel_steps_capped", "interval_max_concurrent",
    "interval_length_sum", "text_boilerplate", "text_pii_scrub",
    "corpus_overlap", "curation_pipeline", "sim_ivf_topk",
    "sim_ivf_recall", "sim_pq_adc", "sample_kcenter", "dedup_semantic",
    "split_leakage_check",
    # r16 optimization targets (verdict items 2/3/6/7/8)
    "timeseries_gaps", "tpch_q2_min_cost", "tpch_q9_product_profit",
    "sim_srp_lsh", "sim_neardup", "win_running_distinct",
    "sql_recursive_cte", "join_inner",
    # staleness fill: the 14 remaining r10 ids (tools/staleness.py
    # order), then the head of the r11 cohort
    "setop_intersect", "setop_union", "sort_limit_topk", "sql_cte",
    "sql_in_subquery", "sql_scalar_subquery", "text_lang_id",
    "text_token_bpe", "udf_grouped_map", "udf_pandas_demo",
    "win_first_last", "win_lag", "win_percent_rank", "win_range_frame",
    "agg_bitmap_distinct", "agg_bool", "agg_by_day", "agg_collect",
    "agg_entropy",
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
