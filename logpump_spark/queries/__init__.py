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
# registry entries per round.  Round-8 window — the completing rotation:
# round 7 went 50/50 green, leaving exactly 17 ids with no driver row
# yet (the late-r7 additions that landed after that window filled; all
# 17 passed the judge's own DuckDB-oracle run).  All 17 lead this
# window, followed by the 3 round-8 additions (skew_key_histogram,
# funnel_steps_capped, timeseries_lttb_exact) — after this round EVERY
# registry id has a driver-green row at least once.  The remaining 30
# slots re-pin ids whose code materially changed in round 8: the parse
# plane (corpus-wide orderBy dropped from the uncapped path), the
# dedup family (planted-clone fixture now a pushed doc_id filter;
# connected-components probes convergence every 2nd round), the
# similarity top-k pair (tail sort dropped), and a spread of the ~55
# queries whose cosmetic corpus-scale final orderBy was removed when
# the plan sweep learned to ban rangepartitioning funnels.
_WINDOW_PRIORITY = [
    # late-r7 ids, never driver-checked — highest priority
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_product_profit", "tpch_q12_shipmode",
    "tpch_q19_discounted_revenue", "tpch_q20_dominant_supplier",
    "funnel_strict_dedup", "timeseries_rate", "timeseries_twa",
    "timeseries_lttb", "timeseries_decay", "interval_max_concurrent",
    "interval_length_sum", "seq_next_node", "seq_match_window",
    "agg_mannwhitney", "agg_assoc_suite",
    # round-8 additions, never driver-checked
    "skew_key_histogram", "funnel_steps_capped", "timeseries_lttb_exact",
    # re-pins: parse plane changed (r7 verdict finding 1 fix)
    "parse_scaled", "parse_full_entry",
    # re-pins: planted-dups fixture + CC probe cadence changed
    "dedup_exact", "dedup_components", "dedup_canonical",
    "dedup_cluster_stats", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash", "dedup_edit_distance", "split_leakage_check",
    "sim_neardup",
    # re-pins: similarity top-k tail sort dropped
    "sim_topk", "sim_ivf_topk",
    # re-pins: representatives of the global-orderBy purge + the
    # window_funnel signature change
    "win_rank", "win_running_sum", "win_moving_avg",
    "win_running_distinct", "text_stats", "fn_array2_suite",
    "fn_encoding_suite", "shuffle_epoch", "pack_sequences",
    "split_assign", "multimodal_frames", "cdc_scd2",
    "attribution_last_touch", "funnel_strict_order", "xform_zorder_key",
    "funnel_steps",
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
