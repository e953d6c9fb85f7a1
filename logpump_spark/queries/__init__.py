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
# stalest cohort mechanically.  Round-13 window: the eleven ids whose
# code changed this round lead (the segmented window family's
# materialized block assignment — sessionize/seglead/segwin — plus the
# SemDeDup derived fit sample and the IVF fit-stride plumbing), then
# the staleness rotation the r12 verdict ordered: parse_record_split
# (the lone r6 id), ALL remaining r7 ids, and the stalest r8 ids to
# fill 50.  After this round the staleness floor rises from r6 to r8.
_WINDOW_PRIORITY = [
    # r14 code changes lead: the parse projection now compiles as two
    # codegen stages by default (the C2-storm plan-shape fix in
    # parser.parse_records; fused shape pinned identical in
    # tests/test_techlog_golden.py)
    "parse_full_entry", "parse_scaled",
    # then the rotation the r13 verdict ordered (task 2): the full
    # 14-id r8 staleness cohort
    "split_leakage_check", "text_stats", "timeseries_decay",
    "timeseries_lttb", "timeseries_lttb_exact", "timeseries_twa",
    "tpch_q12_shipmode", "tpch_q19_discounted_revenue",
    "tpch_q7_volume_shipping", "tpch_q8_market_share",
    "tpch_q9_product_profit", "win_rank", "win_running_sum",
    "xform_zorder_key",
    # then the 34 stalest r9 ids (tools/staleness.py order; the next
    # two, text_decontaminate and text_lm_score, rotate in r15)
    "agg_mannwhitney", "cdc_upsert_apply", "chat_assemble",
    "dedup_canonical", "dedup_cluster_stats", "dedup_components",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "fn_array",
    "fn_cast_suite", "fn_date_suite", "fn_json", "fn_map",
    "fn_math_suite", "fn_regexp_suite", "fn_string_clean",
    "fn_string_suite", "funnel_strict_dedup", "q1_pricing_summary",
    "records_explode", "retention_cohort", "sample_temperature",
    "scan_csv", "scan_glob", "scan_jsonl", "seq_match_window",
    "setop_except", "sim_pq_adc", "sketch_kmv_overlap",
    "skew_key_histogram", "sql_lateral", "stream_dedup",
    "stream_session",
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
