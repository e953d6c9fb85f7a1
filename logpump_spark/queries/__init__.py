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
# registry entries per round.  Round-9 window: the 2 ids that went red
# in r8 on the (now fixed) DuckDB HUGEINT oracle casts lead — green
# rows here complete driver coverage of all 249 registry ids.  Then the
# r9-changed code: ~25 representatives of the global-sort purge (the
# cosmetic corpus-proportional orderBy tails dropped this round — values
# are order-insensitively hashed, so these must stay green) and the 4
# TPC-H shapes whose Spark-side tail ORDER BY was stripped.  The
# remaining slots rotate families whose last driver row dates to r1-r5
# (sources/scan, scalar suites, the early TPC-H matrix) so stale-green
# rot can't accumulate unseen (r8 verdict item 5).
_WINDOW_PRIORITY = [
    # r8 reds, oracle CAST fixed this round — must go green
    "timeseries_rate", "skew_key_histogram",
    # r9 purge re-pins: Spark-side tail sort dropped (values unchanged)
    "dedup_exact", "dedup_components", "dedup_canonical",
    "dedup_minhash_lsh", "dedup_simhash", "dedup_cluster_stats",
    "text_tfidf", "sample_topp", "sample_temperature", "text_lm_score",
    "text_decontaminate", "funnel_steps",
    "funnel_strict_dedup", "sessionize_events", "retention_cohort",
    "seq_match_window", "chat_assemble", "stream_dedup", "stream_session",
    "setop_except", "cdc_upsert_apply", "win_cume_dist", "sim_pq_adc",
    "agg_mannwhitney", "sql_lateral", "sketch_kmv_overlap",
    # r9 TPC-H template split (oracle keeps canonical ORDER BY)
    "tpch_q11_important_stock", "tpch_q13_cust_distribution",
    "tpch_q15_top_supplier", "tpch_q20_dominant_supplier",
    # stale-family rotation: sources/scan (last green r3)
    "scan_glob", "records_explode", "fn_string_clean", "scan_csv",
    "scan_jsonl",
    # stale-family rotation: scalar suites (last green r1/r3)
    "fn_string_suite", "fn_date_suite", "fn_cast_suite", "fn_math_suite",
    "fn_regexp_suite", "fn_json", "fn_array", "fn_map",
    # stale-family rotation: early TPC-H matrix (last green r5)
    "q1_pricing_summary", "tpch_q3_shipping", "tpch_q5_nation_volume",
    "tpch_q6_revenue_delta", "tpch_q10_returns",
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
