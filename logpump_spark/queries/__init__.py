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
# stalest cohort mechanically.  Round-15 window: the two parse ids
# whose code changed this round lead (collision-proof __lp_-prefixed
# split-path intermediates + the Connect fallback now reading
# spark.sql.shuffle.partitions — ADVICE r14), then the rotation the
# r14 verdict ordered: ALL 13 ids last green at r9 (the four
# text/timeseries ids, eight TPC-H, win_cume_dist) and the 35 stalest
# r10 ids to fill 50.  After this round the staleness floor rises from
# r9 to r10.
_WINDOW_PRIORITY = [
    # r15 code changes lead (techlog/parser.py split path)
    "parse_full_entry", "parse_scaled",
    # the full 13-id r9 staleness cohort (tools/staleness.py order)
    "text_decontaminate", "text_lm_score", "text_tfidf",
    "timeseries_rate", "tpch_q10_returns", "tpch_q11_important_stock",
    "tpch_q13_cust_distribution", "tpch_q15_top_supplier",
    "tpch_q20_dominant_supplier", "tpch_q3_shipping",
    "tpch_q5_nation_volume", "tpch_q6_revenue_delta", "win_cume_dist",
    # then the 35 stalest r10 ids (tools/staleness.py order; the
    # remaining r10 tail rotates in r16)
    "agg_approx_distinct", "agg_corr", "agg_cube", "agg_distinct",
    "agg_grouping_sets", "agg_metrics", "agg_percentile", "agg_pivot",
    "agg_rollup", "agg_stats", "corpus_prepare", "doc_fingerprint",
    "filter_pushdown", "fn_bitwise", "fn_conditional",
    "fn_date_suite2", "fn_decimal", "fn_explode", "fn_generators",
    "fn_json_roundtrip", "fn_null_columns", "fn_safe_cast",
    "fn_sql_scrub", "fn_string_suite2", "join_anti", "join_asof",
    "join_broadcast", "join_cross", "join_full_outer", "join_left",
    "join_range", "join_semi", "multimodal_audio", "multimodal_decode",
    "sample_topp",
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
