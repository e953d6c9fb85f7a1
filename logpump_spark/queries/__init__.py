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
# stalest cohort mechanically.  Round-10 window: the one id whose code
# changed this round leads (sample_topp — at-cut tie rank rebuilt as a
# two-stage prefix scan, _KNOWN_FUNNELS retired), then the staleness
# rotation the r9 verdict ordered: all 36 ids whose most recent
# driver-green row dates to ROUND 1, plus 12 of the 26 round-3 ids
# (judge's named starters first).  After this round the staleness floor
# rises from r1 to r3; the remaining 14 r3 ids (agg_by_day, agg_collect,
# agg_histogram, agg_min_max_by, filter_valid_rows, route_group_by_key,
# setop_union_by_name, sink_insert_schema, sort_time,
# stream_interval_join, stream_sliding, stream_tumbling,
# xform_project_sink, xform_filename_date) are the r11 window's
# scheduled rotation.
_WINDOW_PRIORITY = [
    # r10 code changes — the sample_topp prefix-scan rebuild and the
    # two-stage skew-proof cap under funnel_steps_capped must re-verify
    "sample_topp", "funnel_steps_capped",
    # last driver-green r1: aggregate family
    "agg_approx_distinct", "agg_corr", "agg_cube", "agg_distinct",
    "agg_grouping_sets", "agg_metrics", "agg_percentile", "agg_pivot",
    "agg_rollup", "agg_stats",
    # last driver-green r1: join family
    "join_anti", "join_asof", "join_broadcast", "join_cross",
    "join_full_outer", "join_left", "join_range", "join_semi",
    # last driver-green r1: window family
    "win_first_last", "win_lag", "win_percent_rank", "win_range_frame",
    # last driver-green r1: SQL shapes / setops / sort / scan
    "sql_cte", "sql_in_subquery", "sql_scalar_subquery",
    "setop_intersect", "setop_union", "sort_limit_topk",
    "filter_pushdown",
    # last driver-green r1: scalar suites
    "fn_bitwise", "fn_conditional", "fn_date_suite2", "fn_decimal",
    "fn_explode", "fn_json_roundtrip", "fn_string_suite2",
    # last driver-green r3: judge-named starters + scalar stragglers
    "doc_fingerprint", "multimodal_decode", "multimodal_audio",
    "corpus_prepare", "udf_pandas_demo", "udf_grouped_map",
    "fn_generators", "fn_null_columns", "fn_safe_cast", "fn_sql_scrub",
    "text_lang_id", "text_token_bpe",
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
