"""Executable coverage contract: every planned query id from SURVEY.md §2
(and the north-star additions) must exist in the driver registry.  Guards
later rounds against silently dropping an operator."""

from __future__ import annotations

import __spark_entry__ as se

# SURVEY.md §2 "planned query id" column + §2.G + north star, as shipped.
PLANNED_IDS = {
    # §2.A sources
    "scan_glob", "records_explode", "fn_string_clean",
    # §2.B parsing/transforms
    "parse_record_split", "parse_header_positional", "parse_kv_map",
    "parse_sql_quoted", "fn_sql_scrub", "parse_context", "fn_safe_cast",
    "parse_full_entry", "xform_filename_date", "xform_event_time",
    "xform_duration", "xform_project_sink", "fn_null_columns",
    "filter_valid_rows",
    # §2.C scalar suites
    "fn_string_suite", "fn_string_suite2", "fn_date_suite", "fn_date_suite2",
    "fn_cast_suite", "fn_math_suite", "fn_regexp_suite", "fn_json",
    "fn_json_roundtrip", "fn_array", "fn_explode", "fn_map",
    "fn_conditional", "fn_generators", "fn_bitwise", "fn_decimal",
    # §2.D routing/sink
    "route_group_by_key", "sink_insert_schema",
    # §2.F delegated analytical surface
    "agg_by_day", "sort_time", "filter_pushdown", "agg_metrics",
    # §2.G engine surface
    "join_inner", "join_left", "join_semi", "join_anti", "join_broadcast",
    "join_range", "join_asof", "join_full_outer", "join_cross",
    "agg_distinct", "agg_approx_distinct", "agg_rollup", "agg_cube",
    "agg_grouping_sets", "agg_stats", "agg_corr", "agg_percentile",
    "agg_approx_percentile", "agg_pivot", "agg_collect", "agg_min_max_by",
    "agg_histogram",
    "win_rank", "win_running_sum", "win_lag", "win_first_last",
    "win_range_frame", "win_percent_rank",
    "sort_limit_topk", "setop_union", "setop_intersect", "setop_except",
    "setop_union_by_name",
    "sql_in_subquery", "sql_scalar_subquery", "sql_cte", "sql_lateral",
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_interval_join",
    "udf_pandas_demo", "udf_grouped_map",
    "q1_pricing_summary",
    # north star
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_ngram_jaccard", "sim_topk", "sim_ivf_topk", "sim_neardup",
    "text_stats", "text_lang_id", "text_token_bpe", "doc_fingerprint",
    "multimodal_decode", "multimodal_audio", "corpus_prepare",
    # r2 curation/analytics additions
    "dedup_components", "text_tfidf", "sample_stratified", "sim_srp_lsh",
    "topk_per_group", "sessionize_events", "funnel_steps", "retention_cohort",
    "timeseries_fill", "timeseries_anomaly", "unpivot_stack",
    # r2 quality/compression additions
    "text_quality_gopher", "text_repetition", "text_pii_scrub",
    "embed_quantize_sq8",
    # r4 additions
    "sim_pq_adc", "text_decontaminate", "corpus_vocab",
    "quality_decile_by_lang", "dedup_canonical", "sample_topp",
    "join_skew_salted",
}

# ops whose oracle is intentionally absent (different sketch family than
# any SQL engine) — everything else MUST be oracle-checked.  MinHash and
# SimHash graduated to full oracles in r4 (md5-derived shared base hash).
ROWS_ONLY_ALLOWED = {"agg_approx_percentile"}


def test_every_planned_id_is_registered():
    qs = set(se.queries())
    missing = PLANNED_IDS - qs
    assert not missing, f"planned ids missing from registry: {sorted(missing)}"


def test_oracle_discipline():
    qs, oracles = set(se.queries()), set(se.oracle_sql())
    rows_only = qs - oracles
    assert rows_only <= ROWS_ONLY_ALLOWED, (
        f"queries without oracle beyond the sanctioned set: "
        f"{sorted(rows_only - ROWS_ONLY_ALLOWED)}"
    )
    assert oracles <= qs, f"orphan oracles: {sorted(oracles - qs)}"


def test_bench_covers_the_whole_registry():
    """r10 invariant: every registry id is benchmarked (the r9 verdict
    found 85 ids no round had ever timed — a regression there was
    invisible to the bench gate).  A future id added to the registry
    without a HEADLINE entry must fail here, not silently skip."""
    import bench

    qs = set(se.queries())
    headline = set(bench.HEADLINE)
    unbenched = qs - headline
    assert not unbenched, f"registry ids missing from bench: {sorted(unbenched)}"
    ghosts = headline - qs
    assert not ghosts, f"bench ids not in the registry: {sorted(ghosts)}"
    assert len(bench.HEADLINE) == len(headline), "duplicate HEADLINE ids"


def test_staleness_latest_green_reads_driver_rows(tmp_path):
    """tools/staleness.py feeds the window rotation; pin its green rule
    (rows_match AND no err AND no explicit hash/schema mismatch; later
    rounds win; reds don't advance).  The hash_match=False case is the
    r10-advice regression: rows can match on COUNT while the values
    mismatch (r8's timeseries_rate), and such a row must not advance."""
    import json

    from tools.staleness import latest_green

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "a": {"rows_match": True, "err": None},
        "b": {"rows_match": True, "err": None},
        "c": {"rows_match": False, "err": None},
        "d": {"rows_match": True, "err": None, "hash_match": True},
        "e": {"rows_match": True, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        "a": {"rows_match": True, "err": None},
        "b": {"rows_match": True, "err": "boom"},
        "c": {"rows_match": True, "err": None},
        # count matched but values did not: must NOT advance d past r1
        "d": {"rows_match": True, "err": None, "hash_match": False},
        # schema drifted: must NOT advance e past r1
        "e": {"rows_match": True, "err": None, "schema_match": False},
    }))
    got = latest_green(str(tmp_path))
    assert got == {"a": 3, "b": 1, "c": 3, "d": 1, "e": 1}
