"""NULL-robustness regression: the driver fixtures carry no NULLs, so a
query whose Spark and DuckDB sides disagree about NULL semantics passes
the oracle gate while silently diverging on real data.  Round 6 swept the
whole registry against a NULL-injected sf0.001 twin (tools/perturb.py)
and fixed 35 such divergences; this test re-runs the previously-failing
ids (plus representative always-green ones) against a freshly built twin
so the classes cannot regress:

- format_string/printf NULL-arg rendering (the whole parse plane)
- Spark concat() vs DuckDB CONCAT() NULL propagation
- ASC NULLS FIRST (Spark) vs NULLS LAST (DuckDB) in windows
- md5-of-NULL keys crashing the oracle's '0x' cast
- equi joins dropping NULL groups only on one side
- to_json null-field rendering
"""

from __future__ import annotations

import pytest

import __spark_entry__ as se
from tools.parity import compare_one, duckdb_connect
from tools.perturb import build

# every id that failed the round-6 NULL sweep, now pinned green
_FORMERLY_FAILING = [
    "agg_argmax", "agg_hll_distinct", "agg_hll_native", "agg_hll_sliding",
    "agg_quantile_hist", "agg_quantile_weighted", "embed_label_purity",
    "fn_encoding_suite", "fn_json_roundtrip", "fn_map", "fn_math_suite",
    "fn_sql_scrub", "fn_string_suite", "fn_url_suite", "freq_heavy_hitters",
    "join_asof", "join_skew_salted", "parse_context", "parse_full_entry",
    "parse_header_positional", "parse_kv_map", "parse_record_split",
    "parse_sql_quoted", "pref_pairs", "records_explode",
    "sink_insert_schema", "timeseries_ewma", "timeseries_mad",
    "topk_weighted", "win_first_last", "win_percent_rank",
    "xform_duration", "xform_event_time", "xform_project_sink",
    # adjacent queries touched by the shared fixes
    "parse_scaled", "timeseries_fill", "join_asof_tolerance",
    "agg_sum_map", "agg_uniq_upto",
    # upgraded to a full oracle in r7; its naive draft failed THIS sweep
    "agg_approx_percentile",
    # round-7 TPC-H additions, swept green on this twin when added
    "tpch_q13_cust_distribution", "tpch_q16_supplier_cnt",
    "tpch_q21_waiting_supplier", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q19_discounted_revenue", "tpch_q20_dominant_supplier",
    "tpch_q12_shipmode",
    # round-8 additions, swept green on this twin when added
    "skew_key_histogram", "funnel_steps_capped", "timeseries_lttb_exact",
    # round-9: the ASC-on-nullable window class resurfaced at sf0.01
    # twin scale (sf0.001's 150-customer table drew zero c_acctbal
    # NULLs by md5 luck, masking it) — bare .asc() is Spark NULLS
    # FIRST vs DuckDB NULLS LAST; DESC agrees in both engines because
    # DuckDB's default_null_order is nulls_last for BOTH directions
    "win_cume_dist", "win_ntile", "trending_topk",
]


@pytest.fixture(scope="module")
def null_env(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sfnull"))
    # sf0.01, not sf0.001: the 10-permille NULL plan needs table
    # cardinality for small tables (customer) to be hit at all — the
    # r9 win_cume_dist/win_ntile divergence was invisible at sf0.001
    build("null", "/root/testdata/sf0.01", out)
    return out, duckdb_connect(out)


@pytest.mark.parametrize("name", _FORMERLY_FAILING)
def test_query_survives_null_injection(name, spark, null_env):
    sf_dir, con = null_env
    ok, msg = compare_one(
        name, spark, con, sf_dir, se.queries(), se.oracle_sql()
    )
    assert ok, f"{name} diverges on NULL-bearing data: {msg}"
