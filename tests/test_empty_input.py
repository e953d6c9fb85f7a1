"""Empty-input robustness: a 100 TB pipeline routinely meets an empty
partition/day — no query may crash on zero rows, and Spark/DuckDB must
agree on the (usually empty) result.

Round 6 swept the full registry against a zero-row parquet twin:
217/226 agreed out of the box; the fit-based ANN/coreset operators now
degrade gracefully (empty index -> empty search result, faiss-style)
instead of raising, and scan_glob's oracle counts files TOUCHED.  The
one documented divergence class left is the rollup family: on empty
input DuckDB emits the SQL-standard grand-total row (COUNT()=0) while
Spark emits no rows at all — an ENGINE difference, excluded below.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as se
from tools.parity import compare_one
from tools.perturb import build, oracle_views

# engine-level divergence: grand-total row over empty input
_KNOWN_ENGINE_DIVERGENCE = {"agg_cube", "agg_rollup", "agg_grouping_sets"}

# the ids the empty sweep originally broke, now pinned green
_PINNED = [
    "scan_glob", "dedup_semantic", "sample_kcenter", "sim_ivf_recall",
    "sim_ivf_topk", "sim_pq_adc",
    # representative always-green shapes (scan/join/window/sketch/parse)
    "q1_pricing_summary", "join_asof", "win_rank", "freq_heavy_hitters",
    "parse_full_entry", "quantile_timing", "dedup_minhash_lsh",
    "curation_pipeline", "pack_sequences",
    # round-7 TPC-H additions, swept green on this twin when added
    "tpch_q13_cust_distribution", "tpch_q16_supplier_cnt",
    "tpch_q21_waiting_supplier", "tpch_q7_volume_shipping",
    "tpch_q8_market_share", "tpch_q9_product_profit",
    "tpch_q19_discounted_revenue", "tpch_q20_dominant_supplier",
    # round-8 additions (the histogram's 1-row total over zero rows, the
    # funnel prefix over an empty window, lttb with no series)
    "skew_key_histogram", "funnel_steps_capped", "timeseries_lttb_exact",
]


@pytest.fixture(scope="module")
def empty_env(tmp_path_factory):
    out = build("empty", "/root/testdata/sf0.001",
                str(tmp_path_factory.mktemp("sfempty")))
    return out, oracle_views(out)


@pytest.mark.parametrize("name", _PINNED)
def test_query_survives_empty_input(name, spark, empty_env):
    assert name not in _KNOWN_ENGINE_DIVERGENCE
    sf_dir, con = empty_env
    ok, msg = compare_one(
        name, spark, con, sf_dir, se.queries(), se.oracle_sql()
    )
    assert ok, f"{name} diverges/crashes on empty input: {msg}"
