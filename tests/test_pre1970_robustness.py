"""Pre-1970 (negative-epoch) robustness: historical/backfilled logs live
before the epoch, where `%` keeps the dividend's sign and cast-truncation
(toward zero) silently diverges from floor division between engines.

Round 6 swept the registry against a twin with 1/7 of events shifted to
1965: 224/226 agreed; the two finds — Spark's pivot yields NULL for an
empty cell where the oracle's COUNT FILTER yields 0 (invisible on dense
fixtures), and the parse plane's synthesized mm:ss went negative — are
fixed and pinned here, alongside the epoch-day floor() sites the round-5
advisor flagged.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as se
from tools.parity import compare_one
from tools.perturb import build, oracle_views

_PINNED = [
    "agg_pivot",        # empty pivot cell: NULL vs 0
    "records_explode",  # negative within-minute offset in synthesis
    "parse_full_entry", "parse_scaled", "xform_event_time",
    "xform_duration", "parse_record_split",
    # the advisor-flagged floor-division sites
    "timeseries_islands", "agg_hll_sliding",
    # representative calendar/window shapes
    "agg_by_day", "timeseries_ohlc", "sessionize_events", "win_rank",
    "stream_tumbling", "cdc_scd2", "funnel_strict_order",
    # round-8 additions: lttb buckets by day, funnel prefixes by ts —
    # both must survive negative epochs
    "skew_key_histogram", "funnel_steps_capped", "timeseries_lttb_exact",
]

@pytest.fixture(scope="module")
def pre1970_env(tmp_path_factory):
    out = build("pre1970", "/root/testdata/sf0.001",
                str(tmp_path_factory.mktemp("sfpre70")))
    return out, oracle_views(out)


@pytest.mark.parametrize("name", _PINNED)
def test_query_survives_negative_epochs(name, spark, pre1970_env):
    sf_dir, con = pre1970_env
    ok, msg = compare_one(
        name, spark, con, sf_dir, se.queries(), se.oracle_sql()
    )
    assert ok, f"{name} diverges on pre-1970 timestamps: {msg}"
