"""Property-based invariant for the round-7 strict_dedup funnel mode:
random event streams against an exact Python model.  The mode's
semantics are defined on TIMESTAMPS (greedy-earliest chain, strict
inequalities on both the step-advance and the violation window), so the
model works on minute values directly — duplicate timestamps are in the
strategy's range on purpose: an interrupting repeat at exactly t_{k-1}
or t_k must NOT count (strictly-between), and a step candidate at
exactly t_{k-1} must not advance the chain (strictly-after)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.test_round6_properties import _EVENTS, _SETTINGS, _frame


def _dedup_model(evts):
    """evts: list of (minute, type) for ONE user; returns the level the
    strict_dedup chain reaches, or None if there is no anchor view."""
    views = [m for m, t in evts if t == "view"]
    if not views:
        return None
    t1 = min(views)

    def first_after(ty, lo):
        cand = [m for m, t in evts if t == ty and m > lo]
        return min(cand) if cand else None

    def violated(lo, hi, types):
        return any(lo < m < hi for m, t in evts if t in types)

    t2 = first_after("click", t1)
    level = 1
    if t2 is not None and not violated(t1, t2, ("view",)):
        level = 2
        t3 = first_after("purchase", t2)
        if t3 is not None and not violated(t2, t3, ("view", "click")):
            level = 3
    return level


@settings(**_SETTINGS)
@given(_EVENTS)
def test_strict_dedup_funnel_matches_scan_model(spark, events):
    from logpump_spark.operators.funnel import window_funnel_strict_dedup

    steps = [F.col("event_type") == s for s in ("view", "click", "purchase")]
    got = {
        r["user_id"]: r["level"]
        for r in window_funnel_strict_dedup(_frame(spark, events), steps).collect()
    }

    from tests.test_round6_properties import _TYPES

    per_user: dict[int, list] = {}
    for u, m, t in events:
        per_user.setdefault(u, []).append((m, _TYPES[t]))
    want = {
        u: lvl
        for u, evts in per_user.items()
        if (lvl := _dedup_model(evts)) is not None
    }
    assert got == want


# --- interval sweep family vs exact scan models ----------------------------
# Random interval sets, brute-force python models: max concurrency under
# half-open [s, e) is the max over start points of how many intervals
# cover that point (zero-length intervals can never count); union length
# merges touching intervals.  The operators must agree exactly — the
# two-stage prefix scan and the per-key sweep are pure reformulations.

from datetime import datetime, timedelta, timezone


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.integers(0, 500)),
        min_size=1,
        max_size=60,
    )
)
def test_max_concurrent_matches_scan_model(spark, raw):
    from logpump_spark.operators.intervals import max_concurrent_intervals

    ivs = [(min(a, b), max(a, b)) for a, b in raw]
    base = datetime(2024, 1, 1, tzinfo=timezone.utc)
    base_us = int(base.timestamp() * 1_000_000)
    data = [
        (base + timedelta(microseconds=s), base + timedelta(microseconds=e))
        for s, e in ivs
    ]
    df = spark.createDataFrame(
        data, "session_start timestamp, session_end timestamp"
    )
    (row,) = max_concurrent_intervals(df).collect()

    # scan model: concurrency can only peak at a start boundary
    def conc(t):
        return sum(1 for s, e in ivs if s <= t < e)

    peaks = [(conc(s), s) for s, _e in ivs]
    mx = max(c for c, _s in peaks)
    if mx == 0:
        # all intervals zero-length-dominated: the sweep's max is 0 and
        # the position is whatever boundary first attains running == 0
        # after a close — only the max value is contractual here
        assert row.max_concurrent == 0
        return
    at = min(s for c, s in peaks if c == mx)
    assert (row.max_concurrent, row.at_us - base_us) == (mx, at)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 300), st.integers(0, 300)),
        min_size=1,
        max_size=60,
    )
)
def test_union_length_matches_merge_model(spark, raw):
    from logpump_spark.operators.intervals import interval_union_length

    ivs = [(u, min(a, b), max(a, b)) for u, a, b in raw]
    df = spark.createDataFrame(ivs, "user_id long, s_us long, e_us long")
    got = {
        r.user_id: (r.covered_us, r.n_intervals)
        for r in interval_union_length(df).collect()
    }

    from collections import defaultdict

    per_user = defaultdict(list)
    for u, s, e in ivs:
        per_user[u].append((s, e))
    for u, spans in per_user.items():
        merged = []
        for s, e in sorted(spans):
            if merged and s <= merged[-1][1]:  # touching merges
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        want = sum(e - s for s, e in merged)
        assert got[u] == (want, len(spans))
