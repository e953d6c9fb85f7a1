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
