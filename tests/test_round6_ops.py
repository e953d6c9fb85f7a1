"""Round-6 operator semantics: strict-order funnel chain-breaking, the
uniqUpTo saturation contract, the quantileTiming bin layout, and the
weighted-CMS overestimate invariant."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from .conftest import SF_SMALL


def _ts(m):
    return dt.datetime(2024, 1, 1, 10, m, 0)


def test_strict_order_funnel_breaks_on_interleaved_event(spark):
    from logpump_spark.operators.funnel import window_funnel_strict

    rows = [
        # user 1: view, click, purchase consecutive -> level 3
        (1, _ts(0), 1, "view"), (1, _ts(1), 2, "click"), (1, _ts(2), 3, "purchase"),
        # user 2: view, ERROR, click -> interleaved event breaks at level 1
        (2, _ts(0), 4, "view"), (2, _ts(1), 5, "error"), (2, _ts(2), 6, "click"),
        # user 3: view, click, ERROR -> level 2
        (3, _ts(0), 7, "view"), (3, _ts(1), 8, "click"), (3, _ts(2), 9, "error"),
        # user 4: no view at all -> absent from result
        (4, _ts(0), 10, "click"), (4, _ts(1), 11, "purchase"),
        # user 5: second view anchors nothing (earliest view is the anchor)
        (5, _ts(0), 12, "view"), (5, _ts(1), 13, "error"),
        (5, _ts(2), 14, "view"), (5, _ts(3), 15, "click"), (5, _ts(4), 16, "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, event_type string")
    steps = [F.col("event_type") == s for s in ("view", "click", "purchase")]
    got = {
        r["user_id"]: r["level"]
        for r in window_funnel_strict(ev, steps).collect()
    }
    assert got == {1: 3, 2: 1, 3: 2, 5: 1}


def test_uniq_upto_saturates_at_cap_plus_one(spark):
    # 25 distinct users in group a, 3 in group b; cap 10 -> a reports 11
    rows = [("a", u) for u in range(25)] + [("b", u) for u in range(3)]
    df = spark.createDataFrame(rows, "g string, user_id long")
    d = df.select("g", "user_id").distinct()
    out = {
        r["g"]: r["u"]
        for r in d.groupBy("g")
        .agg(F.least(F.count(F.lit(1)), F.lit(11)).alias("u"))
        .collect()
    }
    assert out == {"a": 11, "b": 3}


def test_quantile_timing_layout_boundaries():
    from logpump_spark.queries.sketch_q import (
        _QT_CAP,
        _QT_COARSE_STEP,
        _QT_FINE,
    )

    def layout(ms):
        if ms < _QT_FINE:
            return ms
        if ms < _QT_CAP:
            return (ms // _QT_COARSE_STEP) * _QT_COARSE_STEP
        return _QT_CAP

    # 1 ms resolution below the fine cutoff, coarse above, capped at top
    assert layout(0) == 0 and layout(1023) == 1023
    assert layout(1024) == 1024 and layout(1039) == 1024 and layout(1040) == 1040
    assert layout(10**6) == _QT_CAP
    # monotone non-decreasing, never exceeding the input
    prev = -1
    for v in range(0, 40000, 7):
        b = layout(v)
        assert prev <= b <= v or b == _QT_CAP
        prev = b


def test_weighted_cms_never_underestimates(spark):
    from logpump_spark.queries.sketch_q import topk_weighted

    rows = topk_weighted(spark, SF_SMALL).collect()
    assert rows, "weighted top-k returned nothing"
    assert all(r["est"] >= r["exact_w"] for r in rows)
