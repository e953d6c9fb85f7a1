"""Behavioral tests for windowFunnel/retention: chain ordering, window
cutoffs, and greedy-earliest matching on hand-built event histories."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from logpump_spark.operators.funnel import retention, retention_summary, window_funnel

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    data = [(i, u, T0 + dt.timedelta(hours=h), t) for i, (u, h, t) in enumerate(rows)]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, event_type string"
    )


def _steps():
    return [
        F.col("event_type") == "a",
        F.col("event_type") == "b",
        F.col("event_type") == "c",
    ]


def test_funnel_levels(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "a"), (1, 1, "b"), (1, 2, "c"),      # full funnel
            (2, 0, "a"), (2, 5, "b"),                    # stops at 2
            (3, 0, "a"),                                 # stops at 1
            (4, 0, "b"), (4, 1, "c"),                    # never starts
        ],
    )
    out = {r.user_id: r.level for r in window_funnel(ev, _steps(), 24).collect()}
    assert out == {1: 3, 2: 2, 3: 1}
    assert 4 not in out  # no step-1 event -> no funnel row


def test_funnel_requires_order_and_window(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "a"), (1, 25, "b"),                   # b outside 24h window
            (2, 5, "a"), (2, 3, "b"),                    # b BEFORE a -> not counted
            (3, 0, "a"), (3, 23, "b"), (3, 23.5, "c"),   # all inside
        ],
    )
    out = {r.user_id: r.level for r in window_funnel(ev, _steps(), 24).collect()}
    assert out == {1: 1, 2: 1, 3: 3}


def test_funnel_greedy_earliest_start(spark):
    # user has two 'a' events; the chain anchors at the EARLIEST one, so
    # the 'b' at +30h is outside its window even though it is within 24h
    # of the second 'a' (documented divergence from CH any-start search)
    ev = _ev(spark, [(1, 0, "a"), (1, 10, "a"), (1, 30, "b")])
    out = {r.user_id: r.level for r in window_funnel(ev, _steps(), 24).collect()}
    assert out == {1: 1}


def test_retention_flags(spark):
    ev = _ev(
        spark,
        [
            (1, 0, "signup"), (1, 1, "click"), (1, 2, "purchase"),
            (2, 0, "signup"), (2, 1, "purchase"),
            (3, 0, "click"), (3, 1, "purchase"),         # no signup -> all gated off
        ],
    )
    conds = [
        F.col("event_type") == "signup",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    out = {r.user_id: (r.r1, r.r2, r.r3) for r in retention(ev, conds).collect()}
    assert out == {1: (1, 1, 1), 2: (1, 0, 1), 3: (0, 0, 0)}
    s = retention_summary(ev, conds).first()
    assert (s.n_r1, s.n_r2, s.n_r3) == (2, 1, 2)
