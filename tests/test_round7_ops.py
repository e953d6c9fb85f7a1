"""Round-7 operator semantics: the strict_dedup funnel mode's
chain-interruption rule, counter-reset rate accounting, and
time-weighted-average weighting."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(m):
    return dt.datetime(2024, 1, 1, 10, m, 0)


def test_strict_dedup_funnel_repeat_breaks_chain(spark):
    from logpump_spark.operators.funnel import window_funnel_strict_dedup

    rows = [
        # user 1: clean view -> click -> purchase -> level 3
        (1, _ts(0), "view"), (1, _ts(1), "click"), (1, _ts(2), "purchase"),
        # user 2: view, VIEW again, click, purchase -> the repeated view
        # between t1 and t2 interrupts at level 1
        (2, _ts(0), "view"), (2, _ts(1), "view"),
        (2, _ts(2), "click"), (2, _ts(3), "purchase"),
        # user 3: view, click, CLICK again, purchase -> repeat of an
        # already-matched condition between t2 and t3 -> level 2
        (3, _ts(0), "view"), (3, _ts(1), "click"),
        (3, _ts(2), "click"), (3, _ts(3), "purchase"),
        # user 4: non-step noise between steps does NOT interrupt
        (4, _ts(0), "view"), (4, _ts(1), "error"),
        (4, _ts(2), "click"), (4, _ts(3), "purchase"),
        # user 5: repeat AFTER the full chain completed is harmless
        (5, _ts(0), "view"), (5, _ts(1), "click"),
        (5, _ts(2), "purchase"), (5, _ts(3), "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    steps = [F.col("event_type") == s for s in ("view", "click", "purchase")]
    got = {
        r["user_id"]: r["level"]
        for r in window_funnel_strict_dedup(ev, steps).collect()
    }
    assert got == {1: 3, 2: 1, 3: 2, 4: 3, 5: 3}


def _events_dir(spark, tmp_path, rows):
    import os

    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def test_rate_counts_resets_and_restarts_increase(spark, tmp_path):
    """values 100.0 each -> qv 1e6 -> counter 1e6, 2e6, 3e6, 4e6, 0 (5e6
    wraps to 0 = reset), 1e6: the day's increase is 4e6/1e4 = 400 up to
    the wrap, then restarts at the reading (0), then +100."""
    from logpump_spark.queries.timeseries_q import timeseries_rate

    rows = [
        (i, dt.datetime(2024, 3, 1, 10, i), 7, "view", 100.0, "{}")
        for i in range(6)
    ]
    d = _events_dir(spark, tmp_path, rows)
    out = timeseries_rate(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.user_id == 7 and r.n_samples == 6
    assert r.n_resets == 1
    # increases: 0(first),100,100,100, 0(reset to reading 0), 100
    assert r.increase == 400.0


def test_twa_weights_by_held_duration(spark, tmp_path):
    """value 2.0 held 30 min, then 6.0 held 10 min -> twa = (2*30+6*10)/40 = 3.0;
    the final sample holds nothing and only anchors the last interval."""
    from logpump_spark.queries.timeseries_q import timeseries_twa

    t0 = dt.datetime(2024, 3, 2, 9, 0, 0)
    rows = [
        (1, t0, 3, "view", 2.0, "{}"),
        (2, t0 + dt.timedelta(minutes=30), 3, "view", 6.0, "{}"),
        (3, t0 + dt.timedelta(minutes=40), 3, "view", 99.0, "{}"),
        # single-sample day drops (no held interval)
        (4, dt.datetime(2024, 3, 3, 9, 0, 0), 3, "view", 5.0, "{}"),
    ]
    d = _events_dir(spark, tmp_path, rows)
    out = {(r.user_id, r.day): r for r in timeseries_twa(spark, d).collect()}
    assert set(out) == {(3, "2024-03-02")}
    r = out[(3, "2024-03-02")]
    assert r.n_samples == 3
    assert abs(r.twa - 3.0) < 1e-9
