"""Behavioral tests for gap filling and z-score anomaly detection."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from logpump_spark.operators.timeseries import gap_fill_daily, zscore_anomalies


def _ev(spark, rows):
    data = [
        (i, u, dt.datetime(2024, 1, d, 12, 0, 0), float(v))
        for i, (u, d, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp, value double"
    )


def test_gap_fill_inserts_missing_days(spark):
    ev = _ev(spark, [(1, 1, 10.0), (1, 4, 20.0), (2, 2, 5.0)])
    out = gap_fill_daily(ev, "user_id", "ts", "value")
    rows = {(r.user_id, str(r.day)): r for r in out.collect()}
    # user 1 spans Jan 1-4: days 2 and 3 synthesized with 0 events
    assert len([k for k in rows if k[0] == 1]) == 4
    assert rows[(1, "2024-01-02")].n_events == 0
    assert rows[(1, "2024-01-03")].n_events == 0
    # forward fill carries Jan 1's quantized sum through the gap
    assert rows[(1, "2024-01-02")].qsum_ff == 100000  # floor(10.0*1e4)
    assert rows[(1, "2024-01-04")].qsum_ff == 200000
    # user 2 has a single day -> no synthesis
    assert len([k for k in rows if k[0] == 2]) == 1


def test_gap_fill_without_forward_fill(spark):
    ev = _ev(spark, [(1, 1, 1.0), (1, 3, 2.0)])
    out = gap_fill_daily(ev, "user_id", "ts", "value", forward_fill=False)
    assert "qsum_ff" not in out.columns
    assert out.filter(F.col("n_events") == 0).count() == 1


def test_zscore_flags_outlier_day(spark):
    # key 'a': nine 1-event days and one 20-event day -> that day z >> 2
    rows = [(1, d, 1.0) for d in range(1, 10)]
    rows += [(1, 10, 1.0)] * 20
    ev = _ev(spark, rows)
    out = zscore_anomalies(ev, "user_id", "ts", z_threshold=2.0).collect()
    assert len(out) == 1
    assert str(out[0].day) == "2024-01-10"
    assert out[0].z > 2.0


def test_zscore_constant_series_never_flags(spark):
    ev = _ev(spark, [(1, d, 1.0) for d in range(1, 6)])
    assert zscore_anomalies(ev, "user_id", "ts").count() == 0
