"""Round-8 operator semantics: the opt-in per-user event cap on the
funnel (SCALING.md §4.1 guard), the hot-key histogram pre-flight, and
canonical sequential LTTB vs the fixed-anchor parallel variant."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from logpump_spark.operators.funnel import window_funnel


def _ts(m):
    return dt.datetime(2024, 1, 1, 10, m, 0)


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )


def _steps():
    return [F.col("event_type") == s for s in ("view", "click", "purchase")]


def test_funnel_cap_is_a_noop_when_above_per_user_volume(spark):
    """Planted hot key: user 1 owns 40 events, user 2 owns 4.  A cap >=
    the hottest user's volume must reproduce the uncapped result row for
    row — the guard only changes semantics when it actually binds."""
    rows = [(1, _ts(i), i, "error") for i in range(37)]
    rows += [(1, _ts(37), 37, "view"), (1, _ts(38), 38, "click"),
             (1, _ts(39), 39, "purchase")]
    rows += [(2, _ts(0), 100, "view"), (2, _ts(1), 101, "click"),
             (2, _ts(2), 102, "view"), (2, _ts(3), 103, "purchase")]
    ev = _mk_events(spark, rows)
    uncapped = window_funnel(ev, _steps()).collect()
    capped = window_funnel(ev, _steps(), max_events_per_user=40).collect()
    assert sorted(map(tuple, capped)) == sorted(map(tuple, uncapped))
    assert {r["user_id"]: r["level"] for r in capped} == {1: 3, 2: 3}


def test_funnel_cap_truncates_steps_past_the_cap(spark):
    """When the purchase sits past the user's first-N events, the capped
    funnel stops at the level completed WITHIN the prefix."""
    rows = [(1, _ts(0), 0, "view"), (1, _ts(1), 1, "click")]
    rows += [(1, _ts(2 + i), 2 + i, "error") for i in range(8)]
    rows += [(1, _ts(10), 10, "purchase")]  # event #11 — past a cap of 10
    ev = _mk_events(spark, rows)
    assert window_funnel(ev, _steps()).collect()[0]["level"] == 3
    got = window_funnel(ev, _steps(), max_events_per_user=10).collect()
    assert got[0]["level"] == 2


def test_funnel_cap_prefix_is_by_time_then_tiebreak(spark):
    """The first-N prefix is (ts, event_id)-ordered, not input-ordered:
    a view arriving last in the data but earliest in time survives a
    cap of 1."""
    rows = [(1, _ts(5), 7, "click"), (1, _ts(0), 3, "view")]
    ev = _mk_events(spark, rows)
    got = window_funnel(ev, _steps(), max_events_per_user=1).collect()
    assert {r["user_id"]: r["level"] for r in got} == {1: 1}


def test_funnel_cap_two_stage_matches_single_window_spec(spark):
    """r10 count-gated two-stage cap vs the naive one-window spec it
    replaced: a hot user far over the cap (ranked branch, survivors
    gathered across every tiebreak-hash shard), an under-cap user (the
    no-window passthrough branch), and a cap landing mid-tie-second so
    the exact second-stage rank decides the prefix boundary."""
    # hot user 1: 200 events over rising minutes; view/click planted
    # inside the first-50 prefix at strictly increasing ts, purchase
    # planted past the prefix (must count uncapped, not capped)
    rows = [(1, _ts(i // 10), i, "error") for i in range(200)]
    rows[30] = (1, _ts(3), 30, "view")
    rows[41] = (1, _ts(4), 41, "click")
    rows[150] = (1, _ts(15), 150, "purchase")
    rows += [(2, _ts(0), 1000, "view"), (2, _ts(1), 1001, "click"),
             (2, _ts(2), 1002, "purchase")]
    ev = _mk_events(spark, rows)
    uncapped = {r["user_id"]: r["level"] for r in window_funnel(ev, _steps()).collect()}
    capped = {r["user_id"]: r["level"]
              for r in window_funnel(ev, _steps(), max_events_per_user=50).collect()}
    assert uncapped == {1: 3, 2: 3}
    assert capped == {1: 2, 2: 3}  # purchase at event 150 is past the prefix


def test_skew_histogram_surfaces_a_planted_hot_key(spark, tmp_path):
    """One user owning 32 of 40 rows must show up as the top hot key
    with floor(32e6/40) ppm, and the histogram buckets must be the
    integer floor(log2(cnt)) — 32 -> bucket 5, 2 -> bucket 1."""
    import os

    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    rows = [(i, _ts(i % 60), 999, "view", 1.0, "") for i in range(32)]
    rows += [(100 + i, _ts(i), i, "view", 1.0, "") for i in range(8)]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")

    from logpump_spark.queries.analytics_q import skew_key_histogram

    out = skew_key_histogram(spark, d).collect()
    hot = [r for r in out if r["kind"] == "hot_key"]
    assert hot[0]["k"] == 999 and hot[0]["rows_held"] == 32
    assert hot[0]["share_ppm"] == (32 * 1_000_000) // 40
    hist = {r["k"]: r for r in out if r["kind"] == "hist"}
    assert hist[5]["n_keys"] == 1 and hist[5]["rows_held"] == 32
    assert hist[0]["n_keys"] == 8 and hist[0]["rows_held"] == 8


def _seq_lttb(xs, ys, nb):
    """Reference canonical LTTB (straight from the thesis pseudocode,
    floats throughout) used to pin the distributed implementation."""
    n = len(xs)
    if n <= nb:
        return list(range(n))
    k = nb - 2
    members = [[] for _ in range(k)]
    for j in range(1, n - 1):
        members[((j - 1) * k) // (n - 2)].append(j)
    sel = [0]
    ax, ay = xs[0], ys[0]
    for b in range(k):
        if b + 1 < k:
            nxt = members[b + 1]
            mx = sum(xs[j] for j in nxt) / len(nxt)
            my = sum(ys[j] for j in nxt) / len(nxt)
        else:
            mx, my = xs[n - 1], ys[n - 1]
        best_j, best_a = members[b][0], -1.0
        for j in members[b]:
            area = abs((ax - mx) * (ys[j] - ay) - (ax - xs[j]) * (my - ay))
            if area > best_a:
                best_a, best_j = area, j
        sel.append(best_j)
        ax, ay = xs[best_j], ys[best_j]
    sel.append(n - 1)
    return sel


def test_lttb_exact_matches_sequential_reference(spark, tmp_path):
    """The applyInPandas implementation must reproduce the sequential
    reference on a series whose anchor chain MATTERS: a sawtooth with a
    spike, where fixed-anchor and sequential LTTB pick different points."""
    import os

    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    # one user, 40 days, deterministic pseudo-random daily values
    vals = [((i * 37) % 23) * 10.0 + (500.0 if i == 17 else 0.0) for i in range(40)]
    rows = [
        (i, dt.datetime(2024, 1, 1 + i % 28, 12, 0, 0) + dt.timedelta(days=28 * (i // 28)),
         1, "view", vals[i], "")
        for i in range(40)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")

    from logpump_spark.queries.timeseries_q import (
        _LTTB_EXACT_NB,
        timeseries_lttb_exact,
    )

    got = timeseries_lttb_exact(spark, d).collect()
    assert len(got) == _LTTB_EXACT_NB
    # replay the daily aggregation + reference scan
    import duckdb

    ref_rows = duckdb.sql(
        f"""SELECT CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS BIGINT)
            FROM read_parquet('{d}/events.parquet/*.parquet')
            GROUP BY date_trunc('day', ts) ORDER BY date_trunc('day', ts)"""
    ).fetchall()
    ys = [float(r[0]) for r in ref_rows]
    xs = [float(i) for i in range(len(ys))]
    want = _seq_lttb(xs, ys, _LTTB_EXACT_NB)
    assert [r["rn"] for r in got] == want
    assert got[0]["rn"] == 0 and got[-1]["rn"] == len(ys) - 1


def test_lttb_exact_passthrough_short_series(spark, tmp_path):
    import os

    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    rows = [
        (i, dt.datetime(2024, 1, 1 + i, 12, 0, 0), 2, "view", float(i), "")
        for i in range(5)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")

    from logpump_spark.queries.timeseries_q import timeseries_lttb_exact

    got = timeseries_lttb_exact(spark, d).collect()
    assert [r["rn"] for r in got] == [0, 1, 2, 3, 4]


# ---------------------------------------------------------------------------
# Property: the module-level LTTB core (what applyInPandas and the
# DuckDB CTE chain both replay) equals the independent sequential
# reference above on arbitrary integer-valued series.

from hypothesis import given, settings, strategies as st


@settings(max_examples=300, deadline=None)
@given(
    ys=st.lists(
        st.integers(min_value=-10**9, max_value=10**9), min_size=1, max_size=120
    ),
    nb=st.integers(min_value=3, max_value=20),
)
def test_lttb_core_matches_reference_model(ys, nb):
    from logpump_spark.queries.timeseries_q import lttb_select_indices

    y = [float(v) for v in ys]
    xs = [float(i) for i in range(len(y))]
    got = lttb_select_indices(y, nb)
    want = _seq_lttb(xs, y, nb)
    assert got == want
    # structural invariants: endpoints pinned, strictly increasing,
    # exactly nb points when the series is long enough
    assert got[0] == 0 and got[-1] == len(y) - 1 if len(y) > 1 else True
    assert all(a < b for a, b in zip(got, got[1:]))
    assert len(got) == (len(y) if len(y) <= nb else nb)
