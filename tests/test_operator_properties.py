"""Property-based invariants for the r4-tail operators (hypothesis):
random inputs, structural guarantees — complements the oracle parity
gate, which checks one fixed dataset."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 6)),
        min_size=1,
        max_size=200,
    )
)
def test_cms_never_underestimates_random_keys(spark, rows):
    from logpump_spark.operators.sketch import cms_build, cms_estimate

    df = spark.createDataFrame(
        [(a, b) for a, b in rows], "ka long, kb long"
    ).select(F.concat_ws(":", "ka", "kb").alias("key"))
    sketch = cms_build(df, F.col("key"), depth=3, width=16)
    exact = df.groupBy("key").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(exact, "key", sketch, depth=3, width=16, carry_cols=("exact",))
    bad = est.filter(F.col("est") < F.col("exact")).count()
    assert bad == 0


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 40), st.floats(-100, 100)),
        min_size=1,
        max_size=120,
    )
)
def test_ohlc_invariants_random_frames(spark, rows):
    from datetime import datetime, timedelta

    from logpump_spark.operators.timeseries import ohlc_resample

    base = datetime(2024, 1, 1)
    data = [
        (f"k{k}", base + timedelta(minutes=m), float(v), i)
        for i, (k, m, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "key string, ts timestamp, value double, event_id long"
    )
    out = ohlc_resample(df, "key", "ts", "value", "event_id", "hour").collect()
    assert out, "at least one bar"
    for r in out:
        assert r.low_q <= r.open_q <= r.high_q
        assert r.low_q <= r.close_q <= r.high_q
        assert r.n >= 1


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 400), st.floats(-10, 10)),
        min_size=1,
        max_size=150,
    )
)
def test_ewma_stays_within_observed_range(spark, rows):
    from datetime import datetime, timedelta

    from logpump_spark.operators.timeseries import ewma_daily

    base = datetime(2024, 1, 1)
    data = [
        (k, base + timedelta(days=d), float(v)) for (k, d, v) in rows
    ]
    df = spark.createDataFrame(data, "key long, ts timestamp, value double")
    out = ewma_daily(df, "key", "ts", "value").collect()
    # EWMA of the daily sums is a convex combination of observed daily
    # sums (integer weights), so it must lie inside each key's [min, max]
    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.key, []).append(r)
    for key, rs in by_key.items():
        lo = min(r.qsum for r in rs)
        hi = max(r.qsum for r in rs)
        for r in rs:
            assert lo <= r.ewma_q <= hi


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(0, 10**6), min_size=2, max_size=80, unique=True)
)
def test_pagerank_mass_and_positivity(spark, nodes):
    from logpump_spark.llmdata.graph import pagerank_int

    # ring graph over the given nodes: every node has in/out degree 1
    edges = [(nodes[i], nodes[(i + 1) % len(nodes)]) for i in range(len(nodes))]
    df = spark.createDataFrame(edges, "src long, dst long")
    pr = pagerank_int(df, iters=2).collect()
    assert len(pr) == len(nodes)
    # ring symmetry: every node keeps the full mass (base + damped
    # inflow of a full rank) -> all ranks equal and positive
    vals = {r.pr for r in pr}
    assert len(vals) == 1
    assert vals.pop() > 0


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 10**7), st.integers(0, 4)),
        min_size=1,
        max_size=150,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 100),
)
def test_top_p_matches_sorted_prefix_reference(spark, rows, p):
    """r10 prefix-scan tie rank vs the brute-force spec: sort by
    (score DESC, id ASC), take ceil(n*p/100).  The 0-4 score domain
    forces heavy cutoff ties; ids up to 10^7 span many _TIE_BUCKET
    buckets, so whole/boundary/dropped bucket paths all fire."""
    from logpump_spark.llmdata.curation import top_p_by_score

    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = sorted(
        (r.doc_id, r.n_chars)
        for r in top_p_by_score(df, p_pct=p).collect()
    )
    target = -(-len(rows) * p // 100)  # ceil
    want = sorted(
        sorted(rows, key=lambda t: (-t[1], t[0]))[:target]
    )
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),      # user
            st.integers(0, 300),    # minute
            st.sampled_from(["view", "click", "purchase", "error"]),
        ),
        min_size=1,
        max_size=120,
    ),
    st.integers(1, 30),
)
def test_funnel_cap_equals_funnel_on_reference_prefix(spark, rows, cap):
    """The count-gated two-stage cap must equal running the UNCAPPED
    funnel on each user's reference first-N prefix (computed in plain
    Python by (ts, event_id) sort) — semantics by construction, any
    distribution, caps that bind mid-stream or not at all."""
    from datetime import datetime, timedelta

    from logpump_spark.operators.funnel import window_funnel

    base = datetime(2024, 1, 1)
    data = [
        (u, base + timedelta(minutes=m), i, t)
        for i, (u, m, t) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "user_id long, ts timestamp, event_id long, event_type string"
    )
    steps = [F.col("event_type") == s for s in ("view", "click", "purchase")]
    got = {
        r.user_id: r.level
        for r in window_funnel(df, steps, max_events_per_user=cap).collect()
    }
    prefix = []
    byu = {}
    for row in data:
        byu.setdefault(row[0], []).append(row)
    for u, evs in byu.items():
        evs.sort(key=lambda r: (r[1], r[2]))
        prefix += evs[:cap]
    pdf = spark.createDataFrame(
        prefix, "user_id long, ts timestamp, event_id long, event_type string"
    )
    want = {r.user_id: r.level for r in window_funnel(pdf, steps).collect()}
    assert got == want
