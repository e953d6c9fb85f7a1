"""Property-based invariants for the round-5 sketch/graph operators
(hypothesis): random inputs against exact Python models — complements
the one-dataset oracle parity gate."""

from __future__ import annotations

import hashlib
from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[1:16], 16)


@settings(**_SETTINGS)
@given(st.lists(st.integers(0, 5000), min_size=1, max_size=300))
def test_hll_registers_match_python_model(spark, keys):
    # the Spark register build must equal a pure-Python HLL over the
    # same md5-60bit / bucket / trailing-zero-rho construction
    from logpump_spark.llmdata.dedup import md5_hash60

    df = spark.createDataFrame([(k,) for k in keys], "k long").select(
        F.col("k").cast("string").alias("ks")
    )
    h = md5_hash60(F.col("ks"))
    base = df.select(
        (h % 512).alias("bucket"), F.shiftrightunsigned(h, 9).alias("h2")
    )
    rho = F.when(F.col("h2") == 0, F.lit(52)).otherwise(
        F.bit_count(F.col("h2").bitwiseAND(-F.col("h2")) - 1) + 1
    )
    spark_regs = {
        r["bucket"]: r["rho"]
        for r in base.groupBy("bucket").agg(F.max(rho).alias("rho")).collect()
    }
    model: dict[int, int] = {}
    for k in keys:
        hv = _md5_60(str(k))
        b, h2 = hv % 512, hv >> 9
        r = 52 if h2 == 0 else ((h2 & -h2).bit_length() - 1) + 1
        model[b] = max(model.get(b, 0), r)
    assert spark_regs == model


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(0, 60), min_size=1, max_size=80),
    st.lists(st.integers(0, 60), min_size=1, max_size=80),
)
def test_kmv_samples_are_k_smallest(spark, xs, ys):
    # per source the sample is exactly the K smallest distinct hashes,
    # and the pair's sampled-intersection count matches the Python model
    from logpump_spark.queries.mining_q import kmv_pair_overlap

    K = 8
    rows = [("a", _md5_60(f"v{x}")) for x in set(xs)] + [
        ("b", _md5_60(f"v{y}")) for y in set(ys)
    ]
    hs = spark.createDataFrame(rows, "source string, h long").distinct()
    out = {(r["src_a"], r["src_b"]): r for r in kmv_pair_overlap(hs, K).collect()}
    ha = sorted({_md5_60(f"v{x}") for x in xs})
    hb = sorted({_md5_60(f"v{y}") for y in ys})
    sa, sb = set(ha[:K]), set(hb[:K])
    theta = min(max(ha[:K]), max(hb[:K]))
    nc = len({h for h in sa & sb if h <= theta})
    r = out[("a", "b")]
    assert r["n_common_sample"] == nc
    assert r["exact_common"] == len(set(ha) & set(hb))
    assert r["est_union"] >= r["est_intersection"]


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=60,
    )
)
def test_triangle_stats_match_python_bruteforce(spark, raw):
    from logpump_spark.queries.mining_q import triangle_stats

    edges = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    if not edges:
        return
    df = spark.createDataFrame(sorted(edges), "sa long, sb long")
    row = triangle_stats(df).first()
    eset = set(edges)
    nodes = {v for e in eset for v in e}
    tri = sum(
        1
        for a, b, c in combinations(sorted(nodes), 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    )
    assert row["n_nodes"] == len(nodes)
    assert row["n_edges"] == len(eset)
    assert row["n_triangles"] == tri
