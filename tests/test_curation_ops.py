"""Behavioral tests for the curation/analytics operators: connected
components (cluster correctness on hand graphs the oracle CTE never
sees), SRP-LSH recall on planted duplicate embeddings, stratified-sample
exactness, tf-idf ranking, and sessionization boundaries."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from logpump_spark.llmdata.curation import stratified_sample, tfidf_top_terms
from logpump_spark.llmdata.graph import connected_components
from logpump_spark.llmdata.similarity import srp_lsh_neardup_pairs, srp_sign
from logpump_spark.operators.sessionize import session_stats, sessionize


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {r.node: r.component for r in connected_components(df).collect()}


def test_cc_chain_converges_to_min(spark):
    # a 6-node path: transitive closure must label everything with 1
    labels = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
    assert labels == {n: 1 for n in range(1, 7)}


def test_cc_multiple_components_and_direction(spark):
    # two components, edges given in arbitrary direction, with a cycle
    labels = _cc(spark, [(9, 7), (7, 8), (8, 9), (20, 30), (30, 10)])
    assert labels == {7: 7, 8: 7, 9: 7, 10: 10, 20: 10, 30: 10}


def test_cc_self_loops_and_duplicates_ignored(spark):
    labels = _cc(spark, [(1, 1), (2, 3), (3, 2), (2, 3)])
    assert labels == {2: 2, 3: 2}


def test_cc_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_cc_star_heavy_graph(spark):
    # hub-and-spoke plus a bridge between two hubs: one component, min=0
    edges = [(0, i) for i in range(1, 8)] + [(100, 100 + i) for i in range(1, 8)]
    edges.append((7, 107))
    labels = _cc(spark, edges)
    assert set(labels.values()) == {0}
    assert len(labels) == 16


def test_srp_sign_balance():
    signs = [srp_sign(i, j) for i in range(16) for j in range(64)]
    assert set(signs) == {1, -1}
    # roughly balanced hyperplanes (the 48/97 rate)
    assert 0.4 < signs.count(1) / len(signs) < 0.6


def test_srp_lsh_finds_planted_dups(spark):
    import random

    rng = random.Random(7)
    base = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(40)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # plant exact clones of vectors 0..4 under ids 1000..1004
    rows += [(1000 + i, [float(x) for x in base[i]]) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {
        (r.id_a, r.id_b): r.cos
        for r in srp_lsh_neardup_pairs(emb, threshold=0.99).collect()
    }
    # identical vectors share every signature bit -> every band collides
    for i in range(5):
        assert (i, 1000 + i) in pairs
        assert pairs[(i, 1000 + i)] == 1.0


def test_srp_lsh_bucket_cap_drops_degenerate_bucket(spark):
    # 30 identical vectors: one mega-bucket above the cap -> no pairs
    # (exact dedup is the right tool for those); cap respected exactly
    rows = [(i, [1.0] * 64) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assert srp_lsh_neardup_pairs(emb, threshold=0.5, max_bucket_size=10).count() == 0


def test_stratified_sample_exact_proportions(spark):
    rows = [(i, f"s{i % 3}") for i in range(100)]  # strata of 34/33/33
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_sample(df, "source", 0.2, "doc_id")
    counts = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"s0": 7, "s1": 7, "s2": 7}  # ceil(34*.2)=7, ceil(33*.2)=7
    # deterministic: same call twice -> same ids
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(r.doc_id for r in stratified_sample(df, "source", 0.2, "doc_id").collect())
    assert ids1 == ids2


def test_tfidf_rare_term_wins(spark):
    rows = [
        (1, "common words plus zebra zebra zebra"),
        (2, "common words plus filler filler"),
        (3, "common words plus other other"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    top = tfidf_top_terms(docs, top_n=1).collect()
    by_doc = {r.doc_id: r.term for r in top}
    # each doc's top term is its unique repeated word, never the shared ones
    assert by_doc == {1: "zebra", 2: "filler", 3: "other"}


def test_sessionize_boundaries(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, 10, t0),
        (2, 10, t0 + 5 * m),
        (3, 10, t0 + 45 * m),  # 40-min gap -> new session
        (4, 10, t0 + 50 * m),
        (5, 20, t0),  # other user: own numbering
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    sess = {r.event_id: r.session_no for r in sessionize(ev, gap_minutes=30).collect()}
    assert sess == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}
    stats = {
        (r.user_id, r.session_no): (r.n_events, r.duration_us)
        for r in session_stats(ev, gap_minutes=30).collect()
    }
    assert stats[(10, 1)] == (2, 5 * 60 * 1_000_000)
    assert stats[(10, 2)] == (2, 5 * 60 * 1_000_000)
    assert stats[(20, 1)] == (1, 0)


def test_sessionize_exact_gap_is_same_session(spark):
    # gap == timeout stays in-session (strict > starts a new one)
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, 1, t0), (2, 1, t0 + dt.timedelta(minutes=30))]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    assert sessionize(ev, gap_minutes=30).agg(F.max("session_no")).first()[0] == 1


def test_decontaminate_planted_overlap(spark):
    from logpump_spark.llmdata.curation import decontaminate_ngram_overlap

    eval_docs = spark.createDataFrame(
        [(1000, "the secret benchmark answer is forty two exactly")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # contains the 4-gram "secret benchmark answer is" -> hit
            (1, "we know the secret benchmark answer is forty something"),
            # shares tokens but never 4 consecutive ones -> clean
            (2, "benchmark the answer secret is forty two"),
            (3, "totally unrelated text about spark shuffles here"),
        ],
        "doc_id long, text string",
    )
    hits = {r.doc_id: r.n_hits for r in decontaminate_ngram_overlap(corpus, eval_docs, k=4).collect()}
    assert 1 in hits and hits[1] >= 1
    assert 2 not in hits and 3 not in hits


def test_corpus_vocab_exact_counts_and_rank(spark):
    from logpump_spark.llmdata.curation import corpus_vocab_topk

    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b b"), (3, "c a")],
        "doc_id long, text string",
    )
    rows = corpus_vocab_topk(docs, top_k=2).collect()
    assert [(r.rank, r.token, r.n_occurrences, r.n_docs) for r in rows] == [
        (1, "a", 4, 3),
        (2, "b", 3, 2),
    ]


def test_top_p_exact_selection_with_cutoff_ties(spark):
    from logpump_spark.llmdata.curation import top_p_by_score

    # 20 docs; scores engineered so the 10% target (2 rows) lands INSIDE
    # a tie group: three docs share the 2nd-best score; the id tie-break
    # must admit exactly one of them (the smallest id)
    rows = [(1, 100)] + [(i, 90) for i in (2, 3, 4)] + [(i, 10) for i in range(5, 21)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = sorted((r.doc_id, r.n_chars) for r in top_p_by_score(df, p_pct=10).collect())
    assert got == [(1, 100), (2, 90)]

    # p covering everything returns everything
    assert top_p_by_score(df, p_pct=100).count() == 20


def test_top_p_degenerate_one_score_corpus_spanning_buckets(spark):
    """The r10 funnel retirement: the ENTIRE corpus tied at one score —
    the case the old unpartitioned tie-rank window funnelled one-task.
    Ids span three _TIE_BUCKET buckets so the prefix scan exercises a
    whole-admitted bucket, the boundary bucket (partial take), and a
    dropped bucket."""
    from logpump_spark.llmdata.curation import _TIE_BUCKET, top_p_by_score

    ids = (
        list(range(1, 11))
        + list(range(_TIE_BUCKET + 1, _TIE_BUCKET + 11))
        + list(range(2 * _TIE_BUCKET + 1, 2 * _TIE_BUCKET + 11))
    )
    df = spark.createDataFrame([(i, 50) for i in ids], "doc_id long, n_chars long")
    # target = ceil(30 * 50 / 100) = 15 -> the 15 smallest ids
    got = sorted(r.doc_id for r in top_p_by_score(df, p_pct=50).collect())
    assert got == sorted(ids)[:15]


def test_top_p_rejects_non_integral_id(spark):
    """r10-advice pin: the tie bucket is `id DIV _TIE_BUCKET`, which on a
    string id throws under ANSI and silently NULL-buckets (dropping every
    at-cut row) under non-ANSI — so the operator must fail fast instead."""
    import pytest

    from logpump_spark.llmdata.curation import top_p_by_score

    df = spark.createDataFrame(
        [("a", 10), ("b", 20)], "doc_id string, n_chars long"
    )
    with pytest.raises(TypeError, match="integral id_col"):
        top_p_by_score(df, p_pct=50)


def test_dedup_canonical_picks_biggest_then_smallest_id(spark):
    from logpump_spark.queries.curation2_q import dedup_canonical

    from .conftest import SF_SMALL

    rows = {r.component: r for r in dedup_canonical(spark, SF_SMALL).collect()}
    # planted clones have ids shifted by 10^6 and identical text, so the
    # cluster keeps the ORIGINAL (smaller id, same n_chars) and counts
    # both members
    for comp, r in rows.items():
        assert r.keep_id >= comp  # winner is reachable from the min id
        assert r.n_members >= 1
    multi = [r for r in rows.values() if r.n_members >= 2]
    assert multi, "planted clones must produce at least one multi-member cluster"
    assert all(r.keep_id < 1_000_000 or r.n_members == 1 for r in multi)


def test_boilerplate_planted_footer(spark):
    from logpump_spark.llmdata.curation import boilerplate_flag

    footer = "all rights reserved by example corp"
    rows = [(i, f"unique words {i} only here " + footer) for i in range(4)]
    rows.append((99, "completely unrelated text with many distinct tokens"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in boilerplate_flag(
            docs, k=5, min_docs=3, top_k=10, max_frac=0.2
        ).collect()
    }
    # the footer's 5-token shingles repeat across 4 docs -> flagged
    assert all(out[i].n_boiler > 0 for i in range(4))
    assert all(out[i].is_boilerplate for i in range(4))
    # the unrelated doc shares nothing
    assert out[99].n_boiler == 0 and not out[99].is_boilerplate


def test_boilerplate_threshold_respects_min_docs(spark):
    from logpump_spark.llmdata.curation import boilerplate_flag

    # a shingle shared by only TWO docs is below min_docs=3 -> no flags
    rows = [
        (1, "shared phrase of five tokens plus a b"),
        (2, "shared phrase of five tokens plus c d"),
        (3, "something else entirely one two three four"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = boilerplate_flag(docs, k=5, min_docs=3, top_k=10).collect()
    assert all(r.n_boiler == 0 for r in out)


def test_merge_by_priority_prefers_curated_source(spark):
    from logpump_spark.llmdata.curation import merge_by_priority

    rows = [
        (1, "same content here", "crawl"),
        (2, "same content here", "curated"),
        (3, "only in crawl", "crawl"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    pri = F.when(F.col("source") == "curated", 0).otherwise(1)
    out = {r.doc_id: r for r in merge_by_priority(docs, priority=pri).collect()}
    # curated copy wins the duplicate pair; unique doc passes through
    assert set(out) == {2, 3}
    assert out[2].n_copies == 2 and out[2].n_sources == 2
    assert out[3].n_copies == 1 and out[3].n_sources == 1


def test_merge_by_priority_ties_to_smallest_id(spark):
    from logpump_spark.llmdata.curation import merge_by_priority

    rows = [(9, "x", "a"), (4, "x", "a"), (7, "x", "a")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = merge_by_priority(docs, priority=F.lit(0)).collect()
    assert len(out) == 1 and out[0].doc_id == 4 and out[0].n_copies == 3
