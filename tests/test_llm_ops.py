"""Behavioral tests for the LLM-data operators: planted-duplicate
recall, ANN-degenerates-to-exact bounds, fit determinism, and the
cross-engine md5 hash-parity pin that the MinHash/SimHash/decontaminate
oracles stand on."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from logpump_spark.llmdata.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_neardup_pairs,
)
from logpump_spark.llmdata.multimodal import (
    attach_media,
    decode_image_features,
    sample_frames,
)
from logpump_spark.llmdata.similarity import brute_force_topk, ivf_topk


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (1, base, "src0", len(base)),
        (2, base, "src0", len(base)),  # exact dup of 1
        (3, base.replace("today", "tomorrow"), "src0", len(base) + 3),  # near dup
        (4, "completely different words about spark shuffles and parquet files", "src0", 66),
        (5, "another unrelated document mentioning catalyst optimizer internals", "src0", 66),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string, n_chars long")


def test_exact_dedup_groups(docs):
    res = {r.keep_id: r.n_copies for r in exact_dedup(docs, ["text"], "doc_id").collect()}
    assert res[1] == 2  # docs 1 and 2 collapse
    assert res[3] == 1 and res[4] == 1 and res[5] == 1


def test_minhash_finds_planted_dups(docs):
    pairs = {(r.id_a, r.id_b): r.est_jaccard for r in minhash_lsh_pairs(docs, threshold=0.4).collect()}
    assert pairs[(1, 2)] == 1.0  # exact dup -> identical signatures
    assert (1, 3) in pairs  # near dup caught by at least one band
    assert pairs[(1, 3)] >= 0.4
    assert (1, 4) not in pairs and (4, 5) not in pairs  # unrelated docs


def test_simhash_properties(docs):
    sigs = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert sigs[1] == sigs[2]  # identical text -> identical signature
    ham_near = bin(sigs[1] ^ sigs[3]).count("1")
    ham_far = bin(sigs[1] ^ sigs[4]).count("1")
    assert ham_near < ham_far  # near dup closer in Hamming space

    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_neardup_pairs(docs, max_hamming=8).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs


def test_ngram_jaccard_exact_values(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.2).collect()}
    assert pairs[(1, 2)] == 1.0
    # near-dup pair: token sets differ by one substitution
    assert 0.7 < pairs[(1, 3)] < 1.0


@pytest.fixture(scope="module")
def emb(spark):
    import math

    rows = []
    for i in range(40):
        # two clusters in 8-d: label = cluster; vector = unit direction
        # + small deterministic wiggle
        label = i % 2
        base = [1.0, 0.0, 0.0, 0.0] if label == 0 else [0.0, 1.0, 0.0, 0.0]
        wig = [(math.sin(i * 1.7 + d) * 0.05) for d in range(4)]
        rows.append((i, [b + w for b, w in zip(base, wig)], label))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_brute_force_topk_selfcluster(emb):
    res = brute_force_topk(emb, [0, 1], k=3).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q[0]) == 3 and len(by_q[1]) == 3
    # neighbors of query 0 (cluster 0) should be even ids (same cluster)
    assert all(r.neighbor_id % 2 == 0 for r in by_q[0])
    # collect() order is incidental (no final sort in the operator):
    # assert the rank SET, not positional order
    assert sorted(r.rank for r in by_q[0]) == [1, 2, 3]


def test_ivf_matches_brute_force_when_cluster_aligned(emb):
    bf = {(r.query_id, r.rank): r.neighbor_id for r in brute_force_topk(emb, [0, 1], k=3).collect()}
    ivf = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_topk(emb, [0, 1], k=3, cell_col="label").collect()
    }
    # precomputed cells align with true clusters here -> identical results
    assert bf == ivf


def test_ivf_fitted_full_probe_equals_brute_force(emb):
    # nprobe = n_cells covers every cell: the fitted IVF must return
    # EXACTLY the brute-force result (the ANN-degenerates-to-exact bound)
    bf = {(r.query_id, r.rank): r.neighbor_id for r in brute_force_topk(emb, [0, 1], k=3).collect()}
    ivf = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_topk(emb, [0, 1], k=3, n_cells=4, iters=2, nprobe=4).collect()
    }
    assert bf == ivf


def test_ivf_fitted_recall_at_nprobe(emb):
    # fitted quantizer, partial probing: recall@3 vs brute force must be
    # high on clusterable data (cells subdivide the two true clusters, so
    # probing the 2 nearest cells keeps most true neighbors in scope)
    queries = [0, 1, 2, 3]
    bf = {}
    for r in brute_force_topk(emb, queries, k=3).collect():
        bf.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in ivf_topk(emb, queries, k=3, n_cells=4, iters=2, nprobe=2).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(bf[q] & got.get(q, set())) for q in queries)
    total = sum(len(bf[q]) for q in queries)
    assert hits / total >= 0.75, f"recall {hits}/{total}"


def test_fit_ivf_deterministic_and_integer(emb):
    from logpump_spark.llmdata.similarity import fit_ivf

    cells1, cent1 = fit_ivf(emb, n_cells=4, iters=2)
    cells2, cent2 = fit_ivf(emb, n_cells=4, iters=2)
    a1 = sorted(map(tuple, cells1.collect()))
    a2 = sorted(map(tuple, cells2.collect()))
    assert a1 == a2
    c1 = {r.cid: list(r.c) for r in cent1.collect()}
    c2 = {r.cid: list(r.c) for r in cent2.collect()}
    assert c1 == c2
    # centroids live in the quantized integer domain
    assert all(isinstance(x, int) for v in c1.values() for x in v)


def test_fit_ivf_non_contiguous_ids(emb):
    # rank-based init: ids 5, 15, 25, ... must still seed exactly
    # n_cells centroids (the old filter(_id < n_cells) silently seeded
    # zero on this data)
    from logpump_spark.llmdata.similarity import fit_ivf

    shifted = emb.withColumn("vec_id", F.col("vec_id") * 10 + 5)
    cells, cent = fit_ivf(shifted, n_cells=4, iters=2)
    cids = sorted(r.cid for r in cent.collect())
    assert len(cids) >= 1 and set(cids) <= {0, 1, 2, 3}
    # every vector assigned, under its original-id*10+5 key
    assigned = {r.vec_id for r in cells.collect()}
    assert assigned == {i * 10 + 5 for i in range(40)}
    # full probe still degenerates to brute force on the shifted ids
    bf = {
        (r.query_id, r.rank): r.neighbor_id
        for r in brute_force_topk(shifted, [5, 15], k=3).collect()
    }
    ivf = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_topk(shifted, [5, 15], k=3, n_cells=4, iters=2, nprobe=4).collect()
    }
    assert bf == ivf


def test_fit_ivf_degrades_gracefully_on_small_corpus(emb):
    # round 6: a corpus smaller than n_cells seeds one cell per vector
    # (faiss-style) instead of raising; empty corpus -> empty index
    from logpump_spark.llmdata.similarity import fit_ivf

    cells, cent = fit_ivf(emb.limit(10), n_cells=50)
    assert cells.count() == 10
    assert cent.count() <= 10
    e_cells, e_cent = fit_ivf(emb.limit(0), n_cells=8)
    assert e_cells.count() == 0 and e_cent.count() == 0


def test_fit_pq_deterministic_and_complete(emb):
    from logpump_spark.llmdata.pq import fit_pq

    codes1, cent1 = fit_pq(emb, n_sub=2, k=4, iters=2, dim=4)
    codes2, cent2 = fit_pq(emb, n_sub=2, k=4, iters=2, dim=4)
    a1 = sorted(map(tuple, codes1.collect()))
    a2 = sorted(map(tuple, codes2.collect()))
    assert a1 == a2
    # every vector gets exactly n_sub codes
    n_vecs = emb.count()
    assert len(a1) == n_vecs * 2
    c1 = {(r.m, r.cid): list(r.c) for r in cent1.collect()}
    c2 = {(r.m, r.cid): list(r.c) for r in cent2.collect()}
    assert c1 == c2
    assert all(isinstance(x, int) for v in c1.values() for x in v)


def test_fit_pq_non_contiguous_ids(emb):
    from logpump_spark.llmdata.pq import fit_pq

    shifted = emb.withColumn("vec_id", F.col("vec_id") * 10 + 5)
    codes, cent = fit_pq(shifted, n_sub=2, k=4, iters=1, dim=4)
    # rank-based init: cids 0..k-1 seeded even though no id < k exists
    seeded = {r.cid for r in cent.collect()}
    assert seeded <= {0, 1, 2, 3} and len(seeded) >= 1
    assert {r._id for r in codes.collect()} == {i * 10 + 5 for i in range(40)}

    # round 6: a corpus smaller than k seeds min(n, k) codebook entries
    # per subspace instead of raising; empty corpus -> empty codebooks
    codes_s, cent_s = fit_pq(shifted.limit(10), n_sub=2, k=50, dim=4)
    assert codes_s.count() == 10 * 2
    assert cent_s.count() <= 10 * 2
    codes_e, cent_e = fit_pq(shifted.limit(0), n_sub=2, k=4, dim=4)
    assert codes_e.count() == 0 and cent_e.count() == 0


def test_pq_adc_recall_vs_brute_force(emb):
    from logpump_spark.llmdata.pq import pq_adc_topk

    queries = [0, 1, 2, 3]
    bf = {}
    for r in brute_force_topk(emb, queries, k=3).collect():
        bf.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in pq_adc_topk(emb, queries, topk=3, n_sub=2, k=8, iters=2, dim=4).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    # ADC is approximate (distances via codebook cells) but on 2-cluster
    # data the compressed ranking must keep most true neighbors
    hits = sum(len(bf[q] & got.get(q, set())) for q in queries)
    total = sum(len(bf[q]) for q in queries)
    assert hits / total >= 0.5, f"recall {hits}/{total}"
    # and neighbors come from the query's own cluster (parity of vec_id)
    for q in queries:
        assert all(n % 2 == q % 2 for n in got[q])


def test_multimodal_plumbing(spark, docs):
    media = attach_media(docs, "doc_id", "text", "image", "source")
    assert [f.name for f in media.schema] == ["media_id", "kind", "payload", "meta"]
    feats = decode_image_features(media, strict=False).collect()
    assert len(feats) == 5
    by_id = {r.media_id: r for r in feats}
    # deterministic fake decode: identical payloads -> identical features
    assert by_id[1].width == by_id[2].width and by_id[1].height == by_id[2].height
    assert all(r.decoder == "fake" for r in feats)
    assert all(r.n_bytes > 0 for r in feats)


def test_multimodal_strict_raises(spark, docs):
    media = attach_media(docs, "doc_id", "text", "image", "source")
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL available; strict path would actually decode")
    except ImportError:
        pass
    with pytest.raises(Exception):  # NotImplementedError crosses the Py4J boundary
        decode_image_features(media, strict=True).collect()


def test_frame_sampling(spark, docs):
    media = attach_media(docs, "doc_id", "text", "video", "source")
    frames = sample_frames(media, every_n_bytes=20).collect()
    one = [r for r in frames if r.media_id == 4]
    # n_bytes=66 -> offsets 0,20,40,60
    assert [r.byte_offset for r in sorted(one, key=lambda r: r.frame_no)] == [0, 20, 40, 60]


def test_md5_hash60_cross_engine_equality(spark):
    # three oracles (minhash, simhash, decontaminate) stand on Spark and
    # DuckDB agreeing bit-for-bit on the md5-derived 60-bit hash; pin
    # that over awkward inputs (unicode, quotes, empty-ish, long)
    import duckdb

    from logpump_spark.llmdata.dedup import md5_hash60

    samples = [
        "plain shingle text",
        "tabs\tand  double  spaces",
        "quote's and \"doubles\"",
        "unicode: café 日本語 ßŁ",
        "x",
        " ",
        "a" * 500,
        "1,2,3,4",  # the band-string shape
    ]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = {r.s: r.h for r in df.select("s", md5_hash60(F.col("s")).alias("h")).collect()}
    con = duckdb.connect()
    for s in samples:
        (want,) = con.execute(
            "SELECT CAST(concat('0x', substr(md5(?), 2, 15)) AS BIGINT)", [s]
        ).fetchone()
        assert got[s] == want, f"hash divergence for {s!r}"


def test_label_purity_separated_clusters(spark):
    from logpump_spark.llmdata.similarity import label_purity

    # two orthogonal clusters; vec 5 carries label 1 but sits in
    # cluster 0 -> label 1 purity drops, label 0 stays perfect
    rows = []
    for i in range(4):
        rows.append((i, [10.0 + i, 0.0, 0.0, 0.0], 0))
    for i in range(4):
        rows.append((10 + i, [0.0, 10.0 + i, 0.0, 0.0], 1))
    rows.append((5, [9.0, 0.1, 0.0, 0.0], 1))  # mislabeled straggler
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r.label: r for r in label_purity(emb).collect()}
    assert out[0].n == 4 and out[0].purity == 1.0
    assert out[1].n == 5 and out[1].n_correct == 4
    assert out[1].purity == pytest.approx(0.8)


def test_ivf_index_persists_and_reloads(spark, tmp_path):
    # the operational ANN story: fit ONCE, persist the cell assignment,
    # reload in a later job and query without refitting — results must
    # be identical to querying over the in-memory fit
    from logpump_spark.llmdata.similarity import fit_ivf, ivf_topk
    from logpump_spark.tables import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    cells, _cent = fit_ivf(emb, n_cells=4, iters=2)
    with_cells = emb.join(cells, "vec_id")

    idx_path = str(tmp_path / "ivf_cells")
    cells.write.mode("overwrite").parquet(idx_path)
    reloaded = emb.join(spark.read.parquet(idx_path), "vec_id")

    q = [0, 1, 2]
    a = ivf_topk(with_cells, q, k=3, cell_col="cell").collect()
    b = ivf_topk(reloaded, q, k=3, cell_col="cell").collect()
    assert sorted(map(tuple, a), key=lambda t: (t[0], t[-1])) == sorted(
        map(tuple, b), key=lambda t: (t[0], t[-1])
    )
    assert len(a) > 0


def test_ivf_prebuilt_index_lifecycle_at_derived_k(spark, tmp_path):
    # r14 (verdict task 4): the deployment story SCALING.md §10.2 sells,
    # executed end-to-end AT A DERIVED nlist — replicate the sf0.1
    # embeddings to 20k vectors (nlist = ivf_n_cells(20000) = 141 >> the
    # fixture's 8), fit ONCE on the derived modulo sample, STORE the
    # assignment to parquet, reload in a "later job", query through
    # cell_col, and hold recall vs brute force at the crossover table's
    # measured floor (0.88, the 2k-scale row; 20k measured 1.00)
    from pyspark.sql import functions as F

    from logpump_spark.llmdata.similarity import (
        brute_force_topk,
        fit_ivf,
        ivf_n_cells,
        ivf_topk,
    )
    from logpump_spark.tables import load

    base = load(spark, "/root/testdata/sf0.1", "embeddings")
    id_span = int(base.agg(F.max("vec_id")).first()[0]) + 1
    parts = [base] + [
        base.withColumn("vec_id", F.col("vec_id") + F.lit(i * id_span))
        for i in range(1, 10)
    ]
    emb = parts[0]
    for p in parts[1:]:
        emb = emb.unionByName(p)
    emb = emb.localCheckpoint()
    n = emb.count()
    assert n >= 20_000

    n_cells = ivf_n_cells(n)
    assert n_cells >= 141
    stride = max(1, n // (64 * n_cells))
    assert stride > 1, "the sampled-fit route must actually engage"
    cells, _cent = fit_ivf(emb, n_cells, iters=2, fit_stride=stride)

    idx_path = str(tmp_path / "ivf_cells_derived")
    cells.write.mode("overwrite").parquet(idx_path)
    reloaded = emb.join(spark.read.parquet(idx_path), "vec_id")

    qids = list(range(10))
    got = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(reloaded, qids, k=5, cell_col="cell")
        .select("query_id", "neighbor_id")
        .collect()
    }
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, qids, k=5)
        .select("query_id", "neighbor_id")
        .collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.88, f"prebuilt-index recall {recall} under the floor"


def test_edit_distance_finds_planted_typos(spark):
    from logpump_spark.llmdata.dedup import edit_distance_pairs

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpXa beta gamma delta"),   # 1 substitution inside the key
        (3, "zzz completely different"),
        (4, "alphq betq gamma others"),  # 2 substitutions
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b): r.dist
        for r in edit_distance_pairs(docs, max_dist=2).collect()
    }
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 4)] == 2
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_edit_distance_bucket_blindspot_and_cap(spark):
    from logpump_spark.llmdata.dedup import edit_distance_pairs

    # a difference INSIDE the 3-char bucket prefix is missed by design
    rows = [(1, "abcdefghijkl rest"), (2, "aXcdefghijkl rest")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert edit_distance_pairs(docs).count() == 0
    # a degenerate bucket larger than the cap is dropped whole
    rows = [(i, "same prefix here text") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert edit_distance_pairs(docs, max_bucket_size=10).count() == 0


def test_semantic_dedup_prunes_within_cluster(emb):
    from logpump_spark.llmdata.similarity import semantic_dedup

    out = semantic_dedup(emb, threshold=0.9, n_cells=2, iters=2).collect()
    assert len(out) == 40  # one row per vector, none dropped
    by_id = {r.vec_id: r for r in out}
    # the two tight clusters make most members near-dups of an earlier
    # id: every pruned row points at a smaller kept_by in the same cell
    pruned = [r for r in out if not r.keep]
    assert pruned, "tight clusters must produce pruned members"
    for r in pruned:
        assert r.kept_by < r.vec_id
        assert by_id[r.kept_by].cell == r.cell
    # keep set is exactly the ids with no smaller-id near neighbor:
    # the smallest id of each cell is always kept
    for cell in {r.cell for r in out}:
        members = sorted(r.vec_id for r in out if r.cell == cell)
        assert by_id[members[0]].keep


def test_substring_fingerprints_find_planted_run(spark):
    from logpump_spark.llmdata.dedup import substring_fingerprint_pairs

    shared = "x".join(str(i * 7919 % 97) for i in range(40))  # ~100 chars
    rows = [
        (1, "left context totally unlike anything " + shared),
        (2, shared + " completely different right side here"),
        (3, "no common run with the others at all, just filler words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b) for r in substring_fingerprint_pairs(df).collect()}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_pagerank_int_exact_tiny_graph(spark):
    from logpump_spark.llmdata.graph import pagerank_int

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1)], "src long, dst long"
    )
    pr = {r.node: r.pr for r in pagerank_int(edges, iters=1).collect()}
    # hand-computed: base 150_000_000; 1 gets 850M from 3;
    # 2 gets 425M from 1; 3 gets 425M + 850M
    assert pr == {1: 1_000_000_000, 2: 575_000_000, 3: 1_425_000_000}
