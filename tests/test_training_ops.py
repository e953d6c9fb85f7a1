"""Behavioral tests for the training-set assembly operators: sequence
packing invariants on hand corpora, exact stratified split proportions,
temperature-resampling share shifts, sequenceMatch semantics (adjacency,
negative classes, tie ordering), and real-pixel nearest-neighbor resize.
"""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

from logpump_spark.llmdata.packing import (
    assign_splits,
    pack_sequences,
    temperature_resample,
)
from logpump_spark.operators.seqmatch import sequence_match


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pack_sequences_contiguous_fill(spark):
    # one shard; docs of 3, 4, 2 tokens; budget 5:
    # doc0 [0,3) seq0 off0; doc8 [3,7) spans seq0->seq1; doc16 [7,9) seq1
    docs = _docs(spark, [(0, "a b c"), (8, "a b c d"), (16, "a b")])
    out = {
        r.doc_id: r
        for r in pack_sequences(docs, budget=5, n_shards=8).collect()
    }
    assert (out[0].seq_id, out[0].offset, out[0].n_seqs) == (0, 0, 1)
    assert (out[8].seq_id, out[8].offset, out[8].n_seqs) == (0, 3, 2)
    assert (out[16].seq_id, out[16].offset, out[16].n_seqs) == (1, 2, 1)


def test_pack_sequences_exact_boundary_doc(spark):
    # a doc ending exactly at the budget boundary spans ONE sequence,
    # and the next doc starts at offset 0 of the next sequence
    docs = _docs(spark, [(0, "a b c d e"), (8, "x y")])
    out = {
        r.doc_id: r
        for r in pack_sequences(docs, budget=5, n_shards=8).collect()
    }
    assert (out[0].seq_id, out[0].offset, out[0].n_seqs) == (0, 0, 1)
    assert (out[8].seq_id, out[8].offset, out[8].n_seqs) == (1, 0, 1)


def test_pack_sequences_shards_independent(spark):
    # same token stream in two shards -> identical shard-local placement
    docs = _docs(spark, [(0, "a b c"), (8, "d e"), (1, "a b c"), (9, "d e")])
    out = pack_sequences(docs, budget=4, n_shards=8).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(
            (r.seq_id, r.offset, r.n_seqs)
        )
    assert sorted(by_shard[0]) == sorted(by_shard[1])


def test_pack_sequences_token_conservation(spark):
    # sum of tokens == last doc's cum_end per shard: no token lost/dup
    docs = _docs(
        spark, [(i, " ".join(["t"] * (1 + i % 7))) for i in range(40)]
    )
    out = pack_sequences(docs, budget=6, n_shards=4).collect()
    for shard in range(4):
        rows = sorted(
            (r for r in out if r.shard == shard), key=lambda r: r.doc_id
        )
        cum = 0
        for r in rows:
            assert r.seq_id == cum // 6 and r.offset == cum % 6
            cum += r.n_tokens
            assert r.n_seqs == (cum - 1) // 6 - r.seq_id + 1


def test_assign_splits_exact_counts(spark):
    rows = [(i, "en" if i % 3 else "fr") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = assign_splits(df, strata_col="lang", val_frac=0.1, test_frac=0.2)
    counts = {
        (r.lang, r.split): r.n
        for r in out.groupBy("lang", "split").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    # fr stratum: 20 rows -> val ceil(2)=2, test ceil(4)=4, train 14
    assert counts[("fr", "val")] == 2
    assert counts[("fr", "test")] == 4
    assert counts[("fr", "train")] == 14
    # en stratum: 40 rows -> 4 / 8 / 28
    assert counts[("en", "val")] == 4
    assert counts[("en", "test")] == 8
    assert counts[("en", "train")] == 28


def test_assign_splits_deterministic(spark):
    rows = [(i, "en") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = {r.doc_id: r.split for r in assign_splits(df).collect()}
    b = {r.doc_id: r.split for r in assign_splits(df).collect()}
    assert a == b


def test_temperature_upsamples_tail_language_share(spark):
    # 90/10 corpus at alpha=0.5: kept share of the tail language must
    # exceed its raw 10% share (that is the point of temperature<1)
    rows = [(i, "en") for i in range(90)] + [(100 + i, "ur") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_resample(df, alpha=0.5, keep_frac=0.5).collect()
    n_ur = sum(1 for r in kept if r.lang == "ur")
    assert len(kept) > 0
    assert n_ur / len(kept) > 0.10
    # alpha=1 keeps raw proportions (weight ∝ n_l)
    kept1 = temperature_resample(df, alpha=1.0, keep_frac=0.5).collect()
    n_ur1 = sum(1 for r in kept1 if r.lang == "ur")
    assert n_ur1 / len(kept1) == pytest.approx(0.10, abs=0.03)


def test_temperature_targets_capped_at_available(spark):
    # a tiny stratum can never emit more docs than it has
    rows = [(i, "en") for i in range(99)] + [(1000, "xx")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = temperature_resample(df, alpha=0.1, keep_frac=0.9).collect()
    assert sum(1 for r in kept if r.lang == "xx") <= 1


def _events(spark, rows):
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (eid, base + dt.timedelta(seconds=sec), uid, etype)
            for eid, sec, uid, etype in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


_CONDS = None


def _match(spark, rows, pattern):
    ev = _events(spark, rows)
    conds = [
        F.col("event_type") == "signup",
        F.col("event_type") == "purchase",
        F.col("event_type") == "error",
    ]
    return {
        r.user_id: (r.matched, r.match_count, r.seq_len)
        for r in sequence_match(ev, conds, pattern).collect()
    }


def test_seq_match_negative_class(spark):
    # user 1: signup -> click -> purchase  => A x B matches A[^C]*B
    # user 2: signup -> error -> purchase  => A C B does not
    rows = [
        (1, 0, 1, "signup"), (2, 10, 1, "click"), (3, 20, 1, "purchase"),
        (4, 0, 2, "signup"), (5, 10, 2, "error"), (6, 20, 2, "purchase"),
    ]
    out = _match(spark, rows, "A[^C]*B")
    assert out[1] == (True, 1, 3)
    assert out[2] == (False, 0, 3)


def test_seq_match_adjacency(spark):
    # 'AB' requires adjacency: an intervening click breaks it
    rows = [
        (1, 0, 1, "signup"), (2, 10, 1, "purchase"),
        (3, 0, 2, "signup"), (4, 10, 2, "click"), (5, 20, 2, "purchase"),
    ]
    out = _match(spark, rows, "AB")
    assert out[1][0] is True
    assert out[2][0] is False


def test_seq_match_count_non_overlapping(spark):
    # two disjoint signup->purchase chains: greedy [^C]* spans the whole
    # 'ABAB' (one match); the lazy variant stops at the first B (two)
    rows = [
        (1, 0, 1, "signup"), (2, 1, 1, "purchase"),
        (3, 2, 1, "signup"), (4, 3, 1, "purchase"),
    ]
    assert _match(spark, rows, "A[^C]*B")[1] == (True, 1, 4)
    assert _match(spark, rows, "A[^C]*?B")[1] == (True, 2, 4)


def test_seq_match_ts_tie_broken_by_event_id(spark):
    # same timestamp: event_id orders the sequence deterministically
    rows = [(2, 0, 1, "purchase"), (1, 0, 1, "signup")]
    out = _match(spark, rows, "AB")
    assert out[1][0] is True


def test_resize_identity_and_pixel_sum(spark):
    # resizing a WxH gradient image to the same WxH is the identity:
    # pixel_sum equals the sum of the encoded gradient
    from logpump_spark.llmdata.codecs import decode_png, encode_png
    from logpump_spark.llmdata.multimodal import (
        resize_image_features,
        synthesize_png_media,
    )

    df = spark.createDataFrame(
        [(1, 4, 3, "RGB", "s"), (2, 7, 5, "L", "s")],
        "doc_id long, w int, h int, m string, source string",
    )
    media = synthesize_png_media(df, "doc_id", "w", "h", "m", "source")
    out = {
        r.media_id: r
        for r in resize_image_features(media, 4, 3).collect()
    }
    # id 1 is 4x3 already -> identity resize
    ident = decode_png(encode_png(4, 3, "RGB"))
    assert out[1].pixel_sum == sum(ident["pixels"])
    assert (out[1].width, out[1].height) == (4, 3)
    # id 2: 7x5 L -> 4x3; replay the nearest-neighbor map in python
    expected = sum(
        ((x * 7 // 4) * 7 + (y * 5 // 3) * 13) % 256
        for x in range(4)
        for y in range(3)
    )
    assert out[2].pixel_sum == expected
    assert (out[2].src_width, out[2].src_height) == (7, 5)


def test_resize_upscale(spark):
    # upscaling a 1x1 image replicates the single pixel
    from logpump_spark.llmdata.multimodal import (
        resize_image_features,
        synthesize_png_media,
    )

    df = spark.createDataFrame(
        [(1, 1, 1, "L", "s")], "doc_id long, w int, h int, m string, source string"
    )
    media = synthesize_png_media(df, "doc_id", "w", "h", "m", "source")
    row = resize_image_features(media, 6, 6).collect()[0]
    # pixel(0,0,0) = 0 -> sum stays 0 across all 36 replicated pixels
    assert row.pixel_sum == 0
    assert (row.width, row.height) == (6, 6)


def test_chunk_documents_layout(spark):
    from logpump_spark.llmdata.packing import chunk_documents

    # 10 tokens, chunk 4, overlap 1 (stride 3):
    # starts 0,3,6 cover tokens 0-9 (last chunk = tokens 6-9, full);
    # n_chunks = 1 + ceil((10-4)/3) = 3
    docs = _docs(spark, [(1, " ".join(f"t{i}" for i in range(10)))])
    out = sorted(
        chunk_documents(docs, chunk_size=4, overlap=1).collect(),
        key=lambda r: r.chunk_no,
    )
    assert [(r.chunk_no, r.start_tok, r.n_chunk_tokens) for r in out] == [
        (0, 0, 4), (1, 3, 4), (2, 6, 4),
    ]


def test_chunk_documents_short_doc_single_chunk(spark):
    from logpump_spark.llmdata.packing import chunk_documents

    docs = _docs(spark, [(1, "a b"), (2, "a b c d")])
    out = chunk_documents(docs, chunk_size=4, overlap=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # both docs fit one window -> exactly one chunk each, full content
    assert len(by_doc[1]) == 1 and by_doc[1][0].n_chunk_tokens == 2
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_chunk_tokens == 4


def test_chunk_documents_overlap_fingerprints(spark):
    from logpump_spark.llmdata.packing import chunk_documents

    # identical token windows -> identical fingerprints across docs
    docs = _docs(spark, [(1, "a b c d e f"), (2, "a b c d e f")])
    out = chunk_documents(docs, chunk_size=4, overlap=2).collect()
    md5s = {}
    for r in out:
        md5s.setdefault(r.chunk_no, set()).add(r.chunk_md5)
    assert all(len(s) == 1 for s in md5s.values())


def test_chunk_documents_rejects_bad_overlap(spark):
    from logpump_spark.llmdata.packing import chunk_documents

    docs = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=4, overlap=4)
