"""Behavioral tests for the quality/quantization operators: Gopher rule
gates on hand-built pass/fail documents, repetition ratios with known
duplicate structure, PII detection/redaction edge cases, and SQ8
round-trip error bounds — cases the corpus oracle never constructs."""

from __future__ import annotations

import pytest

from logpump_spark.llmdata.quality import gopher_rules, pii_scrub, repetition_ratios
from logpump_spark.llmdata.quantize import ERR_SCALE, sq8_encode


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_gopher_keeps_clean_doc_and_rejects_short(spark):
    clean = "the quick brown fox jumps over a lazy dog near the river bank"
    short = "too short"
    rows = {r.doc_id: r for r in gopher_rules(_docs(spark, [clean, short])).collect()}
    assert rows[0].keep and rows[0].rule_word_count and rows[0].rule_stopwords
    assert not rows[1].keep and not rows[1].rule_word_count


def test_gopher_rejects_symbol_soup_and_no_stopwords(spark):
    symbols = "### ## # " * 10 + "word"  # symbol ratio >> 0.1
    nostop = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    rows = {
        r.doc_id: r for r in gopher_rules(_docs(spark, [symbols, nostop])).collect()
    }
    assert not rows[0].rule_symbol_ratio and not rows[0].keep
    assert not rows[1].rule_stopwords and not rows[1].keep
    assert rows[1].rule_alpha_words  # fails only on stopwords


def test_repetition_flags_repeated_bigrams(spark):
    # "ab cd" appears 3 times -> every bigram char duplicated except joins
    looped = "ab cd ab cd ab cd"
    varied = "one two three four five"
    out = {
        r.doc_id: r
        for r in repetition_ratios(_docs(spark, [looped, varied])).collect()
    }
    assert out[0].dup_bigram_char_frac > 0.5
    assert out[0].top_word_frac == pytest.approx(0.5)  # 3 of 6 words
    assert out[1].dup_bigram_chars == 0
    assert out[1].top_word_cnt == 1


def test_repetition_single_word_doc_dropped(spark):
    # no bigrams -> doc contributes no row (consistent with the oracle)
    out = repetition_ratios(_docs(spark, ["lonely", "a b a b"])).collect()
    assert [r.doc_id for r in out] == [1]


def test_pii_counts_and_redaction(spark):
    df = _docs(
        spark,
        [
            "mail bob.smith@corp-example.org and call +1-555-0199 now",
            "no pii here at all",
            "two mails a@b.io c.d@e-f.com one phone +1-555-0000",
        ],
    )
    rows = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert (rows[0].n_emails, rows[0].n_phones, rows[0].has_pii) == (1, 1, True)
    assert (rows[1].n_emails, rows[1].n_phones, rows[1].has_pii) == (0, 0, False)
    assert (rows[2].n_emails, rows[2].n_phones) == (2, 1)
    # redacted text must not shrink below the sentinel widths
    assert rows[1].redacted_len == len("no pii here at all")


def test_pii_redaction_is_deterministic(spark):
    df = _docs(spark, ["ping x@y.zz", "ping x@y.zz"])
    a, b = pii_scrub(df).collect()
    assert a.redacted_md5 == b.redacted_md5


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_sq8_codes_bounded_and_extremes_hit(spark):
    out = {
        r.vec_id: r
        for r in sq8_encode(
            _emb(spark, [[0.0, 10.0], [1.0, 20.0], [0.5, 15.0]])
        ).collect()
    }
    for r in out.values():
        assert 0 <= r.code_min <= r.code_max <= 255
        assert r.dim == 2
    # corpus min maps to code 0, corpus max saturates to 255
    assert out[0].code_min == 0
    assert out[1].code_max == 255


def test_sq8_error_within_half_cell_bound(spark):
    # |err| per component <= (range/256)/2 -> err_q <= 1e12 * (range/512)^2
    vecs = [[i / 7.0, -i * 3.0] for i in range(8)]
    out = sq8_encode(_emb(spark, vecs)).collect()
    rng = [1.0, 21.0]
    bound = sum(ERR_SCALE * (r / 512) ** 2 for r in rng) * 1.01
    for r in out:
        assert 0 <= r.err_q_sum <= bound


def test_sq8_constant_dimension_is_zero_coded(spark):
    out = sq8_encode(_emb(spark, [[5.0, 1.0], [5.0, 2.0]])).collect()
    for r in out:
        assert r.code_min == 0  # the constant dim coded 0 everywhere
        assert r.err_q_sum >= 0


def test_bigram_lm_score_hand_corpus(spark):
    # pairs: doc1 (a,b),(b,a),(a,b); doc2 (a,a)
    # c1: a=3, b=1; c2: (a,b)=2, (b,a)=1, (a,a)=1
    # doc1: (2e6 div 3) + (1e6 div 1) + (2e6 div 3) = 2333332 div 3
    # doc2: (1e6 div 3) div 1
    from logpump_spark.llmdata.quality import bigram_lm_score

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a a"), (3, "solo")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in bigram_lm_score(docs).collect()}
    assert out[1].n_bigrams == 3 and out[1].lm_score == 2333332 // 3
    assert out[2].n_bigrams == 1 and out[2].lm_score == 1_000_000 // 3
    assert 3 not in out  # single-token doc has no bigrams


def test_bigram_lm_probabilities_normalize(spark):
    # for any fixed w1, sum over w2 of c2/c1 is 1: the scaled integer
    # scores of all bigrams starting with w1 sum to ~scale (floor slack)
    from logpump_spark.llmdata.quality import bigram_lm_score

    docs = spark.createDataFrame(
        [(1, "x y x z x y x w")], "doc_id long, text string"
    )
    row = bigram_lm_score(docs).collect()[0]
    assert row.n_bigrams == 7
    # x->y (2), x->z (1), x->w (1) of c1(x)=4; y->x, z->x, w->x of c1=1
    expected = (
        2 * (2 * 10**6 // 4)  # the two (x,y) occurrences
        + (10**6 // 4) * 2    # (x,z), (x,w)
        + 3 * 10**6           # (y,x), (z,x), (w,x) are certain
    ) // 7
    assert row.lm_score == expected
