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
