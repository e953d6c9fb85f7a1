"""Corpus quality filtering: Gopher-style rule gates, duplicate-n-gram
repetition ratios, and PII detection/redaction.

These are the cheap high-throughput gates a training-data pipeline runs
BEFORE expensive dedup/scoring stages (the rule set follows the
published Gopher/C4 heuristics).  Everything is pure Column expressions
— one whole-stage-codegen'd projection pass for the rule gates and PII,
and a single explode + two-level aggregation for the repetition ratios.
No UDFs, no collect; every count is an exact integer and every ratio a
single IEEE division, so results are engine-reproducible bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col
from .text import STOPWORDS

# Gopher-style thresholds (public heuristics, tuned down to the synthetic
# corpus's scale so both pass and fail populations are non-trivial)
MIN_WORDS = 10
MAX_WORDS = 10_000
MIN_MEAN_WORD_LEN = 2.0
MAX_MEAN_WORD_LEN = 12.0
MAX_SYMBOL_WORD_RATIO = 0.1
MIN_ALPHA_WORD_FRAC = 0.8
MIN_STOPWORD_HITS = 1


def gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher-style quality gate.

    Emits the raw features (exact integer counts; ratios left as single
    divisions), one boolean per rule, and the conjunction `keep`.
    """
    toks = tokens_col(text_col)
    text = F.col(text_col)
    n_words = F.size(toks)
    # mean word length without re-tokenizing: total chars minus the
    # single-space separators, over the word count
    mean_wl = (F.length(text) - (n_words - 1)) / n_words
    n_alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    n_symbol = F.length(F.regexp_replace(text, r"[^#…]", ""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))

    r_words = (n_words >= MIN_WORDS) & (n_words <= MAX_WORDS)
    r_mean = (mean_wl >= MIN_MEAN_WORD_LEN) & (mean_wl <= MAX_MEAN_WORD_LEN)
    r_symbol = (n_symbol / n_words) <= MAX_SYMBOL_WORD_RATIO
    r_alpha = (n_alpha_words / n_words) >= MIN_ALPHA_WORD_FRAC
    r_stop = n_stop >= MIN_STOPWORD_HITS

    return df.select(
        "*",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        n_alpha_words.alias("n_alpha_words"),
        n_symbol.alias("n_symbol"),
        n_stop.alias("n_stopword_hits"),
        r_words.alias("rule_word_count"),
        r_mean.alias("rule_mean_word_len"),
        r_symbol.alias("rule_symbol_ratio"),
        r_alpha.alias("rule_alpha_words"),
        r_stop.alias("rule_stopwords"),
        (r_words & r_mean & r_symbol & r_alpha & r_stop).alias("keep"),
    )


def _bigrams(toks: Column) -> Column:
    """Overlapping word bigrams; docs under 2 words contribute none.
    (sequence(1, 0) would count DOWN in Spark, so the n < 2 case must be
    short-circuited, not clamped.)"""
    n = F.size(toks)
    pairs = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
    )
    return F.when(n >= 2, pairs).otherwise(F.array().cast("array<string>"))


def repetition_ratios(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Duplicate-n-gram repetition features per document.

    - ``dup_bigram_char_frac``: fraction of bigram characters that sit in
      bigrams occurring ≥2 times in the doc (the Gopher dup-ngram rule);
    - ``top_word_frac``: share of the single most frequent word;
    both as exact-integer numerators/denominators plus one division.

    Scale shape: the (doc, gram) explode is the only big intermediate;
    the per-(doc, gram) count is partial-aggregated map-side before its
    one shuffle on ``id_col``, and the second aggregation reuses the same
    hash partitioning (Catalyst elides the exchange).
    """
    toks = tokens_col(text_col)
    # two independent explodes in one select would cross-product; derive
    # them separately, each its own aggregation over the same shuffle key
    bi = (
        df.select(F.col(id_col), F.explode(_bigrams(toks)).alias("gram"))
        .select(id_col, "gram", F.length("gram").alias("glen"))
        .groupBy(id_col, "gram", "glen")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(
            F.sum(F.col("cnt") * F.col("glen")).alias("bigram_chars"),
            F.sum(
                F.when(F.col("cnt") >= 2, F.col("cnt") * F.col("glen")).otherwise(0)
            ).alias("dup_bigram_chars"),
        )
    )
    wd = (
        df.select(F.col(id_col), F.explode(toks).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(F.max("cnt").alias("top_word_cnt"), F.sum("cnt").alias("n_words"))
    )
    return (
        bi.join(wd, id_col)
        .select(
            id_col,
            "bigram_chars",
            "dup_bigram_chars",
            (F.col("dup_bigram_chars") / F.col("bigram_chars")).alias(
                "dup_bigram_char_frac"
            ),
            "top_word_cnt",
            "n_words",
            (F.col("top_word_cnt") / F.col("n_words")).alias("top_word_frac"),
        )
    )


# PII patterns kept to constructs with identical semantics in Java regex
# (Spark) and RE2 (DuckDB): literal classes, +, {n}, no backrefs/lookahead
EMAIL_RE = "[A-Za-z0-9._]+@[A-Za-z0-9.-]+[A-Za-z0-9]"
PHONE_RE = "[+]1-555-[0-9]{4}"


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Detect and redact e-mail / phone PII in one projection pass.

    Emits match counts, the redacted text's length and fingerprint, and a
    ``has_pii`` flag.  Redaction replaces every match with a fixed-width
    sentinel so downstream token counts stay stable.
    """
    text = F.col(text_col)
    n_email = F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), 0))
    n_phone = F.size(F.regexp_extract_all(text, F.lit(PHONE_RE), 0))
    redacted = F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return df.select(
        F.col(id_col),
        n_email.alias("n_emails"),
        n_phone.alias("n_phones"),
        ((n_email + n_phone) > 0).alias("has_pii"),
        F.length(redacted).alias("redacted_len"),
        F.md5(redacted).alias("redacted_md5"),
    )
