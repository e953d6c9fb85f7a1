"""Text analysis for corpus preparation: language ID, quality scoring,
token counting, fingerprinting.  All built-ins, all codegen'd — one
projection pass over the corpus regardless of scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language discriminative word lists for the n-gram/stopword
# language-ID heuristic (public knowledge; any real system would learn
# these from data)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "und", "ist", "das"),
    "es": ("el", "la", "de", "y", "es"),
}

STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")

# BPE-ish pre-tokenizer: word pieces, numbers, or single non-space symbols
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _toks(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def marker_score(toks: Column, markers: tuple[str, ...]) -> Column:
    """How many tokens are markers of the given language."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic language-ID heuristic: argmax of marker-word hits
    with a fixed preference order on ties ('und' = undetermined when no
    marker hits at all)."""
    toks = _toks(text_col)
    scores = {lang: marker_score(toks, m) for lang, m in LANG_MARKERS.items()}
    best = (
        F.when(
            (scores["en"] >= scores["de"]) & (scores["en"] >= scores["es"]) & (scores["en"] > 0),
            "en",
        )
        .when((scores["de"] >= scores["es"]) & (scores["de"] > 0), "de")
        .when(scores["es"] > 0, "es")
        .otherwise("und")
    )
    return df.select(
        "*",
        scores["en"].alias("score_en"),
        scores["de"].alias("score_de"),
        scores["es"].alias("score_es"),
        best.alias("lang_pred"),
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality features: token counts, mean token length,
    stopword ratio, punctuation ratio, uppercase ratio — the standard
    cheap filters before expensive dedup/scoring stages."""
    toks = _toks(text_col)
    text = F.col(text_col)
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.length(F.regexp_replace(text, r"[^.,;:!?]", ""))
    n_upper = F.length(F.regexp_replace(text, "[^A-Z]", ""))
    # ratios stay UNROUNDED: a single IEEE division of identical integer
    # operands is bit-identical across engines, whereas ROUND(x, n) differs
    # at decimal midpoints (e.g. 1/128) between rounding modes
    return df.select(
        "*",
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        ((F.length(text) - (n_tok - 1)) / n_tok).alias("mean_token_len"),
        (n_stop / n_tok).alias("stopword_ratio"),
        (n_punct / F.length(text)).alias("punct_ratio"),
        (n_upper / F.length(text)).alias("upper_ratio"),
    )


def bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counts under whitespace and BPE-ish regex pre-tokenization —
    the cheap proxy for 'how many LLM tokens is this document'."""
    text = F.col(text_col)
    return df.select(
        "*",
        F.size(F.split(text, " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(BPE_REGEX), 0)).alias("bpe_tokens"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical-form document fingerprints: md5 + sha256 of the
    normalized text (lowercase, collapsed whitespace) and a cheap
    first/last-shingle sketch.  Normalization-then-hash is the standard
    exact-dup key across shards."""
    norm = F.lower(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")))
    return df.select(
        "*",
        F.md5(norm).alias("fp_md5"),
        F.sha2(norm, 256).alias("fp_sha256"),
        F.substring(norm, 1, 16).alias("fp_head"),
        F.length(norm).alias("norm_len"),
    )
