"""Driver-facing queries for the corpus-quality and embedding-compression
operators: Gopher-style rule gates, duplicate-n-gram repetition ratios,
PII detection/redaction, and int8 scalar quantization.

All four are oracle-checked.  Regex patterns are restricted to constructs
with identical semantics in Java regex (Spark) and RE2 (DuckDB); every
ratio is a single IEEE division of identical integer operands and every
error total is an integer-quantized sum, so value hashes match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llmdata.quality import (
    EMAIL_RE,
    MAX_MEAN_WORD_LEN,
    MAX_SYMBOL_WORD_RATIO,
    MAX_WORDS,
    MIN_ALPHA_WORD_FRAC,
    MIN_MEAN_WORD_LEN,
    MIN_STOPWORD_HITS,
    MIN_WORDS,
    PHONE_RE,
    bigram_lm_score,
    gopher_rules,
    pii_scrub,
    repetition_ratios,
)
from ..llmdata.quantize import ERR_SCALE, sq8_encode
from ..llmdata.text import STOPWORDS
from ..tables import load

# ---------------------------------------------------------------- text_quality_gopher


def text_quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gate over the documents corpus: exact feature
    counts, one boolean per rule, and the conjunction `keep` — a single
    codegen'd projection pass (see llmdata/quality.py)."""
    docs = load(spark, sf_dir, "documents")
    return gopher_rules(docs).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "n_alpha_words",
        "n_symbol",
        "n_stopword_hits",
        "rule_word_count",
        "rule_mean_word_len",
        "rule_symbol_ratio",
        "rule_alpha_words",
        "rule_stopwords",
        "keep",
    )


_STOP_LIST = ", ".join(f"'{s}'" for s in STOPWORDS)

_TEXT_QUALITY_SQL = f"""
WITH f AS (
  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
),
feats AS (
  SELECT doc_id,
    len(t) AS n_words,
    (length(text) - (len(t) - 1)) / len(t) AS mean_word_len,
    len(list_filter(t, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha_words,
    length(regexp_replace(text, '[^#…]', '', 'g')) AS n_symbol,
    len(list_filter(t, w -> list_contains([{_STOP_LIST}], w))) AS n_stopword_hits
  FROM f
)
SELECT doc_id, n_words, mean_word_len, n_alpha_words, n_symbol, n_stopword_hits,
  (n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}) AS rule_word_count,
  (mean_word_len >= {MIN_MEAN_WORD_LEN} AND mean_word_len <= {MAX_MEAN_WORD_LEN})
    AS rule_mean_word_len,
  ((n_symbol / n_words) <= {MAX_SYMBOL_WORD_RATIO}) AS rule_symbol_ratio,
  ((n_alpha_words / n_words) >= {MIN_ALPHA_WORD_FRAC}) AS rule_alpha_words,
  (n_stopword_hits >= {MIN_STOPWORD_HITS}) AS rule_stopwords,
  ((n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS})
   AND (mean_word_len >= {MIN_MEAN_WORD_LEN} AND mean_word_len <= {MAX_MEAN_WORD_LEN})
   AND ((n_symbol / n_words) <= {MAX_SYMBOL_WORD_RATIO})
   AND ((n_alpha_words / n_words) >= {MIN_ALPHA_WORD_FRAC})
   AND (n_stopword_hits >= {MIN_STOPWORD_HITS})) AS keep
FROM feats ORDER BY doc_id
"""


# ---------------------------------------------------------------- text_repetition


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-bigram character fraction + top-word share per document
    (the Gopher repetition rules), as exact integer numerators and
    denominators with one final division each."""
    docs = load(spark, sf_dir, "documents")
    return repetition_ratios(docs)


_TEXT_REPETITION_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bg AS (
  SELECT doc_id,
         UNNEST(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                               i -> t[i] || ' ' || t[i + 1])) AS gram
  FROM toks
),
bi1 AS (
  SELECT doc_id, gram, length(gram) AS glen, COUNT(*) AS cnt
  FROM bg GROUP BY 1, 2, 3
),
bi AS (
  SELECT doc_id,
         CAST(SUM(cnt * glen) AS BIGINT) AS bigram_chars,
         CAST(SUM(CASE WHEN cnt >= 2 THEN cnt * glen ELSE 0 END) AS BIGINT)
           AS dup_bigram_chars
  FROM bi1 GROUP BY 1
),
w1 AS (SELECT doc_id, UNNEST(t) AS word FROM toks),
w2 AS (SELECT doc_id, word, COUNT(*) AS cnt FROM w1 GROUP BY 1, 2),
wd AS (
  SELECT doc_id, MAX(cnt) AS top_word_cnt, CAST(SUM(cnt) AS BIGINT) AS n_words
  FROM w2 GROUP BY 1
)
SELECT bi.doc_id, bigram_chars, dup_bigram_chars,
       dup_bigram_chars / bigram_chars AS dup_bigram_char_frac,
       top_word_cnt, n_words,
       top_word_cnt / n_words AS top_word_frac
FROM bi JOIN wd ON bi.doc_id = wd.doc_id
ORDER BY bi.doc_id
"""


# ---------------------------------------------------------------- text_pii_scrub


def _with_planted_pii(docs: DataFrame) -> DataFrame:
    """Plant deterministic e-mail/phone PII into every third document so
    detection has non-trivial positives AND negatives."""
    planted = F.concat(
        F.col("text"),
        F.lit(" reach me at user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail-example.com or call +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, planted).otherwise(F.col("text")).alias("text"),
    )


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction in one projection pass: match counts per
    class, redacted-text length and md5 fingerprint."""
    docs = load(spark, sf_dir, "documents")
    return pii_scrub(_with_planted_pii(docs))


_TEXT_PII_SQL = f"""
WITH planted AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0
         THEN text || ' reach me at user' || CAST(doc_id AS VARCHAR)
              || '@mail-example.com or call +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         ELSE text END AS text
  FROM documents
),
scrubbed AS (
  SELECT doc_id,
    len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
    len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
    regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{PHONE_RE}', '<PHONE>', 'g') AS redacted
  FROM planted
)
SELECT doc_id, n_emails, n_phones,
       (n_emails + n_phones) > 0 AS has_pii,
       length(redacted) AS redacted_len,
       md5(redacted) AS redacted_md5
FROM scrubbed ORDER BY doc_id
"""


# ---------------------------------------------------------------- embed_quantize_sq8


def embed_quantize_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embeddings corpus: per-vector code
    summaries + integer-exact reconstruction-error totals.  The corpus
    pass is one projection against a broadcast 1-row range table (see
    llmdata/quantize.py)."""
    emb = load(spark, sf_dir, "embeddings")
    return sq8_encode(emb)


_EMBED_SQ8_SQL = f"""
WITH comp AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
         CAST(UNNEST(embedding) AS DOUBLE) AS x
  FROM embeddings
),
stats AS (SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM comp GROUP BY pos),
enc AS (
  SELECT vec_id, x, mn, mx,
    CASE WHEN mx = mn THEN 0
         ELSE LEAST(255, CAST(FLOOR(((x - mn) / (mx - mn)) * 256) AS BIGINT))
    END AS code
  FROM comp JOIN stats USING (pos)
),
err AS (
  SELECT vec_id, code,
    CASE WHEN mx = mn THEN 0
         ELSE CAST(FLOOR(
           ((x - (mn + ((code + 0.5) * (mx - mn)) / 256))
            * (x - (mn + ((code + 0.5) * (mx - mn)) / 256))) * {ERR_SCALE}
         ) AS BIGINT)
    END AS err_q
  FROM enc
)
SELECT vec_id, COUNT(*) AS dim, CAST(SUM(code) AS BIGINT) AS code_sum,
       MIN(code) AS code_min, MAX(code) AS code_max,
       CAST(SUM(err_q) AS BIGINT) AS err_q_sum
FROM err GROUP BY vec_id ORDER BY vec_id
"""


SPARK_QUERIES = {
    "text_quality_gopher": text_quality_gopher,
    "text_repetition": text_repetition,
    "text_pii_scrub": text_pii_scrub,
    "embed_quantize_sq8": embed_quantize_sq8,
}

ORACLE_SQL = {
    "text_quality_gopher": _TEXT_QUALITY_SQL,
    "text_repetition": _TEXT_REPETITION_SQL,
    "text_pii_scrub": _TEXT_PII_SQL,
    "embed_quantize_sq8": _EMBED_SQ8_SQL,
}


def text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram-LM quality score per document (the CCNet
    perplexity gate, integer-exact — see llmdata/quality.bigram_lm_score
    for why integers instead of log-space)."""
    docs = load(spark, sf_dir, "documents")
    return bigram_lm_score(docs)


_TEXT_LM_SQL = """
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pairs AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM tok, UNNEST(range(1, greatest(len(t), 1))) AS u(i)
),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM pairs GROUP BY w1),
c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM pairs GROUP BY w1, w2)
SELECT p.doc_id, COUNT(*) AS n_bigrams,
       CAST(SUM((c2.c2 * 1000000) // c1.c1) // COUNT(*) AS BIGINT)
         AS lm_score
FROM pairs p JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
GROUP BY p.doc_id ORDER BY p.doc_id
"""

SPARK_QUERIES["text_lm_score"] = text_lm_score
ORACLE_SQL["text_lm_score"] = _TEXT_LM_SQL


_BENFORD_PM = (301, 176, 125, 97, 79, 67, 58, 51, 46)  # P(d) * 1000, d=1..9


def quality_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit per event type — the classic
    fabricated-data / instrumentation-bug detector: observed per-mille
    frequency of each first significant digit vs the Benford
    expectation, folded to a max-deviation and an integer chi-square
    statistic per group.  The first digit comes from the DECIMAL STRING
    of the quantized value (no float log10 — engines disagree in the
    last ulp at decade boundaries), so every step is engine-exact.  One
    grouped pass + a 9-row-per-group fold."""
    ev = load(spark, sf_dir, "events")
    qv = F.floor(F.col("value") * 100).cast("long")
    digit = F.substring(qv.cast("string"), 1, 1).cast("int")
    # value >= 0.01 keeps floor(value*100) >= 1, so the digit domain is
    # provably 1-9: a (0, 0.01) value would yield d=0, which element_at
    # rejects (1-based) while the oracle's exp_t join silently drops it.
    base = ev.filter(F.col("value") >= 0.01).select(
        "event_type", digit.alias("d")
    )
    counts = base.groupBy("event_type", "d").agg(F.count(F.lit(1)).alias("c"))
    tot = base.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    exp_pm = F.element_at(
        F.array(*[F.lit(p) for p in _BENFORD_PM]), F.col("d")
    )
    per_digit = (
        counts.join(tot, "event_type")
        .withColumn("obs_pm", F.col("c") * 1000 / F.col("n"))
        .withColumn("obs_pm", F.floor(F.col("obs_pm")).cast("long"))
        .withColumn("dev", F.abs(F.col("obs_pm") - exp_pm))
    )
    return (
        per_digit.groupBy("event_type")
        .agg(
            F.max("n").alias("n_values"),
            F.max("dev").alias("max_dev_permille"),
            F.sum(
                F.floor(
                    (F.col("obs_pm") - exp_pm) * (F.col("obs_pm") - exp_pm)
                    * 1000 / exp_pm
                ).cast("long")
            ).alias("chi2_scaled"),
        )
        .orderBy("event_type")
    )


_BENFORD_SQL = f"""
WITH base AS (
  SELECT event_type,
         CAST(substr(CAST(CAST(FLOOR(value * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS d
  FROM events WHERE value >= 0.01
),
counts AS (SELECT event_type, d, COUNT(*) AS c FROM base GROUP BY 1, 2),
tot AS (SELECT event_type, COUNT(*) AS n FROM base GROUP BY 1),
exp_t AS (
  SELECT * FROM (VALUES {", ".join(f"({i+1}, {p})" for i, p in enumerate(_BENFORD_PM))}) AS t(d, pm)
),
per_digit AS (
  SELECT c.event_type,
         t.n,
         CAST(FLOOR(c.c * 1000 / t.n) AS BIGINT) AS obs_pm,
         e.pm AS exp_pm
  FROM counts c
  JOIN tot t ON t.event_type = c.event_type
  JOIN exp_t e ON e.d = c.d
)
SELECT event_type,
       MAX(n) AS n_values,
       MAX(ABS(obs_pm - exp_pm)) AS max_dev_permille,
       CAST(SUM(CAST(FLOOR((obs_pm - exp_pm) * (obs_pm - exp_pm) * 1000 / exp_pm) AS BIGINT)) AS BIGINT) AS chi2_scaled
FROM per_digit
GROUP BY event_type
ORDER BY event_type
"""

SPARK_QUERIES["quality_benford"] = quality_benford
ORACLE_SQL["quality_benford"] = _BENFORD_SQL
