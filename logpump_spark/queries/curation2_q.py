"""Round-4 curation additions: benchmark decontamination, corpus
vocabulary statistics, and per-stratum quality deciles — three more
training-data-pipeline staples, each with an exact-arithmetic DuckDB
oracle (integer counts, md5-derived shingle hashes, standard-SQL ntile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..llmdata.curation import corpus_vocab_topk, decontaminate_ngram_overlap
from ..tables import load

_EVAL_MOD = 97  # doc_id % 97 == 0 -> the deterministic "benchmark" set
_SHINGLE_K = 4
_VOCAB_K = 100

# the DuckDB twin of dedup.md5_hash60
_MD5I = "CAST(concat('0x', substr(md5({s}), 2, 15)) AS BIGINT)"


def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag corpus docs sharing any 4-token shingle with the
    deterministic eval subset (doc_id % 97 == 0) — the pretraining
    decontamination pass.  Eval shingle hashes broadcast; corpus side is
    one scan."""
    docs = load(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % _EVAL_MOD == 0)
    corpus = docs.filter(F.col("doc_id") % _EVAL_MOD != 0)
    return decontaminate_ngram_overlap(corpus, eval_docs, k=_SHINGLE_K).orderBy(
        "doc_id"
    )


_SHINGLES = (
    "list_distinct(list_transform("
    "range(1, greatest(len(string_split(text, ' ')) - {km1}, 1) + 1),"
    " i -> array_to_string(list_slice(string_split(text, ' '), i, i + {km1}), ' ')))"
).format(km1=_SHINGLE_K - 1)

_DECONTAMINATE_SQL = f"""
WITH ev AS (
  SELECT DISTINCT {_MD5I.format(s="s")} AS h FROM (
    SELECT UNNEST({_SHINGLES}) AS s
    FROM documents WHERE doc_id % {_EVAL_MOD} = 0)
),
co AS (
  SELECT doc_id, {_MD5I.format(s="s")} AS h FROM (
    SELECT doc_id, UNNEST({_SHINGLES}) AS s
    FROM documents WHERE doc_id % {_EVAL_MOD} != 0)
)
SELECT doc_id, COUNT(*) AS n_hits
FROM co JOIN ev USING (h)
GROUP BY doc_id ORDER BY doc_id
"""


def corpus_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 corpus vocabulary by occurrence count with document
    frequency — the Zipf/vocab-building pass."""
    docs = load(spark, sf_dir, "documents")
    return corpus_vocab_topk(docs, top_k=_VOCAB_K)


_CORPUS_VOCAB_SQL = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents
),
stats AS (
  SELECT token, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
  FROM tok GROUP BY token
),
top AS (
  SELECT * FROM stats ORDER BY n_occurrences DESC, token LIMIT {_VOCAB_K}
)
SELECT ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, token) AS rank,
       token, n_occurrences, n_docs
FROM top ORDER BY rank
"""


def quality_decile_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top quality decile PER LANGUAGE (proxy score: n_chars, doc_id
    tiebreak) — the quality-gating pass of a curation pipeline.

    Scale note: ntile is PARTITIONED by lang, so the sort shuffles by
    stratum instead of funneling the corpus through one global-order
    partition; for an unstratified exact top-p at 100 TB the right shape
    is a value-histogram cutoff, not a global ntile."""
    docs = load(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        docs.withColumn("decile", F.ntile(10).over(w))
        .filter(F.col("decile") == 1)
        .select("doc_id", "lang", "n_chars", "decile")
        .orderBy("doc_id")
    )


_QUALITY_DECILE_SQL = """
SELECT doc_id, lang, n_chars, decile FROM (
  SELECT doc_id, lang, n_chars,
         NTILE(10) OVER (PARTITION BY lang
                         ORDER BY n_chars DESC, doc_id ASC) AS decile
  FROM documents
) WHERE decile = 1 ORDER BY doc_id
"""

SPARK_QUERIES = {
    "text_decontaminate": text_decontaminate,
    "corpus_vocab": corpus_vocab,
    "quality_decile_by_lang": quality_decile_by_lang,
}
ORACLE_SQL = {
    "text_decontaminate": _DECONTAMINATE_SQL,
    "corpus_vocab": _CORPUS_VOCAB_SQL,
    "quality_decile_by_lang": _QUALITY_DECILE_SQL,
}
