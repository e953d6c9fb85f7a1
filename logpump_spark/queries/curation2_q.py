"""Round-4 curation additions: benchmark decontamination, corpus
vocabulary statistics, and per-stratum quality deciles — three more
training-data-pipeline staples, each with an exact-arithmetic DuckDB
oracle (integer counts, md5-derived shingle hashes, standard-SQL ntile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.materialize import materialize as _mat

from ..llmdata.curation import (
    _SAMPLE_MOD,
    _SAMPLE_MULT,
    corpus_vocab_topk,
    decontaminate_ngram_overlap,
)
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
)
from ..tables import load
from .quality_q import _STOP_LIST

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
    return decontaminate_ngram_overlap(corpus, eval_docs, k=_SHINGLE_K)


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
    )


_QUALITY_DECILE_SQL = """
SELECT doc_id, lang, n_chars, decile FROM (
  SELECT doc_id, lang, n_chars,
         NTILE(10) OVER (PARTITION BY lang
                         ORDER BY n_chars DESC, doc_id ASC) AS decile
  FROM documents
) WHERE decile = 1 ORDER BY doc_id
"""

def dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The survivor-selection step that completes the dedup story
    (detect -> cluster -> KEEP ONE): per duplicate cluster (same edge
    rule + connected components as `dedup_components`), keep the doc
    with the most content, ties to the smallest id.  Emits one row per
    cluster with the winner and member count."""
    from .curation_q import _dup_cluster_labels

    labeled = _dup_cluster_labels(spark, sf_dir)
    w = W.partitionBy("component")
    wo = w.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    return (
        labeled.withColumn("rn", F.row_number().over(wo))
        .withColumn("n_members", F.count(F.lit(1)).over(w))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("keep_id"),
            F.col("n_chars").alias("keep_n_chars"),
            "n_members",
        )
    )


# same recursive-closure oracle as dedup_components, extended with the
# per-cluster winner pick
_DEDUP_CANONICAL_SQL = """
WITH RECURSIVE docs AS (
  SELECT doc_id, text, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, source, n_chars
  FROM (SELECT * FROM documents WHERE doc_id < 20)
),
tok AS (
  SELECT doc_id, source, n_chars, UNNEST(list_distinct(string_split(text, ' '))) AS tok
  FROM docs
),
sizes AS (
  SELECT doc_id, len(list_distinct(string_split(text, ' '))) AS n_tok FROM docs
),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
  FROM tok a JOIN tok b
    ON a.tok = b.tok AND a.source = b.source AND a.doc_id < b.doc_id
   AND abs(a.n_chars - b.n_chars) <= 20
  GROUP BY 1, 2
),
edges AS (
  SELECT id_a, id_b FROM shared
  JOIN sizes na ON na.doc_id = id_a
  JOIN sizes nb ON nb.doc_id = id_b
  WHERE n_shared / (na.n_tok + nb.n_tok - n_shared) >= 0.2
),
und AS (
  SELECT id_a AS u, id_b AS v FROM edges
  UNION
  SELECT id_b AS u, id_a AS v FROM edges
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM docs
  UNION
  SELECT w.node, e.v FROM reach w JOIN und e ON e.u = w.r
),
comp AS (SELECT node AS doc_id, MIN(r) AS component FROM reach GROUP BY node),
lab AS (
  SELECT d.doc_id, c.component, d.n_chars
  FROM docs d JOIN comp c ON c.doc_id = d.doc_id
),
win AS (
  SELECT component, doc_id AS keep_id, n_chars AS keep_n_chars,
         ROW_NUMBER() OVER (PARTITION BY component
                            ORDER BY n_chars DESC, doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY component) AS n_members
  FROM lab
)
SELECT component, keep_id, keep_n_chars, n_members
FROM win WHERE rn = 1 ORDER BY component
"""

_TOPP_PCT = 10


def sample_topp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10% of docs by (n_chars DESC, doc_id ASC) via the
    histogram-cutoff shape (llmdata/curation.py top_p_by_score) — the
    scale-safe alternative to a global rank the quality-decile docstring
    points at.  Since r10 the at-cut tie rank is a two-stage prefix
    scan, so even an all-one-score corpus never runs one-task."""
    from ..llmdata.curation import top_p_by_score

    docs = load(spark, sf_dir, "documents")
    return top_p_by_score(docs, p_pct=_TOPP_PCT)


# the oracle states the SPEC (global rank); the Spark side implements
# the scale shape — identical selections by construction
_SAMPLE_TOPP_SQL = f"""
WITH ranked AS (
  SELECT doc_id, n_chars,
         ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
),
t AS (SELECT (COUNT(*) * {_TOPP_PCT} + 99) // 100 AS target FROM documents)
SELECT doc_id, n_chars FROM ranked, t WHERE rn <= target ORDER BY doc_id
"""

SPARK_QUERIES = {
    "text_decontaminate": text_decontaminate,
    "corpus_vocab": corpus_vocab,
    "quality_decile_by_lang": quality_decile_by_lang,
    "dedup_canonical": dedup_canonical,
    "sample_topp": sample_topp,
}
ORACLE_SQL = {
    "text_decontaminate": _DECONTAMINATE_SQL,
    "corpus_vocab": _CORPUS_VOCAB_SQL,
    "quality_decile_by_lang": _QUALITY_DECILE_SQL,
    "dedup_canonical": _DEDUP_CANONICAL_SQL,
    "sample_topp": _SAMPLE_TOPP_SQL,
}


_BP_K = 5
_BP_MIN_DOCS = 3
_BP_TOP = 200
_BP_MAX_FRAC = 0.5


def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb/C4-style boilerplate pass: top-200 5-token shingles
    repeating across >=3 distinct docs, then per-doc boilerplate
    fraction + gate (llmdata/curation.py boilerplate_flag)."""
    from ..llmdata.curation import boilerplate_flag

    docs = load(spark, sf_dir, "documents")
    return boilerplate_flag(
        docs,
        k=_BP_K,
        min_docs=_BP_MIN_DOCS,
        top_k=_BP_TOP,
        max_frac=_BP_MAX_FRAC,
    )


# shingles WITH multiplicity (no list_distinct): every window counts
_BP_SHINGLES = (
    "list_transform("
    "range(1, greatest(len(string_split(text, ' ')) - {km1}, 1) + 1),"
    " i -> array_to_string(list_slice(string_split(text, ' '), i, i + {km1}), ' '))"
).format(km1=_BP_K - 1)

_TEXT_BOILERPLATE_SQL = f"""
WITH sh AS (
  SELECT doc_id, {_MD5I.format(s="s")} AS h FROM (
    SELECT doc_id, UNNEST({_BP_SHINGLES}) AS s FROM documents)
),
hot AS (
  SELECT h FROM (
    SELECT h, COUNT(DISTINCT doc_id) AS n_docs
    FROM sh GROUP BY h)
  WHERE n_docs >= {_BP_MIN_DOCS}
  ORDER BY n_docs DESC, h ASC LIMIT {_BP_TOP}
),
f AS (
  SELECT s.doc_id, COUNT(*) AS n_shingles,
         SUM(CASE WHEN hot.h IS NOT NULL THEN 1 ELSE 0 END) AS n_boiler
  FROM sh s LEFT JOIN hot ON s.h = hot.h
  GROUP BY s.doc_id
)
SELECT doc_id, n_shingles, CAST(n_boiler AS BIGINT) AS n_boiler,
       ROUND(n_boiler / n_shingles, 6) AS boiler_frac,
       (n_boiler / n_shingles) > {_BP_MAX_FRAC} AS is_boilerplate
FROM f ORDER BY doc_id
"""

SPARK_QUERIES["text_boilerplate"] = text_boilerplate
ORACLE_SQL["text_boilerplate"] = _TEXT_BOILERPLATE_SQL


def corpus_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-corpora merge: every 7th doc also arrives via a
    lower-priority 'mirror' corpus (planted in-plan with shifted ids);
    the merge must keep the original copy and report provenance
    (llmdata/curation.py merge_by_priority)."""
    from ..llmdata.curation import merge_by_priority

    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "source")
    mirror = (
        docs.filter(F.col("doc_id") % 7 == 0)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "text",
            F.lit("mirror").alias("source"),
        )
    )
    both = docs.unionByName(mirror)
    pri = F.when(F.col("source") == "mirror", 1).otherwise(0)
    return (
        merge_by_priority(both, priority=pri)
        .select("doc_id", "source", "n_copies", "n_sources")
    )


_CORPUS_MERGE_SQL = """
WITH merged AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, 'mirror' AS source
  FROM documents WHERE doc_id % 7 = 0
),
ranked AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY md5(text)
            ORDER BY CASE WHEN source = 'mirror' THEN 1 ELSE 0 END, doc_id)
           AS rk,
         COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies,
         COUNT(DISTINCT source) OVER (PARTITION BY md5(text)) AS n_sources
  FROM merged
)
SELECT doc_id, source, n_copies, CAST(n_sources AS INT) AS n_sources
FROM ranked WHERE rk = 1 ORDER BY doc_id
"""

SPARK_QUERIES["corpus_merge"] = corpus_merge
ORACLE_SQL["corpus_merge"] = _CORPUS_MERGE_SQL


def corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source contamination matrix over the documents table
    (llmdata/curation.source_overlap_matrix): shared distinct 3-token
    shingles + shingle-set Jaccard per source pair.  A mirrored slice of
    the corpus (every 7th doc) is planted under a synthetic source so
    the matrix provably detects cross-source duplication — the mirror
    rows dominate the Jaccard ranking."""
    from ..llmdata.curation import source_overlap_matrix

    docs = load(spark, sf_dir, "documents")
    mirror = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
        "source", F.lit("mirror7")
    )
    return (
        source_overlap_matrix(docs.unionByName(mirror))
        .filter(F.col("n_common") >= 3)
    )


_CORPUS_OVERLAP_SQL = """
WITH all_docs AS (
  SELECT source, text FROM documents
  UNION ALL
  SELECT 'mirror7' AS source, text FROM documents WHERE doc_id % 7 = 0
),
sh AS (
  SELECT DISTINCT source AS src, s AS sh FROM (
    SELECT source, UNNEST(list_transform(
      range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
      i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' '))) AS s
    FROM all_docs WHERE text IS NOT NULL)
),
sizes AS (SELECT src, COUNT(*) AS n FROM sh GROUP BY src),
pairs AS (
  SELECT a.src AS src_a, b.src AS src_b, COUNT(*) AS n_common
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.src < b.src
  GROUP BY 1, 2
)
SELECT src_a, src_b, n_common, na.n AS n_a, nb.n AS n_b,
       ROUND(n_common / (na.n + nb.n - n_common), 6) AS jaccard
FROM pairs
JOIN sizes na ON na.src = src_a
JOIN sizes nb ON nb.src = src_b
WHERE n_common >= 3
ORDER BY src_a, src_b
"""

SPARK_QUERIES["corpus_overlap"] = corpus_overlap
ORACLE_SQL["corpus_overlap"] = _CORPUS_OVERLAP_SQL


def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus-curation chain a training-data run executes,
    as ONE composed plan: Gopher quality gate -> exact dedup (min-id
    keeper) -> PII redaction -> deterministic 50% stratified sample.
    Every stage is the library operator (llmdata/quality.gopher_rules,
    llmdata/quality.pii_scrub, llmdata/curation.stratified_sample), so
    this id proves the operators COMPOSE — same contract a user's
    production pipeline relies on — and the oracle replays all four
    stages chained in SQL."""
    from ..llmdata.curation import stratified_sample
    from ..llmdata.quality import gopher_rules, pii_scrub

    docs = load(spark, sf_dir, "documents")
    gated = gopher_rules(docs).filter(F.col("keep")).select(
        "doc_id", "text", "lang", "source"
    )
    w = W.partitionBy("text").orderBy(F.col("doc_id").asc())
    deduped = (
        gated.withColumn("dup_rn", F.row_number().over(w))
        .filter(F.col("dup_rn") == 1)
        .drop("dup_rn")
    )
    # scrub AFTER the sample, with metadata riding through the scrub
    # projection: one linear plan, ONE corpus scan (joining a scrubbed
    # branch back to a sampled branch would re-derive gate+dedup+sample
    # twice — Catalyst does not share the subplan)
    sampled = stratified_sample(deduped, "source", 0.5, "doc_id")
    scrubbed = pii_scrub(
        sampled, keep_cols=("source", "lang", "strat_n", "sample_rank")
    )
    return scrubbed.select(
        "doc_id", "source", "lang", "strat_n", "sample_rank",
        "has_pii", "redacted_md5",
    )


_CURATION_PIPELINE_SQL = f"""
WITH feats AS (
  SELECT doc_id, text, lang, source,
         string_split(text, ' ') AS t
  FROM documents
),
gated AS (
  SELECT doc_id, text, lang, source FROM (
    SELECT doc_id, text, lang, source,
      len(t) AS n_words,
      (length(text) - (len(t) - 1)) / len(t) AS mean_word_len,
      len(list_filter(t, w -> regexp_matches(w, '[A-Za-z]'))) AS n_alpha_words,
      length(regexp_replace(text, '[^#…]', '', 'g')) AS n_symbol,
      len(list_filter(t, w -> list_contains([{_STOP_LIST}], w))) AS n_stop
    FROM feats
  )
  WHERE n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}
    AND mean_word_len >= {MIN_MEAN_WORD_LEN} AND mean_word_len <= {MAX_MEAN_WORD_LEN}
    AND (n_symbol / n_words) <= {MAX_SYMBOL_WORD_RATIO}
    AND (n_alpha_words / n_words) >= {MIN_ALPHA_WORD_FRAC}
    AND n_stop >= {MIN_STOPWORD_HITS}
),
deduped AS (
  SELECT doc_id, text, lang, source FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id ASC) AS rn
    FROM gated
  ) WHERE rn = 1
),
scrubbed AS (
  SELECT doc_id,
    (len(regexp_extract_all(text, '{EMAIL_RE}'))
     + len(regexp_extract_all(text, '{PHONE_RE}'))) > 0 AS has_pii,
    md5(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                       '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
  FROM deduped
),
sampled AS (
  SELECT doc_id, source, lang, strat_n, sample_rank FROM (
    SELECT doc_id, source, lang,
           COUNT(*) OVER (PARTITION BY source) AS strat_n,
           ROW_NUMBER() OVER (
             PARTITION BY source
             ORDER BY (doc_id * {_SAMPLE_MULT}) % {_SAMPLE_MOD} ASC, doc_id ASC
           ) AS sample_rank
    FROM deduped
  ) WHERE sample_rank <= CEIL(strat_n * 0.5)
)
SELECT s.doc_id AS doc_id, s.source AS source, s.lang AS lang,
       s.strat_n AS strat_n, s.sample_rank AS sample_rank,
       c.has_pii AS has_pii, c.redacted_md5 AS redacted_md5
FROM sampled s JOIN scrubbed c ON c.doc_id = s.doc_id
ORDER BY s.doc_id
"""

SPARK_QUERIES["curation_pipeline"] = curation_pipeline
ORACLE_SQL["curation_pipeline"] = _CURATION_PIPELINE_SQL


def text_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc OOV rate vs the corpus top-100 vocabulary
    (llmdata/curation.oov_rate) — the tokenizer-coverage report."""
    from ..llmdata.curation import oov_rate

    docs = load(spark, sf_dir, "documents")
    return oov_rate(docs, vocab_k=100)


_TEXT_OOV_SQL = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
  FROM documents WHERE text IS NOT NULL
),
vocab AS (
  SELECT token FROM (
    SELECT token, COUNT(*) AS cnt FROM toks GROUP BY token
    ORDER BY cnt DESC, token ASC LIMIT 100
  )
)
SELECT t.doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       ROUND(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) / COUNT(*), 6)
         AS oov_rate
FROM toks t LEFT JOIN vocab v ON v.token = t.token
GROUP BY t.doc_id ORDER BY t.doc_id
"""

SPARK_QUERIES["text_oov_rate"] = text_oov_rate
ORACLE_SQL["text_oov_rate"] = _TEXT_OOV_SQL


def curation_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus accounting (the C4/RefinedWeb-style source
    audit every crawl curation run starts with): docs, characters,
    language spread, and each domain's exact per-mille share of the
    corpus.  One groupBy on the domain key; the corpus total is a
    1-row aggregate broadcast back, so the share never forces a second
    corpus scan — at 100 TB this is one shuffle of |domains| rows."""
    docs = load(spark, sf_dir, "documents")
    g = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
    tot = docs.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        g.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "total_chars",
            "n_langs",
            F.floor(F.col("n_docs") * 1000 / F.col("n_total"))
            .cast("long")
            .alias("share_permille"),
        )
        .orderBy(F.col("total_chars").desc(), F.col("source"))
    )


_DOMAIN_STATS_SQL = """
WITH tot AS (SELECT COUNT(*) AS n_total FROM documents)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(DISTINCT lang) AS n_langs,
       CAST(FLOOR(COUNT(*) * 1000 / MAX(n_total)) AS BIGINT) AS share_permille
FROM documents CROSS JOIN tot
GROUP BY source
ORDER BY total_chars DESC, source
"""

SPARK_QUERIES["curation_domain_stats"] = curation_domain_stats
ORACLE_SQL["curation_domain_stats"] = _DOMAIN_STATS_SQL


_DSIR_BUCKETS = 1024
_DSIR_TOPN = 50


def sample_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style targeted data selection (Xie et al. 2023,
    arXiv:2302.03169): hashed word-bigram features, importance weight
    per feature bucket = (target count + 1) / (raw count + 1), per-doc
    score = mean bucket weight over the doc's features, top docs
    selected.  Here the 'target domain' is the English slice and the
    raw corpus is everything — the standard domain-upweighting setup.

    Engine-exact: buckets via the replayable md5 hash, weights
    floor-quantized at 1e6 (one identical IEEE division), score = one
    more floored division of exact integers — no cross-engine log().

    100 TB shape: the feature table is BOUNDED (1024 buckets), so the
    count aggregation shuffles at most n_buckets rows per mapper and
    the weight table broadcasts back onto the exploded features —
    scoring never shuffles anything wider than (doc_id, bucket), and
    the final per-doc fold rides one doc-key shuffle."""
    from ..llmdata.dedup import md5_hash60

    # token array materialized ONCE before the transform — interpreted
    # higher-order functions get no CSE, so a lambda over split(text)
    # re-splits per ELEMENT (SCALING.md §7, same fix as fn_array2_suite
    # and text_pmi_pairs)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split(F.col("text"), " ").alias("toks")
    )
    bg = F.when(
        F.size("toks") >= 2,
        F.expr(
            "transform(sequence(1, size(toks) - 1),"
            " i -> concat(toks[i-1], ' ', toks[i]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = docs.select(
        "doc_id", "lang", F.explode(bg).alias("f")
    ).select(
        "doc_id", "lang", F.pmod(md5_hash60(F.col("f")), F.lit(_DSIR_BUCKETS)).alias("b")
    )
    # two consumers (bucket counts, then scoring) — materialize the
    # explode+md5 pass once instead of re-hashing every bigram per
    # branch; at 100 TB this is the standard featurize-once checkpoint
    feats = feats.transform(_mat)
    # ONE aggregation carries both corpus counts (conditional sum for
    # the target slice) — a separate target pass would re-explode and
    # re-hash every bigram a second time
    w = (
        feats.groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("raw_c"),
            F.sum(
                F.when(F.col("lang") == "en", 1).otherwise(0)
            ).alias("tgt_c"),
        )
        .select(
            "b",
            F.floor(
                (F.col("tgt_c") + 1) * 1000000 / (F.col("raw_c") + 1)
            ).cast("long").alias("q"),
        )
    )
    scored = (
        feats.join(F.broadcast(w), "b")
        .groupBy("doc_id", "lang")
        .agg(F.sum("q").alias("qsum"), F.count(F.lit(1)).alias("n_feats"))
        .select(
            "doc_id",
            "lang",
            "n_feats",
            F.floor(F.col("qsum") / F.col("n_feats")).cast("long").alias("score_mean"),
        )
    )
    return scored.orderBy(
        F.col("score_mean").desc(), F.col("doc_id").asc()
    ).limit(_DSIR_TOPN)


_DSIR_SQL = f"""
WITH ts AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
feats AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substr(md5(t[i] || ' ' || t[i+1]), 2, 15)) AS BIGINT)
           % {_DSIR_BUCKETS} AS b
  FROM ts, UNNEST(range(1, greatest(len(t), 1))) AS r(i)
),
w AS (
  SELECT b,
         CAST(FLOOR((SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) + 1) * 1000000
                    / (COUNT(*) + 1)) AS BIGINT) AS q
  FROM feats GROUP BY b
),
scored AS (
  SELECT doc_id, lang, COUNT(*) AS n_feats,
         CAST(FLOOR(SUM(q) / COUNT(*)) AS BIGINT) AS score_mean
  FROM feats JOIN w ON feats.b = w.b
  GROUP BY doc_id, lang
)
SELECT doc_id, lang, n_feats, score_mean
FROM scored
ORDER BY score_mean DESC, doc_id ASC
LIMIT {_DSIR_TOPN}
"""

SPARK_QUERIES["sample_dsir"] = sample_dsir
ORACLE_SQL["sample_dsir"] = _DSIR_SQL
