"""Driver-facing queries for the round-2 curation/analytics operators:
duplicate-cluster connected components, tf-idf, stratified sampling,
SRP-LSH embedding near-dup, per-group top-k, batch sessionization.

All six are oracle-checked: the iterative CC is replayed by a DuckDB
recursive CTE (exact transitive closure — affordable at oracle scale,
which is exactly why the Spark side exists for the 100 TB scale), and
the SRP-LSH hyperplanes are pure-int64 arithmetic inlined identically
into both plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.materialize import materialize as _mat

from ..llmdata.curation import _SAMPLE_MOD, _SAMPLE_MULT, stratified_sample, tfidf_top_terms
from ..llmdata.dedup import ngram_jaccard_pairs
from ..llmdata.graph import connected_components
from ..llmdata.similarity import srp_lsh_neardup_pairs, srp_signs
from ..operators.sessionize import session_stats
from ..tables import load
from .llm_q import _docs_with_planted_dups

# ---------------------------------------------------------------- dedup_components

# (session, sf_dir) -> (doc_id, component, n_chars) labels.  The dedup
# trio (components / canonical survivor / cluster stats) shares ONE
# detect->cluster stage; in production the pipeline runs connected
# components once and derives all three reports from the same labels.
# The memo makes the registry reflect that instead of re-running the
# iterative CC fit (a driver loop with per-round actions) at each
# query's construction — the round-6 bench flagged exactly this
# triple-run as a registry artifact.  Cached value is a
# localCheckpoint-backed DataFrame, one row per doc (bounded); stale
# entries from stopped sessions are inert and bounded by
# sessions-per-process.
_CC_LABEL_CACHE: dict[tuple[str, str], DataFrame] = {}


def _dup_cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    # keyed by applicationId, not id(spark): a stopped session's address
    # can be reused by a new SparkSession, and a stale hit would hand
    # out a DataFrame whose checkpoint blocks died with the old session.
    # Stale appId entries are bounded by sessions-per-process (tiny).
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CC_LABEL_CACHE:
        docs = _docs_with_planted_dups(spark, sf_dir)
        edges = ngram_jaccard_pairs(docs, threshold=0.2).select("id_a", "id_b")
        labels = connected_components(edges, "id_a", "id_b")
        _CC_LABEL_CACHE[key] = (
            docs.select("doc_id", "n_chars")
            .join(labels, docs.doc_id == labels.node, "left")
            .select(
                "doc_id",
                F.coalesce(F.col("component"), F.col("doc_id")).alias("component"),
                "n_chars",
            )
            .transform(_mat)
        )
    return _CC_LABEL_CACHE[key]


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate clusters: near-dup pairs (exact token-set
    Jaccard over the deterministic candidate space, threshold 0.2, same
    edge rule as `dedup_ngram_jaccard`) fed into large-star/small-star
    connected components.  Every doc gets a cluster label = min doc_id
    reachable through near-dup edges (itself if isolated); planted clones
    guarantee non-trivial clusters."""
    return (
        _dup_cluster_labels(spark, sf_dir)
        .select("doc_id", "component")
    )


# the oracle replays the SAME edge rule, then takes exact transitive
# closure with a recursive CTE: component = min reachable node
_DEDUP_COMPONENTS_SQL = """
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
)
SELECT node AS doc_id, MIN(r) AS component
FROM reach GROUP BY node ORDER BY doc_id
"""


# ---------------------------------------------------------------- text_tfidf


def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 tf-idf terms per document (smoothed idf, term-asc ties)."""
    docs = load(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, top_n=3)


_TEXT_TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
total AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         ROUND(tf.tf * (ln((total.n_docs + 1) / (dfreq.df + 1)) + 1), 6) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN total
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf, rank FROM ranked
WHERE rank <= 3 ORDER BY doc_id, rank
"""


# ---------------------------------------------------------------- sample_stratified


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% per-source sample of the documents corpus."""
    docs = load(spark, sf_dir, "documents")
    return (
        stratified_sample(docs, "source", 0.2, "doc_id")
        .select("doc_id", "source", "strat_n", "sample_rank")
    )


_SAMPLE_STRATIFIED_SQL = f"""
WITH keyed AS (
  SELECT doc_id, source,
         COUNT(*) OVER (PARTITION BY source) AS strat_n,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY (doc_id * {_SAMPLE_MULT}) % {_SAMPLE_MOD} ASC, doc_id ASC
         ) AS sample_rank
  FROM documents
)
SELECT doc_id, source, strat_n, sample_rank FROM keyed
WHERE sample_rank <= CEIL(strat_n * 0.2)
ORDER BY doc_id
"""


# ---------------------------------------------------------------- sim_srp_lsh

_SRP_BITS = 32
_SRP_BANDS = 4
_SRP_DIM = 64
_SRP_THRESHOLD = 0.35
_SRP_CAP = 1000


def sim_srp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via signed-random-projection LSH
    (32 hyperplane bits, 4 bands of 8), cosine-verified at 0.35 — the
    no-precomputed-cells scale path for embedding dedup."""
    emb = load(spark, sf_dir, "embeddings")
    return srp_lsh_neardup_pairs(
        emb,
        threshold=_SRP_THRESHOLD,
        n_bits=_SRP_BITS,
        n_bands=_SRP_BANDS,
        dim=_SRP_DIM,
        max_bucket_size=_SRP_CAP,
    )


def _srp_sql() -> str:
    """Inline the identical ±1 hyperplanes and replay signature, banding,
    capped buckets, and cosine verification in SQL."""
    signs = srp_signs(_SRP_BITS, _SRP_DIM)
    width = _SRP_BITS // _SRP_BANDS
    # bit i: sign of the exact-integer dot product of quantized components
    bit_terms = []
    for i in range(_SRP_BITS):
        arr = "[" + ", ".join(str(s) for s in signs[i]) + "]"
        dot = (
            f"list_sum(list_transform(list_zip(q, {arr}::BIGINT[]), "
            "p -> p[1] * p[2]))"
        )
        # fully parenthesized: DuckDB's << does not bind tighter than |
        bit_terms.append(f"((CASE WHEN {dot} >= 0 THEN 1 ELSE 0 END)::BIGINT << {i})")
    sig = " | ".join(bit_terms)
    cos = """(
      list_dot_product(va, vb)
      / (sqrt(list_dot_product(va, va)) * sqrt(list_dot_product(vb, vb)))
    )"""
    return f"""
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
  FROM embeddings
  WHERE len(embedding) = {_SRP_DIM}
),
sigs AS (SELECT vec_id, v, {sig} AS sig FROM base),
bands AS (
  SELECT vec_id, v, band_no, (sig >> (band_no * {width})) & {(1 << width) - 1} AS band_val
  FROM sigs CROSS JOIN (SELECT UNNEST(range({_SRP_BANDS})) AS band_no)
),
sized AS (
  SELECT *, COUNT(*) OVER (PARTITION BY band_no, band_val) AS bsz FROM bands
),
ok_bands AS (SELECT * FROM sized WHERE bsz BETWEEN 2 AND {_SRP_CAP}),
pairs AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, a.v AS va, b.v AS vb
  FROM ok_bands a JOIN ok_bands b
    ON a.band_no = b.band_no AND a.band_val = b.band_val
   AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, ROUND({cos}, 6) AS cos
FROM pairs
WHERE ROUND({cos}, 6) >= {_SRP_THRESHOLD}
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------- topk_per_group


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 lineitems by extended price per supplier — the grouped
    twin of global top-k: one hash-shuffle on the group key and an
    in-partition sort; no global sort of the fact table."""
    li = load(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    )
    return (
        li.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice", "rank"
        )
    )


_TOPK_PER_GROUP_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rank FROM (
  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
         ROW_NUMBER() OVER (
           PARTITION BY l_suppkey
           ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
         ) AS rank
  FROM lineitem
)
WHERE rank <= 3 ORDER BY l_suppkey, rank
"""


# ---------------------------------------------------------------- sessionize_events


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gaps-and-islands sessionization of the event stream: 30-min
    timeout, per-session bounds / counts / exact-µs durations."""
    ev = load(spark, sf_dir, "events")
    return session_stats(ev, gap_minutes=30)


_SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, event_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 30 * 60 * 1000000
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
numbered AS (
  SELECT user_id, ts,
    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM marked
)
SELECT user_id, session_no,
  MIN(ts) AS session_start,
  MAX(ts) AS session_end,
  COUNT(*) AS n_events,
  epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
FROM numbered
GROUP BY user_id, session_no
ORDER BY user_id, session_no
"""


SPARK_QUERIES = {
    "dedup_components": dedup_components,
    "text_tfidf": text_tfidf,
    "sample_stratified": sample_stratified,
    "sim_srp_lsh": sim_srp_lsh,
    "topk_per_group": topk_per_group,
    "sessionize_events": sessionize_events,
}

ORACLE_SQL = {
    "dedup_components": _DEDUP_COMPONENTS_SQL,
    "text_tfidf": _TEXT_TFIDF_SQL,
    "sample_stratified": _SAMPLE_STRATIFIED_SQL,
    "sim_srp_lsh": _srp_sql(),
    "topk_per_group": _TOPK_PER_GROUP_SQL,
    "sessionize_events": _SESSIONIZE_SQL,
}


def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram — the corpus-health report a
    dedup run ends with (how much of the corpus is singleton vs small
    clusters vs mega-clusters).  Same edges + connected components as
    `dedup_components`, folded twice: component -> size, size ->
    (n_clusters, n_docs).  Both folds are tiny aggregates after the CC
    labels exist, so the histogram costs nothing beyond the labeling.
    Reuses dedup_components' (doc_id, component) output directly so the
    edge rule / CC labeling can never drift between the two ids."""
    labeled = dedup_components(spark, sf_dir)
    sizes = labeled.groupBy("component").agg(F.count(F.lit(1)).alias("csize"))
    return (
        sizes.groupBy("csize")
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("csize").alias("n_docs"),
        )
    )


# wrap the components oracle as a subquery (no string surgery on its
# CTE chain — a fragile rsplit here once produced broken SQL on edit)
_DEDUP_CLUSTER_STATS_SQL = f"""
WITH csizes AS (
  SELECT component, COUNT(*) AS csize
  FROM ({_DEDUP_COMPONENTS_SQL}) GROUP BY component
)
SELECT csize, COUNT(*) AS n_clusters, CAST(SUM(csize) AS BIGINT) AS n_docs
FROM csizes GROUP BY csize ORDER BY csize
"""

SPARK_QUERIES["dedup_cluster_stats"] = dedup_cluster_stats
ORACLE_SQL["dedup_cluster_stats"] = _DEDUP_CLUSTER_STATS_SQL
