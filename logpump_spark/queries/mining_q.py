"""Round-5 mining operators: degree-oriented triangle counting, PMI
collocation extraction, and a KMV (k-minimum-values / theta) distinct
sketch with SET operations.

These extend the graph plane (connected components `llmdata/graph.py`,
PageRank) and the sketch plane (count-min `operators/sketch.py`, HLL
`coverage3_q.py`) with the remaining classic large-scale primitives:
triangles are THE graph-clustering health metric, PMI lift is the
standard collocation/phrase-mining pass over a training corpus, and KMV
is the sketch family whose estimates compose under union/intersection —
what HLL alone cannot do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..llmdata.dedup import md5_hash60, ordered_pair_structs
from ..tables import load

# --------------------------------------------------------------------
# graph_triangles — degree-oriented triangle counting
# --------------------------------------------------------------------

_TRI_LO, _TRI_HI = "1996-01-01", "1996-04-01"


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the supplier co-supply graph (suppliers are
    adjacent when they supplied the same part in 1996Q1) via the
    degree-oriented node-iterator (Suri & Vassilvitskii, WWW'11):
    orient every edge toward its (degree, id)-larger endpoint, enumerate
    wedges among out-neighbors, close them against the oriented edge
    set.  Orientation bounds every out-degree by O(sqrt(m)), so a hub
    node cannot explode the wedge count — the reason this shape (and
    not a naive triple self-join) survives 100 TB graphs.  Edge
    generation reuses the capped bucket-collect pair idiom (suppliers
    per part is naturally small).  The oracle triple-joins the same
    undirected edges — orientation changes the plan, never the count."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_TRI_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_TRI_HI).cast("timestamp"))
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    grouped = (
        ps.groupBy("l_partkey")
        .agg(F.sort_array(F.collect_set("l_suppkey")).alias("ss"))
        .filter(F.size("ss") >= 2)
    )
    pair_structs = ordered_pair_structs(
        F.col("ss"), lambda a, b: F.struct(a.alias("sa"), b.alias("sb"))
    )
    edges = (
        grouped.select(F.explode(pair_structs).alias("p"))
        .select("p.sa", "p.sb")
        .distinct()
    )
    deg = (
        edges.select(F.col("sa").alias("v"))
        .unionAll(edges.select(F.col("sb").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    e = (
        edges.join(deg.select(F.col("v").alias("sa"), F.col("deg").alias("da")), "sa")
        .join(deg.select(F.col("v").alias("sb"), F.col("deg").alias("db")), "sb")
    )
    ka = F.struct(F.col("da").alias("d"), F.col("sa").alias("i"))
    kb = F.struct(F.col("db").alias("d"), F.col("sb").alias("i"))
    oriented = e.select(
        F.when(ka < kb, F.col("sa")).otherwise(F.col("sb")).alias("src"),
        F.when(ka < kb, F.col("sb")).otherwise(F.col("sa")).alias("dst"),
        F.when(ka < kb, kb).otherwise(ka).alias("dst_key"),
    )
    a, b = oriented.alias("a"), oriented.alias("b")
    wedges = a.join(
        b,
        (F.col("a.src") == F.col("b.src"))
        & (F.col("a.dst_key") < F.col("b.dst_key")),
    ).select(F.col("a.dst").alias("w1"), F.col("b.dst").alias("w2"))
    closing = oriented.select(
        F.col("src").alias("w1"), F.col("dst").alias("w2")
    )
    # one lazy plan, no driver actions: three 1-row aggregates cross-joined
    nodes_df = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    edges_df = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    tri_df = (
        wedges.join(closing, ["w1", "w2"])
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return nodes_df.crossJoin(edges_df).crossJoin(tri_df)


_TRI_SQL = f"""
WITH ps AS (
  SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_TRI_LO}' AND l_shipdate < TIMESTAMP '{_TRI_HI}'
),
e AS (
  SELECT DISTINCT a.s AS sa, b.s AS sb
  FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
),
nodes AS (SELECT sa AS v FROM e UNION SELECT sb FROM e),
tri AS (
  SELECT COUNT(*) AS t
  FROM e e1
  JOIN e e2 ON e2.sa = e1.sa AND e2.sb > e1.sb
  JOIN e e3 ON e3.sa = e1.sb AND e3.sb = e2.sb
)
SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
       (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT t FROM tri) AS n_triangles
"""


# --------------------------------------------------------------------
# text_pmi_pairs — collocation extraction by lift
# --------------------------------------------------------------------

_PMI_MIN_C12 = 3
_PMI_TOPN = 20


def text_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation (phrase) mining: top bigrams by lift
    n * c(w1,w2) / (c(w1) * c(w2)) — the monotone core of PMI without
    the cross-engine log().  Lift stays a ratio of exact integer
    products, computed as ONE division of identical operands, so the
    ranking is engine-exact.  One corpus scan feeds both the bigram and
    unigram counts; the two count joins shuffle on the token (bounded
    by vocabulary, not corpus); the global bigram total rides in as a
    broadcast 1-row cross join."""
    docs = load(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    bg = F.when(
        F.size(t) >= 2,
        F.expr(
            "transform(sequence(1, size(split(text, ' ')) - 1),"
            " i -> struct(split(text, ' ')[i-1] AS w1, split(text, ' ')[i] AS w2))"
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bigrams = docs.select(F.explode(bg).alias("b")).select("b.w1", "b.w2")
    c12 = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = (
        docs.select(F.explode(t).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = bigrams.agg(F.count(F.lit(1)).alias("n"))
    lift = F.round(
        (F.col("n") * F.col("c12")).cast("double")
        / (F.col("c1") * F.col("c2")).cast("double"),
        6,
    )
    return (
        c12.filter(F.col("c12") >= _PMI_MIN_C12)
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(total))
        .select("w1", "w2", "c12", "c1", "c2", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(_PMI_TOPN)
    )


_PMI_SQL = f"""
WITH ts AS (SELECT string_split(text, ' ') AS t FROM documents),
bigrams AS (
  SELECT t[i] AS w1, t[i+1] AS w2
  FROM ts, UNNEST(range(1, greatest(len(t), 1))) AS r(i)
),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bigrams GROUP BY 1, 2),
uni AS (SELECT UNNEST(t) AS w FROM ts),
cu AS (SELECT w, COUNT(*) AS c FROM uni GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM bigrams)
SELECT c12.w1, c12.w2, c12.c12, a.c AS c1, b.c AS c2,
       round(CAST(n.n * c12.c12 AS DOUBLE) / CAST(a.c * b.c AS DOUBLE), 6) AS lift
FROM c12
JOIN cu a ON a.w = c12.w1
JOIN cu b ON b.w = c12.w2
CROSS JOIN n
WHERE c12.c12 >= {_PMI_MIN_C12}
ORDER BY lift DESC, c12.w1 ASC, c12.w2 ASC
LIMIT {_PMI_TOPN}
"""


# --------------------------------------------------------------------
# sketch_kmv_overlap — KMV / theta sketch with set operations
# --------------------------------------------------------------------

_KMV_K = 32
_KMV_RANGE = float(1 << 60)  # md5_hash60 hash space


def sketch_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source-pair distinct-document overlap via KMV (k-minimum-
    values / theta) sketches — the sketch family whose estimates compose
    under UNION and INTERSECTION (what HLL cannot do), i.e. the
    ClickHouse uniqTheta analog.

    Per source: the K=32 smallest distinct md5-60bit content hashes
    (one groupBy + one rank — per-source state bounded by K at any
    corpus size).  Per pair: theta = min of the two Kth values; both
    samples clip below theta; union/intersection counts are exact
    integers over <= 2K sampled hashes; the only doubles are the final
    count * 2^60 / theta estimates (identical operands both engines).
    The exact distinct overlap rides alongside, making estimate quality
    part of the checked result — at 100 TB the exact column is the
    expensive recomputation the sketch exists to avoid."""
    docs = load(spark, sf_dir, "documents")
    hs = docs.select("source", md5_hash60(F.col("text")).alias("h")).distinct()
    w = W.partitionBy("source").orderBy("h")
    sample = hs.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _KMV_K
    )
    theta = sample.groupBy("source").agg(
        F.max("h").alias("theta"), F.count(F.lit(1)).alias("k_used")
    )
    ta = theta.select(
        F.col("source").alias("src_a"),
        F.col("theta").alias("th_a"),
        F.col("k_used").alias("k_a"),
    )
    tb = theta.select(
        F.col("source").alias("src_b"),
        F.col("theta").alias("th_b"),
        F.col("k_used").alias("k_b"),
    )
    pairs = ta.join(tb, F.col("src_a") < F.col("src_b")).select(
        "src_a", "src_b", F.least("th_a", "th_b").alias("theta")
    )
    sa = sample.select(F.col("source").alias("src_a"), F.col("h").alias("ha"))
    sb = sample.select(F.col("source").alias("src_b"), F.col("h").alias("hb"))
    na = (
        sa.join(F.broadcast(pairs), "src_a")
        .filter(F.col("ha") <= F.col("theta"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("na"))
    )
    nb = (
        sb.join(F.broadcast(pairs), "src_b")
        .filter(F.col("hb") <= F.col("theta"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    common = (
        sa.join(sb, F.col("ha") == F.col("hb"))
        .join(F.broadcast(pairs), ["src_a", "src_b"])
        .filter(F.col("ha") <= F.col("theta"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    exact = (
        hs.select(F.col("source").alias("src_a"), "h")
        .join(hs.select(F.col("source").alias("src_b"), "h"), "h")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("exact_common"))
    )
    est = (
        pairs.join(na, ["src_a", "src_b"], "left")
        .join(nb, ["src_a", "src_b"], "left")
        .join(common, ["src_a", "src_b"], "left")
        .join(exact, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            F.coalesce("nc", F.lit(0)).alias("n_common_sample"),
            F.floor(
                F.coalesce("nc", F.lit(0)).cast("double")
                * F.lit(_KMV_RANGE)
                / F.col("theta").cast("double")
            ).cast("long").alias("est_intersection"),
            F.floor(
                (
                    F.coalesce("na", F.lit(0))
                    + F.coalesce("nb", F.lit(0))
                    - F.coalesce("nc", F.lit(0))
                ).cast("double")
                * F.lit(_KMV_RANGE)
                / F.col("theta").cast("double")
            ).cast("long").alias("est_union"),
            F.coalesce("exact_common", F.lit(0)).alias("exact_common"),
        )
    )
    return est.orderBy("src_a", "src_b")


_KMV_MD5 = "CAST(concat('0x', substr(md5(text), 2, 15)) AS BIGINT)"

_KMV_SQL = f"""
WITH hs AS (
  SELECT DISTINCT source, {_KMV_MD5} AS h FROM documents
),
ranked AS (
  SELECT source, h,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rk
  FROM hs
),
sample AS (SELECT source, h FROM ranked WHERE rk <= {_KMV_K}),
theta AS (
  SELECT source, MAX(h) AS theta, COUNT(*) AS k_used FROM sample GROUP BY 1
),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b,
         LEAST(a.theta, b.theta) AS theta
  FROM theta a JOIN theta b ON a.source < b.source
),
na AS (
  SELECT p.src_a, p.src_b, COUNT(*) AS na
  FROM sample s JOIN pairs p ON s.source = p.src_a AND s.h <= p.theta
  GROUP BY 1, 2
),
nb AS (
  SELECT p.src_a, p.src_b, COUNT(*) AS nb
  FROM sample s JOIN pairs p ON s.source = p.src_b AND s.h <= p.theta
  GROUP BY 1, 2
),
common AS (
  SELECT p.src_a, p.src_b, COUNT(*) AS nc
  FROM sample a JOIN sample b ON a.h = b.h
  JOIN pairs p ON p.src_a = a.source AND p.src_b = b.source AND a.h <= p.theta
  GROUP BY 1, 2
),
exact AS (
  SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS exact_common
  FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.src_a, p.src_b,
       COALESCE(common.nc, 0) AS n_common_sample,
       CAST(FLOOR(CAST(COALESCE(common.nc, 0) AS DOUBLE) * {_KMV_RANGE}
                  / CAST(p.theta AS DOUBLE)) AS BIGINT) AS est_intersection,
       CAST(FLOOR(CAST(COALESCE(na.na, 0) + COALESCE(nb.nb, 0)
                       - COALESCE(common.nc, 0) AS DOUBLE) * {_KMV_RANGE}
                  / CAST(p.theta AS DOUBLE)) AS BIGINT) AS est_union,
       COALESCE(exact.exact_common, 0) AS exact_common
FROM pairs p
LEFT JOIN na ON na.src_a = p.src_a AND na.src_b = p.src_b
LEFT JOIN nb ON nb.src_a = p.src_a AND nb.src_b = p.src_b
LEFT JOIN common ON common.src_a = p.src_a AND common.src_b = p.src_b
LEFT JOIN exact ON exact.src_a = p.src_a AND exact.src_b = p.src_b
ORDER BY p.src_a, p.src_b
"""


SPARK_QUERIES = {
    "graph_triangles": graph_triangles,
    "text_pmi_pairs": text_pmi_pairs,
    "sketch_kmv_overlap": sketch_kmv_overlap,
}

ORACLE_SQL = {
    "graph_triangles": _TRI_SQL,
    "text_pmi_pairs": _PMI_SQL,
    "sketch_kmv_overlap": _KMV_SQL,
}


# --------------------------------------------------------------------
# dedup_bloom_probe — replayable Bloom-filter membership dedup
# --------------------------------------------------------------------

_BLOOM_M = 4096  # bits
_BLOOM_K = 4  # hash functions (the _MH_PARAMS affine family)


def dedup_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter cross-corpus dedup probe (the classic membership
    sketch, completing the sketch family next to CMS/HLL/KMV): src0's
    document contents build a 4096-bit filter (k=4 md5-affine hash
    positions — the same oracle-replayable family as the count-min
    sketch); every other source probes it.  Per source the report
    carries bloom hits AND exact content matches, so the false-positive
    rate is part of the checked result.

    Scale shape: the filter is a bounded distinct-position set
    (<= m rows) built in one aggregation and BROADCAST; the probe is
    one corpus scan + k-way explode + broadcast semi-join — the shape
    that lets a 100 TB corpus skip re-shuffling against a reference
    corpus it almost never matches."""
    from ..llmdata.dedup import _MH_P, _MH_PARAMS

    docs = load(spark, sf_dir, "documents")
    h = md5_hash60(F.col("text")) % _MH_P
    positions = F.array(
        *[
            ((F.lit(a) * F.col("h") + F.lit(b)) % _MH_P % _BLOOM_M)
            for a, b in _MH_PARAMS[:_BLOOM_K]
        ]
    )
    build = (
        docs.filter(F.col("source") == "src0")
        .select(h.alias("h"))
        .select(F.explode(positions).alias("pos"))
        .distinct()
    )
    probe = (
        docs.filter(F.col("source") != "src0")
        .select("doc_id", "source", h.alias("h"))
        .select("doc_id", "source", "h", F.explode(positions).alias("pos"))
    )
    hits = (
        probe.join(F.broadcast(build), "pos")
        .groupBy("doc_id", "source", "h")
        .agg(F.count(F.lit(1)).alias("n_pos"))
        .withColumn("bloom_hit", F.col("n_pos") == _BLOOM_K)
    )
    exact = (
        docs.filter(F.col("source") == "src0")
        .select(h.alias("h"))
        .distinct()
        .withColumn("is_dup", F.lit(True))
    )
    per_doc = (
        docs.filter(F.col("source") != "src0")
        .select("doc_id", "source", h.alias("h"))
        .join(hits.select("doc_id", "bloom_hit"), "doc_id", "left")
        .join(F.broadcast(exact), "h", "left")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("bloom_hit"), F.lit(False)).cast("long")).alias(
                "n_bloom_hits"
            ),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(False)).cast("long")).alias(
                "n_true_dups"
            ),
        )
        .orderBy("source")
    )


_BLOOM_MD5 = "(CAST(concat('0x', substr(md5(text), 2, 15)) AS BIGINT) % 4294967311)"


def _bloom_sql() -> str:
    from ..llmdata.dedup import _MH_P, _MH_PARAMS

    pos_terms = ", ".join(
        f"((({a} * h + {b}) % {_MH_P}) % {_BLOOM_M})"
        for a, b in _MH_PARAMS[:_BLOOM_K]
    )
    return f"""
WITH hashed AS (
  SELECT doc_id, source, {_BLOOM_MD5} AS h FROM documents
),
build AS (
  SELECT DISTINCT pos
  FROM (SELECT UNNEST([{pos_terms}]) AS pos FROM hashed WHERE source = 'src0')
),
probe AS (
  SELECT doc_id, source, h, UNNEST([{pos_terms}]) AS pos
  FROM hashed WHERE source <> 'src0'
),
hits AS (
  SELECT p.doc_id, COUNT(*) AS n_pos
  FROM probe p JOIN build b ON b.pos = p.pos
  GROUP BY 1
),
exact AS (SELECT DISTINCT h FROM hashed WHERE source = 'src0')
SELECT d.source,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN COALESCE(hits.n_pos, 0) = {_BLOOM_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
       CAST(SUM(CASE WHEN exact.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_true_dups
FROM hashed d
LEFT JOIN hits ON hits.doc_id = d.doc_id
LEFT JOIN exact ON exact.h = d.h
WHERE d.source <> 'src0'
GROUP BY d.source
ORDER BY d.source
"""


SPARK_QUERIES["dedup_bloom_probe"] = dedup_bloom_probe
ORACLE_SQL["dedup_bloom_probe"] = _bloom_sql()
