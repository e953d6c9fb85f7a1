"""Product quantization (PQ) for embedding compression + ADC search.

PQ splits each vector into ``n_sub`` subvectors and vector-quantizes each
subspace independently (k-means, ``k`` centroids), so a 64-dim float
vector compresses to ``n_sub`` small codes.  Search uses asymmetric
distance computation (ADC): the query stays exact, and its distance to a
corpus vector is the sum of precomputed query-to-centroid subdistances —
a table lookup per subspace instead of a 64-dim scan.

Like ``similarity.fit_ivf``, the whole fit runs in the floor(x*1e6)
integer domain with deterministic init (first ``k`` ids) and tie-breaks
(smallest centroid id), so a SQL oracle replays the exact codebooks,
codes, and ADC rankings — no RNG, no float accumulation order anywhere.

Scale shape:
- fit: per iteration one corpus scan + one (m, cell, pos)-grouped
  aggregation; centroids (n_sub * k rows) stay broadcast;
- encode: corpus x broadcast-centroids, argmin per (vector, subspace);
- ADC search: the distance TABLE (queries x n_sub x k rows) is computed
  once against centroids and broadcast; the corpus side only joins its
  codes to the table — per corpus row it's n_sub lookups, never a
  full-dimension distance, and never a corpus self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .similarity import _sqdist, quantize


def _subvectors(
    emb: DataFrame,
    n_sub: int,
    width: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(_id, m, sq): quantized subvector m of every vector."""
    q = quantize(F.col(vec_col))
    parts = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"), F.slice(q, m * width + 1, width).alias("sq")
            )
            for m in range(n_sub)
        ]
    )
    return (
        emb.filter(F.size(F.col(vec_col)) == n_sub * width)
        .select(F.col(id_col).alias("_id"), F.explode(parts).alias("p"))
        .select("_id", "p.m", "p.sq")
    )


def _assign(sub: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment per (vector, subspace); ties to the
    smallest centroid id (lexicographic min over (dist, cid))."""
    d = sub.join(F.broadcast(cent), "m").select(
        "_id", "m", "cid", _sqdist("sq", "c").alias("dist")
    )
    return (
        d.groupBy("_id", "m")
        .agg(F.min(F.struct("dist", "cid")).alias("mm"))
        .select("_id", "m", F.col("mm.cid").alias("cell"))
    )


def fit_pq(
    emb: DataFrame,
    n_sub: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Fit PQ codebooks and encode the corpus.

    Returns ``(codes, centroids)``: codes = (_id, m, cell) — ``n_sub``
    codes per vector; centroids = (m, cid, c: array<long>).  Same exact
    integer arithmetic as ``fit_ivf`` (floored integer means, (dist, cid)
    tie-break); init = the ``k`` smallest-id vectors in RANK order
    (cid = rank-1, so ids need not be contiguous).

    Like ``fit_ivf``, centroids live on the DRIVER between iterations
    (n_sub x k rows — bounded), so each iteration is one corpus scan
    against a literal broadcast instead of a recursive plan replayed per
    action."""
    spark = emb.sparkSession
    width = dim // n_sub
    sub = _subvectors(emb, n_sub, width, id_col, vec_col)
    init_ids = [
        r._id for r in sub.select("_id").distinct().orderBy("_id").limit(k).collect()
    ]
    if len(init_ids) < k:
        raise ValueError(
            f"fit_pq: need >= {k} vectors to seed {k} centroids per subspace, "
            f"got {len(init_ids)}"
        )
    rank = {i: n for n, i in enumerate(init_ids)}
    init = sub.filter(F.col("_id").isin(init_ids)).collect()

    def _cent_df(rows: list[tuple[int, int, list[int]]]) -> DataFrame:
        return spark.createDataFrame(rows, "m int, cid long, c array<long>")

    cent = _cent_df(sorted((int(r.m), rank[r._id], list(r.sq)) for r in init))
    for _ in range(iters):
        assigned = _assign(sub, cent)
        updated = (
            assigned.join(sub, ["_id", "m"])
            .select("m", "cell", F.posexplode("sq").alias("pos", "val"))
            .groupBy("m", "cell", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .withColumn("cv", F.floor(F.col("s") / F.col("n")).cast("long"))
            .groupBy("m", "cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("pc"))
            .select(
                "m",
                F.col("cell").alias("cid"),
                F.transform("pc", lambda x: x["cv"]).alias("c"),
            )
            .collect()
        )
        cent = _cent_df(sorted((int(r.m), int(r.cid), list(r.c)) for r in updated))
    codes = _assign(sub, cent)
    return codes, cent


def pq_adc_topk(
    emb: DataFrame,
    query_ids: list[int],
    topk: int = 5,
    n_sub: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """ADC top-k: exact queries against the PQ-compressed corpus.

    The per-query distance table (n_sub * k subdistances) is broadcast;
    corpus rows contribute their codes only.  Output ranks ascending by
    integer ADC distance, ties to the smaller neighbor id."""
    width = dim // n_sub
    codes, cent = fit_pq(emb, n_sub, k, iters, id_col, vec_col, dim)
    sub = _subvectors(emb, n_sub, width, id_col, vec_col)
    qsub = sub.filter(F.col("_id").isin(query_ids)).select(
        F.col("_id").alias("query_id"), "m", F.col("sq").alias("qsq")
    )
    dtable = qsub.join(F.broadcast(cent), "m").select(
        "query_id", "m", F.col("cid").alias("cell"), _sqdist("qsq", "c").alias("d")
    )
    scored = (
        codes.join(F.broadcast(dtable), ["m", "cell"])
        .filter(F.col("_id") != F.col("query_id"))
        .groupBy("query_id", "_id")
        .agg(F.sum("d").alias("adc_dist"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id", F.col("_id").alias("neighbor_id"), "adc_dist", "rank"
        )
        .orderBy("query_id", "rank")
    )
