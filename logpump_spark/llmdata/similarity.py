"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline.  The query set is
  small and BROADCAST; the corpus streams through one scan — at 100 TB
  this is a single pass, no shuffle of the corpus side, and the per-query
  top-k heap is a TakeOrdered-by-group (window + filter)
- IVF-bucketed top-k: the scale path — a REAL coarse quantizer (k-means
  fitted by ``fit_ivf``) assigns every vector to its nearest centroid
  cell; each query probes only its ``nprobe`` closest cells, shrinking
  the scan by ~n_cells/nprobe.  At nprobe=n_cells this provably
  degenerates to brute force (tests pin that).

The k-means fit is INTEGER-QUANTIZED so it is bit-for-bit reproducible
across engines (the DuckDB oracle re-derives identical centroids):
embeddings quantize to floor(x*1e6) longs, distances are exact integer
sums of squares, centroid updates floor the (exact) integer mean, ties
break on the smallest centroid id, and init is the first ``n_cells``
vectors by id.  No RNG, no float accumulation order anywhere in the fit.

Cosine math is written as the same explicit formula in Spark and in the
DuckDB oracle (dot/(sqrt(n2a)*sqrt(n2b)) over double-cast elements), and
rounded to 6 dp so fold-order ULP noise can't flip the hash or the
ranking tiebreak (vec_id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    na, nb = dot(a, a), dot(b, b)
    return dot(a, b) / (F.sqrt(na) * F.sqrt(nb))


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query id (excluded from its own
    result).  Queries are broadcast; corpus side never shuffles until the
    per-query top-k reduction."""
    base = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    queries = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        base.join(F.broadcast(queries), F.col(id_col) != F.col("query_id"))
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("v")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cos", "rank")
        .orderBy("query_id", "rank")
    )


def quantize(v: Column) -> Column:
    """floor(x * 1e6) per element: the exact-integer domain every engine
    agrees on (float -> double widening is exact; floor of a double is
    deterministic)."""
    return F.transform(v, lambda x: F.floor(x.cast("double") * 1000000).cast("long"))


def _sqdist(a: Column | str, b: Column | str) -> Column:
    """Exact integer squared L2 distance between quantized vectors.
    |q| <= ~1e6 per dim -> diff^2 <= 4e12, x 64 dims ~ 2.6e14: fits long."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(base: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment, ties to the smallest centroid id
    (lexicographic min over (dist, cid) — deterministic in any engine)."""
    d = base.crossJoin(F.broadcast(cent)).select(
        "_id", "cid", _sqdist("q", "c").alias("dist")
    )
    return d.groupBy("_id").agg(F.min(F.struct("dist", "cid")).alias("m")).select(
        "_id", F.col("m.cid").alias("cell")
    )


def fit_ivf(
    emb: DataFrame,
    n_cells: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Fit the IVF coarse quantizer: ``iters`` Lloyd iterations over the
    quantized embeddings, init = the first ``n_cells`` vectors by id.

    Returns ``(cells, centroids)``: cells = (id_col, cell) for every
    vector; centroids = (cid, c: array<long>) after the final update.
    All arithmetic is exact-integer (sums) or a single floored double
    division (the mean), so any engine replays to identical centroids.

    Scale shape: centroids are tiny and BROADCAST; each iteration is one
    corpus scan + one (cell, dim)-grouped aggregation — no corpus
    self-join, no collect.  Empty cells drop out (standard Lloyd)."""
    base = emb.select(F.col(id_col).alias("_id"), quantize(F.col(vec_col)).alias("q"))
    cent = base.filter(F.col("_id") < n_cells).select(
        F.col("_id").alias("cid"), F.col("q").alias("c")
    )
    for _ in range(iters):
        assigned = _assign(base, cent)
        cent = (
            assigned.join(base, "_id")
            .select("cell", F.posexplode("q").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            # exact integer mean, floored: long/long division is double in
            # Spark and DuckDB alike, operands are exact -> identical
            .withColumn("cv", F.floor(F.col("s") / F.col("n")).cast("long"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("pc"))
            .select(
                F.col("cell").alias("cid"),
                F.transform("pc", lambda x: x["cv"]).alias("c"),
            )
        )
    cells = _assign(base, cent).select(F.col("_id").alias(id_col), "cell")
    return cells, cent


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = None,
    n_cells: int = 8,
    iters: int = 2,
    nprobe: int = 2,
) -> DataFrame:
    """IVF ANN: fit the coarse quantizer (or reuse a precomputed
    ``cell_col``), then search only each query's ``nprobe`` closest
    cells.  The scan shrinks by ~n_cells/nprobe; recall is bounded by
    the quantizer and rises with nprobe — at nprobe=n_cells the probe
    set covers every cell and the result equals brute force."""
    if cell_col is not None:
        # precomputed cells: each query probes its own cell only
        base = emb.select(
            F.col(id_col), F.col(cell_col).alias("cell"), _as_double(F.col(vec_col)).alias("v")
        )
        probes = base.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"), F.col("cell").alias("pcell")
        )
    else:
        cells, cent = fit_ivf(emb, n_cells, iters, id_col, vec_col)
        base = (
            emb.join(cells, id_col)
            .select(F.col(id_col), "cell", _as_double(F.col(vec_col)).alias("v"))
        )
        # per-query probe list: the nprobe nearest FINAL centroids
        qbase = emb.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("_id"), quantize(F.col(vec_col)).alias("q")
        )
        qd = qbase.crossJoin(F.broadcast(cent)).select(
            "_id", "cid", _sqdist("q", "c").alias("dist")
        )
        wq = W.partitionBy("_id").orderBy("dist", "cid")
        probes = (
            qd.withColumn("prn", F.row_number().over(wq))
            .filter(F.col("prn") <= nprobe)
            .select(F.col("_id").alias("query_id"), F.col("cid").alias("pcell"))
        )
    queries = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv"))
        .join(probes, "query_id")
    )
    scored = (
        base.join(
            F.broadcast(queries),
            (F.col("cell") == F.col("pcell")) & (F.col(id_col) != F.col("query_id")),
        )
        .withColumn("cos", F.round(cosine(F.col("qv"), F.col("v")), 6))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "cos", "rank")
        .orderBy("query_id", "rank")
    )


def embedding_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    max_cell_size: int = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, candidate-bounded to the
    same coarse cell (the embedding analog of LSH-bucketed text dedup).

    ``max_cell_size`` caps the in-cell candidate set (deterministically,
    by id order) so one pathological mega-cell cannot go quadratic at
    scale — the same guard the MinHash bucket path has.  Capped cells
    trade recall for a hard cost bound; sized so normal cells never hit
    it."""
    w_cell = W.partitionBy(cell_col).orderBy(F.col(id_col).asc())
    capped = (
        emb.withColumn("_cn", F.row_number().over(w_cell))
        .filter(F.col("_cn") <= max_cell_size)
    )
    base = capped.select(
        F.col(id_col), F.col(cell_col), _as_double(F.col(vec_col)).alias("v")
    )
    a = base.select(
        F.col(id_col).alias("id_a"), F.col(cell_col).alias("cell"), F.col("v").alias("va")
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col(cell_col).alias("cell"), F.col("v").alias("vb")
    )
    return (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cell", "cos")
    )
