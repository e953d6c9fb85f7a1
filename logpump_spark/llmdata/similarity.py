"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline.  The query set is
  small and BROADCAST; the corpus streams through one scan — at 100 TB
  this is a single pass, no shuffle of the corpus side, and the per-query
  top-k heap is a TakeOrdered-by-group (window + filter)
- IVF-bucketed top-k: the scale path — restrict the scan to the query's
  coarse cell(s).  Here the precomputed ``label`` column stands in for a
  k-means cell id (a real IVF fits centroids offline and assigns
  argmin-distance; the bucket-restricted search shape is identical)

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


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: search only the query's coarse cell.  The join key
    gains the cell id, so each query's scan shrinks by ~n_cells x; recall
    is bounded by the quantizer (probe more cells to trade speed for
    recall — at nprobe=n_cells this degenerates to brute force)."""
    base = emb.select(
        F.col(id_col), F.col(cell_col), _as_double(F.col(vec_col)).alias("v")
    )
    queries = base.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(cell_col).alias("qcell"),
        F.col("v").alias("qv"),
    )
    scored = (
        base.join(
            F.broadcast(queries),
            (F.col(cell_col) == F.col("qcell")) & (F.col(id_col) != F.col("query_id")),
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
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, candidate-bounded to the
    same coarse cell (the embedding analog of LSH-bucketed text dedup)."""
    base = emb.select(
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
