"""Embedding compression: int8 scalar quantization (SQ8) with exact
reconstruction-error accounting.

The standard vector-store trick: per-dimension [min, max] ranges over the
corpus, each component encoded to an 8-bit code, reconstruction at the
cell midpoint.  Scale shape:

1. range derivation — one posexplode + groupBy(pos): 64 groups, partial
   min/max map-side, a few KB of shuffle regardless of corpus size;
2. the ranges are packed into two 1-row arrays and broadcast, so the
   ENCODE pass over the full corpus is a single whole-stage-codegen'd
   projection (transform/aggregate over the vector array) — no explode,
   no second shuffle, no UDF.

Error accounting is exact: per-component squared error is quantized to
an integer (floor(err * 1e12)) before summing, so the per-vector totals
are engine-reproducible integers, not float folds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ERR_SCALE = 1_000_000_000_000  # 1e12: squared errors are ~1e-6, exact in int64


def _code(x: Column, mn: Column, mx: Column) -> Column:
    """8-bit code for component x given its dimension range [mn, mx]."""
    raw = F.floor(((x - mn) / (mx - mn)) * 256)
    return F.when(mx == mn, F.lit(0).cast("long")).otherwise(
        F.least(F.lit(255).cast("long"), raw)
    )


def _err_q(x: Column, code: Column, mn: Column, mx: Column) -> Column:
    """floor(1e12 * (x - reconstruction)^2) with midpoint reconstruction."""
    rec = mn + ((code + F.lit(0.5)) * (mx - mn)) / 256
    return F.when(mx == mn, F.lit(0).cast("long")).otherwise(
        F.floor(((x - rec) * (x - rec)) * ERR_SCALE)
    )


def sq8_stats(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension [min, max] ranges — the SQ8 'codebook'."""
    return (
        emb.select(F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    )


def sq8_encode(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Encode every vector to 8-bit codes + exact integer error totals.

    Returns one row per vector: dimension count, code sum / min / max and
    the quantized squared-error sum — integer summaries that certify the
    encoding without materializing 100 TB of code arrays in the result.
    """
    stats = sq8_stats(emb, vec_col)
    packed = stats.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mn"))), lambda s: s.mn
        ).alias("mns"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mx"))), lambda s: s.mx
        ).alias("mxs"),
    )
    v = F.col(vec_col).cast("array<double>")
    idx = F.sequence(F.lit(1), F.size(v))

    def comp(i: Column) -> tuple[Column, Column, Column]:
        x = F.element_at(v, i)
        mn = F.element_at(F.col("mns"), i)
        mx = F.element_at(F.col("mxs"), i)
        return x, mn, mx

    def err_at(i: Column) -> Column:
        x, mn, mx = comp(i)
        return _err_q(x, _code(x, mn, mx), mn, mx)

    codes = F.transform(idx, lambda i: _code(*comp(i)))
    errs = F.transform(idx, err_at)
    zero = F.lit(0).cast("long")
    return (
        emb.crossJoin(F.broadcast(packed))
        .select(
            F.col(id_col),
            F.size(v).alias("dim"),
            F.aggregate(codes, zero, lambda a, c: a + c).alias("code_sum"),
            F.array_min(codes).alias("code_min"),
            F.array_max(codes).alias("code_max"),
            F.aggregate(errs, zero, lambda a, c: a + c).alias("err_q_sum"),
        )
    )
