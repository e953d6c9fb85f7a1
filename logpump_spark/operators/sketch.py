"""Count-min sketch: fixed-memory frequency estimation over unbounded
key cardinality (Cormode & Muthukrishnan 2005).

The reference delegates its frequency analytics to ClickHouse's
approximate aggregates (``topK``; reference README's analytical query
surface); this is the engine-side analog, built so any SQL engine can
replay it exactly:

- Row hashes reuse the MinHash universal-hash family
  (llmdata/dedup.py): bucket_i(key) = ((a_i * h + b_i) mod p) mod w
  with h = md5_hash60(key) mod p, so h < p ~ 2^32 and a < 2^30 keep
  every product below 2^62 (no int64 overflow, in Spark or DuckDB).
- Building the sketch is ONE pass over raw rows: each row contributes
  ``depth`` (row, bucket) cells, and partial aggregation folds them
  mapper-side, so the shuffle carries at most depth x width cells per
  mapper REGARDLESS of key cardinality — that bounded shuffle is the
  whole point of the sketch at 100 TB (an exact per-key groupBy
  shuffles every distinct key).
- The finished sketch is depth x width rows (tiny); estimation
  broadcasts it and takes min over the key's depth cells, so the
  estimate never underestimates and overestimates by at most
  2N/width with probability 1 - 2^-depth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..llmdata.dedup import _MH_P, _MH_PARAMS, md5_hash60


def cms_bucket_cols(key: Column, depth: int, width: int) -> list[Column]:
    """The ``depth`` bucket indices of ``key`` — exact int64 arithmetic,
    replayable in any engine."""
    hm = md5_hash60(key) % F.lit(_MH_P)
    return [
        (((F.lit(a) * hm + F.lit(b)) % F.lit(_MH_P)) % F.lit(width)).cast("long")
        for a, b in _MH_PARAMS[:depth]
    ]


def cms_build(
    df: DataFrame,
    key: Column,
    depth: int = 4,
    width: int = 256,
    weight: Column | None = None,
) -> DataFrame:
    """One-pass sketch build: (r, b, c) counts, at most depth*width rows.

    ``weight`` (an exact-integer Column) switches the cells from row
    counts to weight sums — the ClickHouse ``topKWeighted`` base: same
    bounded depth*width state, same mergeability, estimates bound the
    key's TOTAL weight instead of its frequency."""
    buckets = cms_bucket_cols(key, depth, width)
    cells = F.explode(
        F.array(
            *[
                F.struct(F.lit(r).cast("long").alias("r"), buckets[r].alias("b"))
                for r in range(depth)
            ]
        )
    )
    w = F.lit(1).cast("long") if weight is None else weight
    return (
        df.select(cells.alias("cell"), w.alias("w"))
        .groupBy(F.col("cell.r").alias("r"), F.col("cell.b").alias("b"))
        .agg(F.sum("w").alias("c"))
    )


def cms_estimate(
    keys: DataFrame,
    key_col: str,
    sketch: DataFrame,
    depth: int = 4,
    width: int = 256,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: est = min over
    the key's depth cells.  The sketch is broadcast (depth*width rows),
    so this adds no shuffle to whatever produced ``keys``.  ``carry_cols``
    ride through the estimate unchanged so a caller never has to join the
    result back to ``keys`` — joining a DataFrame to an aggregate of
    itself makes Catalyst derive the upstream twice."""
    buckets = cms_bucket_cols(F.col(key_col), depth, width)
    cells = F.explode(
        F.array(
            *[
                F.struct(F.lit(r).cast("long").alias("r"), buckets[r].alias("b"))
                for r in range(depth)
            ]
        )
    )
    exploded = keys.select(
        F.col(key_col), *[F.col(c) for c in carry_cols], cells.alias("cell")
    ).select(
        key_col, *carry_cols, F.col("cell.r").alias("r"), F.col("cell.b").alias("b")
    )
    joined = exploded.join(F.broadcast(sketch), ["r", "b"], "left").withColumn(
        "c", F.coalesce("c", F.lit(0))
    )
    return joined.groupBy(key_col, *carry_cols).agg(F.min("c").alias("est"))
