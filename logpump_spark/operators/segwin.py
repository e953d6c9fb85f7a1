"""Segmented re-expressions of bounded ROWS-frame windows.

SCALING.md §4.1 narrowed the user-key window family's blindspot in
r11: sessionize parallelizes a hot key transparently because session
numbering is a segmented prefix sum.  This module extends the same
treatment to the other shape whose cross-block carry is BOUNDED: a
trailing ROWS frame (``ROWS BETWEEN k-1 PRECEDING AND CURRENT ROW``)
needs at most k-1 rows from earlier blocks, so a hot key's window can
be range-split into blocks, computed block-locally, and patched at
block heads from a tiny carry table — EXACT, like the sessionize
rebuild, not an approximation.  (r12: the lead() chains got the same
treatment with the carry direction reversed — ``seglead.py``; only
running distinct, whose per-row state is the full preceding value
set, genuinely needs an unbounded carry and stays cap-guarded.)

Carry correctness: each block contributes its last k-1 rows (fewer if
the block is smaller) to a per-key, block-ordered tail table.  For any
block b, the true k-1 rows preceding b's first row are a suffix of the
CONCATENATED tails of blocks < b: a row deeper than k-1 from the end
of its own block is at least k positions before any row of a later
block (outside every frame), and if the previous block is a sliver of
j < k-1 rows, the missing rows are within the last k-1 of the block
before it, which carries them too — inductively the concatenation
holds the full lookback.  The tail table is bounded by
n_blocks × (k-1) rows per key, the cum-concat arrays by the same, and
the join back rides the (key, block) partitioning the window pass
already established.

Count-gated exactly like ``sessionize``: no key over the threshold →
the compiled plan IS the plain single-window plan (and the same
plan-build-time routing CONTRACT applies — long-lived plans do not
re-gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .sessionize import HOT_KEY_THRESHOLD
from .skewguard import BLOCK_OVERSUBSCRIPTION, cap_shards, over_threshold_keys


def moving_rows_frame(
    df: DataFrame,
    value_col: str,
    frame_rows: int = 7,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    hot_key_threshold: int | None = HOT_KEY_THRESHOLD,
) -> DataFrame:
    """Attach ``frame_sum`` (sum of ``value_col``, NULL-skipping, NULL
    when the frame holds no non-NULL value — plain SUM semantics) and
    ``frame_n`` (frame ROW count) over ``ROWS BETWEEN frame_rows-1
    PRECEDING AND CURRENT ROW`` per key in (ts, id) order.

    ``value_col`` must be integral (the repo's quantized-int64
    aggregate discipline — exact under any execution order); callers
    quantize doubles first, as ``win_moving_avg`` does."""
    if hot_key_threshold is None:
        return _moving_plain(df, value_col, frame_rows, key_col, ts_col, id_col)
    if over_threshold_keys(df, hot_key_threshold, key_col).isEmpty():
        return _moving_plain(df, value_col, frame_rows, key_col, ts_col, id_col)
    return _moving_segmented(df, value_col, frame_rows, key_col, ts_col, id_col)


def _moving_plain(
    df: DataFrame,
    value_col: str,
    frame_rows: int,
    key_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    w = (
        W.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(-(frame_rows - 1), 0)
    )
    return df.withColumn("frame_sum", F.sum(value_col).over(w)).withColumn(
        "frame_n", F.count(F.lit(1)).over(w)
    )


def _moving_segmented(
    df: DataFrame,
    value_col: str,
    frame_rows: int,
    key_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    k1 = frame_rows - 1  # cross-block lookback bound
    n_blocks = BLOCK_OVERSUBSCRIPTION * cap_shards(df)
    order = [F.col(ts_col).asc(), F.col(id_col).asc()]

    # EXCHANGE-REUSE DEPENDENCY: both the windowed branch and the tails
    # branch below consume this one ranged frame, and correctness needs
    # them to observe the SAME block assignment.  RangePartitioner bounds
    # are sampled, so if an optimizer change ever defeated exchange/stage
    # reuse the two branches could sample different bounds and silently
    # disagree on _mw_blk.  tests/test_segwin.py pins exactly ONE range
    # exchange (a ReusedExchange for the second consumer) in the physical
    # plan; if that pin ever breaks, persist/localCheckpoint the ranged
    # frame here instead of relying on reuse.
    ranged = df.repartitionByRange(
        n_blocks, F.col(key_col).asc(), *order
    ).withColumn("_mw_blk", F.spark_partition_id())

    w_blk = W.partitionBy(key_col, "_mw_blk").orderBy(*order)
    w_frame = w_blk.rowsBetween(-k1, 0)
    # block-local frame pieces: the window clips at the block head, and
    # the carry supplies exactly what was clipped
    windowed = (
        ranged.withColumn("_mw_rn", F.row_number().over(w_blk))
        .withColumn("_mw_insum", F.sum(value_col).over(w_frame))
        .withColumn("_mw_incnt", F.count(F.lit(1)).over(w_frame))
    )

    # per-(key, block) tail: the block's last k-1 rows, in order
    w_rev = W.partitionBy(key_col, "_mw_blk").orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    tails = (
        ranged.withColumn("_mw_rev", F.row_number().over(w_rev))
        .filter(F.col("_mw_rev") <= k1)
        .groupBy(key_col, "_mw_blk")
        .agg(
            # array_sort over (ts, id, v) structs compares field-wise
            # (ts first — it leads the struct for exactly that), and a
            # NULL ts FIELD sorts first, matching the window's asc
            # NULLS FIRST; note array_sort's non-sort_array treatment
            # of NULL ELEMENTS never applies (structs are non-null)
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("t"),
                        F.col(id_col).alias("i"),
                        F.col(value_col).alias("v"),
                    )
                )
            ).alias("_mw_tail")
        )
    )
    # cumulative lookback per block: concatenated tails of all EARLIER
    # blocks (bounded by n_blocks * (k-1) structs per key), trimmed to
    # the last k-1 — the only rows any frame can reach across a block
    # head
    w_c = W.partitionBy(key_col).orderBy("_mw_blk")
    prev_concat = F.flatten(
        F.collect_list("_mw_tail").over(
            w_c.rowsBetween(W.unboundedPreceding, -1)
        )
    )
    lookback = F.when(
        F.size(prev_concat) > k1, F.slice(prev_concat, -k1, k1)
    ).otherwise(prev_concat)
    carry = tails.withColumn(
        "_mw_lookback", F.coalesce(lookback, F.array())
    ).select(
        F.col(key_col).alias("_mw_c_key"),
        F.col("_mw_blk").alias("_mw_c_blk"),
        "_mw_lookback",
    )

    joined = windowed.join(
        carry,
        F.col(key_col).eqNullSafe(F.col("_mw_c_key"))
        & (F.col("_mw_blk") == F.col("_mw_c_blk")),
        "left",
    )

    # rows the frame needs from earlier blocks: frame_rows - in-block
    # rows available; take them from the lookback suffix
    need = F.greatest(F.lit(0), F.lit(frame_rows) - F.col("_mw_rn"))
    lb = F.coalesce(F.col("_mw_lookback"), F.array())
    take = F.least(need, F.size(lb))
    # a zero-length slice is a correctly-typed empty array, so take=0
    # needs no special branch (start is clamped >= 1 for that case)
    cross = F.slice(lb, F.greatest(F.lit(1), F.size(lb) - take + 1), take)
    cross_vals = F.filter(cross, lambda s: s["v"].isNotNull())
    cross_sum = F.when(
        F.size(cross_vals) > 0,
        F.aggregate(cross_vals, F.lit(0).cast("long"), lambda a, s: a + s["v"]),
    )
    frame_sum = F.when(
        F.col("_mw_insum").isNull() & cross_sum.isNull(), F.lit(None)
    ).otherwise(
        F.coalesce(F.col("_mw_insum"), F.lit(0)) + F.coalesce(cross_sum, F.lit(0))
    )
    return (
        joined.withColumn("frame_sum", frame_sum.cast("long"))
        .withColumn("frame_n", F.col("_mw_incnt") + take)
        .drop(
            "_mw_blk", "_mw_rn", "_mw_insum", "_mw_incnt",
            "_mw_c_key", "_mw_c_blk", "_mw_lookback",
        )
    )
