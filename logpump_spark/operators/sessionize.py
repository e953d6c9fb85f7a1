"""Batch sessionization (gaps-and-islands) over an event stream.

The batch twin of ``streaming/windows.py``'s session windows: given
(user, ts) events, a new session starts wherever the gap to the previous
event exceeds the timeout.  Gap arithmetic runs on epoch MICROSECONDS
(int64), never on interval/double types, so any engine agrees exactly.

Two physical strategies, one semantics (r11 rebuild — SCALING.md §4.1):

- **plain**: the classic two-window formulation — lag to mark session
  starts, running sum to number them — one hash-shuffle on the user
  key, in-partition sort, no self-join, no UDF.  Correct and optimal
  while every key fits one task's sort budget.
- **segmented** (hot keys only): session numbering is a SEGMENTED
  PREFIX SUM, so a hot key's timeline can be range-split into blocks,
  gap flags computed within blocks in parallel, and one bounded
  (first_us, last_us, n_boundaries) row per block carried across —
  the same two-stage scan shape as the r10 funnel cap, but EXACT: the
  output is bit-identical to plain for any block assignment that is
  monotone in the sort order.  Block ids come from Spark's NATIVE
  sampled range repartition on the full (key, ts, id) sort key —
  blocks are row-balanced by the RangePartitioner's own quantile
  sampling, and because the range key includes the unique event id,
  even a burst bot whose events share one timestamp spreads across
  blocks by COUNT (an all-equal-(key, ts) prefix cannot collapse
  into one block the way value-quantile boundaries would).

The strategies are count-gated at plan-build time (one grouped count
with map-side partials + ``isEmpty`` — the same cardinality-bounded
routing pattern as the repo's fit/route collects): a corpus with no key
over ``hot_key_threshold`` compiles to EXACTLY the plain plan, keeping
the downstream exchange reuse (``session_stats`` rides the same
hashpartitioning) and paying only the detector aggregate.  With hot
keys present, the WHOLE input takes the segmented path — it is exact
for every key, and the k=64 profiling showed a per-key under/hot split
(flag join + two scan branches + union) costs more than it saves
(9.2 s split vs 4.5 s segmented-for-all vs 8.2 s plain on the 98%-skew
twin): the carry table it avoids is only ~one row per (key, block),
which the co-partitioned join absorbs at any corpus size.

Why per-key work was the last scale-killer: a window frame may not be
split mid-key, so AQE skew handling never applies — one user owning
10^7+ events is one straggler task however many executors exist
(measured 6.25x at 98% single-key skew, SCALING.md §4.1).  The
segmented path splits that one sort ``BLOCK_OVERSUBSCRIPTION *
max(32, defaultParallelism)`` ways (oversubscription smooths
balls-into-bins collisions when (key, block) hash-shuffles into the
final window; 8x measured best at k=64 — skewguard.py); the carry
table is bounded by keys-spanning-blocks + n_blocks rows.

CONTRACT: the plain-vs-segmented routing is frozen when the DataFrame
is BUILT (one detector job at construction — even a plan that is only
EXPLAINed pays it).  A long-lived plan executed after the underlying
table grows a new hot key keeps the plain plan (exact, but
single-task on that key again); build plans per run, as the driver
contract does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .skewguard import over_threshold_keys, ranged_blocks

# Per-key row count above which the segmented path engages.  Below
# ~10^6 rows a single-task sort finishes inside a few seconds (the
# k-sweep's k=4 column is noise-level), so the plain path is both
# correct and fastest; above it the hot key becomes a measurable
# straggler.  None disables the gate entirely (always plain).
HOT_KEY_THRESHOLD = 1_000_000


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
    hot_key_threshold: int | None = HOT_KEY_THRESHOLD,
) -> DataFrame:
    """Attach ``session_no`` (1-based, per user, in time order) to every
    event.  ``id_col`` breaks ordering ties deterministically.

    Exact under any ``hot_key_threshold`` (the segmented path is a
    re-expression, not an approximation — property-pinned against the
    plain window in tests/test_sessionize_segmented.py); the threshold
    only picks the physical strategy per key."""
    gap_us = gap_minutes * 60 * 1_000_000
    if hot_key_threshold is None:
        return _sessionize_plain(df, user_col, ts_col, id_col, gap_us)

    if over_threshold_keys(df, hot_key_threshold, user_col).isEmpty():
        # no hot key -> compile the plain plan, nothing else in it
        return _sessionize_plain(df, user_col, ts_col, id_col, gap_us)
    return _sessionize_segmented(df, user_col, ts_col, id_col, gap_us)


def _sessionize_plain(
    df: DataFrame, user_col: str, ts_col: str, id_col: str, gap_us: int
) -> DataFrame:
    us = F.unix_micros(F.col(ts_col))
    w = W.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    return df.withColumn(
        "session_no",
        F.sum(is_new).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )


def _sessionize_segmented(
    df: DataFrame, user_col: str, ts_col: str, id_col: str, gap_us: int
) -> DataFrame:
    """Exact session numbering for keys too hot for one task's sort.

    1. block id = the partition id of a NATIVE sampled range
       repartition on the full sort key (key, ts, id), MATERIALIZED
       once (``skewguard.ranged_blocks``) so both consumers below read
       one assignment — Spark's RangePartitioner does the quantile
       sampling and the per-row binary search JVM-side, so blocks are
       row-balanced (a burst bot's rows spread by COUNT, not
       wall-clock width) with no per-row interpreted expression and no
       sketch aggregate.  The first cut of this path used per-key
       ``percentile_approx`` boundaries plus a higher-order ``filter``
       per row; the k=64 hot twin measured it SLOWER than the plain
       single-task sort (17.7 s vs 9.2 s) — the 63-quantile sketch
       over the hot key plus 6.3M x 63 interpreted comparisons cost
       more than the straggler they removed.  Partition ids are
       non-decreasing along the lexicographic (key, ts, id) order, so
       blocks are contiguous segments per key and ties never straddle
       a block; exact output is block-assignment-invariant anyway.
    2. oversubscribed block count (8x parallelism, measured sweet spot
       — skewguard.BLOCK_OVERSUBSCRIPTION): (key, block) later
       hash-shuffles into shuffle partitions, and with only
       ~parallelism blocks the balls-into-bins collisions leave a
       third of the cluster idle; past ~512 blocks per-group overhead
       wins instead.
    3. per-(key, block) window — the hot sort, now split n_blocks
       ways — computes the plain path's exact lag/gap flag for every
       non-first row, plus the block-local running sum.
    4. per-(key, block) summary (reuses the window's partitioning):
       first/last epoch-micros and the count of in-block boundaries.
       A tiny per-key carry window over the summary resolves each
       block's first-row flag (gap vs the previous block's last row —
       the same expression the plain lag would have produced) and the
       boundary count carried from all earlier blocks.
    5. join the carry back on (key, block) — bounded right side, AQE
       broadcasts it — and emit carry + first_flag + local cum sum.

    NULL handling mirrors the plain window exactly: NULL ``ts`` sorts
    first (range partitioning and the window agree on NULLS FIRST
    asc), a row after a NULL-us row re-starts a session (lag is
    NULL), and an all-NULL block propagates NULL ``last_us`` so the
    next block's first row also re-starts — each case shared with the
    plain expression, and the property test plants them."""
    # r13: the carry join's two subtrees read ONE materialized block
    # assignment (skewguard.ranged_blocks localCheckpoints the ranged
    # frame) — block ids are reuse-independent by construction, retiring
    # the r12 sampler-determinism contract.  Cost and the
    # fault-tolerance trade are stated on the helper.
    withb = ranged_blocks(
        df,
        user_col,
        [F.col(ts_col).asc(), F.col(id_col).asc()],
        "_sz_blk",
    ).withColumn("_sz_us", F.unix_micros(F.col(ts_col)))

    w_blk = W.partitionBy(user_col, "_sz_blk").orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    prev = F.lag(F.col("_sz_us")).over(w_blk)
    # identical to the plain path's is_new for every non-first row;
    # the block's first row is resolved by the carry (rn == 1 -> 0)
    is_new_tail = F.when(
        prev.isNull() | ((F.col("_sz_us") - prev) > gap_us), 1
    ).otherwise(0)
    windowed = withb.withColumn(
        "_sz_isnew",
        F.when(F.row_number().over(w_blk) == 1, F.lit(0)).otherwise(is_new_tail),
    ).withColumn(
        "_sz_cum",
        F.sum("_sz_isnew").over(w_blk.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )

    summ = windowed.groupBy(user_col, "_sz_blk").agg(
        F.min("_sz_us").alias("_sz_first_us"),
        F.max("_sz_us").alias("_sz_last_us"),
        F.sum("_sz_isnew").alias("_sz_nb"),
    )
    w_c = W.partitionBy(user_col).orderBy("_sz_blk")
    prev_last = F.lag("_sz_last_us").over(w_c)
    carry = summ.withColumn(
        "_sz_first_flag",
        F.when(
            prev_last.isNull() | ((F.col("_sz_first_us") - prev_last) > gap_us), 1
        ).otherwise(0),
    ).withColumn(
        "_sz_carry",
        F.coalesce(
            F.sum(F.col("_sz_first_flag") + F.col("_sz_nb")).over(
                w_c.rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )

    joined = windowed.join(
        carry.select(
            F.col(user_col).alias("_sz_c_key"),
            F.col("_sz_blk").alias("_sz_c_blk"),
            "_sz_first_flag",
            "_sz_carry",
        ),
        F.col(user_col).eqNullSafe(F.col("_sz_c_key"))
        & (F.col("_sz_blk") == F.col("_sz_c_blk")),
        "left",
    )
    return joined.withColumn(
        "session_no",
        (F.col("_sz_carry") + F.col("_sz_first_flag") + F.col("_sz_cum")).cast(
            "long"
        ),
    ).drop(
        "_sz_us", "_sz_blk", "_sz_isnew", "_sz_cum",
        "_sz_c_key", "_sz_c_blk", "_sz_first_flag", "_sz_carry",
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
    hot_key_threshold: int | None = HOT_KEY_THRESHOLD,
) -> DataFrame:
    """Per-session rollup: bounds, event count, exact integer duration.
    On a hot-key-free corpus: the same single shuffle as ``sessionize``
    — the grouped agg reuses the (user) partitioning the window pass
    already established.

    The input is projected to the three columns the rollup reads BEFORE
    sessionizing (r13): in the plain path Catalyst prunes anyway (a
    no-op), but the segmented path MATERIALIZES the ranged frame at the
    width it is handed (the localCheckpoint freezes columns before
    downstream pruning can reach them), so a stats caller must not
    freeze payload columns it immediately drops."""
    s = sessionize(
        df.select(user_col, ts_col, id_col),
        user_col, ts_col, id_col, gap_minutes, hot_key_threshold,
    )
    return s.groupBy(user_col, "session_no").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))).alias(
            "duration_us"
        ),
    )
