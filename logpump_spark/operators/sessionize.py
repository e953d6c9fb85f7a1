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
  monotone in the sort order.  Block boundaries come from per-key
  ``percentile_approx`` over the epoch-micros order key, i.e. sampled
  range partitioning — equal ROW COUNTS per block, so a burst bot
  cannot re-concentrate the densest block the way fixed time-width
  blocks would (the r10-recorded obstacle).

The strategies are count-gated at plan-build time (one grouped count
with map-side partials + ``isEmpty`` — the same cardinality-bounded
routing pattern as the repo's fit/route collects): a corpus with no key
over ``hot_key_threshold`` compiles to EXACTLY the plain plan, keeping
the downstream exchange reuse (``session_stats`` rides the same
hashpartitioning) and paying only the detector aggregate.  With hot
keys present, only their rows take the segmented path; everyone else
still runs plain, and the two branches union.

Why per-key work was the last scale-killer: a window frame may not be
split mid-key, so AQE skew handling never applies — one user owning
10^7+ events is one straggler task however many executors exist
(measured 6.25x at 98% single-key skew, SCALING.md §4.1).  The
segmented path splits that one sort ``max(32, defaultParallelism)``
ways; the carry table is bounded by hot_keys x n_blocks rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .skewguard import cap_shards, over_threshold_keys

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

    hot = over_threshold_keys(df, hot_key_threshold, user_col)
    if hot.isEmpty():
        # no hot key -> compile the plain plan, nothing else in it
        return _sessionize_plain(df, user_col, ts_col, id_col, gap_us)

    flagged = df.join(
        hot.select(
            F.col(user_col).alias("_sz_hot_key"), F.lit(True).alias("_sz_hot")
        ),
        F.col(user_col).eqNullSafe(F.col("_sz_hot_key")),
        "left",
    )
    is_hot = F.coalesce(F.col("_sz_hot"), F.lit(False))
    under = flagged.filter(~is_hot).drop("_sz_hot_key", "_sz_hot")
    hot_rows = flagged.filter(is_hot).drop("_sz_hot_key", "_sz_hot")
    return _sessionize_plain(under, user_col, ts_col, id_col, gap_us).unionByName(
        _sessionize_segmented(hot_rows, user_col, ts_col, id_col, gap_us)
    )


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

    1. per-key block boundaries: ``percentile_approx`` of the
       epoch-micros order key at n_blocks-1 quantiles (bounded sketch
       state, map-side partials — the detector property again).  Any
       boundary set yields the correct answer; the quantiles only make
       the blocks row-balanced.
    2. block id = #(boundaries < us): non-decreasing along the
       (ts, id) sort order, so blocks are contiguous segments and
       equal-ts ties never straddle a block.
    3. per-(key, block) window — the hot sort, now split n_blocks
       ways — computes the plain path's exact lag/gap flag for every
       non-first row, plus the block-local running sum.
    4. per-(key, block) summary (reuses the window's partitioning):
       first/last epoch-micros and the count of in-block boundaries.
       A tiny per-key carry window over the summary resolves each
       block's first-row flag (gap vs the previous block's last row —
       the same expression the plain lag would have produced) and the
       boundary count carried from all earlier blocks.
    5. join the carry back on (key, block) — partitioning already
       matches — and emit carry + first_flag + local running sum.

    NULL handling mirrors the plain window exactly: NULL ``us`` sorts
    first (block 0 — the boundary lambda yields false), a row after a
    NULL-us row re-starts a session (lag is NULL), and an all-NULL
    block propagates NULL ``last_us`` so the next block's first row
    also re-starts — each case shared with the plain expression, and
    the property test plants them."""
    n_blocks = cap_shards(df)
    us_col = F.unix_micros(F.col(ts_col))
    with_us = df.withColumn("_sz_us", us_col)

    qs = [i / n_blocks for i in range(1, n_blocks)]
    bounds = with_us.groupBy(user_col).agg(
        F.percentile_approx("_sz_us", qs, 10_000).alias("_sz_bounds")
    )
    withb = (
        with_us.join(
            bounds.select(
                F.col(user_col).alias("_sz_b_key"), "_sz_bounds"
            ),
            F.col(user_col).eqNullSafe(F.col("_sz_b_key")),
            "left",
        )
        .withColumn(
            "_sz_blk",
            F.size(F.filter(F.col("_sz_bounds"), lambda x: x < F.col("_sz_us"))),
        )
        .drop("_sz_b_key", "_sz_bounds")
    )

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
    already established."""
    s = sessionize(df, user_col, ts_col, id_col, gap_minutes, hot_key_threshold)
    return s.groupBy(user_col, "session_no").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max(ts_col)) - F.unix_micros(F.min(ts_col))).alias(
            "duration_us"
        ),
    )
