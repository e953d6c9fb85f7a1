"""Time-series operators: calendar gap filling with forward fill (the
ClickHouse ``ORDER BY ... WITH FILL`` analog) and z-score anomaly
flagging over per-key daily series.

Shapes chosen for scale:
- gap_fill: the date spine comes from one per-key (min, max) aggregate
  exploded with ``sequence()`` — never a cross join against a global
  calendar; the spine left-joins the daily aggregate on (key, day) and
  forward-fills with ``last(ignorenulls)`` over the key window.  Two
  shuffles on the key total (agg + window share partitioning).
- zscore: mean/variance derive from exact integer power sums
  (SUM(x), SUM(x^2), n) per key, so any engine computes identical
  doubles from identical integers — no Welford-vs-naive ULP drift —
  and one final rounded division absorbs nothing because there is
  nothing to absorb.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .skewguard import over_threshold_keys, ranged_blocks


def gap_fill_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    forward_fill: bool = True,
) -> DataFrame:
    """Fill missing calendar days per key.  Returns one row per
    (key, day) between the key's first and last day: observed days carry
    their daily aggregate (count + integer value sum), missing days get
    n_events=0 and (optionally) the last observed sum forward-filled."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    daily = df.select(F.col(key_col), day.alias("day"), F.col(value_col)).groupBy(
        key_col, "day"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        # quantized integer sum: engine-exact (memory: raw double sums
        # drift in fold order)
        F.sum(F.floor(F.col(value_col) * 10000).cast("long")).alias("qsum"),
    )
    spine = (
        daily.groupBy(key_col)
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            key_col,
            F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
        )
    )
    joined = spine.join(daily, [key_col, "day"], "left")
    out = joined.withColumn("n_events", F.coalesce("n_events", F.lit(0)))
    if forward_fill:
        w = (
            W.partitionBy(key_col)
            .orderBy("day")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        out = out.withColumn("qsum_ff", F.last("qsum", ignorenulls=True).over(w))
    return out


def zscore_anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Days whose event count deviates from the key's mean by more than
    ``z_threshold`` population standard deviations.

    Moments come from exact integer sums: with n, s1 = sum(x),
    s2 = sum(x^2) all int64, variance = (n*s2 - s1^2) / n^2 is one
    double expression over exact integers — bit-identical in any engine.
    Keys with zero variance never flag (every day equals the mean)."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    daily = (
        df.select(F.col(key_col), day.alias("day"))
        .groupBy(key_col, "day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    wk = W.partitionBy(key_col)
    stats = (
        daily.withColumn("n", F.count(F.lit(1)).over(wk))
        .withColumn("s1", F.sum("x").over(wk))
        .withColumn("s2", F.sum(F.col("x") * F.col("x")).over(wk))
    )
    var = (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")) / (
        F.col("n") * F.col("n")
    )
    mean = F.col("s1") / F.col("n")
    z = (F.col("x") - mean) / F.sqrt(var)
    return (
        stats.withColumn("z", F.round(z, 6))
        .filter(F.sqrt(var) > 0)
        .filter(F.abs(F.col("z")) > z_threshold)
        .select(key_col, "day", "x", "z")
    )


def ewma_daily(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    half_lives: int = 8,
) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 1/2) of the per-key
    daily quantized value sum, truncated to the last ``half_lives``
    observed days — the smoothing shape behind rate dashboards and
    alerting baselines over tech-log volumes.

    Exactness: with alpha = 1/2 the weights are the integers
    2^(half_lives-1-k) for lag k, so numerator and denominator are exact
    int64 sums over LAG values and the EWMA is ONE floored division of
    exact integers — any engine replays it bit-identically (same trick
    as zscore_anomalies' power sums).  Truncation bounds the weight
    vector; beyond 8 half-lives the dropped tail contributes < 0.4% and
    an untruncated recursive EWMA has no order-exact cross-engine form.

    Scale shape: one groupBy shuffle on (key, day), then one window
    sorted per key reused by all LAG terms — the window state is O(lags)
    per key, no spine join, no self-join per lag.
    """
    day = F.date_trunc("day", F.col(ts_col)).cast("date")
    daily = (
        df.select(F.col(key_col), day.alias("day"), F.col(value_col))
        .groupBy(key_col, "day")
        .agg(F.sum(F.floor(F.col(value_col) * 10000).cast("long")).alias("qsum"))
    )
    w = W.partitionBy(key_col).orderBy("day")
    num = F.lit(0).cast("long")
    den = F.lit(0).cast("long")
    for k in range(half_lives):
        weight = 1 << (half_lives - 1 - k)
        lagged = F.lag("qsum", k).over(w) if k else F.col("qsum")
        num = num + F.coalesce(lagged * F.lit(weight), F.lit(0))
        den = den + F.when(lagged.isNotNull(), F.lit(weight)).otherwise(F.lit(0))
    return daily.withColumn("ewma_q", F.floor(num / den).cast("long"))


def ohlc_resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """OHLC downsampling (the ClickHouse first_value/last_value-per-
    bucket reporting shape): per (key, time bucket) the opening value,
    closing value, high, low, count, and volume.

    Values are floor-quantized to int64 first, so every aggregate is
    exact; open/close come from row_numbers over (ts, id) — the unique
    id tiebreak makes first/last engine-deterministic even with
    duplicate timestamps.  One shuffle on (key, bucket) drives both the
    window and the final aggregate (same partitioning, AQE reuses it).
    """
    b = F.date_trunc(bucket, F.col(ts_col))
    qv = F.floor(F.col(value_col) * 10000).cast("long")
    base = df.select(
        F.col(key_col), b.alias("bucket"), qv.alias("qv"),
        F.col(ts_col).alias("_ts"), F.col(id_col).alias("_id"),
    )
    w_a = W.partitionBy(key_col, "bucket").orderBy(
        F.col("_ts").asc(), F.col("_id").asc()
    )
    w_d = W.partitionBy(key_col, "bucket").orderBy(
        F.col("_ts").desc(), F.col("_id").desc()
    )
    marked = base.withColumn("rn_a", F.row_number().over(w_a)).withColumn(
        "rn_d", F.row_number().over(w_d)
    )
    return marked.groupBy(key_col, "bucket").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("qv"))).alias("open_q"),
        F.max(F.when(F.col("rn_d") == 1, F.col("qv"))).alias("close_q"),
        F.max("qv").alias("high_q"),
        F.min("qv").alias("low_q"),
        F.count(F.lit(1)).alias("n"),
        F.sum("qv").alias("volume_q"),
    )


#: inter-arrival hot-type gate: below it the plain per-key LAG window
#: compiles (the classic plan the bench and oracle fixtures see —
#: sf0.1's largest event_type holds ~20k rows); above it one key owns
#: enough rows that its single-task sort is the stage wall and the
#: segmented rebuild wins.  Same 1M default as sessionize's
#: HOT_KEY_THRESHOLD — the two shapes have the same single-task-per-key
#: cost model (one global per-key sort).
GAPS_HOT_THRESHOLD = 1_000_000


def inter_arrival_gaps(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    hot_key_threshold: int | None = GAPS_HOT_THRESHOLD,
) -> DataFrame:
    """(key, gap_us) rows: the multiset of µs gaps between CONSECUTIVE
    events per key in (unix_micros(ts), id) order — the input to any
    inter-arrival distribution statistic (timeseries_gaps' p50/p95/max).

    Count-gated like the segmented window family (r16, VERDICT r15
    item 2): with no key over ``hot_key_threshold`` the plain LAG
    window compiles — identical to the historical timeseries_gaps
    plan.  A hot key routes through ``skewguard.ranged_blocks``: the
    per-key sort splits into range blocks, LAG runs block-locally, and
    the one gap each block boundary hides is patched from a bounded
    per-(key, block) first/last table — |blocks| rows per key, never
    the corpus.  EXACT, not an approximation: blocks are contiguous
    segments of the per-key sort, so block-local consecutive pairs plus
    one boundary pair per adjacent block pair enumerate exactly the
    key's consecutive pairs (multiset equality pinned in
    tests/test_timeseries_gaps_segmented.py, and gap statistics are
    multiset functions — LAG direction, like LEAD-based gaps, yields
    the same multiset).  ``hot_key_threshold=None`` forces the plain
    window (expert escape hatch, mirrors the segwin family)."""
    us = F.unix_micros(F.col(ts_col))
    if hot_key_threshold is not None and not over_threshold_keys(
        df, hot_key_threshold, key_col
    ).isEmpty():
        order = [F.col("_ia_us").asc(), F.col(id_col).asc()]
        base = df.select(F.col(key_col), us.alias("_ia_us"), F.col(id_col))
        ranged = ranged_blocks(base, key_col, order, "_ia_blk")
        w_blk = W.partitionBy(key_col, "_ia_blk").orderBy(*order)
        local = (
            ranged.select(
                F.col(key_col),
                (F.col("_ia_us") - F.lag("_ia_us").over(w_blk)).alias("gap_us"),
            )
            .filter(F.col("gap_us").isNotNull())
        )
        # struct min/max order NULL fields first, matching the window's
        # asc NULLS FIRST (the seglead heads precedent) — a NULL-ts row
        # sorts first either way and its gap is NULL-filtered in both
        # branches
        pair = F.struct(F.col("_ia_us"), F.col(id_col))
        bounds = ranged.groupBy(key_col, "_ia_blk").agg(
            F.min(pair).alias("_ia_first"), F.max(pair).alias("_ia_last")
        )
        w_key = W.partitionBy(key_col).orderBy(F.col("_ia_blk").asc())
        boundary = (
            bounds.withColumn(
                "_ia_prev_us", F.lag(F.col("_ia_last._ia_us")).over(w_key)
            )
            .select(
                F.col(key_col),
                (F.col("_ia_first._ia_us") - F.col("_ia_prev_us")).alias(
                    "gap_us"
                ),
            )
            .filter(F.col("gap_us").isNotNull())
        )
        return local.unionByName(boundary)
    w = W.partitionBy(key_col).orderBy(us.asc(), F.col(id_col).asc())
    return df.select(
        F.col(key_col), (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())


def time_decayed_by_type(
    events: DataFrame,
    tau_us: int = 86400 * 1_000_000,
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """ClickHouse ``exponentialTimeDecayedSum/Avg`` at the series end +
    ``boundingRatio``: per type, the recency-weighted sum/avg of
    ``value_col`` with w = exp(-(T_end - t)/tau) where T_end is the
    corpus maximum timestamp (1-row broadcast), plus the end-to-end
    slope per hour from row_number endpoints.  NOTE the recompute
    contract: T_end moves when newer data arrives, re-weighting every
    earlier event — streaming deployments must accumulate-and-recompute
    (tests/test_stream_intervals.py pins this), never merge per-batch
    decayed sums."""
    ev = events.filter(F.col(value_col).isNotNull())
    t_end = ev.agg(F.max(F.unix_micros(ts_col)).alias("t_end"))
    d = ev.crossJoin(F.broadcast(t_end))
    w = F.exp(
        -(F.col("t_end") - F.unix_micros(ts_col)).cast("double")
        / F.lit(float(tau_us))
    )
    sums = d.groupBy(type_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col) * w).alias("dsum"),
        F.sum(w).alias("dw"),
    )

    wt = W.partitionBy(type_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    wt_desc = W.partitionBy(type_col).orderBy(
        F.col(ts_col).desc(), F.col(id_col).desc()
    )
    ends = (
        ev.withColumn("rn_a", F.row_number().over(wt))
        .withColumn("rn_d", F.row_number().over(wt_desc))
        .filter((F.col("rn_a") == 1) | (F.col("rn_d") == 1))
        .groupBy(type_col)
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col(value_col))).alias("first_v"),
            F.max(F.when(F.col("rn_d") == 1, F.col(value_col))).alias("last_v"),
            F.max(
                F.when(F.col("rn_a") == 1, F.unix_micros(ts_col))
            ).alias("first_us"),
            F.max(
                F.when(F.col("rn_d") == 1, F.unix_micros(ts_col))
            ).alias("last_us"),
        )
    )
    hours = (F.col("last_us") - F.col("first_us")).cast("double") / F.lit(3.6e9)
    return sums.join(ends, type_col).select(
        type_col,
        "n_events",
        F.round(F.col("dsum"), 6).alias("decayed_sum"),
        F.round(F.col("dsum") / F.col("dw"), 6).alias("decayed_avg"),
        F.round((F.col("last_v") - F.col("first_v")) / hours, 6).alias(
            "slope_per_hour"
        ),
    )
