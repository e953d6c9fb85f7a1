"""ClickHouse-style behavioral analytics: windowFunnel and retention.

The reference delegates its analytical surface to ClickHouse
(SURVEY.md §2.F); funnels and retention cohorts are the bread-and-butter
queries its users run there, so the engine carries first-class
equivalents.

Both are expressed as chained per-key aggregations that REUSE one hash
partitioning on the user key: step N's minimum-timestamp aggregate joins
back on user_id, which Catalyst satisfies with the existing
hashpartitioning(user_id) — N funnel steps cost ONE shuffle of the
events, not N.  No collect_list of a user's full history is ever built
(unbounded per-user state is the thing that OOMs at 100 TB).

Funnel semantics (greedy-earliest, documented divergence from
ClickHouse's any-start search): t1 = earliest step-1 event; t_k =
earliest step-k event after t_{k-1} and within ``window`` of t1.  The
greedy chain is deterministic and SQL-expressible, so the oracle can
replay it exactly; ClickHouse's windowFunnel scans every candidate
start, which can only extend the window forward in time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .seglead import lead_ints_segmented
from .sessionize import HOT_KEY_THRESHOLD
from .skewguard import first_n_per_key, over_threshold_keys


def window_funnel(
    events: DataFrame,
    steps: list[Column],
    window_hours: int = 24,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_events_per_user: int | None = None,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-user funnel level: how many of ``steps`` completed in order,
    starting at the earliest step-1 event, within ``window_hours`` of it.
    Returns (user_col, level, t1..tN timestamps of the matched chain).

    ``max_events_per_user``: OPT-IN hot-key guard (SCALING.md §4.1) —
    restrict the funnel to each user's first N events (by ts, tiebreak).
    This deliberately CHANGES semantics (a step completed after a user's
    N-th event no longer counts), which is why the default is uncapped.

    The cap itself is skew-proof (r10; the r8 single-window form was
    not — its row_number sorted the WHOLE hot partition before
    filtering, so at 98% skew the cap was the straggler it claimed to
    guard).  The count-gated two-stage exact first-N lives in
    ``operators/skewguard.py:first_n_per_key`` (shared r11 with the
    strict funnel and sequenceCount) — see its docstring for the
    stage-by-stage shape and the no-broadcast-hint rationale."""
    window_us = window_hours * 3600 * 1_000_000
    us = F.unix_micros(F.col(ts_col))

    if max_events_per_user is not None:
        events = first_n_per_key(
            events, max_events_per_user, user_col, ts_col, tiebreak_col
        )

    # t1: earliest step-1 event per user
    cur = events.filter(steps[0]).groupBy(user_col).agg(F.min(ts_col).alias("t1"))
    for k in range(2, len(steps) + 1):
        nxt = (
            events.join(cur, user_col)
            .filter(
                steps[k - 1]
                & (us > F.unix_micros(F.col(f"t{k - 1}")))
                & (us <= F.unix_micros(F.col("t1")) + window_us)
            )
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{k}"))
        )
        cur = cur.join(nxt, user_col, "left")
    # build ascending so the HIGHEST completed step is the outermost test
    level = F.lit(0)
    for k in range(1, len(steps) + 1):
        level = F.when(F.col(f"t{k}").isNotNull(), k).otherwise(level)
    return cur.withColumn("level", level.cast("int"))


def retention(
    events: DataFrame,
    conds: list[Column],
    user_col: str = "user_id",
) -> DataFrame:
    """ClickHouse ``retention``: one row per user with r1..rN flags —
    r1 = cond1 fired at least once; rk = r1 AND condk fired.  A single
    grouped aggregation (one shuffle, N fused max-aggregates)."""
    flags = [
        F.max(F.when(c, F.lit(1)).otherwise(F.lit(0))).alias(f"f{i}")
        for i, c in enumerate(conds, 1)
    ]
    g = events.groupBy(user_col).agg(*flags)
    out = [F.col("f1").alias("r1")]
    out += [
        (F.col("f1") * F.col(f"f{i}")).alias(f"r{i}") for i in range(2, len(conds) + 1)
    ]
    return g.select(user_col, *out)


def retention_summary(
    events: DataFrame,
    conds: list[Column],
    user_col: str = "user_id",
) -> DataFrame:
    """Cohort rollup of ``retention``: one row of r1..rN user counts."""
    r = retention(events, conds, user_col)
    return r.agg(
        *[F.sum(f"r{i}").alias(f"n_r{i}") for i in range(1, len(conds) + 1)]
    )


def window_funnel_strict(
    events: DataFrame,
    steps: list[Column],
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    max_events_per_user: int | None = None,
    hot_key_threshold: int | None = HOT_KEY_THRESHOLD,
) -> DataFrame:
    """ClickHouse ``windowFunnel(... , 'strict_order')`` analog: the
    step chain must be CONSECUTIVE in the user's full event stream — any
    interleaved event (matching a step or not) breaks it.  Anchored at
    the user's earliest step-1 event (deterministic, so the oracle can
    replay it; ClickHouse scans every candidate start).

    Two physical strategies, one semantics (r12 — the per-row lookahead
    is BOUNDED by len(steps)-1, so the segmented treatment applies):

    - **plain**: label each event with its step number, then ``lead``
      over one user-partitioned sort answers "are the next k-1 events
      exactly steps 2..k" — one shuffle on the user key, two window
      passes over the same sort, per-row state bounded by len(steps).
    - **segmented** (hot keys only, count-gated like sessionize): the
      same leads computed block-locally via ``seglead.
      lead_ints_segmented`` with a bounded heads carry, then the
      earliest anchor picked per key by a skew-proof min(struct)
      aggregate instead of a per-key window — EXACT, property-pinned
      against plain (tests/test_seglead.py).

    Returns (user_col, ts of the anchor, level).

    ``max_events_per_user``: OPT-IN semantics-CHANGING cap (restrict to
    each user's first N events via ``skewguard.first_n_per_key``) —
    retained for callers who want first-N semantics; no longer needed
    as a scale guard now the exact segmented path exists.  A cap at or
    below the hot threshold bounds every key, so the detector is
    skipped and the plain plan compiles."""
    from pyspark.sql import Window as W

    if max_events_per_user is not None:
        events = first_n_per_key(
            events, max_events_per_user, user_col, ts_col, tiebreak_col
        )

    lbl = None
    for i, s in enumerate(steps, 1):
        lbl = F.when(s, i) if lbl is None else lbl.when(s, i)
    lbl = lbl.otherwise(0)
    depth = len(steps) - 1

    segmented = (
        depth >= 1
        and hot_key_threshold is not None
        and (max_events_per_user is None or max_events_per_user > hot_key_threshold)
        and not over_threshold_keys(events, hot_key_threshold, user_col).isEmpty()
    )

    if segmented:
        d = events.select(
            user_col, ts_col, tiebreak_col, lbl.cast("int").alias("lbl")
        )
        df = lead_ints_segmented(
            d, "lbl", depth, user_col, ts_col, tiebreak_col
        )
    else:
        w = W.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
        df = events.withColumn("lbl", lbl.cast("int"))
        for j in range(1, len(steps)):
            df = df.withColumn(f"nxt{j}", F.lead("lbl", j).over(w))

    # level at an anchor row: longest prefix with nxt_j == j+1
    level = F.lit(1)
    cond = F.lit(True)
    for j in range(1, len(steps)):
        cond = cond & (F.col(f"nxt{j}") == j + 1)
        level = F.when(cond, j + 1).otherwise(level)
    anchors = df.filter(F.col("lbl") == 1)

    if segmented:
        # earliest anchor per key WITHOUT a per-key window: (blk, rn) is
        # monotone in the global (ts, id) sort, both non-null ints, so a
        # min(struct) aggregate (map-side partials, skew-proof) picks the
        # same row the plain row_number()==1 filter does
        m = anchors.groupBy(user_col).agg(
            F.min(
                F.struct(
                    F.col("_sl_blk"),
                    F.col("_sl_rn"),
                    F.col(ts_col).alias("ats"),
                    level.cast("int").alias("lv"),
                )
            ).alias("m")
        )
        return m.select(
            user_col,
            F.col("m.ats").alias("anchor_ts"),
            F.col("m.lv").alias("level"),
        )

    w = W.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    # same window spec as the lead() pass — ONE sort serves both
    return (
        anchors.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            user_col,
            F.col(ts_col).alias("anchor_ts"),
            level.cast("int").alias("level"),
        )
    )


def sequence_count_adjacent(
    events: DataFrame,
    first: Column,
    second: Column,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    max_events_per_user: int | None = None,
    hot_key_threshold: int | None = HOT_KEY_THRESHOLD,
) -> DataFrame:
    """ClickHouse ``sequenceCount`` (strict-order form): per-user count
    of events matching ``first`` IMMEDIATELY followed in the full
    ordered stream by an event matching ``second`` — occurrence
    counting, where ``window_funnel_strict`` stops at the first anchor.
    One lead() over one user-partitioned sort, then a per-user
    conditional count; per-row state is one label.  A hot key routes
    the lead through ``seglead.lead_ints_segmented`` (count-gated like
    sessionize; exact — the lookback is a single following row) and the
    per-user count is already a skew-proof grouped aggregate.  Returns
    (user_col, n_matches) for every user with at least one event.

    ``max_events_per_user``: OPT-IN semantics-CHANGING cap (count only
    within each user's first N events via ``skewguard.
    first_n_per_key``) — retained for first-N semantics; no longer
    needed as a scale guard.  A cap at or below the hot threshold
    bounds every key, so the detector is skipped and the plain plan
    compiles."""
    from pyspark.sql import Window as W

    if max_events_per_user is not None:
        events = first_n_per_key(
            events, max_events_per_user, user_col, ts_col, tiebreak_col
        )

    lbl = F.when(first, 1).when(second, 2).otherwise(0)
    d = events.select(user_col, ts_col, tiebreak_col, lbl.alias("lbl"))
    segmented = (
        hot_key_threshold is not None
        and (max_events_per_user is None or max_events_per_user > hot_key_threshold)
        and not over_threshold_keys(d, hot_key_threshold, user_col).isEmpty()
    )
    if segmented:
        d = lead_ints_segmented(
            d, "lbl", 1, user_col, ts_col, tiebreak_col, out_prefix="nxt"
        ).withColumnRenamed("nxt1", "nxt")
    else:
        w = W.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
        d = d.withColumn("nxt", F.lead("lbl").over(w))
    return d.groupBy(user_col).agg(
        F.sum(
            F.when((F.col("lbl") == 1) & (F.col("nxt") == 2), 1).otherwise(0)
        ).alias("n_matches")
    )


def sequence_next_node(
    events: DataFrame,
    anchor: Column,
    value_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    hot_key_threshold: int | None = HOT_KEY_THRESHOLD,
) -> DataFrame:
    """ClickHouse ``sequenceNextNode('forward', 'head')`` analog: per
    user, the ``value_col`` of the event IMMEDIATELY following the
    user's first ``anchor`` event in the full ordered stream (NULL when
    that anchor is the user's last event).  Returns (user_col,
    next_value) for users with at least one anchor event.

    Same bounded-lookahead family as ``sequence_count_adjacent`` — one
    lead(1) over one user-partitioned sort; a hot key routes through
    ``seglead.lead_ints_segmented`` (count-gated, exact) and the
    earliest anchor is then picked by a skew-proof min(struct(blk, rn,
    value)) aggregate instead of a per-key row_number window.

    ``anchor`` may reference ANY column of ``events``: it is evaluated
    on the full frame into a flag BEFORE the narrow-row projection the
    segmented sort rides (the projection is the family's
    ~30-bytes/row discipline, not an input restriction)."""
    from pyspark.sql import Window as W

    d = events.withColumn("_nn_anchor", anchor).select(
        user_col, ts_col, tiebreak_col, value_col, "_nn_anchor"
    )
    segmented = (
        hot_key_threshold is not None
        and not over_threshold_keys(d, hot_key_threshold, user_col).isEmpty()
    )
    if segmented:
        led = lead_ints_segmented(
            d, value_col, 1, user_col, ts_col, tiebreak_col, out_prefix="_nn"
        )
        anchors = led.filter(F.col("_nn_anchor"))
        m = anchors.groupBy(user_col).agg(
            F.min(
                F.struct(
                    F.col("_sl_blk"),
                    F.col("_sl_rn"),
                    F.col("_nn1").alias("nx"),
                )
            ).alias("m")
        )
        return m.select(user_col, F.col("m.nx").alias("next_value"))

    w = W.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    led = d.withColumn("_nn1", F.lead(value_col).over(w))
    anchors = led.filter(F.col("_nn_anchor"))
    return (
        anchors.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(user_col, F.col("_nn1").alias("next_value"))
    )


def window_funnel_strict_dedup(
    events: DataFrame,
    steps: list[Column],
    window_hours: int = 24,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """ClickHouse ``windowFunnel(..., 'strict_dedup')`` analog on the
    greedy-earliest chain: a repeat of an ALREADY-matched condition
    strictly between two matched steps interrupts the chain at the
    earlier level (the mode users reach for when "view, view, click"
    must not count as progress past the first view).

    Shape: the same chained per-key aggregation loop as
    ``window_funnel`` — each step k adds one min-aggregate join and one
    violation-scan join, ALL reusing the single hashpartitioning on the
    user key, so N steps still cost one shuffle of the events.  The
    violation scan is itself an aggregate (first hit per user), never a
    per-user history.  Returns (user_col, t1, level)."""
    window_us = window_hours * 3600 * 1_000_000
    us = F.unix_micros(F.col(ts_col))

    lbl = None
    for i, s in enumerate(steps, 1):
        lbl = F.when(s, i) if lbl is None else lbl.when(s, i)
    lab = events.select(
        user_col, F.col(ts_col), lbl.otherwise(0).alias("lbl")
    ).filter(F.col("lbl") > 0)

    cur = events.filter(steps[0]).groupBy(user_col).agg(F.min(ts_col).alias("t1"))
    for k in range(2, len(steps) + 1):
        nxt = (
            events.join(cur, user_col)
            .filter(
                steps[k - 1]
                & (us > F.unix_micros(F.col(f"t{k - 1}")))
                & (us <= F.unix_micros(F.col("t1")) + window_us)
            )
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{k}"))
        )
        cur = cur.join(nxt, user_col, "left")
        viol = (
            lab.join(cur.select(user_col, f"t{k - 1}", f"t{k}"), user_col)
            .filter(
                (F.col("lbl") < k)
                & (us > F.unix_micros(F.col(f"t{k - 1}")))
                & (us < F.unix_micros(F.col(f"t{k}")))
            )
            .groupBy(user_col)
            .agg(F.lit(1).alias(f"viol{k}"))
        )
        cur = cur.join(viol, user_col, "left")

    level = F.lit(1)
    ok = F.lit(True)
    for k in range(2, len(steps) + 1):
        ok = ok & F.col(f"t{k}").isNotNull() & F.col(f"viol{k}").isNull()
        level = F.when(ok, k).otherwise(level)
    return cur.select(user_col, "t1", level.cast("int").alias("level"))
