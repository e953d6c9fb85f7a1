"""Driver-facing queries for the behavioral-analytics operators
(ClickHouse windowFunnel / retention analogs over the events table)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.funnel import retention, window_funnel
from ..tables import load


def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel, 24 h window, greedy-earliest
    chain (operators/funnel.py); per-user matched chain + level."""
    ev = load(spark, sf_dir, "events")
    steps = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    out = window_funnel(ev, steps, window_hours=24)
    return out.select("user_id", "t1", "t2", "t3", "level")


_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click'
    AND epoch_us(e.ts) > epoch_us(s1.t1)
    AND epoch_us(e.ts) <= epoch_us(s1.t1) + 86400000000::BIGINT
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase'
    AND epoch_us(e.ts) > epoch_us(s2.t2)
    AND epoch_us(e.ts) <= epoch_us(s1.t1) + 86400000000::BIGINT
  GROUP BY e.user_id
)
SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
       CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3
                 WHEN s2.t2 IS NOT NULL THEN 2
                 ELSE 1 END AS INT) AS level
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
ORDER BY user_id
"""


def retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user retention flags: signed up; signed up AND clicked;
    signed up AND purchased (ClickHouse retention semantics)."""
    ev = load(spark, sf_dir, "events")
    conds = [
        F.col("event_type") == "signup",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    return retention(ev, conds)


_RETENTION_SQL = """
SELECT user_id,
  MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r1,
  MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
    * MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS r2,
  MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
    * MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS r3
FROM events GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Hot-key pre-flight (SCALING.md §4.1 "detection first", promoted to a
# first-class operator in r8): ONE cheap grouped pass over the fact
# table answers "can the user-key window family run here, or does a
# bot/test-rig own the corpus?" before any per-key ordered job starts.
# Output: a log2 histogram of per-key row counts (how many keys per size
# decade, rows they hold) plus the top-N hottest keys with their corpus
# share in ppm.
#
# Exactness: the size bucket is length(bin(cnt)) - 1 == floor(log2 cnt)
# computed on the INTEGER's binary representation (never a libm log2,
# whose last-ulp wobble flips the bucket at exact powers of two), and
# the ppm share is one integer division — both engines replay them
# bit-identically.
#
# 100 TB shape: groupBy(key) with map-side partials is the cheapest
# possible full-table pass; everything after it sees |keys| rows, the
# top-N is a TakeOrdered (never a global sort), and the 1-row total is
# a broadcast.

_SKEW_TOP_N = 5


def skew_key_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user-key size histogram + top-5 hot keys over events.
    Returns (kind, k, n_keys, rows_held, share_ppm): kind='hist' rows
    keyed by log2-size bucket, kind='hot_key' rows keyed by user_id."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    hist = (
        counts.groupBy(
            (F.length(F.bin("cnt")) - 1).cast("long").alias("k")
        )
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").alias("rows_held"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            F.lit("hist").alias("kind"),
            "k",
            "n_keys",
            "rows_held",
            F.expr("CAST(FLOOR(CAST(rows_held AS DOUBLE) * 1000000.0 / total) AS BIGINT)").alias("share_ppm"),
        )
    )
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("user_id").asc_nulls_last())
        .limit(_SKEW_TOP_N)
        .crossJoin(F.broadcast(total))
        .select(
            F.lit("hot_key").alias("kind"),
            F.col("user_id").alias("k"),
            F.lit(1).cast("long").alias("n_keys"),
            F.col("cnt").alias("rows_held"),
            F.expr("CAST(FLOOR(CAST(cnt AS DOUBLE) * 1000000.0 / total) AS BIGINT)").alias("share_ppm"),
        )
    )
    return hist.unionByName(top)


_SKEW_HIST_SQL = f"""
WITH counts AS (
  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id
),
tot AS (SELECT SUM(cnt) AS total FROM counts)
SELECT 'hist' AS kind, CAST(length(bin(cnt)) - 1 AS BIGINT) AS k,
       COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS rows_held,
       CAST(FLOOR(CAST(SUM(cnt) AS DOUBLE) * 1000000.0
                  / (SELECT total FROM tot)) AS BIGINT) AS share_ppm
FROM counts GROUP BY 2
UNION ALL
SELECT 'hot_key', user_id, CAST(1 AS BIGINT), cnt,
       CAST(FLOOR(CAST(cnt AS DOUBLE) * 1000000.0
            / (SELECT total FROM tot)) AS BIGINT)
FROM (SELECT * FROM counts ORDER BY cnt DESC, user_id ASC LIMIT {_SKEW_TOP_N})
"""


_FUNNEL_CAP = 15  # binds on the synthetic data (min ~45 events/user), so the
# driver gate exercises the prefix truncation, not just the prefix plumbing


def funnel_steps_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same view->click->purchase funnel restricted to each user's
    first ``_FUNNEL_CAP`` events — the opt-in §4.1 straggler guard
    (window_funnel(max_events_per_user=N)) as a registered, value-
    oracled query; the pytest pin (tests/test_round8_ops.py) proves
    cap >= per-user volume reproduces the uncapped result exactly."""
    ev = load(spark, sf_dir, "events")
    steps = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    out = window_funnel(
        ev, steps, window_hours=24, max_events_per_user=_FUNNEL_CAP
    )
    return out.select("user_id", "t1", "t2", "t3", "level")


_FUNNEL_CAPPED_SQL = f"""
WITH ev AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS _rn
    FROM events
  ) WHERE _rn <= {_FUNNEL_CAP}
),
s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM ev e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click'
    AND epoch_us(e.ts) > epoch_us(s1.t1)
    AND epoch_us(e.ts) <= epoch_us(s1.t1) + 86400000000::BIGINT
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM ev e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase'
    AND epoch_us(e.ts) > epoch_us(s2.t2)
    AND epoch_us(e.ts) <= epoch_us(s1.t1) + 86400000000::BIGINT
  GROUP BY e.user_id
)
SELECT s1.user_id, s1.t1, s2.t2, s3.t3,
       CAST(CASE WHEN s3.t3 IS NOT NULL THEN 3
                 WHEN s2.t2 IS NOT NULL THEN 2
                 ELSE 1 END AS INT) AS level
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""


SPARK_QUERIES = {
    "funnel_steps": funnel_steps,
    "retention_cohort": retention_cohort,
    "skew_key_histogram": skew_key_histogram,
    "funnel_steps_capped": funnel_steps_capped,
}

ORACLE_SQL = {
    "funnel_steps": _FUNNEL_SQL,
    "retention_cohort": _RETENTION_SQL,
    "skew_key_histogram": _SKEW_HIST_SQL,
    "funnel_steps_capped": _FUNNEL_CAPPED_SQL,
}


def trending_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending items: top-2 event types per DAY by event count with the
    day-over-day count delta — the time-bucketed grouped top-k every
    monitoring dashboard runs.  The rank window partitions by day, so
    WindowGroupLimit prunes per input partition and no day funnels
    through a global sort; the delta lag rides the event_type
    partitioning."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").cast("string").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w_lag = W.partitionBy("event_type").orderBy("day")
    # event_type carries NULLs under the null robustness twin; pin the
    # rank tiebreak to DuckDB's ASC NULLS LAST default
    w_rank = W.partitionBy("day").orderBy(
        F.col("n").desc(), F.col("event_type").asc_nulls_last()
    )
    return (
        daily.withColumn("prev_n", F.lag("n").over(w_lag))
        .withColumn("delta", F.col("n") - F.coalesce("prev_n", F.col("n")))
        .withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= 2)
        .select("day", "event_type", "n", "delta", "rk")
        .orderBy("day", "rk")
    )


_TRENDING_SQL = """
WITH daily AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
x AS (
  SELECT day, event_type, n,
         n - COALESCE(LAG(n) OVER (PARTITION BY event_type ORDER BY day), n)
           AS delta,
         ROW_NUMBER() OVER (PARTITION BY day
                            ORDER BY n DESC, event_type) AS rk
  FROM daily
)
SELECT day, event_type, n, CAST(delta AS BIGINT) AS delta, CAST(rk AS INT) AS rk
FROM x WHERE rk <= 2 ORDER BY day, rk
"""

SPARK_QUERIES["trending_topk"] = trending_topk
ORACLE_SQL["trending_topk"] = _TRENDING_SQL


def cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 history build (the warehouse-dimension twin of
    `cdc_latest_wins`): each user's event_type stream collapses to
    validity intervals — consecutive identical values merge into one
    interval, valid_to = next CHANGE's timestamp, the open interval is
    current.  Both window passes (change detection via lag, interval
    close via lead) ride ONE user_id shuffle; (ts, event_id) ordering
    makes duplicate timestamps deterministic."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    base = ev.select("user_id", "event_type", us.alias("us"), "event_id")
    changes = (
        base.withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
    )
    w2 = W.partitionBy("user_id").orderBy("us", "event_id")
    return (
        changes.withColumn("valid_to", F.lead("us").over(w2))
        .select(
            "user_id",
            F.col("event_type").alias("status"),
            F.col("us").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


_SCD2_SQL = """
WITH base AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
),
changes AS (
  SELECT user_id, event_type, us, event_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
  FROM base
),
kept AS (
  SELECT user_id, event_type, us, event_id FROM changes
  WHERE prev IS NULL OR prev <> event_type
)
SELECT user_id,
       event_type AS status,
       us AS valid_from,
       LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to,
       (LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) IS NULL) AS is_current
FROM kept
ORDER BY user_id, valid_from
"""

SPARK_QUERIES["cdc_scd2"] = cdc_scd2
ORACLE_SQL["cdc_scd2"] = _SCD2_SQL


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: every purchase is credited to
    the user's most recent PRECEDING non-purchase event (type + µs
    timestamp).  `last(..., ignorenulls)` over a running frame rides the
    same user_id shuffle as the event ordering — one pass, no self-join
    of the event log against itself."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    base = ev.select("user_id", "event_type", us.alias("us"), "event_id")
    w = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    touch_us = F.when(F.col("event_type") != "purchase", F.col("us"))
    return (
        base.withColumn("touch_type", F.last(touch, ignorenulls=True).over(w))
        .withColumn("touch_us", F.last(touch_us, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("us").alias("purchase_us"),
            "touch_type",
            "touch_us",
        )
    )


_ATTRIB_SQL = """
WITH base AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
),
attributed AS (
  SELECT user_id, event_type, us, event_id,
         LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_type,
         LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN us END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_us
  FROM base
)
SELECT event_id AS purchase_id, user_id, us AS purchase_us, touch_type, touch_us
FROM attributed
WHERE event_type = 'purchase'
ORDER BY purchase_id
"""

SPARK_QUERIES["attribution_last_touch"] = attribution_last_touch
ORACLE_SQL["attribution_last_touch"] = _ATTRIB_SQL


def funnel_strict_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel in ClickHouse 'strict_order'
    mode (operators/funnel.py:window_funnel_strict): the chain counts
    only while the user's IMMEDIATELY NEXT events continue it — any
    interleaved event breaks the run.  Anchored at the earliest view.
    Complements funnel_steps (greedy-earliest windowed mode).  r12: a
    hot key routes the bounded lead chain through the exact segmented
    path (operators/seglead.py, count-gated); the driver fixture is
    uniform, so this plan compiles plain."""
    ev = load(spark, sf_dir, "events")
    steps = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    from ..operators.funnel import window_funnel_strict

    return window_funnel_strict(ev, steps)


_FUNNEL_STRICT_SQL = """
WITH labeled AS (
  SELECT user_id, ts, event_id,
         CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
              WHEN 'purchase' THEN 3 ELSE 0 END AS lbl
  FROM events
),
led AS (
  SELECT user_id, ts, lbl,
         LEAD(lbl, 1) OVER w AS nxt1,
         LEAD(lbl, 2) OVER w AS nxt2,
         ROW_NUMBER() OVER (PARTITION BY user_id, (lbl = 1)
                            ORDER BY ts, event_id) AS rn1
  FROM labeled
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, ts AS anchor_ts,
       CAST(CASE WHEN nxt1 = 2 AND nxt2 = 3 THEN 3
                 WHEN nxt1 = 2 THEN 2
                 ELSE 1 END AS INT) AS level
FROM led
WHERE lbl = 1 AND rn1 = 1
ORDER BY user_id
"""

SPARK_QUERIES["funnel_strict_order"] = funnel_strict_order
ORACLE_SQL["funnel_strict_order"] = _FUNNEL_STRICT_SQL


def seq_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceCount`` (strict-order form): how many times
    per user a view is IMMEDIATELY followed by a click in the full
    event stream — occurrence counting, where funnel_strict_order stops
    at the first anchor.  One lead() over one user-partitioned sort
    then a per-user conditional count; per-row state is one label.
    r12: a hot key routes the lead(1) through the exact segmented path
    (operators/seglead.py, count-gated)."""
    from ..operators.funnel import sequence_count_adjacent

    ev = load(spark, sf_dir, "events")
    out = sequence_count_adjacent(
        ev, F.col("event_type") == "view", F.col("event_type") == "click"
    )
    return (
        out.select("user_id", F.col("n_matches").alias("n_view_click"))
        .filter(F.col("n_view_click") > 0)
    )


_SEQ_COUNT_SQL = """
WITH labeled AS (
  SELECT user_id, ts, event_id,
         CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
              ELSE 0 END AS lbl
  FROM events
),
led AS (
  SELECT user_id, lbl,
         LEAD(lbl) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM labeled
)
SELECT user_id,
       CAST(SUM(CASE WHEN lbl = 1 AND nxt = 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_view_click
FROM led GROUP BY user_id
HAVING SUM(CASE WHEN lbl = 1 AND nxt = 2 THEN 1 ELSE 0 END) > 0
ORDER BY user_id
"""

SPARK_QUERIES["seq_count"] = seq_count
ORACLE_SQL["seq_count"] = _SEQ_COUNT_SQL


def seq_next_node(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceNextNode('forward', 'head')`` analog: for
    each user, the event type that IMMEDIATELY follows the user's first
    signup in the full ordered stream (NULL when the signup is the
    user's last event) — the path-analysis primitive behind "what do
    users do right after X".  Same shape as seq_count: lead() over one
    user-partitioned sort, then (plain route) a second row_number pass
    over the SAME sort to keep only the earliest anchor; per-row state
    is one label.  r12: expressed through
    ``operators/funnel.py:sequence_next_node`` — a hot key routes the
    lead(1) through the exact segmented path and the anchor pick
    becomes a skew-proof min(struct) aggregate (count-gated; the
    driver fixture is uniform, so this plan compiles plain)."""
    from ..operators.funnel import sequence_next_node

    ev = load(spark, sf_dir, "events")
    out = sequence_next_node(ev, F.col("event_type") == "signup")
    return out.select(
        "user_id", F.col("next_value").alias("next_event_type")
    )


_SEQ_NEXT_NODE_SQL = """
WITH led AS (
  SELECT user_id, ts, event_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS nxt
  FROM events
),
anchors AS (
  SELECT user_id, nxt,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM led WHERE event_type = 'signup'
)
SELECT user_id, nxt AS next_event_type
FROM anchors WHERE rn = 1 ORDER BY user_id
"""

SPARK_QUERIES["seq_next_node"] = seq_next_node
ORACLE_SQL["seq_next_node"] = _SEQ_NEXT_NODE_SQL


def cdc_upsert_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a CDC change batch to a base snapshot — the MERGE INTO
    pattern without a table format: deletes drop the base row, upserts
    replace it, untouched keys pass through.  The change batch is
    derived deterministically from events (a user whose LAST event is an
    error is deleted; otherwise upserted with an accumulated balance),
    so both engines replay it exactly.

    100 TB shape: the change batch aggregates once on its key (one
    shuffle bounded by |changed keys|), then ONE full-outer equi join
    against the snapshot on the same key applies everything — no
    per-operation loop, no second pass; this is how a daily CDC batch
    folds into a parquet snapshot when MERGE isn't available."""
    cust = load(spark, sf_dir, "customer")
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    changes = (
        ev.withColumn("rn", F.row_number().over(w))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias("last_ty"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("qbal"),
        )
        .select(
            F.col("user_id").alias("key"),
            F.when(F.col("last_ty") == "error", F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            (F.col("qbal").cast("double") / 100).alias("new_bal"),
        )
    )
    snap = cust.select(
        F.col("c_custkey").alias("key"), "c_name", "c_acctbal"
    )
    applied = snap.join(changes, "key", "full_outer")
    return (
        applied.filter(F.coalesce(F.col("op"), F.lit("")) != "D")
        .select(
            "key",
            F.coalesce(F.col("c_name"), F.concat(F.lit("NEW_"), F.col("key"))).alias(
                "c_name"
            ),
            F.when(F.col("op") == "U", F.col("new_bal"))
            .otherwise(F.col("c_acctbal"))
            .alias("balance"),
            F.coalesce(F.col("op"), F.lit("K")).alias("applied_op"),
        )
    )


_CDC_UPSERT_SQL = """
WITH ranked AS (
  SELECT user_id, event_type, CAST(FLOOR(value * 100) AS BIGINT) AS qv,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
changes AS (
  SELECT user_id AS key,
         CASE WHEN MAX(CASE WHEN rn = 1 THEN event_type END) = 'error'
              THEN 'D' ELSE 'U' END AS op,
         CAST(SUM(qv) AS DOUBLE) / 100 AS new_bal
  FROM ranked GROUP BY user_id
),
snap AS (SELECT c_custkey AS key, c_name, c_acctbal FROM customer)
SELECT COALESCE(snap.key, changes.key) AS key,
       COALESCE(c_name, 'NEW_' || CAST(COALESCE(snap.key, changes.key) AS VARCHAR)) AS c_name,
       CASE WHEN op = 'U' THEN new_bal ELSE c_acctbal END AS balance,
       COALESCE(op, 'K') AS applied_op
FROM snap FULL OUTER JOIN changes ON snap.key = changes.key
WHERE COALESCE(op, '') <> 'D'
ORDER BY key
"""

SPARK_QUERIES["cdc_upsert_apply"] = cdc_upsert_apply
ORACLE_SQL["cdc_upsert_apply"] = _CDC_UPSERT_SQL


def funnel_strict_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view -> click -> purchase funnel in the 'strict_dedup' mode: a
    repeated already-matched condition strictly between two matched
    steps caps the level (window_funnel_strict_dedup).  Completes the
    windowFunnel mode family next to the greedy default (funnel_steps)
    and 'strict_order' (funnel_strict_order)."""
    from ..operators.funnel import window_funnel_strict_dedup

    ev = load(spark, sf_dir, "events")
    steps = [
        F.col("event_type") == "view",
        F.col("event_type") == "click",
        F.col("event_type") == "purchase",
    ]
    out = window_funnel_strict_dedup(ev, steps, window_hours=24)
    return out.select("user_id", "t1", "level")


_FUNNEL_DEDUP_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click'
    AND epoch_us(e.ts) > epoch_us(s1.t1)
    AND epoch_us(e.ts) <= epoch_us(s1.t1) + 86400000000::BIGINT
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase'
    AND epoch_us(e.ts) > epoch_us(s2.t2)
    AND epoch_us(e.ts) <= epoch_us(s1.t1) + 86400000000::BIGINT
  GROUP BY e.user_id
),
v2 AS (
  SELECT e.user_id, 1 AS viol
  FROM events e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
  WHERE e.event_type = 'view'
    AND epoch_us(e.ts) > epoch_us(s1.t1) AND epoch_us(e.ts) < epoch_us(s2.t2)
  GROUP BY e.user_id
),
v3 AS (
  SELECT e.user_id, 1 AS viol
  FROM events e JOIN s2 USING (user_id) JOIN s3 USING (user_id)
  WHERE e.event_type IN ('view', 'click')
    AND epoch_us(e.ts) > epoch_us(s2.t2) AND epoch_us(e.ts) < epoch_us(s3.t3)
  GROUP BY e.user_id
)
SELECT s1.user_id, s1.t1,
  CAST(CASE WHEN s2.t2 IS NULL OR v2.viol IS NOT NULL THEN 1
            WHEN s3.t3 IS NULL OR v3.viol IS NOT NULL THEN 2
            ELSE 3 END AS INT) AS level
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        LEFT JOIN v2 USING (user_id) LEFT JOIN v3 USING (user_id)
ORDER BY user_id
"""

SPARK_QUERIES["funnel_strict_dedup"] = funnel_strict_dedup
ORACLE_SQL["funnel_strict_dedup"] = _FUNNEL_DEDUP_SQL


def seq_match_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1)(?t<=3600)(?2)')`` analog — the
    TIME-CONSTRAINED form `seq_match`'s regex pattern cannot express:
    did the user make a purchase within one hour of a signup (any other
    events may intervene)?  One window pass carries the latest signup
    time into every later row (ROWS .. 1 PRECEDING keeps "strictly
    before" identical in both engines), purchase rows test the delta,
    and a grouped max folds it per user — per-row state is one int64,
    never a per-user history.  Returns (user_id, matched) for users
    with at least one signup."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    last_signup = F.max(
        F.when(F.col("event_type") == "signup", us)
    ).over(w)
    d = ev.withColumn("ls_us", last_signup)
    hit = (
        (F.col("event_type") == "purchase")
        & F.col("ls_us").isNotNull()
        & ((us - F.col("ls_us")) <= 3600 * 1_000_000)
    )
    return (
        d.groupBy("user_id")
        .agg(
            F.max(F.when(hit, 1).otherwise(0)).alias("matched"),
            F.max(
                F.when(F.col("event_type") == "signup", 1).otherwise(0)
            ).alias("has_anchor"),
        )
        .filter(F.col("has_anchor") == 1)
        .select("user_id", "matched")
    )


_SEQ_MATCH_WINDOW_SQL = """
WITH carried AS (
  SELECT user_id, event_type, epoch_us(ts) AS us,
         MAX(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ls_us
  FROM events
)
SELECT user_id,
       MAX(CASE WHEN event_type = 'purchase' AND ls_us IS NOT NULL
                     AND us - ls_us <= 3600000000::BIGINT
                THEN 1 ELSE 0 END) AS matched
FROM carried
GROUP BY user_id
HAVING MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) = 1
ORDER BY user_id
"""

SPARK_QUERIES["seq_match_window"] = seq_match_window
ORACLE_SQL["seq_match_window"] = _SEQ_MATCH_WINDOW_SQL
