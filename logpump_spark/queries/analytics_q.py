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
    return out.select("user_id", "t1", "t2", "t3", "level").orderBy("user_id")


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
    return retention(ev, conds).orderBy("user_id")


_RETENTION_SQL = """
SELECT user_id,
  MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS r1,
  MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
    * MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS r2,
  MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
    * MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS r3
FROM events GROUP BY user_id ORDER BY user_id
"""


SPARK_QUERIES = {
    "funnel_steps": funnel_steps,
    "retention_cohort": retention_cohort,
}

ORACLE_SQL = {
    "funnel_steps": _FUNNEL_SQL,
    "retention_cohort": _RETENTION_SQL,
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
    w_rank = W.partitionBy("day").orderBy(F.col("n").desc(), F.col("event_type"))
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
