"""Batch-checkable window/routing queries (SURVEY.md §2.G streaming rows,
§2.D R1).  The window builders are the same code the streaming job uses —
Spark window operators are identical in batch and streaming — so the
DuckDB oracle genuinely checks the streaming semantics."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import sql_dsum
from ..streaming.job import table_routing_column
from ..streaming.windows import session_agg, sliding_agg, tumbling_agg
from ..tables import load

# the reference's component->table routing from config.yaml:25-27
_TABLE_MAP = {"error": "tech_log_errors", "purchase": "tech_log_sales"}
_DEFAULT_TABLE = "tech_log"


def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return tumbling_agg(ev).orderBy("window_start", "event_type")


_TUMBLING_SQL = f"""
SELECT
  date_trunc('day', ts) AS window_start,
  date_trunc('day', ts) + INTERVAL 1 DAY AS window_end,
  event_type,
  COUNT(*) AS n_events,
  {sql_dsum('value')} AS sum_value
FROM events
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
"""


def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return sliding_agg(ev).orderBy("window_start", "event_type")


# every event belongs to exactly two [2-day) windows sliding by 1 day:
# the one starting at its own day and the one starting the day before
_SLIDING_SQL = """
SELECT window_start, event_type, COUNT(*) AS n_events FROM (
  SELECT date_trunc('day', ts) - (off * INTERVAL 1 DAY) AS window_start, event_type
  FROM events CROSS JOIN (VALUES (0), (1)) AS offs(off)
)
GROUP BY window_start, event_type
ORDER BY window_start, event_type
"""


def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    return session_agg(ev, gap="6 hours")


# gaps-and-islands replication of session_window semantics: a new session
# starts when the gap to the previous event is >= the 6h window (Spark
# session end = last_ts + gap, exclusive)
_SESSION_SQL = """
WITH marked AS (
  SELECT user_id, ts,
    CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) >= 21600000000
         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id < 100
),
islands AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS island
  FROM marked
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 6 HOUR AS session_end,
       user_id,
       COUNT(*) AS n_events
FROM islands
GROUP BY user_id, island
ORDER BY user_id, session_start
"""


def route_group_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: component->table routing as a map-literal column + per-table
    counts — the scalable form of the reference's per-group INSERT loop
    (clickhouse.go:65-72)."""
    ev = load(spark, sf_dir, "events")
    routed = ev.withColumn(
        "sink_table", table_routing_column(_TABLE_MAP, _DEFAULT_TABLE, "event_type")
    )
    return (
        routed.groupBy("sink_table")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("event_type").alias("n_components"),
        )
    )


_ROUTE_SQL = """
SELECT
  CASE event_type WHEN 'error' THEN 'tech_log_errors'
                  WHEN 'purchase' THEN 'tech_log_sales'
                  ELSE 'tech_log' END AS sink_table,
  COUNT(*) AS n_rows,
  COUNT(DISTINCT event_type) AS n_components
FROM events
GROUP BY 1
ORDER BY sink_table
"""


def agg_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.F partitioned-storage query shape: per-EventDate rollup that a
    PARTITION BY EventDate layout answers with partition pruning."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").cast("string").alias("event_date"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_date")
    )


_AGG_BY_DAY_SQL = """
SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1
ORDER BY event_date
"""


def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join in batch mode (the SAME builder the
    streaming tests run with watermarks): each error correlated with this
    user's purchases in the preceding 2 hours."""
    from ..streaming.joins import interval_join

    ev = load(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id"), F.col("ts"), F.col("event_id").alias("err_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("pts"),
        F.col("event_id").alias("purchase_id"),
    )
    joined = interval_join(
        errors,
        purchases.withColumnRenamed("p_user", "user_id"),
        ["user_id"],
        "ts",
        "pts",
        lookback="2 hours",
    )
    return joined.select("err_id", "purchase_id", "user_id")


_STREAM_INTERVAL_JOIN_SQL = """
SELECT e.event_id AS err_id, p.event_id AS purchase_id, e.user_id
FROM events e JOIN events p
  ON e.user_id = p.user_id
 AND e.event_type = 'error' AND p.event_type = 'purchase'
 AND p.ts <= e.ts AND p.ts >= e.ts - INTERVAL 2 HOUR
ORDER BY err_id, purchase_id
"""


def sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery through the SQL API: each region's
    top-2 customers by balance (per-row dependent subplan — Catalyst
    decorrelates into a ranked join)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_l")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_l")
    return spark.sql(
        """
        SELECT n.n_name, t.c_custkey, t.c_acctbal
        FROM nation_l n,
        LATERAL (
          SELECT c_custkey, c_acctbal FROM customer_l
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey ASC
          LIMIT 2
        ) t
        ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey
        """
    )


_SQL_LATERAL_SQL = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_acctbal FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey ASC
  LIMIT 2
) t
ORDER BY n.n_name, t.c_acctbal DESC, t.c_custkey
"""


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/stateful.dedup_stream
    (dropDuplicatesWithinWatermark): replayed events — the reference's
    Redis-offset-store failure mode re-ingesting a file (SURVEY.md §2.E
    T3) — collapse to one row per (user, type, ts) key.  Every fifth
    user's events are planted twice; projecting exactly the key columns
    makes the kept row deterministic, so the oracle is a plain DISTINCT.
    The streaming-mode path with watermark-bounded state is exercised
    end-to-end in tests/test_stateful_streaming.py."""
    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    replayed = ev.unionAll(ev.filter(F.col("user_id") % 5 == 0))
    return (
        replayed.filter(F.col("user_id") < 50)
        .dropDuplicates(["user_id", "event_type", "ts"])
    )


_STREAM_DEDUP_SQL = """
SELECT DISTINCT user_id, event_type, ts FROM (
  SELECT user_id, event_type, ts FROM events
  UNION ALL
  SELECT user_id, event_type, ts FROM events WHERE user_id % 5 = 0
)
WHERE user_id < 50
ORDER BY user_id, event_type, ts
"""


SPARK_QUERIES = {
    "stream_dedup": stream_dedup,
    "stream_interval_join": stream_interval_join,
    "sql_lateral": sql_lateral,
    "stream_tumbling": stream_tumbling,
    "stream_sliding": stream_sliding,
    "stream_session": stream_session,
    "route_group_by_key": route_group_by_key,
    "agg_by_day": agg_by_day,
}

ORACLE_SQL = {
    "stream_dedup": _STREAM_DEDUP_SQL,
    "stream_interval_join": _STREAM_INTERVAL_JOIN_SQL,
    "sql_lateral": _SQL_LATERAL_SQL,
    "stream_tumbling": _TUMBLING_SQL,
    "stream_sliding": _SLIDING_SQL,
    "stream_session": _SESSION_SQL,
    "route_group_by_key": _ROUTE_SQL,
    "agg_by_day": _AGG_BY_DAY_SQL,
}
