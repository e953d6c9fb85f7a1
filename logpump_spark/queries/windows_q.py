"""Window functions (SURVEY.md §2.G): ranking, analytic, running frames.

All windows partition by a key (event_type / user_id), so at 100 TB each
window computation is a single shuffle on the partition key followed by a
within-partition sort — no global sort, no driver involvement.  Skewed
partition keys (one user with millions of events) are the risk at scale;
AQE skew handling covers joins but not window sorts, so heavy-hitter users
would need a two-level (salted prefix-agg) rewrite — documented here, not
needed at these volumes.

Determinism: every ORDER BY includes a unique tiebreaker (event_id), and
running double sums aggregate in decimal (see compat.py) so the fold is
order-exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..compat import quant
from ..tables import load


def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 events by value per type via row_number — the scalable top-k
    per group (shuffle on the group key, heap-free rank within)."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("rnk", F.rank().over(w))
        .withColumn("drnk", F.dense_rank().over(w))
        .filter(F.col("rn") <= 5)
        .select("event_type", "event_id", "value", "rn", "rnk", "drnk")
    )


_WIN_RANK_SQL = """
SELECT event_type, event_id, value, rn, rnk, drnk
FROM (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn,
         RANK()       OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rnk,
         DENSE_RANK() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS drnk
  FROM events
)
WHERE rn <= 5
ORDER BY event_type, rn
"""


def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running sum of value over event time (ROWS UNBOUNDED
    PRECEDING frame).  Summed in decimal so the cumulative fold is exact and
    engine-independent."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            (F.sum(quant("value")).over(w).cast("double") / 10000.0).alias("running_value"),
            F.count(F.lit(1)).over(w).alias("running_n"),
        )
    )


_WIN_RUNNING_SUM_SQL = """
SELECT user_id, event_id, ts,
       CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) OVER w AS DOUBLE) / 10000.0 AS running_value,
       COUNT(*) OVER w AS running_n
FROM events
WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY user_id, ts, event_id
"""


def win_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: per-user inter-event gap in seconds and value
    delta against the previous event."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev_ts = F.lag("ts").over(w)
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
            (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
            (F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)).alias("gap_us"),
        )
    )


_WIN_LAG_SQL = """
SELECT user_id, event_id, ts,
       LAG(value)  OVER w AS prev_value,
       LEAD(value) OVER w AS next_value,
       value - LAG(value) OVER w AS value_delta,
       epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS gap_us
FROM events
WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
ORDER BY user_id, ts, event_id
"""


def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last value over a full-partition frame: each user's first and
    latest event type + ntile quartile by value."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w_ord = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    w_full = w_ord.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.first("event_type").over(w_full).alias("first_type"),
            F.last("event_type").over(w_full).alias("last_type"),
            # explicit NULLS LAST: Spark ASC defaults NULLS FIRST,
            # DuckDB NULLS LAST — unpinned, NULL values silently shift
            # every ntile boundary between engines
            F.ntile(4).over(
                W.partitionBy("user_id").orderBy(
                    F.col("value").asc_nulls_last(), F.col("event_id").asc()
                )
            ).alias("quartile"),
        )
    )


_WIN_FIRST_LAST_SQL = """
SELECT user_id, event_id,
       FIRST_VALUE(event_type) OVER w2 AS first_type,
       LAST_VALUE(event_type)  OVER w2 AS last_type,
       NTILE(4) OVER (PARTITION BY user_id ORDER BY value ASC NULLS LAST, event_id ASC) AS quartile
FROM events
WHERE user_id < 50
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
ORDER BY user_id, event_id
"""


def win_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: count of this user's events within the trailing hour —
    the 'sliding lookback' shape used for rate limiting / sessionization
    over tech logs."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    hour_us = 3_600_000_000
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-hour_us, 0)
    )
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            F.count(F.lit(1)).over(w).alias("n_last_hour"),
        )
    )


_WIN_RANGE_FRAME_SQL = """
SELECT user_id, event_id, ts,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_last_hour
FROM events
WHERE user_id < 50
ORDER BY user_id, event_id
"""


def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth quartiles of customers by account balance within each
    nation (NTILE), folded to per-(nation, quartile) counts and quantized
    balance sums — the bucketing shape behind equi-depth histograms and
    per-cohort sampling.  ORDER BY carries c_custkey as a unique
    tiebreaker so tile assignment is deterministic in both engines."""
    cust = load(spark, sf_dir, "customer")
    # asc_nulls_last: DuckDB's ASC default is NULLS LAST, Spark's is
    # NULLS FIRST — bare asc() flips every rank below a NULLed balance
    # the moment the null robustness twin touches c_acctbal (10 permille)
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc_nulls_last(), F.col("c_custkey").asc()
    )
    return (
        cust.withColumn("tile", F.ntile(4).over(w))
        .groupBy("c_nationkey", "tile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.floor(F.col("c_acctbal") * 100).cast("long")).alias("acctbal_q"),
        )
    )


_WIN_NTILE_SQL = """
SELECT c_nationkey, tile,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(FLOOR(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_q
FROM (
  SELECT c_nationkey, c_acctbal,
         NTILE(4) OVER (PARTITION BY c_nationkey
                        ORDER BY c_acctbal ASC, c_custkey ASC) AS tile
  FROM customer
)
GROUP BY c_nationkey, tile
ORDER BY c_nationkey, tile
"""


SPARK_QUERIES = {
    "win_rank": win_rank,
    "win_running_sum": win_running_sum,
    "win_lag": win_lag,
    "win_first_last": win_first_last,
    "win_range_frame": win_range_frame,
    "win_ntile": win_ntile,
}

ORACLE_SQL = {
    "win_rank": _WIN_RANK_SQL,
    "win_running_sum": _WIN_RUNNING_SUM_SQL,
    "win_lag": _WIN_LAG_SQL,
    "win_first_last": _WIN_FIRST_LAST_SQL,
    "win_range_frame": _WIN_RANGE_FRAME_SQL,
    "win_ntile": _WIN_NTILE_SQL,
}


def win_pct_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each (day, event_type) cell's share of its DAY
    total and of its TYPE total — two window denominators over one
    aggregated cell table (the share-of-segment report every dashboard
    runs).  Shares are per-mille floor divisions of exact counts, so
    values are engine-exact; the cell table is tiny (days x types), so
    both windows run after one grouped pass of the raw events."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.to_date("ts").cast("string").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    w_day = W.partitionBy("day")
    w_type = W.partitionBy("event_type")
    return cells.select(
        "day",
        "event_type",
        "n",
        F.floor(F.col("n") * 1000 / F.sum("n").over(w_day)).cast("long").alias(
            "pm_of_day"
        ),
        F.floor(F.col("n") * 1000 / F.sum("n").over(w_type)).cast("long").alias(
            "pm_of_type"
        ),
    ).orderBy("day", "event_type")


_WIN_PCT_SQL = """
WITH cells AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT day, event_type, n,
       CAST(FLOOR(n * 1000 / SUM(n) OVER (PARTITION BY day)) AS BIGINT) AS pm_of_day,
       CAST(FLOOR(n * 1000 / SUM(n) OVER (PARTITION BY event_type)) AS BIGINT) AS pm_of_type
FROM cells
ORDER BY day, event_type
"""

SPARK_QUERIES["win_pct_of_total"] = win_pct_of_total
ORACLE_SQL["win_pct_of_total"] = _WIN_PCT_SQL


def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per user over event time — the classic
    hard-in-SQL analytic, expressed scalably: mark each (user, type)'s
    FIRST occurrence, then a running sum of first-occurrence flags
    gives the distinct-so-far — state O(1) per row (never a
    collect_set that grows with history).  r12: expressed through
    ``operators/segwin.py:running_distinct`` — a hot key routes the
    flag pass through a grouped min-aggregate + join (no per-(key,
    value) window to single-task) and the running sum through the
    generic segmented prefix scan; the uniform driver fixture compiles
    the classic two-window plain plan.  This closes SCALING.md §4.1's
    last cap-only shape: the "unbounded value-set carry" was an
    artifact of the naive formulation.  Sampled to every user's last
    event per day to keep the checked result bounded."""
    from ..operators.segwin import running_distinct

    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    base = ev.select("user_id", "event_type", us.alias("us"), "event_id")
    w_day = W.partitionBy("user_id", F.to_date(F.timestamp_micros(F.col("us"))))
    running = running_distinct(
        base, "event_type", ts_col="us", out_col="n_distinct_types"
    )
    last_of_day = running.withColumn(
        "mx", F.max(F.struct(F.col("us"), F.col("event_id"))).over(w_day)
    ).filter((F.col("us") == F.col("mx.us")) & (F.col("event_id") == F.col("mx.event_id")))
    return last_of_day.select(
        "user_id",
        F.to_date(F.timestamp_micros(F.col("us"))).cast("string").alias("day"),
        "n_distinct_types",
    )


_WIN_RUNDIST_SQL = """
WITH base AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events
),
flagged AS (
  SELECT user_id, event_type, us, event_id,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY us, event_id) = 1
              THEN 1 ELSE 0 END AS is_first
  FROM base
),
running AS (
  SELECT user_id, us, event_id,
         SUM(is_first) OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS n_distinct_types,
         CAST(CAST(make_timestamp(us) AS DATE) AS VARCHAR) AS day
  FROM flagged
),
ranked AS (
  SELECT user_id, day, n_distinct_types,
         ROW_NUMBER() OVER (PARTITION BY user_id, day ORDER BY us DESC, event_id DESC)
           AS rn
  FROM running
)
SELECT user_id, day, CAST(n_distinct_types AS BIGINT) AS n_distinct_types
FROM ranked WHERE rn = 1
ORDER BY user_id, day
"""

SPARK_QUERIES["win_running_distinct"] = win_running_distinct
ORACLE_SQL["win_running_distinct"] = _WIN_RUNDIST_SQL


def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROWS-frame moving average (the groupArrayMovingAvg analog):
    trailing-7-event mean value per user — the count-based sibling of
    win_range_frame's time-based lookback.  ROWS frames depend on the
    physical order, so the ORDER BY carries the unique event_id
    tiebreak; the mean is one division of a quantized integer sum by
    the frame row count, engine-exact.

    r11: expressed through ``operators/segwin.py:moving_rows_frame`` —
    on hot-key-free corpora (this fixture) the count gate compiles the
    identical plain window plan; a key over 10⁶ rows takes the exact
    segmented-carry path instead of a single-task sort
    (SCALING.md §4.1)."""
    from ..operators.segwin import moving_rows_frame

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    qv = F.floor(F.col("value") * 10000).cast("long")
    base = ev.select("user_id", "event_id", "ts", qv.alias("qv"))
    out = moving_rows_frame(base, "qv", frame_rows=7)
    return out.select(
        "user_id",
        "event_id",
        (F.col("frame_sum").cast("double") / (F.col("frame_n") * 10000)).alias(
            "mov_avg7"
        ),
        "frame_n",
    )


_WIN_MOVING_AVG_SQL = """
SELECT user_id, event_id,
       CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) OVER w AS DOUBLE)
         / (COUNT(*) OVER w * 10000) AS mov_avg7,
       COUNT(*) OVER w AS frame_n
FROM events
WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
"""

SPARK_QUERIES["win_moving_avg"] = win_moving_avg
ORACLE_SQL["win_moving_avg"] = _WIN_MOVING_AVG_SQL
