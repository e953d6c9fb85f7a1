"""Interval sweep-line analytics: ClickHouse ``maxIntersections`` /
``maxIntersectionsPosition`` and ``intervalLengthSum`` analogs.

Both are boundary-sweep algorithms over (start, end) interval sets —
here the intervals are user sessions derived from the events stream
(the same 30-minute-gap sessionization as ``sessionize_events``), the
shape a monitoring deployment of the reference would run against its
delegated warehouse ("how many techlog sessions were open at peak?",
"how long was each user actually active, overlaps merged?").

Scale design (100 TB):

- ``interval_max_concurrent`` needs a GLOBAL running sum over all
  boundaries — the naive form is a single-partition window over a
  corpus-cardinality input, exactly the shape tests/test_plan_sweep.py
  bans.  Instead it runs the textbook two-stage parallel prefix scan:
  (1) aggregate per-hour net deltas (map-side partials, one bounded
  shuffle), (2) a running carry over the HOUR table (single-partition
  window, but over an already-aggregated, time-bounded row set —
  ~9k rows/year), (3) broadcast the carry back and finish the running
  sum WITHIN each hour partition.  No stage ever funnels raw
  boundaries through one task.
- ``interval_length_sum`` partitions its sweep by user — the same
  user-key window family as sessionize/funnel, with the same
  documented hot-key blindspot (SCALING.md).

Exactness: all sweep arithmetic runs on epoch MICROSECONDS (int64) and
integer deltas; every engine agrees bit-for-bit, so both queries carry
full value oracles.

Boundary-order semantics (pinned identically in Spark and the DuckDB
twins):

- max-concurrent orders ``(ts ASC, delta ASC)`` — the -1 of an interval
  ending at t applies before the +1 of one starting at t, i.e.
  HALF-OPEN [s, e): touching sessions never stack, zero-length
  (single-event) sessions count zero, matching ClickHouse
  ``maxIntersections`` over (start, end) pairs.
- length-sum orders ``(ts ASC, delta DESC)`` — a +1 at t applies before
  a -1 at t, so touching intervals MERGE and their junction point is
  covered, matching ``intervalLengthSum``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.intervals import interval_union_length, max_concurrent_intervals
from ..operators.sessionize import session_stats, sessionize
from ..tables import load


def interval_max_concurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak number of concurrently-open user sessions platform-wide and
    the earliest instant it is reached (``maxIntersections`` +
    ``maxIntersectionsPosition``).  Sessions: 30-min-gap sessionization
    of the events stream.  Returns one row (max_concurrent, at_us)."""
    sess = session_stats(load(spark, sf_dir, "events"))
    return max_concurrent_intervals(sess)


# the oracle sweeps the same boundaries with one global window — exact
# on DuckDB's single node, which is the point of the two-stage Spark form
_MAX_CONCURRENT_SQL = """
WITH marked AS (
  SELECT user_id, event_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 30 * 60 * 1000000
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
),
numbered AS (
  SELECT user_id, ts,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                      ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
),
sess AS (
  SELECT user_id, session_no,
         epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) AS e_us
  FROM numbered GROUP BY user_id, session_no
),
bounds AS (
  SELECT s_us AS us, 1 AS delta FROM sess
  UNION ALL
  SELECT e_us AS us, -1 AS delta FROM sess
),
run AS (
  SELECT us,
         SUM(delta) OVER (ORDER BY us ASC, delta ASC
                          ROWS UNBOUNDED PRECEDING) AS running
  FROM bounds
)
SELECT CAST((SELECT MAX(running) FROM run) AS BIGINT) AS max_concurrent,
       CAST((SELECT MIN(us) FROM run
             WHERE running = (SELECT MAX(running) FROM run)) AS BIGINT)
         AS at_us
"""


def interval_length_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user UNION length of the user's per-event-type session
    intervals (``intervalLengthSum``): total microseconds during which
    the user had at least one event-type session open, overlaps counted
    once and touching intervals merged.  Users < 60 bound the oracle.
    Returns (user_id, covered_us, n_intervals)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 60)
    # narrow BEFORE sessionize: the segmented path materializes the
    # ranged frame at the width it is handed (sessionize.py r13 note)
    keyed = ev.select("user_id", "event_type", "ts", "event_id").withColumn(
        "uk", F.concat_ws("|", F.col("user_id"), F.col("event_type"))
    )
    iv = (
        sessionize(keyed, user_col="uk")
        .groupBy("user_id", "event_type", "session_no")
        .agg(
            F.unix_micros(F.min("ts")).alias("s_us"),
            F.unix_micros(F.max("ts")).alias("e_us"),
        )
    )
    return interval_union_length(iv).orderBy("user_id")


_LENGTH_SUM_SQL = """
WITH ev AS (SELECT * FROM events WHERE user_id < 60),
marked AS (
  SELECT user_id, event_type, event_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 30 * 60 * 1000000
         THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC)
),
numbered AS (
  SELECT user_id, event_type, ts,
    SUM(is_new) OVER (PARTITION BY user_id, event_type
                      ORDER BY ts ASC, event_id ASC
                      ROWS UNBOUNDED PRECEDING) AS session_no
  FROM marked
),
iv AS (
  SELECT user_id, event_type, session_no,
         epoch_us(MIN(ts)) AS s_us, epoch_us(MAX(ts)) AS e_us
  FROM numbered GROUP BY 1, 2, 3
),
bounds AS (
  SELECT user_id, s_us AS us, 1 AS delta FROM iv
  UNION ALL
  SELECT user_id, e_us AS us, -1 AS delta FROM iv
),
running AS (
  SELECT user_id, us, delta,
    SUM(delta) OVER (PARTITION BY user_id ORDER BY us ASC, delta DESC
                     ROWS UNBOUNDED PRECEDING) AS run_incl
  FROM bounds
),
swept AS (
  SELECT user_id, us, run_incl,
    LAG(us) OVER (PARTITION BY user_id ORDER BY us ASC, delta DESC) AS prev_us,
    LAG(run_incl) OVER (PARTITION BY user_id ORDER BY us ASC, delta DESC)
      AS prev_run
  FROM running
)
SELECT user_id,
       CAST(SUM(CASE WHEN prev_run > 0 THEN us - prev_us ELSE 0 END) AS BIGINT)
         AS covered_us,
       CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals
FROM swept GROUP BY user_id ORDER BY user_id
"""


SPARK_QUERIES = {
    "interval_max_concurrent": interval_max_concurrent,
    "interval_length_sum": interval_length_sum,
}

ORACLE_SQL = {
    "interval_max_concurrent": _MAX_CONCURRENT_SQL,
    "interval_length_sum": _LENGTH_SUM_SQL,
}
