"""Relational core: scans, filters, joins, aggregates, set ops, sort/top-k.

This is the analytical surface the reference delegates to ClickHouse
(SURVEY.md §2.F: MergeTree PARTITION BY EventDate ORDER BY (EventDate,
EventTime), /root/reference/README.md:111-131) plus the §2.G categories the
reference lacks entirely.  All queries are declarative DataFrame plans:
Catalyst pushes the filters into the parquet scans, prunes columns, and
picks broadcast-hash joins for the dimension tables (we hint `broadcast`
where the small side is known small at ANY scale factor, so the plan stays
broadcast at 100 TB where AQE statistics alone might mis-estimate).

Scale notes per query are in the docstrings.  Nothing here collects to the
driver; every aggregation does map-side partial aggregation (Catalyst
HashAggregate partial -> shuffle -> final).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import davg, dsum, sql_davg, sql_dsum
from ..tables import load


# ---------------------------------------------------------------------------
# Flagship: pricing summary (scan -> filter -> project -> hash agg -> sort)
# Shape mirrors the dominant tech-log query the reference's ClickHouse DDL
# implies: "events per type per status with duration stats" (SURVEY.md §2.F).
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem.

    At 100 TB: single scan + partial agg; the shuffle carries only
    |groups| x |partitions| rows (6 groups here).  Filter and the 7-column
    projection are pushed into the parquet scan.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {sql_dsum('l_quantity')} AS sum_qty,
  {sql_dsum('l_extendedprice')} AS sum_base_price,
  {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
  {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
  {sql_davg('l_quantity')} AS avg_qty,
  {sql_davg('l_extendedprice')} AS avg_price,
  {sql_davg('l_discount')} AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Joins (§2.G): the reference's only join-like construct is the Component ->
# table map lookup (internal/clickhouseclient/clickhouse.go:68); everything
# here is new surface.
# ---------------------------------------------------------------------------

def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders |><| lineitem on orderkey -> revenue per order priority.

    Fact-fact equi join: at scale both sides shuffle on l_orderkey /
    o_orderkey (sort-merge); AQE converts to broadcast if one side is small
    post-filter.  Co-locating via bucketing on orderkey would remove the
    shuffle entirely for repeated runs (documented, not forced here).
    """
    from .. import compat

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    # two-level aggregation instead of COUNT(DISTINCT): pre-aggregate per
    # (priority, orderkey) — the partial agg compresses each order's
    # lineitems BEFORE the wide shuffle, and the distinct count becomes a
    # plain COUNT of the pre-aggregated rows.  Catalyst's Expand-based
    # distinct would instead double the shuffled row count; at 100 TB the
    # pre-aggregation is the difference between shuffling |lineitem| x 2
    # and shuffling |orders|.
    per_order = (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "inner")
        .groupBy("o_orderpriority", "o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(compat.quant(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("qrev"),
        )
    )
    return (
        per_order.groupBy("o_orderpriority")
        .agg(
            F.sum("cnt").alias("n_items"),
            F.count(F.lit(1)).alias("n_orders"),
            (F.sum("qrev").cast("double") / 10000.0).alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


_JOIN_INNER_SQL = f"""
SELECT
  o_orderpriority,
  COUNT(*) AS n_items,
  COUNT(DISTINCT o_orderkey) AS n_orders,
  {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer LEFT JOIN orders -> per-segment counts incl. customers
    without orders.  Left side preserved; COUNT(o_orderkey) skips nulls."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("o_orderkey").alias("n_orders"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
        .orderBy("c_mktsegment")
    )


_JOIN_LEFT_SQL = """
SELECT
  c_mktsegment,
  COUNT(*) AS n_rows,
  COUNT(o_orderkey) AS n_orders,
  COUNT(DISTINCT c_custkey) AS n_customers
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one open ('O') order — left semi join.

    Semi joins shuffle only the join key of the right side and never
    duplicate left rows; strictly cheaper than inner+distinct at scale.
    """
    cust = load(spark, sf_dir, "customer")
    open_orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        cust.join(open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
    )


_JOIN_SEMI_SQL = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
)
ORDER BY c_custkey
"""


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no finished ('F') order — left anti join."""
    cust = load(spark, sf_dir, "customer")
    f_orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        cust.join(f_orders, cust.c_custkey == f_orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


_JOIN_ANTI_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake dim join: customer -> nation -> region with explicit
    broadcast hints.  nation (25 rows) and region (5 rows) are constant-size
    at every scale factor, so the hint is correct at 100 TB — no shuffle of
    the customer fact at all for this join."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
        .orderBy("r_name")
    )


_JOIN_BROADCAST_SQL = f"""
SELECT r_name, COUNT(*) AS n_customers, {sql_dsum('c_acctbal')} AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: price-band dimension joined on an interval
    predicate.  The band table is a literal — broadcast nested-loop join
    over 4 rows, which is the right physical plan for band joins at any
    scale (the alternative, a theta sort-merge, is never better for a
    constant-size band list)."""
    part = load(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [
            ("budget", 0.0, 925.0),
            ("mid", 925.0, 950.0),
            ("premium", 950.0, 975.0),
            ("luxury", 975.0, 1e12),
        ],
        "band string, lo double, hi double",
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
            "inner",
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum("p_retailprice").alias("total_price"),
        )
    )


_JOIN_RANGE_SQL = f"""
SELECT band, COUNT(*) AS n_parts, {sql_dsum('p_retailprice')} AS total_price
FROM part
JOIN (VALUES ('budget', 0.0, 925.0), ('mid', 925.0, 950.0),
             ('premium', 950.0, 975.0), ('luxury', 975.0, 1e12))
     AS bands(band, lo, hi)
  ON p_retailprice >= lo AND p_retailprice < hi
GROUP BY band
ORDER BY band
"""


def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase event, the most recent click by the
    same user at or before it.

    Spark lacks a native as-of join; the scalable formulation is the
    union+window trick: tag both streams, union, and take the running max
    of click timestamps per user.  One shuffle on user_id, no pairwise
    blow-up — this is the 100 TB-safe shape (a correlated subquery or a
    range self-join would be quadratic per user).
    """
    from ..operators.asof import asof_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # NULL-user clicks match nothing (the oracle's correlated equi
    # predicate never equates NULLs; Spark's window partitioning WOULD
    # group NULL with NULL) — drop them so both engines agree
    clicks = ev.filter(
        (F.col("event_type") == "click") & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        F.col("ts").alias("cts"),
        F.col("ts").alias("last_click_ts"),
    )
    return (
        asof_join(purchases, clicks, ["user_id"], "ts", "cts", suffix="")
        .select("event_id", "user_id", "ts", "last_click_ts")
    )


_JOIN_ASOF_SQL = """
SELECT
  p.event_id,
  p.user_id,
  p.ts,
  (SELECT MAX(c.ts) FROM events c
    WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts
  ) AS last_click_ts
FROM events p
WHERE p.event_type = 'purchase'
ORDER BY p.event_id
"""


# ---------------------------------------------------------------------------
# Aggregations (§2.F "aggregations over log metrics" + §2.G distinct/rollup)
# ---------------------------------------------------------------------------

def agg_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type metric stats — the direct analog of "duration stats
    per EventType" over the reference's tech-log table (SURVEY.md §2.F)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
            davg("value").alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


_AGG_METRICS_SQL = f"""
SELECT
  event_type,
  COUNT(*) AS n_events,
  {sql_dsum('value')} AS sum_value,
  {sql_davg('value')} AS avg_value,
  MIN(value) AS min_value,
  MAX(value) AS max_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct users per event type (expands to per-key dedup then
    count; Catalyst plans it as two-phase agg)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


_AGG_DISTINCT_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus): subtotals + grand total in one
    pass (Catalyst expands to a single Expand+HashAggregate — one shuffle)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


_AGG_ROLLUP_SQL = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items, {sql_dsum('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day): all 4 grouping-set combinations."""
    ev = load(spark, sf_dir, "events").withColumn("day", F.date_trunc("day", F.col("ts")))
    return (
        ev.cube("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .orderBy(
            F.col("event_type").asc_nulls_first(),
            F.col("day").asc_nulls_first(),
        )
    )


_AGG_CUBE_SQL = f"""
SELECT event_type, date_trunc('day', ts) AS day, COUNT(*) AS n_events,
       {sql_dsum('value')} AS sum_value
FROM events
GROUP BY CUBE (event_type, date_trunc('day', ts))
ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST
"""


def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct.  The oracle compares against the
    EXACT count: for low-cardinality groups (5 event types per day) HLL's
    sparse/linear-counting regime returns the exact value in both engines.
    The approx form is the one that scales — exact distinct over 100 TB of
    user ids is a full shuffle of the key universe; HLL sketches merge in
    O(registers)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.approx_count_distinct("event_type").alias("n_types"))
        .orderBy("day")
    )


_AGG_APPROX_DISTINCT_SQL = """
SELECT date_trunc('day', ts) AS day, COUNT(DISTINCT event_type) AS n_types
FROM events
GROUP BY date_trunc('day', ts)
ORDER BY day
"""


# ---------------------------------------------------------------------------
# Set operations (§2.G)
# ---------------------------------------------------------------------------

def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two customer populations."""
    cust = load(spark, sf_dir, "customer")
    rich = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    auto = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    return rich.union(auto).distinct()


_SETOP_UNION_SQL = """
SELECT c_custkey FROM customer WHERE c_acctbal > 9000
UNION
SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
ORDER BY c_custkey
"""


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers that placed both an 'O' and an 'F' order."""
    orders = load(spark, sf_dir, "orders")
    o_cust = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    f_cust = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return o_cust.intersect(f_cust)


_SETOP_INTERSECT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY custkey
"""


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: multiset difference preserving multiplicity."""
    orders = load(spark, sf_dir, "orders")
    all_cust = orders.select(F.col("o_custkey").alias("custkey"))
    open_cust = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return all_cust.exceptAll(open_cust)


_SETOP_EXCEPT_SQL = """
SELECT o_custkey AS custkey FROM orders
EXCEPT ALL
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY custkey
"""


# ---------------------------------------------------------------------------
# Sort / limit / top-k (§2.G; reference's only sort is file mtime,
# internal/watcher/scan.go:151-153)
# ---------------------------------------------------------------------------

def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-100 lineitems by price.  Spark plans orderBy+limit as
    TakeOrderedAndProject: per-partition top-k then a k-row merge on the
    driver — O(k) network, never a full sort at scale.  Unique tiebreak
    (orderkey, linenumber) makes the result deterministic."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(100)
    )


_SORT_LIMIT_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 100
"""


def filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective filter + narrow projection — the "slice by event type /
    user / session" pattern from §2.F.  Both the two predicates and the
    3-column ReadSchema reach the parquet scan (verified in tests via
    .explain containing PushedFilters)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter((F.col("event_type") == "error") & (F.col("value") > 50.0))
        .select("event_id", "user_id", "value")
    )


_FILTER_PUSHDOWN_SQL = """
SELECT event_id, user_id, value
FROM events
WHERE event_type = 'error' AND value > 50.0
ORDER BY event_id
"""


SPARK_QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "join_inner": join_inner,
    "join_left": join_left,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_broadcast": join_broadcast,
    "join_range": join_range,
    "join_asof": join_asof,
    "agg_metrics": agg_metrics,
    "agg_distinct": agg_distinct,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_approx_distinct": agg_approx_distinct,
    "setop_union": setop_union,
    "setop_intersect": setop_intersect,
    "setop_except": setop_except,
    "sort_limit_topk": sort_limit_topk,
    "filter_pushdown": filter_pushdown,
}

ORACLE_SQL = {
    "q1_pricing_summary": _Q1_SQL,
    "join_inner": _JOIN_INNER_SQL,
    "join_left": _JOIN_LEFT_SQL,
    "join_semi": _JOIN_SEMI_SQL,
    "join_anti": _JOIN_ANTI_SQL,
    "join_broadcast": _JOIN_BROADCAST_SQL,
    "join_range": _JOIN_RANGE_SQL,
    "join_asof": _JOIN_ASOF_SQL,
    "agg_metrics": _AGG_METRICS_SQL,
    "agg_distinct": _AGG_DISTINCT_SQL,
    "agg_rollup": _AGG_ROLLUP_SQL,
    "agg_cube": _AGG_CUBE_SQL,
    "agg_approx_distinct": _AGG_APPROX_DISTINCT_SQL,
    "setop_union": _SETOP_UNION_SQL,
    "setop_intersect": _SETOP_INTERSECT_SQL,
    "setop_except": _SETOP_EXCEPT_SQL,
    "sort_limit_topk": _SORT_LIMIT_SQL,
    "filter_pushdown": _FILTER_PUSHDOWN_SQL,
}
