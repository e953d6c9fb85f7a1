"""TPC-H classic query shapes over the driver's TPC-H-ish star schema.

The reference delegates its whole analytical surface to ClickHouse
(SURVEY.md §2.F); these five queries are the canonical multi-join /
selective-filter / top-k shapes a warehouse user actually runs, adapted
to the columns the synthetic tables carry (no l_commitdate /
o_shippriority / c_address — see TESTDATA.md).  Together with
q1_pricing_summary (relational_q.py) they cover TPC-H Q1/Q3/Q5/Q6/Q10/
Q18 — the standard evidence that the join planner, broadcast selection,
and partial aggregation hold up.

Scale notes (100 TB):
- Dimension sides (region, nation, supplier, the filtered customer
  segment) broadcast; fact-fact joins (orders ⋈ lineitem) shuffle on
  the order key only AFTER the date filters cut them down — filters are
  pushed into the parquet scans (PushedFilters, pinned in
  tests/test_plans.py).
- Money aggregates use compat.dsum (floor-quantized int64 partial sums)
  so results are order- and engine-exact — see compat.py.
- Top-k results sort only |groups| rows with unique-key tiebreaks, and
  Spark's TakeOrderedAndProject keeps the global sort off the full set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..compat import dsum, quant, sql_dsum, sql_quant
from ..tables import load

_Q3_CUT = "1998-07-01"
_Q5_LO, _Q5_HI = "1996-01-01", "1997-01-01"
_Q10_LO, _Q10_HI = "1996-01-01", "1996-04-01"
_Q18_MIN_QTY = 150


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp")


def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): top-10 unshipped BUILDING-segment
    orders by revenue.  customer filters to one segment and broadcasts;
    orders ⋈ lineitem shuffles on the order key post-filter."""
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < _ts(_Q3_CUT))
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > _ts(_Q3_CUT))
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def tpch_q5_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue per ASIA nation where
    the supplier and customer share a nation.  region/nation/supplier
    broadcast; the only large shuffles are customer ⋈ orders on custkey
    and orders ⋈ lineitem on orderkey."""
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = load(spark, sf_dir, "customer").join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts(_Q5_LO)) & (F.col("o_orderdate") < _ts(_Q5_HI))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def tpch_q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): one scan, fully pushed-down
    predicates, one global sum — the minimal full-table filter-agg."""
    li = load(spark, sf_dir, "lineitem")
    sel = li.filter(
        (F.col("l_shipdate") >= _ts(_Q5_LO))
        & (F.col("l_shipdate") < _ts(_Q5_HI))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.09)
        & (F.col("l_quantity") < 24)
    )
    return sel.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by revenue
    lost to returns in one quarter."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts(_Q10_LO)) & (F.col("o_orderdate") < _ts(_Q10_HI))
    )
    cust = load(spark, sf_dir, "customer")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def tpch_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customer): orders whose total quantity
    exceeds a threshold, with their customer.  The HAVING side
    aggregates lineitem once on its natural key; only qualifying order
    keys (rare) flow into the joins."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(quant("l_quantity")).alias("qsum"))
        .filter(F.col("qsum") > _Q18_MIN_QTY * 10**4)
        .select(
            "l_orderkey",
            (F.col("qsum").cast("double") / F.lit(10**4)).alias("sum_qty"),
        )
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


_Q3_SQL = f"""
SELECT
  l_orderkey,
  o_orderdate,
  {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{_Q3_CUT}'
  AND l_shipdate > TIMESTAMP '{_Q3_CUT}'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

_Q5_SQL = f"""
SELECT
  n_name,
  {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '{_Q5_LO}'
  AND o_orderdate < TIMESTAMP '{_Q5_HI}'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""

_Q6_SQL = f"""
SELECT
  {sql_dsum('l_extendedprice * l_discount')} AS revenue,
  COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_Q5_LO}'
  AND l_shipdate < TIMESTAMP '{_Q5_HI}'
  AND l_discount >= 0.02 AND l_discount <= 0.09
  AND l_quantity < 24
"""

_Q10_SQL = f"""
SELECT
  c_custkey, c_name, c_acctbal,
  {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '{_Q10_LO}'
  AND o_orderdate < TIMESTAMP '{_Q10_HI}'
GROUP BY c_custkey, c_name, c_acctbal
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

_Q18_SQL = f"""
WITH big AS (
  SELECT l_orderkey, SUM({sql_quant('l_quantity')}) AS qsum
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM({sql_quant('l_quantity')}) > {_Q18_MIN_QTY * 10**4}
)
SELECT
  c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
  (CAST(qsum AS DOUBLE) / 10000) AS sum_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


SPARK_QUERIES = {
    "tpch_q3_shipping": tpch_q3_shipping,
    "tpch_q5_nation_volume": tpch_q5_nation_volume,
    "tpch_q6_revenue_delta": tpch_q6_revenue_delta,
    "tpch_q10_returns": tpch_q10_returns,
    "tpch_q18_big_orders": tpch_q18_big_orders,
}

ORACLE_SQL = {
    "tpch_q3_shipping": _Q3_SQL,
    "tpch_q5_nation_volume": _Q5_SQL,
    "tpch_q6_revenue_delta": _Q6_SQL,
    "tpch_q10_returns": _Q10_SQL,
    "tpch_q18_big_orders": _Q18_SQL,
}
