"""TPC-H classic query shapes over the driver's TPC-H-ish star schema.

The reference delegates its whole analytical surface to ClickHouse
(SURVEY.md §2.F); these queries are the canonical multi-join /
selective-filter / top-k / subquery shapes a warehouse user actually
runs, adapted to the columns the synthetic tables carry (no
l_commitdate / o_shippriority / c_address — see TESTDATA.md).  Together
with q1_pricing_summary (relational_q.py) they cover TPC-H
Q1/Q3/Q4/Q5/Q6/Q10/Q14/Q17/Q18/Q22 — join planning, broadcast
selection, partial aggregation, EXISTS decorrelation, conditional
aggregation, correlated-scalar-average rewrite, and anti joins.

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

import re

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


def tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking), EXISTS form: count orders per
    priority that have at least one line shipped after the order date.
    Written as a correlated EXISTS subquery in SQL so Catalyst's
    rewrite-to-left-semi decorrelation is the surface under test — at
    scale the semi join shuffles each side once on the order key and
    never multiplies rows."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    orders.createOrReplaceTempView("t_orders")
    li.createOrReplaceTempView("t_lineitem")
    return spark.sql(
        f"""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM t_orders
        WHERE o_orderdate >= TIMESTAMP '{_Q5_LO}'
          AND o_orderdate < TIMESTAMP '{_Q5_HI}'
          AND EXISTS (
            SELECT 1 FROM t_lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


def tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): PROMO revenue share of one month,
    via conditional aggregation over the part join — part broadcasts;
    the ratio is one division of identical quantized operands."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-03-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    part = load(spark, sf_dir, "part")
    rev = quant(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).cast(
                "double"
            )
            / F.sum(rev).cast("double"),
            6,
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


def tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lines under 50% of
    their part's average quantity.  The correlated scalar subquery
    decorrelates to one aggregate over lineitem re-joined on partkey —
    expressed directly in that decorrelated DataFrame shape (the plan
    Catalyst would produce), since the avg side is a partial-aggregated
    shuffle, not a per-row subquery loop.  Integer-exact threshold:
    qty*10 < 5*avg_scaled with avg as an exact integer ratio
    (2*sum < n*qty flips to sum*10 > ... kept multiplicative)."""
    li = load(spark, sf_dir, "lineitem")
    qq = F.floor(F.col("l_quantity") * 10000).cast("long")
    avg_side = (
        li.select("l_partkey", qq.alias("qq"))
        .groupBy("l_partkey")
        .agg(F.sum("qq").alias("sq"), F.count(F.lit(1)).alias("nq"))
        .select(F.col("l_partkey").alias("p_key"), "sq", "nq")
    )
    rev = quant(F.col("l_extendedprice"))
    return (
        li.select("l_partkey", qq.alias("qq"), rev.alias("rev"))
        .join(avg_side, F.col("l_partkey") == F.col("p_key"))
        # qty < 0.5 * avg  <=>  qq * 2 * nq < sq  (all exact int64)
        .filter(F.col("qq") * 2 * F.col("nq") < F.col("sq"))
        .agg(
            (F.sum("rev").cast("double") / F.lit(10000.0 * 7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


def tpch_q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): positive-balance customers
    above the average positive balance with NO recent orders
    (none since 1999) — scalar subquery (one broadcast 1-row aggregate)
    + anti join, grouped by a
    derived segment (custkey mod 7 stands in for the missing phone
    country code)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    qbal = F.floor(F.col("c_acctbal") * 100).cast("long")
    avg_pos = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(F.sum(qbal).alias("s"), F.count(F.lit(1)).alias("n"))
    )
    rich = (
        cust.select("c_custkey", qbal.alias("qb"))
        .crossJoin(F.broadcast(avg_pos))
        # bal > avg  <=>  qb * n > s  (exact int64)
        .filter(F.col("qb") * F.col("n") > F.col("s"))
    )
    recent = orders.filter(F.col("o_orderdate") >= _ts("1999-01-01"))
    no_orders = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return (
        no_orders.groupBy((F.col("c_custkey") % 7).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("qb").cast("double") / 100).alias("totacctbal"),
        )
    )


_Q4_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{_Q5_LO}'
  AND o_orderdate < TIMESTAMP '{_Q5_HI}'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

_Q14_SQL = f"""
SELECT
  round(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN {sql_quant('l_extendedprice * (1 - l_discount)')}
                   ELSE 0 END) AS DOUBLE)
        / CAST(SUM({sql_quant('l_extendedprice * (1 - l_discount)')}) AS DOUBLE),
        6) AS promo_revenue_pct,
  COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""

_Q17_SQL = """
WITH q AS (
  SELECT l_partkey, CAST(FLOOR(l_quantity * 10000) AS BIGINT) AS qq,
         CAST(FLOOR(l_extendedprice * 10000) AS BIGINT) AS rev
  FROM lineitem
),
avg_side AS (
  SELECT l_partkey AS p_key, SUM(qq) AS sq, COUNT(*) AS nq
  FROM q GROUP BY 1
)
SELECT CAST(SUM(q.rev) AS DOUBLE) / (10000.0 * 7.0) AS avg_yearly,
       COUNT(*) AS n_small
FROM q JOIN avg_side ON q.l_partkey = avg_side.p_key
WHERE q.qq * 2 * avg_side.nq < avg_side.sq
"""

_Q22_SQL = """
WITH qc AS (
  SELECT c_custkey, CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS qb, c_acctbal
  FROM customer
),
avg_pos AS (
  SELECT SUM(qb) AS s, COUNT(*) AS n FROM qc WHERE c_acctbal > 0.0
)
SELECT c_custkey % 7 AS cntrycode,
       COUNT(*) AS numcust,
       CAST(SUM(qb) AS DOUBLE) / 100 AS totacctbal
FROM qc CROSS JOIN avg_pos
WHERE qb * n > s
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1
ORDER BY 1
"""

SPARK_QUERIES.update(
    {
        "tpch_q4_priority": tpch_q4_priority,
        "tpch_q14_promo": tpch_q14_promo,
        "tpch_q17_small_qty": tpch_q17_small_qty,
        "tpch_q22_global_sales": tpch_q22_global_sales,
    }
)
ORACLE_SQL.update(
    {
        "tpch_q4_priority": _Q4_SQL,
        "tpch_q14_promo": _Q14_SQL,
        "tpch_q17_small_qty": _Q17_SQL,
        "tpch_q22_global_sales": _Q22_SQL,
    }
)


# ---------------------------------------------------------------------------
# Round 6: the remaining decorrelation shapes — Q2 (correlated scalar MIN
# per group), Q11 (group-filtered fraction-of-global), Q15 (scalar MAX
# against a view-style aggregate).  The synthetic schema has no partsupp
# table, so lineitem's (l_partkey, l_suppkey) pairs act as the supply
# relation with an exact quantized unit cost; everything else keeps the
# canonical TPC-H shape.  All three run through spark.sql so Catalyst's
# subquery decorrelation is the surface under test.
#
# Scale notes (100 TB): the supply CTE is one (part, supp) shuffle with
# map-side partial MIN; Q2's correlated MIN decorrelates to a per-part
# aggregate joined back on the part key (equi, never BNLJ); Q11/Q15's
# scalar subqueries are 1-row aggregates Spark injects as literals after
# an independent subquery execution — no join multiplies fact rows.

_Q2_TEMPLATE = """
WITH supply AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         MIN(CAST(FLOOR((l_extendedprice / l_quantity) * 10000) AS BIGINT)) AS qcost
  FROM {lineitem} GROUP BY 1, 2
),
esupp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM {supplier}
  JOIN {nation} ON s_nationkey = n_nationkey
  JOIN {region} ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey, p.p_type,
       CAST(sp.qcost AS DOUBLE) / 10000 AS unit_cost
FROM {part} p
JOIN supply sp ON sp.partkey = p.p_partkey
JOIN esupp s ON s.s_suppkey = sp.suppkey
WHERE p.p_size <= 10 AND p.p_type = 'STANDARD'
  AND sp.qcost = (
    SELECT MIN(sp2.qcost)
    FROM supply sp2 JOIN esupp s2 ON s2.s_suppkey = sp2.suppkey
    WHERE sp2.partkey = p.p_partkey
  )
ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p.p_partkey
LIMIT 100
"""

# Spark-side Q2 (r16): one supply pass, part-key semi join pushed below
# the aggregation, correlated MIN -> window min.  The oracle keeps the
# canonical correlated _Q2_TEMPLATE; equivalence argument in the
# tpch_q2_min_cost docstring.  p_type is the filter constant and
# partkey membership in fpart is enforced by the semi join, so the
# final part join is redundant and elided.
_Q2_SPARK_TEMPLATE = """
WITH fpart AS (
  SELECT p_partkey FROM {part}
  WHERE p_size <= 10 AND p_type = 'STANDARD'
),
supply AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         MIN(CAST(FLOOR((l_extendedprice / l_quantity) * 10000) AS BIGINT)) AS qcost
  FROM {lineitem}
  WHERE l_partkey IN (SELECT p_partkey FROM fpart)
  GROUP BY 1, 2
),
esupp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM {supplier}
  JOIN {nation} ON s_nationkey = n_nationkey
  JOIN {region} ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
emin AS (
  SELECT s.s_acctbal, s.s_name, s.n_name, sp.partkey, sp.qcost,
         MIN(sp.qcost) OVER (PARTITION BY sp.partkey) AS min_qcost
  FROM supply sp JOIN esupp s ON s.s_suppkey = sp.suppkey
)
SELECT s_acctbal, s_name, n_name, partkey AS p_partkey,
       'STANDARD' AS p_type,
       CAST(qcost AS DOUBLE) / 10000 AS unit_cost
FROM emin
WHERE qcost = min_qcost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

_Q11_TEMPLATE = """
WITH val AS (
  SELECT l_partkey AS partkey,
         CAST(FLOOR(l_extendedprice * 10000) AS BIGINT) AS v
  FROM {lineitem}
  JOIN {supplier} ON l_suppkey = s_suppkey
  JOIN {nation} ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
)
SELECT partkey, CAST(SUM(v) AS DOUBLE) / 10000 AS stock_value
FROM val
GROUP BY partkey
HAVING SUM(v) * 1000 > (SELECT SUM(v) FROM val)
ORDER BY stock_value DESC, partkey
"""

_Q15_TEMPLATE = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS total_q
  FROM {lineitem}
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(total_q AS DOUBLE) / 10000 AS total_revenue
FROM {supplier} JOIN revenue ON s_suppkey = supplier_no
WHERE total_q = (SELECT MAX(total_q) FROM revenue)
ORDER BY s_suppkey
"""

_TPCH_TABLES = (
    "lineitem",
    "supplier",
    "nation",
    "region",
    "part",
    "customer",
    "orders",
)


def _no_tail_sort(template: str) -> str:
    """Spark-side variant of a template with the final ORDER BY dropped.

    Used only for queries whose output cardinality grows with the corpus
    (Q11 parts, Q13 distribution buckets, Q15 tied top suppliers, Q20
    qualifying suppliers): the canonical tail sort is presentation-only,
    the driver's value hash is order-insensitive, and at scale it costs
    a full extra rangepartitioning shuffle + sort of the result.  The
    DuckDB oracle keeps the canonical ORDER BY (free there, and it
    documents the canonical query text).  Bounded-output TPC-H sorts
    (constant group domains like returnflag/shipmode/nation) keep theirs
    on both sides.

    Fails loudly (assert) unless exactly one substitution occurred: a
    future edit that leaves the template no longer ending in a bare
    ORDER BY line (a trailing LIMIT, semicolon, or whitespace) would
    otherwise silently reintroduce the corpus-scale tail sort — and for
    Q13 the plan sweep would not catch it, since its sort key classifies
    as value-domain.
    """
    stripped, n = re.subn(r"\nORDER BY[^\n]*(\n?)$", r"\1", template)
    assert n == 1, (
        f"_no_tail_sort expects the template to end with a bare ORDER BY "
        f"line, found {n} matches — tail sort NOT stripped; template ends: "
        f"{template[-80:]!r}"
    )
    return stripped


def _run_tpch_sql(spark: SparkSession, sf_dir: str, template: str) -> DataFrame:
    names = {}
    for t in _TPCH_TABLES:
        if "{" + t + "}" in template:
            view = f"t_tpch_{t}"
            load(spark, sf_dir, t).createOrReplaceTempView(view)
            names[t] = view
        else:
            names[t] = t
    return spark.sql(template.format(**names))


def tpch_q2_min_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): for each qualifying part, the
    EUROPE suppliers offering exactly the minimum unit cost — the
    correlated-scalar-MIN shape.  The ORACLE keeps the canonical
    correlated form (_Q2_TEMPLATE); the Spark side runs the equivalent
    single-pass shape (_Q2_SPARK_TEMPLATE, r16 — guide §2.4/§3.2/§3.3):

    - the decorrelated plan computed the supply CTE TWICE (two full
      lineitem scans + two (partkey, suppkey) agg shuffles — zero
      ReusedExchange, plans/r16/tpch_q2_min_cost_executed_before.txt)
      and joined the per-part MIN back over a SortMergeJoin; the
      correlated MIN per part IS the window min over the same joined
      relation, so one supply pass + MIN() OVER (PARTITION BY partkey)
      replaces supply #2, the min aggregate, and the (qcost, partkey)
      join back (the corpus_prepare window-min precedent, r15);
    - the part predicate keeps 3.2% of parts, so a semi join on the
      filtered part keys BELOW the supply aggregation drops ~97% of
      lineitem BEFORE the (partkey, suppkey) exchange (§3.2's
      reduce-the-big-side, realized as a broadcast semi join on the
      dimension — exact, not approximate: restricting supply by
      partkey keeps every surviving part's full pair set, so each
      per-part MIN is unchanged).

    Equivalence proven against the canonical oracle at sf0.001/0.01/
    0.1 (tools/parity, value-hash) — same rows, same tail order."""
    return _run_tpch_sql(spark, sf_dir, _Q2_SPARK_TEMPLATE)


def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): per-part supply value among one
    nation's suppliers, keeping parts above 1/1000 of that nation's
    global value — the group-filtered fraction-of-global shape.  The
    global total is a 1-row scalar subquery (independent execution,
    injected as a literal); the comparison stays in exact int64
    (sum*1000 vs total, no double fraction)."""
    return _run_tpch_sql(spark, sf_dir, _no_tail_sort(_Q11_TEMPLATE))


def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): suppliers whose quarterly revenue
    equals the maximum — the scalar-MAX-against-a-view shape (the
    reference DDL's delegated warehouse runs exactly this report).  The
    revenue CTE aggregates once; the MAX is a 1-row scalar subquery;
    ties all surface (engine-exact quantized equality)."""
    return _run_tpch_sql(spark, sf_dir, _no_tail_sort(_Q15_TEMPLATE))


_IDENT = {t: t for t in _TPCH_TABLES}

SPARK_QUERIES.update(
    {
        "tpch_q2_min_cost": tpch_q2_min_cost,
        "tpch_q11_important_stock": tpch_q11_important_stock,
        "tpch_q15_top_supplier": tpch_q15_top_supplier,
    }
)
ORACLE_SQL.update(
    {
        "tpch_q2_min_cost": _Q2_TEMPLATE.format(**_IDENT),
        "tpch_q11_important_stock": _Q11_TEMPLATE.format(**_IDENT),
        "tpch_q15_top_supplier": _Q15_TEMPLATE.format(**_IDENT),
    }
)


# ---------------------------------------------------------------------------
# Round 7: the remaining canonical warehouse shapes — Q13 (left outer
# join + count distribution), Q16 (NOT IN + countDistinct), Q21
# (multi-EXISTS/NOT-EXISTS).  Adaptations to the synthetic schema:
# Q13's comment filter becomes an order-priority filter; Q16's
# complaining-supplier blacklist becomes the negative-balance suppliers
# (same NOT IN decorrelation, 6-row excluded set); Q21's receipt-vs-
# commit lateness becomes ship-more-than-60-days-after-order, computed
# once in a lineitem⋈orders CTE so the EXISTS correlation stays a pure
# equi key (l_orderkey) that Spark turns into semi/anti hash joins.
#
# Scale notes (100 TB): Q13's outer join shuffles on custkey with the
# priority filter pushed below the join; both aggregations are partial
# (the second groups |distinct counts| ≈ tens of rows).  Q16's NOT IN
# set is dimension-bounded (suppliers) and broadcasts as a null-aware
# anti join; count(DISTINCT) is Spark's two-phase expand+partial, never
# a driver collect.  Q21 scans lineitem⋈orders once into the CTE; the
# EXISTS/NOT EXISTS become left-semi/left-anti shuffles on l_orderkey —
# no row multiplication, and the final group is |suppliers|-bounded.

_Q13_TEMPLATE = """
WITH c_orders AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM {customer} LEFT OUTER JOIN {orders}
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

_Q16_TEMPLATE = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM {lineitem} JOIN {part} ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 7, 13, 19, 25, 31, 37, 43)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM {supplier} WHERE s_acctbal < 0.0
  )
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

_Q21_TEMPLATE = """
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS is_late
  FROM {lineitem} JOIN {orders} ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, COUNT(*) AS numwait
FROM l l1
JOIN {supplier} ON s_suppkey = l1.l_suppkey
JOIN {nation} ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
  AND l1.is_late
  AND EXISTS (
    SELECT 1 FROM l l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM l l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.is_late
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def tpch_q13_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): how many customers placed k
    non-urgent orders, for each k — the left-outer-join + two-level
    aggregation shape (zero-order customers must surface as c_count=0,
    which only the outer join preserves)."""
    return _run_tpch_sql(spark, sf_dir, _no_tail_sort(_Q13_TEMPLATE))


def tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): distinct supplier count
    per (brand, type, size) bucket excluding blacklisted suppliers — the
    NOT IN (null-aware anti join) + COUNT(DISTINCT) shape.  lineitem's
    (l_partkey, l_suppkey) pairs act as partsupp (the synthetic schema
    has no partsupp table)."""
    return _run_tpch_sql(spark, sf_dir, _Q16_TEMPLATE)


def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): for finished
    multi-supplier orders, count per supplier the times it was the ONLY
    late supplier in the order — the multi-EXISTS/NOT-EXISTS shape.
    Lateness (ship > order date + 60d) is computed once in the CTE so
    both subqueries correlate on the pure equi key l_orderkey.

    r16 MEASURED AND REJECTED: materializing the ``l`` CTE once (it is
    referenced by l1, the EXISTS, and the NOT EXISTS, and the executed
    plan computes the fact join three times with zero ReusedExchange).
    Under write-only timing the checkpoint looked 0.79x at decade, but
    with the materialization charged to the SAME timed window as the
    rest of the query (construct+write) the three-arm A/B read plain
    0.82 / ckpt 0.84 / persist 0.81 s at sf0.1 and plain 1.96 / ckpt
    2.14 / persist 2.09 s at decade — the three duplicated subtrees
    run CONCURRENTLY on idle cores and beat compute-once-then-fan-out
    (the r15 funnel-chain lesson, reconfirmed).  Canonical form kept."""
    return _run_tpch_sql(spark, sf_dir, _Q21_TEMPLATE)


SPARK_QUERIES.update(
    {
        "tpch_q13_cust_distribution": tpch_q13_cust_distribution,
        "tpch_q16_supplier_cnt": tpch_q16_supplier_cnt,
        "tpch_q21_waiting_supplier": tpch_q21_waiting_supplier,
    }
)
ORACLE_SQL.update(
    {
        "tpch_q13_cust_distribution": _Q13_TEMPLATE.format(**_IDENT),
        "tpch_q16_supplier_cnt": _Q16_TEMPLATE.format(**_IDENT),
        "tpch_q21_waiting_supplier": _Q21_TEMPLATE.format(**_IDENT),
    }
)


# ---------------------------------------------------------------------------
# Round 7 (second batch): the remaining canonical shapes the synthetic
# schema supports — Q7 (nation-pair volume), Q8 (market share), Q9
# (product profit, supply CTE as in Q2), Q19 (disjunctive predicate
# pushdown; p_size stands in for the missing p_container), Q20 (nested
# dominant-supplier selection; "supplied >50% of a part's annual
# quantity" stands in for the missing partsupp.availqty).  Q12 follows
# in a third batch below (derived ship mode + ship-delay lateness, the
# same adaptation style as Q21/Q22), completing all 22 canonical
# shapes.
#
# Scale notes (100 TB): Q7/Q8/Q9 are star joins — nation/region/
# supplier/part broadcast, the only big shuffles are orders ⋈ lineitem
# on the order key and (Q9) the supply CTE's one (part, supp) partial
# MIN; market share and profit are conditional/arithmetic aggregates in
# ONE grouped pass (no second scan).  Q19 is scan + broadcast part join
# with the OR-of-triples evaluated as a residual filter (brand/size
# conjuncts push into the part scan).  Q20 reduces lineitem to per-
# (part, supp) partials FIRST, joins two agg outputs part-to-part, and
# only then touches the supplier dim via semi join — no fact-side row
# multiplication anywhere.

_Q7_TEMPLATE = """
WITH shipping AS (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS vol
  FROM {supplier}
  JOIN {lineitem} ON s_suppkey = l_suppkey
  JOIN {orders} ON o_orderkey = l_orderkey
  JOIN {customer} ON c_custkey = o_custkey
  JOIN {nation} n1 ON s_nationkey = n1.n_nationkey
  JOIN {nation} n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_5' AND n2.n_name = 'NATION_8')
      OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_5'))
    AND l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
)
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(vol) AS DOUBLE) / 10000 AS revenue
FROM shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

_Q8_TEMPLATE = """
WITH all_nations AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS vol,
         n2.n_name AS supp_nation
  FROM {part}
  JOIN {lineitem} ON p_partkey = l_partkey
  JOIN {supplier} ON s_suppkey = l_suppkey
  JOIN {orders} ON l_orderkey = o_orderkey
  JOIN {customer} ON o_custkey = c_custkey
  JOIN {nation} n1 ON c_nationkey = n1.n_nationkey
  JOIN {region} ON n1.n_regionkey = r_regionkey
  JOIN {nation} n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0 END) AS DOUBLE)
         / CAST(SUM(vol) AS DOUBLE) AS mkt_share,
       COUNT(*) AS n_rows
FROM all_nations
GROUP BY o_year
ORDER BY o_year
"""

_Q9_TEMPLATE = """
WITH supply AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         MIN(CAST(FLOOR((l_extendedprice / l_quantity) * 10000) AS BIGINT)) AS qcost
  FROM {lineitem} GROUP BY 1, 2
)
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
           - CAST(FLOOR(sp.qcost * l_quantity) AS BIGINT)) AS DOUBLE) / 10000 AS sum_profit
FROM {part}
JOIN {lineitem} ON p_partkey = l_partkey
JOIN supply sp ON sp.partkey = l_partkey AND sp.suppkey = l_suppkey
JOIN {supplier} ON s_suppkey = l_suppkey
JOIN {orders} ON o_orderkey = l_orderkey
JOIN {nation} ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
ORDER BY nation, o_year DESC
"""

# Spark-side Q9 (r16, guide §3.2): the supply CTE aggregated EVERY
# (partkey, suppkey) pair, but the query only consumes pairs of
# '%red%' parts (12.9% of parts) — the main join discards the rest
# after the full agg shuffle.  Pushing a semi join on the red part
# keys BELOW the aggregation drops ~87% of lineitem before the supply
# exchange.  Exact: supply is keyed by partkey, and every partkey the
# main query can reference survives the semi join with its full pair
# set, so each retained (partkey, suppkey) MIN is unchanged.  The
# oracle keeps the canonical _Q9_TEMPLATE.
_Q9_SPARK_TEMPLATE = """
WITH rpart AS (
  SELECT p_partkey FROM {part} WHERE p_name LIKE '%red%'
),
supply AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         MIN(CAST(FLOOR((l_extendedprice / l_quantity) * 10000) AS BIGINT)) AS qcost
  FROM {lineitem}
  WHERE l_partkey IN (SELECT p_partkey FROM rpart)
  GROUP BY 1, 2
)
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
           - CAST(FLOOR(sp.qcost * l_quantity) AS BIGINT)) AS DOUBLE) / 10000 AS sum_profit
FROM {part}
JOIN {lineitem} ON p_partkey = l_partkey
JOIN supply sp ON sp.partkey = l_partkey AND sp.suppkey = l_suppkey
JOIN {supplier} ON s_suppkey = l_suppkey
JOIN {orders} ON o_orderkey = l_orderkey
JOIN {nation} ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, o_year
ORDER BY nation, o_year DESC
"""

_Q19_TEMPLATE = """
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
         / 10000 AS revenue,
       COUNT(*) AS n_items
FROM {lineitem} JOIN {part} ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
       AND l_quantity >= 20 AND l_quantity <= 30)
"""

_Q20_TEMPLATE = """
WITH part_year AS (
  SELECT l_partkey, l_suppkey,
         CAST(FLOOR(l_quantity * 10000) AS BIGINT) AS qq
  FROM {lineitem}
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
    AND l_partkey IN (SELECT p_partkey FROM {part} WHERE p_name LIKE 'red%')
),
per_pair AS (
  SELECT l_partkey, l_suppkey, SUM(qq) AS pair_qty
  FROM part_year GROUP BY 1, 2
),
per_part AS (
  SELECT l_partkey, SUM(pair_qty) AS part_qty FROM per_pair GROUP BY 1
),
dominant AS (
  SELECT DISTINCT pp.l_suppkey
  FROM per_pair pp JOIN per_part pt ON pp.l_partkey = pt.l_partkey
  WHERE pp.pair_qty * 2 > pt.part_qty
)
SELECT s_name, s_acctbal
FROM {supplier}
JOIN {nation} ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND s_suppkey IN (SELECT l_suppkey FROM dominant)
ORDER BY s_name
"""


def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade volume between two
    nations by ship year — the two-role dimension shape (nation joined
    twice under different keys, OR'd pair filter)."""
    return _run_tpch_sql(spark, sf_dir, _Q7_TEMPLATE)


def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): one nation's share of a
    region's yearly volume for one part type — conditional share in a
    single grouped pass; the division is one IEEE op over two exact
    int64 sums, engine-identical."""
    return _run_tpch_sql(spark, sf_dir, _Q8_TEMPLATE)


def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product type profit): per-nation yearly profit
    (revenue minus supply cost) for a part-name family; the supply
    relation is the same lineitem-derived min-unit-cost CTE Q2 uses
    (the synthetic schema has no partsupp).  r16: the Spark side runs
    _Q9_SPARK_TEMPLATE — the red-part semi join pushed below the
    supply aggregation (§3.2; equivalence note at the template) — the
    oracle keeps the canonical _Q9_TEMPLATE."""
    return _run_tpch_sql(spark, sf_dir, _Q9_SPARK_TEMPLATE)


def tpch_q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): revenue under an OR of three
    (brand, size-range, quantity-range) triples — the disjunctive-
    predicate shape; p_size stands in for the schema's missing
    p_container."""
    return _run_tpch_sql(spark, sf_dir, _Q19_TEMPLATE)


def tpch_q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion, adapted): suppliers in one
    nation who supplied more than half of a red-part's shipped quantity
    in a year — the nested IN + threshold-vs-group-total shape
    (partsupp.availqty does not exist; annual shipped share replaces
    it).  Two stacked aggregations join part-to-part; the supplier dim
    enters last via semi join."""
    return _run_tpch_sql(spark, sf_dir, _no_tail_sort(_Q20_TEMPLATE))


SPARK_QUERIES.update(
    {
        "tpch_q7_volume_shipping": tpch_q7_volume_shipping,
        "tpch_q8_market_share": tpch_q8_market_share,
        "tpch_q9_product_profit": tpch_q9_product_profit,
        "tpch_q19_discounted_revenue": tpch_q19_discounted_revenue,
        "tpch_q20_dominant_supplier": tpch_q20_dominant_supplier,
    }
)
ORACLE_SQL.update(
    {
        "tpch_q7_volume_shipping": _Q7_TEMPLATE.format(**_IDENT),
        "tpch_q8_market_share": _Q8_TEMPLATE.format(**_IDENT),
        "tpch_q9_product_profit": _Q9_TEMPLATE.format(**_IDENT),
        "tpch_q19_discounted_revenue": _Q19_TEMPLATE.format(**_IDENT),
        "tpch_q20_dominant_supplier": _Q20_TEMPLATE.format(**_IDENT),
    }
)


# ---------------------------------------------------------------------------
# Round 7 (third batch): Q12, the last canonical shape — shipping-mode
# priority counting (reference DDL's delegated warehouse runs this class
# of report; clickhouse.go's INSERT schema carries no mode column, so
# the analytical surface is where it lives).  The synthetic schema has
# no l_shipmode / l_commitdate / l_receiptdate; the adaptation keeps the
# shape exactly: the mode is a deterministic 7-way hash of the line key
# (the same stand-in style as Q22's custkey%7 country code), and "late"
# is ship-more-than-60-days-after-order (Q21's lateness).  What the
# shape exercises is unchanged: fact-fact join, a derived low-cardinality
# dimension, and a two-way conditional count per group.
#
# Scale notes (100 TB): the mode filter references only lineitem columns
# so Catalyst pushes it below the join (the scan keeps ~2/7 of lines
# before shuffling on the order key); the conditional counts are one
# grouped pass with map-side partials over a 2-row group space.
# COUNT(CASE WHEN ... THEN 1 END) (not SUM of 0/1) keeps the output
# BIGINT in both engines and drops NULL-priority rows from both
# counters symmetrically — pinned by the NULL-twin robustness sweep.

_Q12_LO, _Q12_HI = "1996-01-01", "1997-01-01"
_Q12_HIGH = ("1-URGENT", "2-HIGH")


def tpch_q12_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority, adapted): per ship
    mode, how many late-shipped lines belonged to high- vs low-priority
    orders in one year.  Mode is a derived 7-way hash of
    (l_orderkey, l_linenumber) filtered to MAIL/SHIP; lateness is
    ship > order date + 60 days (see batch comment for the adaptation
    rationale)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts(_Q12_LO)) & (F.col("l_shipdate") < _ts(_Q12_HI))
    )
    bucket = (F.col("l_orderkey") * 31 + F.col("l_linenumber")) % 7
    li = li.withColumn("_mb", bucket).filter(F.col("_mb").isin(2, 5))
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin(*_Q12_HIGH)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy(
            F.when(F.col("_mb") == 2, F.lit("MAIL"))
            .otherwise(F.lit("SHIP"))
            .alias("shipmode")
        )
        .agg(
            F.count(F.when(high, F.lit(1))).alias("high_line_count"),
            F.count(F.when(~high, F.lit(1))).alias("low_line_count"),
        )
        .orderBy("shipmode")
    )


_Q12_SQL = f"""
SELECT CASE (l_orderkey * 31 + l_linenumber) % 7 WHEN 2 THEN 'MAIL' ELSE 'SHIP' END
         AS shipmode,
       COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END)
         AS high_line_count,
       COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END)
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{_Q12_LO}'
  AND l_shipdate < TIMESTAMP '{_Q12_HI}'
  AND (l_orderkey * 31 + l_linenumber) % 7 IN (2, 5)
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY 1
ORDER BY 1
"""

SPARK_QUERIES["tpch_q12_shipmode"] = tpch_q12_shipmode
ORACLE_SQL["tpch_q12_shipmode"] = _Q12_SQL
