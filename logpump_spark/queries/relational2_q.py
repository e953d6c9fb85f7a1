"""Relational coverage, batch 2 (SURVEY.md §2.G): statistical aggregates,
percentiles, pivot, grouping sets, full-outer/cross joins, and the SQL-API
subquery surface (IN / EXISTS / scalar / CTE via spark.sql over temp
views).

Engine-parity technique for second-moment statistics: variance/stddev/
covariance/correlation are computed from QUANTIZED INTEGER power sums
(n, S=sum(q), S2=sum(q^2), q=floor(x*10^4)) and combined with one fixed
double formula — integer sums are order-independent and the final
arithmetic is identical IEEE in both engines.  Raw stddev_samp(double)
would differ in merge order between Spark partials and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..operators.materialize import materialize as _mat

from ..compat import dsum, quant, sql_dsum, sql_quant
from ..tables import load


def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance/stddev per event type from quantized power sums.
    Map-side combinable (two integer sums + count) -> one shuffle row per
    group at any scale."""
    ev = load(spark, sf_dir, "events")
    q = quant("value")
    n = F.count(F.lit(1)).cast("double")
    s = F.sum(q).cast("double")
    # square-sum in decimal(38,0): exact at any row count (int64 would
    # overflow past ~1e6 rows of 1e12-sized squares)
    s2 = F.sum(q.cast("decimal(19,0)") * q.cast("decimal(19,0)")).cast("double")
    var = (s2 - s * s / n) / (n - F.lit(1.0)) / F.lit(1e8)
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            var.alias("var_value"),
            F.sqrt(var).alias("std_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


_Q2 = (
    f"CAST(SUM(CAST({sql_quant('value')} AS DECIMAL(19,0))"
    f" * CAST({sql_quant('value')} AS DECIMAL(19,0))) AS DOUBLE)"
)

_AGG_STATS_SQL = f"""
SELECT event_type,
  COUNT(*) AS n,
  ({_Q2}
   - CAST(SUM({sql_quant('value')}) AS DOUBLE) * CAST(SUM({sql_quant('value')}) AS DOUBLE)
     / CAST(COUNT(*) AS DOUBLE))
  / (CAST(COUNT(*) AS DOUBLE) - 1.0) / 1e8 AS var_value,
  sqrt(({_Q2}
   - CAST(SUM({sql_quant('value')}) AS DOUBLE) * CAST(SUM({sql_quant('value')}) AS DOUBLE)
     / CAST(COUNT(*) AS DOUBLE))
  / (CAST(COUNT(*) AS DOUBLE) - 1.0) / 1e8) AS std_value,
  MIN(value) AS min_value,
  MAX(value) AS max_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + population covariance of (quantity, price)
    per return flag, from quantized cross sums."""
    li = load(spark, sf_dir, "lineitem")
    qx, qy = quant("l_quantity"), quant("l_extendedprice")

    # second moments overflow int64 (q^2 ~ 1e18 per ROW for 1e5-scale
    # prices) -> multiply and sum in decimal(38,0): still exact and
    # order-independent, headroom to ~1e38
    def dsum2(a, b):
        return F.sum(a.cast("decimal(19,0)") * b.cast("decimal(19,0)")).cast("double")

    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum(qx).cast("double"), F.sum(qy).cast("double")
    sxx = dsum2(qx, qx)
    syy = dsum2(qy, qy)
    sxy = dsum2(qx, qy)
    cov = (sxy - sx * sy / n) / n / F.lit(1e8)
    corr = (sxy - sx * sy / n) / (
        F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)
    )
    return (
        li.groupBy("l_returnflag")
        .agg(cov.alias("covar_pop_qp"), corr.alias("corr_qp"))
        .orderBy("l_returnflag")
    )


_AGG_CORR_SQL = f"""
WITH s AS (
  SELECT l_returnflag,
    CAST(COUNT(*) AS DOUBLE) AS n,
    CAST(SUM({sql_quant('l_quantity')}) AS DOUBLE) AS sx,
    CAST(SUM({sql_quant('l_extendedprice')}) AS DOUBLE) AS sy,
    CAST(SUM(CAST({sql_quant('l_quantity')} AS DECIMAL(19,0)) * CAST({sql_quant('l_quantity')} AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST({sql_quant('l_extendedprice')} AS DECIMAL(19,0)) * CAST({sql_quant('l_extendedprice')} AS DECIMAL(19,0))) AS DOUBLE) AS syy,
    CAST(SUM(CAST({sql_quant('l_quantity')} AS DECIMAL(19,0)) * CAST({sql_quant('l_extendedprice')} AS DECIMAL(19,0))) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
  (sxy - sx * sy / n) / n / 1e8 AS covar_pop_qp,
  (sxy - sx * sy / n) / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr_qp
FROM s ORDER BY l_returnflag
"""


def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (median, p25, p90) per event
    type, rounded 6dp to absorb interpolation-arithmetic ULPs.  The exact
    form needs a per-group sort; approx_percentile is the sketch-merge
    variant for 100 TB (checked rows-only via agg_approx_distinct's
    pattern)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.25)"), 6).alias("p25"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        )
        .orderBy("event_type")
    )


_AGG_PERCENTILE_SQL = """
SELECT event_type,
  ROUND(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS p50,
  ROUND(quantile_cont(CAST(value AS DOUBLE), 0.25), 6) AS p25,
  ROUND(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90,
FROM events GROUP BY event_type ORDER BY event_type
"""


def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one column per event type with per-day counts.  Spark's
    pivot with an EXPLICIT value list compiles to conditional aggregates —
    no extra pass to discover values (required form at scale)."""
    ev = load(spark, sf_dir, "events").withColumn("day", F.date_trunc("day", "ts"))
    types = ["click", "error", "purchase", "signup", "view"]
    pv = ev.groupBy("day").pivot("event_type", types).agg(F.count(F.lit(1)))
    # empty pivot cells are NULL in Spark but 0 under the oracle's
    # COUNT FILTER — invisible on dense fixtures, divergent on any day
    # missing a type; pin the count semantics with coalesce
    return pv.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    ).orderBy("day")


_AGG_PIVOT_SQL = """
SELECT date_trunc('day', ts) AS day,
  COUNT(*) FILTER (event_type = 'click') AS click,
  COUNT(*) FILTER (event_type = 'error') AS error,
  COUNT(*) FILTER (event_type = 'purchase') AS purchase,
  COUNT(*) FILTER (event_type = 'signup') AS signup,
  COUNT(*) FILTER (event_type = 'view') AS view
FROM events GROUP BY 1 ORDER BY day
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (not derivable from rollup/cube) via the SQL
    API over a temp view."""
    ev = load(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events_gs")
    return spark.sql(
        """
        SELECT event_type, user_id % 10 AS user_bucket, COUNT(*) AS n
        FROM events_gs
        GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
        ORDER BY event_type ASC NULLS FIRST, user_bucket ASC NULLS FIRST
        """
    )


_AGG_GROUPING_SETS_SQL = """
SELECT event_type, user_id % 10 AS user_bucket, COUNT(*) AS n
FROM events
GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())
ORDER BY event_type ASC NULLS FIRST, user_bucket ASC NULLS FIRST
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER with genuinely unmatched rows on both sides, classified."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    j = cust.join(orders, cust.c_custkey == orders.o_custkey, "full_outer")
    side = (
        F.when(F.col("c_custkey").isNull(), "order_only")
        .when(F.col("o_orderkey").isNull(), "customer_only")
        .otherwise("matched")
    )
    return j.groupBy(side.alias("side")).agg(F.count(F.lit(1)).alias("n")).orderBy("side")


_JOIN_FULL_OUTER_SQL = """
SELECT side, COUNT(*) AS n FROM (
  SELECT CASE WHEN c.c_custkey IS NULL THEN 'order_only'
              WHEN o.o_orderkey IS NULL THEN 'customer_only'
              ELSE 'matched' END AS side
  FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
  FULL OUTER JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
    ON c.c_custkey = o.o_custkey
) GROUP BY side ORDER BY side
"""


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join of two tiny dimensions (broadcast NLJ)."""
    region = load(spark, sf_dir, "region").select("r_name")
    status = load(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("status")
    ).distinct()
    return region.crossJoin(F.broadcast(status))


_JOIN_CROSS_SQL = """
SELECT r_name, status
FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders)
ORDER BY r_name, status
"""


def sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (uncorrelated subquery) through the SQL entry point."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment FROM customer_v
        WHERE c_acctbal > 9500
          AND c_custkey IN (SELECT o_custkey FROM orders_v WHERE o_orderstatus = 'O')
        """
    )


_SQL_IN_SUBQUERY_SQL = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE c_acctbal > 9500
  AND c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
ORDER BY c_custkey
"""


def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate; the scalar (a mean) uses the
    quantized-sum form so both engines compare against the identical
    double."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_v2")
    return spark.sql(
        f"""
        SELECT o_orderpriority, COUNT(*) AS n_above
        FROM orders_v2
        WHERE o_totalprice > (
          SELECT {sql_dsum("o_totalprice")} / COUNT(*) FROM orders_v2
        )
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


_SQL_SCALAR_SUBQUERY_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS n_above
FROM orders
WHERE o_totalprice > (
  SELECT {sql_dsum("o_totalprice")} / COUNT(*) FROM orders
)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def sql_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE chain through the SQL entry point: revenue per nation via two
    CTEs and a dim join."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_c")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_c")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_c")
    return spark.sql(
        f"""
        WITH cust_orders AS (
          SELECT c_nationkey, {sql_quant("o_totalprice")} AS qprice
          FROM customer_c JOIN orders_c ON c_custkey = o_custkey
        ),
        by_nation AS (
          SELECT c_nationkey, CAST(SUM(qprice) AS DOUBLE) / 10000.0 AS revenue,
                 COUNT(*) AS n_orders
          FROM cust_orders GROUP BY c_nationkey
        )
        SELECT n_name, revenue, n_orders
        FROM by_nation JOIN nation_c ON c_nationkey = n_nationkey
        ORDER BY n_name
        """
    )


_SQL_CTE_SQL = f"""
WITH cust_orders AS (
  SELECT c_nationkey, {sql_quant("o_totalprice")} AS qprice
  FROM customer JOIN orders ON c_custkey = o_custkey
),
by_nation AS (
  SELECT c_nationkey, CAST(SUM(qprice) AS DOUBLE) / 10000.0 AS revenue,
         COUNT(*) AS n_orders
  FROM cust_orders GROUP BY c_nationkey
)
SELECT n_name, revenue, n_orders
FROM by_nation JOIN nation ON c_nationkey = n_nationkey
ORDER BY n_name
"""


def win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / nth_value window analytics."""
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    # explicit NULLS LAST (Spark ASC = NULLS FIRST, DuckDB = NULLS LAST)
    w = W.partitionBy("user_id").orderBy(
        F.col("value").asc_nulls_last(), F.col("event_id").asc()
    )
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.nth_value("event_id", 2).over(w_full).alias("second_event"),
        )
    )


_WIN_PERCENT_RANK_SQL = """
SELECT user_id, event_id,
  PERCENT_RANK() OVER w AS pct_rank,
  CUME_DIST() OVER w AS cume,
  NTH_VALUE(event_id, 2) OVER (PARTITION BY user_id ORDER BY value ASC NULLS LAST, event_id ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    AS second_event
FROM events WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY value ASC NULLS LAST, event_id ASC)
ORDER BY user_id, event_id
"""


def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join (operators/skew.py) over the naturally skewed
    events.event_type key (few distinct types, many rows each — the
    hot-Component shape of the reference's routing).  The big side is
    salted deterministically (hash(event_id) mod 8) so the result is
    oracle-reproducible; semantically the salted join IS the plain join,
    which is exactly what the oracle states."""
    from ..operators.skew import salted_join

    # equi-join semantics: NULL keys match nothing — filter them so the
    # oracle's GROUP BY (which would keep a NULL group) states the same set
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
    ).select("event_id", "event_type", "value")
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn(
            "type_code",
            F.conv(F.substring(F.md5("event_type"), 2, 15), 16, 10).cast("long")
            % 1000,
        )
    )
    joined = salted_join(ev, dim, on="event_type", salt=8, salt_from="event_id")
    return (
        joined.groupBy("event_type", "type_code")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
    )


_JOIN_SKEW_SALTED_SQL = """
SELECT event_type,
       CAST(concat('0x', substr(md5(event_type), 2, 15)) AS BIGINT) % 1000
         AS type_code,
       COUNT(*) AS n, MIN(event_id) AS min_id, MAX(event_id) AS max_id
FROM events WHERE event_type IS NOT NULL
GROUP BY 1, 2 ORDER BY event_type
"""

def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (native iterative SQL, Spark 4.1 UnionLoop):
    ancestor-chain traversal over the implicit binary-tree hierarchy
    parent(u) = u div 2 on the event user population — the org-chart /
    BOM walk shape.  Complements the DataFrame-level iterative
    connected components (llmdata/graph.py): there the loop lives in
    Python with checkpointed rounds; here the ENGINE owns the fixpoint.

    Scale note: each iteration is a distributed plan over the prior
    step's frontier only (rows with a > 0 drop out as chains reach the
    root), so work per step shrinks — the same frontier-contraction
    property the CC loop relies on."""
    load(spark, sf_dir, "events").select("user_id").distinct() \
        .createOrReplaceTempView("users_rcte")
    return spark.sql(
        """
        WITH RECURSIVE anc(u, a, d) AS (
          SELECT user_id, user_id, 0 FROM users_rcte
          UNION ALL
          SELECT u, a div 2, d + 1 FROM anc WHERE a > 0
        )
        SELECT u AS user_id, MAX(d) AS depth, COUNT(*) AS chain_len,
               SUM(a) AS ancestor_sum
        FROM anc GROUP BY u ORDER BY user_id
        """
    )


_SQL_RECURSIVE_SQL = """
WITH RECURSIVE anc(u, a, d) AS (
  SELECT user_id, user_id, 0 FROM (SELECT DISTINCT user_id FROM events)
  UNION ALL
  SELECT u, a // 2, d + 1 FROM anc WHERE a > 0
)
SELECT u AS user_id, CAST(MAX(d) AS INT) AS depth, COUNT(*) AS chain_len,
       CAST(SUM(a) AS BIGINT) AS ancestor_sum
FROM anc GROUP BY u ORDER BY user_id
"""


SPARK_QUERIES = {
    "join_skew_salted": join_skew_salted,
    "agg_stats": agg_stats,
    "agg_corr": agg_corr,
    "agg_percentile": agg_percentile,
    "agg_pivot": agg_pivot,
    "agg_grouping_sets": agg_grouping_sets,
    "join_full_outer": join_full_outer,
    "join_cross": join_cross,
    "sql_in_subquery": sql_in_subquery,
    "sql_scalar_subquery": sql_scalar_subquery,
    "sql_cte": sql_cte,
    "win_percent_rank": win_percent_rank,
    "sql_recursive_cte": sql_recursive_cte,
}

ORACLE_SQL = {
    "join_skew_salted": _JOIN_SKEW_SALTED_SQL,
    "agg_stats": _AGG_STATS_SQL,
    "agg_corr": _AGG_CORR_SQL,
    "agg_percentile": _AGG_PERCENTILE_SQL,
    "agg_pivot": _AGG_PIVOT_SQL,
    "agg_grouping_sets": _AGG_GROUPING_SETS_SQL,
    "join_full_outer": _JOIN_FULL_OUTER_SQL,
    "join_cross": _JOIN_CROSS_SQL,
    "sql_in_subquery": _SQL_IN_SUBQUERY_SQL,
    "sql_scalar_subquery": _SQL_SCALAR_SUBQUERY_SQL,
    "sql_cte": _SQL_CTE_SQL,
    "win_percent_rank": _WIN_PERCENT_RANK_SQL,
    "sql_recursive_cte": _SQL_RECURSIVE_SQL,
}


def agg_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample t-statistic between each event_type's values and
    the 'error' type's (the A/B-test primitive): means and variances
    from exact quantized power sums (decimal second moments — the
    agg_corr overflow trick), ONE rounded final expression, so both
    engines compute the identical t."""
    ev = load(spark, sf_dir, "events")
    qv = F.floor(F.col("value") * 10000).cast("long")

    def moments(df):
        return df.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(qv).cast("double").alias("s1"),
            F.sum(qv.cast("decimal(19,0)") * qv.cast("decimal(19,0)"))
            .cast("double")
            .alias("s2"),
        )
    m = moments(ev)
    ctrl = m.filter(F.col("event_type") == "error").select(
        F.col("n").alias("cn"), F.col("s1").alias("cs1"), F.col("s2").alias("cs2")
    )
    j = m.filter(F.col("event_type") != "error").crossJoin(F.broadcast(ctrl))
    mean, cmean = F.col("s1") / F.col("n"), F.col("cs1") / F.col("cn")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
    cvar = (F.col("cs2") - F.col("cs1") * F.col("cs1") / F.col("cn")) / (
        F.col("cn") - 1
    )
    t = (mean - cmean) / F.sqrt(var / F.col("n") + cvar / F.col("cn"))
    return (
        j.select("event_type", F.round(t, 6).alias("t_vs_error"))
        .orderBy("event_type")
    )


_AGG_TTEST_SQL = """
WITH m AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS DOUBLE) AS s1,
         CAST(SUM(CAST(FLOOR(value * 10000) AS HUGEINT)
                  * CAST(FLOOR(value * 10000) AS HUGEINT)) AS DOUBLE) AS s2
  FROM events GROUP BY event_type
),
ctrl AS (SELECT n AS cn, s1 AS cs1, s2 AS cs2 FROM m WHERE event_type = 'error')
SELECT event_type,
       ROUND(((s1 / n) - (cs1 / cn))
             / sqrt(((s2 - s1 * s1 / n) / (n - 1)) / n
                    + ((cs2 - cs1 * cs1 / cn) / (cn - 1)) / cn), 6) AS t_vs_error
FROM m CROSS JOIN ctrl
WHERE event_type != 'error'
ORDER BY event_type
"""

SPARK_QUERIES["agg_ttest"] = agg_ttest
ORACLE_SQL["agg_ttest"] = _AGG_TTEST_SQL


def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy of the event-type distribution (behavior
    diversity score; users < 50 bound the result): p_i from exact
    integer counts, -sum(p ln p) rounded 6dp — identical count operands
    make the doubles identical in both engines."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = W.partitionBy("user_id")
    p = F.col("c") / F.sum("c").over(w)
    return (
        per_type.withColumn("term", -p * F.log(p))
        .groupBy("user_id")
        .agg(
            F.sum("c").alias("n_events"),
            F.count(F.lit(1)).alias("n_types"),
            F.round(F.sum("term"), 6).alias("entropy"),
        )
        .orderBy("user_id")
    )


_AGG_ENTROPY_SQL = """
WITH per_type AS (
  SELECT user_id, event_type, COUNT(*) AS c
  FROM events WHERE user_id < 50 GROUP BY 1, 2
),
withp AS (
  SELECT user_id, c,
         c / CAST(SUM(c) OVER (PARTITION BY user_id) AS DOUBLE) AS p
  FROM per_type
)
SELECT user_id,
       CAST(SUM(c) AS BIGINT) AS n_events,
       COUNT(*) AS n_types,
       ROUND(SUM(-p * ln(p)), 6) AS entropy
FROM withp GROUP BY user_id ORDER BY user_id
"""

SPARK_QUERIES["agg_entropy"] = agg_entropy
ORACLE_SQL["agg_entropy"] = _AGG_ENTROPY_SQL


def agg_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares slope/intercept of price over quantity per return
    flag (regr_slope / regr_intercept analog) — same exact-power-sum
    derivation as agg_corr, one rounded division each."""
    li = load(spark, sf_dir, "lineitem")
    qx, qy = quant("l_quantity"), quant("l_extendedprice")

    def dsum2(a, b):
        return F.sum(a.cast("decimal(19,0)") * b.cast("decimal(19,0)")).cast("double")

    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum(qx).cast("double"), F.sum(qy).cast("double")
    sxx, sxy = dsum2(qx, qx), dsum2(qx, qy)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n / F.lit(10000.0)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(slope, 6).alias("slope_qp"),
            F.round(intercept, 4).alias("intercept_p"),
        )
        .orderBy("l_returnflag")
    )


_AGG_REGR_SQL = """
WITH s AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(FLOOR(l_quantity * 10000) AS BIGINT)) AS DOUBLE) AS sx,
         CAST(SUM(CAST(FLOOR(l_extendedprice * 10000) AS BIGINT)) AS DOUBLE) AS sy,
         CAST(SUM(CAST(FLOOR(l_quantity * 10000) AS HUGEINT)
                  * CAST(FLOOR(l_quantity * 10000) AS HUGEINT)) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(FLOOR(l_quantity * 10000) AS HUGEINT)
                  * CAST(FLOOR(l_extendedprice * 10000) AS HUGEINT)) AS DOUBLE) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_qp,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n / 10000.0, 4)
         AS intercept_p
FROM s ORDER BY l_returnflag
"""

SPARK_QUERIES["agg_regr"] = agg_regr
ORACLE_SQL["agg_regr"] = _AGG_REGR_SQL


def agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis of value per event_type —
    completes the moment-statistics family (mean/var/corr/regr/t):
    3rd/4th power sums in decimal(38,0) stay exact (q^4 ~ 1e28 per row
    fits), every downstream double derives from identical integers, one
    6dp round each."""
    ev = load(spark, sf_dir, "events")
    qv = F.floor(F.col("value") * 10000).cast("long")
    q1 = qv.cast("decimal(19,0)")
    q2 = (q1 * q1).cast("decimal(19,0)")
    agg = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(qv).cast("double").alias("s1"),
        F.sum(q1 * q1).cast("double").alias("s2"),
        F.sum(q2 * q1).cast("double").alias("s3"),
        F.sum(q2 * q2).cast("double").alias("s4"),
    )
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    mean = s1 / n
    m2 = s2 / n - mean * mean
    m3 = s3 / n - 3 * mean * s2 / n + 2 * mean * mean * mean
    m4 = (
        s4 / n
        - 4 * mean * s3 / n
        + 6 * mean * mean * s2 / n
        - 3 * mean * mean * mean * mean
    )
    return agg.select(
        "event_type",
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3, 6).alias("excess_kurtosis"),
    ).orderBy("event_type")


_AGG_SKEW_SQL = """
WITH s AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(q) AS DOUBLE) AS s1,
         CAST(SUM(CAST(q AS HUGEINT) * q) AS DOUBLE) AS s2,
         CAST(SUM(CAST(q AS HUGEINT) * q * q) AS DOUBLE) AS s3,
         CAST(SUM(CAST(q AS HUGEINT) * q * q * q) AS DOUBLE) AS s4
  FROM (SELECT event_type, CAST(FLOOR(value * 10000) AS BIGINT) AS q FROM events)
  GROUP BY event_type
)
SELECT event_type,
       ROUND((s3/n - 3*(s1/n)*s2/n + 2*(s1/n)*(s1/n)*(s1/n))
             / POW(s2/n - (s1/n)*(s1/n), 1.5), 6) AS skewness,
       ROUND((s4/n - 4*(s1/n)*s3/n + 6*(s1/n)*(s1/n)*s2/n
              - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
             / ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3, 6)
         AS excess_kurtosis
FROM s ORDER BY event_type
"""

SPARK_QUERIES["agg_skew_kurt"] = agg_skew_kurt
ORACLE_SQL["agg_skew_kurt"] = _AGG_SKEW_SQL


def setop_bag_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL / INTERSECT ALL — the bag-semantics set operations
    (multiplicity-aware, unlike the DISTINCT-semantics setop_except /
    setop_intersect).  Two overlapping event projections with repeated
    rows; the fold to counts makes multiplicities part of the checked
    result."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 3 != 0).select(
        "user_id", "event_type"
    )
    b = ev.filter(F.col("event_id") % 2 != 0).select(
        "user_id", "event_type"
    )
    ex = a.exceptAll(b).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_except_all")
    )
    inter = a.intersectAll(b).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_intersect_all")
    )
    return ex.join(inter, "event_type", "full").select(
        "event_type",
        F.coalesce("n_except_all", F.lit(0)).alias("n_except_all"),
        F.coalesce("n_intersect_all", F.lit(0)).alias("n_intersect_all"),
    ).orderBy("event_type")


_BAG_SQL = """
WITH a AS (SELECT user_id, event_type FROM events WHERE event_id % 3 <> 0),
b AS (SELECT user_id, event_type FROM events WHERE event_id % 2 <> 0),
ex AS (
  SELECT event_type, COUNT(*) AS n_except_all
  FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 1
),
inter AS (
  SELECT event_type, COUNT(*) AS n_intersect_all
  FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 1
)
SELECT COALESCE(ex.event_type, inter.event_type) AS event_type,
       COALESCE(n_except_all, 0) AS n_except_all,
       COALESCE(n_intersect_all, 0) AS n_intersect_all
FROM ex FULL JOIN inter ON inter.event_type = ex.event_type
ORDER BY event_type
"""

SPARK_QUERIES["setop_bag_ops"] = setop_bag_ops
ORACLE_SQL["setop_bag_ops"] = _BAG_SQL


def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a max-gap tolerance (pandas merge_asof
    ``tolerance`` semantics on the union+window shape): each purchase
    gets the same-user's latest click at-or-before it, but only if that
    click is within 30 minutes — older matches NULL out.  Same ONE
    user-key shuffle as join_asof (operators/asof.py); the tolerance is
    a post-filter on the carried timestamp, costing nothing extra."""
    from ..operators.asof import asof_join

    tol_us = 30 * 60 * 1_000_000
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(
        (F.col("event_type") == "click") & F.col("user_id").isNotNull()
    ).select(
        "user_id",
        F.col("ts").alias("cts"),
        F.col("ts").alias("click_ts"),
    )
    joined = asof_join(purchases, clicks, ["user_id"], "ts", "cts", suffix="")
    in_tol = F.unix_micros(F.col("click_ts")) >= (
        F.unix_micros(F.col("ts")) - tol_us
    )
    return (
        joined.select(
            "event_id",
            "user_id",
            "ts",
            F.when(in_tol, F.col("click_ts")).alias("click_ts"),
            F.coalesce(in_tol, F.lit(False)).alias("matched"),
        )
    )


_JOIN_ASOF_TOL_SQL = """
WITH raw AS (
  SELECT p.event_id, p.user_id, p.ts,
         (SELECT MAX(c.ts) FROM events c
          WHERE c.user_id = p.user_id AND c.event_type = 'click'
            AND c.ts <= p.ts) AS click_ts
  FROM events p WHERE p.event_type = 'purchase'
)
SELECT event_id, user_id, ts,
       CASE WHEN epoch_us(click_ts) >= epoch_us(ts) - 1800000000
            THEN click_ts END AS click_ts,
       COALESCE(epoch_us(click_ts) >= epoch_us(ts) - 1800000000, FALSE)
         AS matched
FROM raw ORDER BY event_id
"""

SPARK_QUERIES["join_asof_tolerance"] = join_asof_tolerance
ORACLE_SQL["join_asof_tolerance"] = _JOIN_ASOF_TOL_SQL


# ---------------------------------------------------------------------------
# Rank / contingency statistics (ClickHouse ``mannWhitneyUTest``,
# ``cramersV``, ``theilsU`` analogs).  Both are one-pass-over-aggregates
# shapes: the heavy input reduces to a bounded table (quantized value
# distribution / source-by-lang contingency cells) and every irrational
# step runs on identical integer operands in both engines, so the
# doubles match bit-for-bit before the final 6dp round.
#
# Scale notes (100 TB): the rank computation NEVER globally sorts rows —
# ranks come from the VALUE DISTRIBUTION (group by quantized value, then
# a running sum over distinct values), so the single-partition window
# sees |distinct quantized values| rows, not |events| (sweep-compliant:
# an aggregate sits below the exchange).  The contingency table is
# |sources| x |langs| cells.  Tie-correction cubes t per distinct value:
# exact in int64 while every tie block stays under ~2.1M rows (t^3 <
# 2^63) — far beyond any real quantized-double bin; the bound is the
# documented contract.


def agg_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U test (two-sided z approximation, tie-corrected)
    comparing the `value` distribution of click vs error events.
    Average ranks from the quantized value distribution; U, mu, sigma
    from exact integer sums.  Returns one row
    (n_click, n_error, u_stat, z_score)."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "error") & F.col("value").isNotNull()
    )
    d = ev.groupBy(quant("value").alias("v")).agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n2"),
    )
    d = d.withColumn("t", F.col("n1") + F.col("n2"))
    wv = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    d = d.withColumn("cum", F.sum("t").over(wv))
    # average rank of a tied block: ranks cum-t+1 .. cum -> cum-t + (t+1)/2
    avgrank = (F.col("cum") - F.col("t")).cast("double") + (
        F.col("t") + 1
    ).cast("double") / F.lit(2.0)
    s = d.agg(
        F.sum("n1").alias("n1"),
        F.sum("n2").alias("n2"),
        F.sum(F.col("n1").cast("double") * avgrank).alias("r1"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("ties"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    nn = n1 + n2
    u1 = F.col("r1") - n1 * (n1 + 1) / F.lit(2.0)
    mu = n1 * n2 / F.lit(2.0)
    sigma = F.sqrt(
        (n1 * n2 / F.lit(12.0))
        * ((nn + 1) - F.col("ties").cast("double") / (nn * (nn - 1)))
    )
    return s.select(
        F.col("n1").alias("n_click"),
        F.col("n2").alias("n_error"),
        u1.alias("u_stat"),  # exact half-integer, no rounding needed
        F.round((u1 - mu) / sigma, 6).alias("z_score"),
    )


_MANNWHITNEY_SQL = """
WITH d AS (
  SELECT CAST(FLOOR(value * 10000) AS BIGINT) AS v,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n2
  FROM events
  WHERE event_type IN ('click', 'error') AND value IS NOT NULL
  GROUP BY 1
),
ranked AS (
  SELECT n1, n2, (n1 + n2) AS t,
         SUM(n1 + n2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
),
s AS (
  SELECT CAST(SUM(n1) AS BIGINT) AS n1, CAST(SUM(n2) AS BIGINT) AS n2,
         SUM(CAST(n1 AS DOUBLE)
             * (CAST(cum - t AS DOUBLE) + CAST(t + 1 AS DOUBLE) / 2.0)) AS r1,
         CAST(SUM(t * t * t - t) AS DOUBLE) AS ties
  FROM ranked
)
SELECT n1 AS n_click, n2 AS n_error,
       r1 - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1) / 2.0 AS u_stat,
       ROUND(
         (r1 - CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) + 1) / 2.0
          - CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 2.0)
         / sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                * ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) + 1)
                   - ties / ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                             * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1)))),
         6) AS z_score
FROM s
"""

SPARK_QUERIES["agg_mannwhitney"] = agg_mannwhitney
ORACLE_SQL["agg_mannwhitney"] = _MANNWHITNEY_SQL


def agg_assoc_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical association between document source and language:
    chi-squared, Cramer's V, and Theil's U(lang|source) — all from one
    |sources| x |langs| contingency table of exact integer counts.
    Returns one row (n_docs, n_sources, n_langs, chi2, cramers_v,
    theils_u)."""
    docs = load(spark, sf_dir, "documents").filter(
        F.col("source").isNotNull() & F.col("lang").isNotNull()
    )
    # r16: the contingency table is BOUNDED (|sources| x |langs| rows)
    # and consumed by four branches (row margins, column margins, the
    # totals, and the joined chi2 pass) — un-materialized, the corpus
    # scan + grouped count ran four times (executed plan: 6 scans,
    # zero ReusedExchange).  Conf-aware materialize-once; full-window
    # interleaved A/B (materialization inside the timed region):
    # 0.66 -> 0.60 s sf0.1 (0.91x), 0.66 -> 0.59 s decade (0.89x)
    # wall, with total work 4 corpus aggs -> 1.
    cells = _mat(
        docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    )
    s_m = cells.groupBy("source").agg(F.sum("c").alias("ns"))
    l_m = cells.groupBy("lang").agg(F.sum("c").alias("nl"))
    tot = cells.agg(
        F.sum("c").alias("n"),
        F.countDistinct("source").alias("r"),
        F.countDistinct("lang").alias("cc"),
    )
    j = (
        cells.join(F.broadcast(s_m), "source")
        .join(F.broadcast(l_m), "lang")
        .crossJoin(F.broadcast(tot))
    )
    c = F.col("c").cast("double")
    e = F.col("ns").cast("double") * F.col("nl").cast("double") / F.col("n").cast(
        "double"
    )
    chi2_terms = (c - e) * (c - e) / e
    # H(L|S) = -sum_cells (c/N) ln(c/ns)
    hls_terms = -(c / F.col("n").cast("double")) * F.log(
        c / F.col("ns").cast("double")
    )
    agg1 = j.agg(
        F.sum(chi2_terms).alias("chi2"),
        F.sum(hls_terms).alias("hls"),
        F.first("n").alias("n"),
        F.first("r").alias("r"),
        F.first("cc").alias("cc"),
    )
    # H(L) from the language margins
    lm = l_m.crossJoin(F.broadcast(tot.select("n"))).agg(
        F.sum(
            -(F.col("nl").cast("double") / F.col("n").cast("double"))
            * F.log(F.col("nl").cast("double") / F.col("n").cast("double"))
        ).alias("hl")
    )
    out = agg1.crossJoin(F.broadcast(lm))
    minrc = F.least(F.col("r"), F.col("cc")).cast("double")
    return out.select(
        F.col("n").alias("n_docs"),
        F.col("r").alias("n_sources"),
        F.col("cc").alias("n_langs"),
        F.round(F.col("chi2"), 6).alias("chi2"),
        F.round(
            F.sqrt(F.col("chi2") / (F.col("n").cast("double") * (minrc - 1))), 6
        ).alias("cramers_v"),
        F.round((F.col("hl") - F.col("hls")) / F.col("hl"), 6).alias("theils_u"),
    )


_ASSOC_SQL = """
WITH cells AS (
  SELECT source, lang, COUNT(*) AS c FROM documents
  WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2
),
sm AS (SELECT source, SUM(c) AS ns FROM cells GROUP BY 1),
lm AS (SELECT lang, SUM(c) AS nl FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
               COUNT(DISTINCT source) AS r, COUNT(DISTINCT lang) AS cc
        FROM cells),
j AS (
  SELECT SUM((CAST(c.c AS DOUBLE) - CAST(sm.ns AS DOUBLE) * CAST(lm.nl AS DOUBLE)
              / CAST(t.n AS DOUBLE))
             * (CAST(c.c AS DOUBLE) - CAST(sm.ns AS DOUBLE) * CAST(lm.nl AS DOUBLE)
                / CAST(t.n AS DOUBLE))
             / (CAST(sm.ns AS DOUBLE) * CAST(lm.nl AS DOUBLE)
                / CAST(t.n AS DOUBLE))) AS chi2,
         SUM(-(CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
             * ln(CAST(c.c AS DOUBLE) / CAST(sm.ns AS DOUBLE))) AS hls,
         ANY_VALUE(t.n) AS n, ANY_VALUE(t.r) AS r, ANY_VALUE(t.cc) AS cc
  FROM cells c JOIN sm USING (source) JOIN lm USING (lang) CROSS JOIN tot t
),
hl AS (
  SELECT SUM(-(CAST(nl AS DOUBLE) / CAST(t.n AS DOUBLE))
             * ln(CAST(nl AS DOUBLE) / CAST(t.n AS DOUBLE))) AS hl
  FROM lm CROSS JOIN tot t
)
SELECT j.n AS n_docs, j.r AS n_sources, j.cc AS n_langs,
       ROUND(j.chi2, 6) AS chi2,
       ROUND(sqrt(j.chi2 / (CAST(j.n AS DOUBLE)
                            * (CAST(LEAST(j.r, j.cc) AS DOUBLE) - 1))), 6)
         AS cramers_v,
       ROUND((hl.hl - j.hls) / hl.hl, 6) AS theils_u
FROM j CROSS JOIN hl
"""

SPARK_QUERIES["agg_assoc_suite"] = agg_assoc_suite
ORACLE_SQL["agg_assoc_suite"] = _ASSOC_SQL
