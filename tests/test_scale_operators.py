"""Scale-strategy tests: salted joins preserve semantics and spread skew;
bucketed tables co-locate joins (no shuffle in the plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logpump_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 0 — the hot-Component shape
    big = spark.range(0, 20000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), F.concat(F.lit("dim"), F.col("id")).alias("name")
    )
    return big, small


def test_salted_join_matches_plain_join(skewed):
    big, small = skewed
    plain = big.join(small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    )
    salted = salted_join(big, small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, "a"), (99, "b")], "k long, v string")
    small = spark.createDataFrame([(1, "dim1")], "k long, name string")
    out = {tuple(r) for r in salted_join(big, small, "k", how="left").collect()}
    assert (1, "a", "dim1") in out
    assert (99, "b", None) in out


def test_salted_join_rejects_unsupported(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError):
        salted_join(df, df, "k", how="full_outer")


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Pre-bucketing both fact tables on the join key removes the
    Exchange entirely — the repeated-join answer at 100 TB (SURVEY.md
    join_inner note).  Plan must show SortMergeJoin with NO shuffle."""
    # spark.sql.warehouse.dir is static per-session; the tables land in the
    # default warehouse and are dropped in the finally block
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("orders_b")
    lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("lineitem_b")

    ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    # the session default prefers shuffled hash join (r15); this pin is
    # about bucketed co-location exploiting the bucket SORT, so ask for
    # sort-merge explicitly
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
    try:
        j = ob.join(lb, ob.o_orderkey == lb.l_orderkey).select("o_orderkey", "l_quantity")
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        # and the join still returns every lineitem row
        assert j.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")  # session default (r15)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_salted_join_deterministic_salt(spark):
    # salt_from: content-derived salt -> identical results across runs
    # AND identical to the plain join (rand-salted already covered above)
    big = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold") for i in range(1000)], "id long, k string"
    )
    small = spark.createDataFrame([("hot", 1), ("cold", 2)], "k string, v int")
    a = sorted(map(tuple, salted_join(big, small, "k", salt_from="id").collect()))
    b = sorted(map(tuple, salted_join(big, small, "k", salt_from="id").collect()))
    plain = sorted(map(tuple, big.join(small, "k").collect()))
    assert a == b
    assert sorted(t[:3] for t in a) == sorted(t[:3] for t in plain)
