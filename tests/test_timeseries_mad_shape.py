"""Pin for the r15 timeseries_mad reformulation: the count-table rank
statistics (lower median / MAD from cumulative multiplicities) must be
IDENTICAL to the direct per-row rank formulation they replaced.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from logpump_spark.queries.timeseries_q import timeseries_mad
from logpump_spark.tables import load

from .conftest import SF_SMALL


def _naive_mad(spark, sf_dir):
    # the pre-r15 formulation, verbatim: rank over (value, event_id)
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    qv = F.floor(F.col("value") * 10000).cast("long")
    base = ev.select("event_type", qv.alias("qv"), "event_id")
    w1 = W.partitionBy("event_type").orderBy("qv", "event_id")
    n1 = W.partitionBy("event_type")
    med = (
        base.withColumn("rk", F.row_number().over(w1))
        .withColumn("n", F.count(F.lit(1)).over(n1))
        .filter(F.col("rk") * 2 == F.col("n") + (F.col("n") % 2))
        .select("event_type", F.col("qv").alias("med"))
    )
    dev = base.join(F.broadcast(med), "event_type").select(
        "event_type", "qv", "event_id",
        F.abs(F.col("qv") - F.col("med")).alias("ad"), "med",
    )
    w2 = W.partitionBy("event_type").orderBy("ad", "event_id")
    mad = (
        dev.withColumn("rk", F.row_number().over(w2))
        .withColumn("n", F.count(F.lit(1)).over(n1))
        .filter(F.col("rk") * 2 == F.col("n") + (F.col("n") % 2))
        .select("event_type", F.col("ad").alias("mad"))
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            (F.max("med").cast("double") / 10000).alias("median_value"),
            (F.max("mad").cast("double") / 10000).alias("mad_value"),
            F.sum((F.col("ad") > 3 * F.col("mad")).cast("long")).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


def test_count_table_mad_equals_per_row_rank(spark):
    got = [tuple(r) for r in timeseries_mad(spark, SF_SMALL).collect()]
    want = [tuple(r) for r in _naive_mad(spark, SF_SMALL).collect()]
    assert got == want
    assert len(got) > 0
