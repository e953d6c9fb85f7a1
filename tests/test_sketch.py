"""Count-min sketch invariants: never underestimates, overestimate is
bounded, and the sketch size is depth x width regardless of cardinality."""

from __future__ import annotations

from pyspark.sql import functions as F

from logpump_spark.operators.sketch import cms_build, cms_estimate
from logpump_spark.tables import load

from .conftest import SF_SMALL

DEPTH, WIDTH = 4, 256


def _keyed(spark):
    ev = load(spark, SF_SMALL, "events")
    return ev.select(
        F.concat_ws(":", F.col("event_type"), F.col("user_id").cast("string")).alias(
            "key"
        )
    )


def test_cms_never_underestimates_any_key(spark):
    keyed = _keyed(spark)
    sketch = cms_build(keyed, F.col("key"), DEPTH, WIDTH)
    exact = keyed.groupBy("key").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(exact, "key", sketch, DEPTH, WIDTH)
    joined = exact.join(est, "key")
    n_keys = joined.count()
    assert n_keys > 0
    assert joined.filter(F.col("est") < F.col("exact")).count() == 0
    # CMS error bound: overestimate <= 2N/width for each key with
    # probability 1 - 2^-depth; assert the aggregate bound loosely
    n_total = keyed.count()
    bad = joined.filter(F.col("est") - F.col("exact") > 2 * n_total / WIDTH).count()
    assert bad <= max(1, n_keys // (2**DEPTH))


def test_cms_sketch_is_fixed_size(spark):
    keyed = _keyed(spark)
    sketch = cms_build(keyed, F.col("key"), DEPTH, WIDTH)
    assert sketch.count() <= DEPTH * WIDTH
    # every cell count positive, rows within range
    agg = sketch.agg(
        F.min("c").alias("cmin"), F.max("r").alias("rmax"), F.max("b").alias("bmax")
    ).first()
    assert agg.cmin >= 1 and agg.rmax <= DEPTH - 1 and agg.bmax <= WIDTH - 1
