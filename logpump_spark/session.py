"""SparkSession factory tuned for this engine.

Local mode is the test bed; the config block is written so the same code
runs unchanged on a multi-executor cluster: AQE handles runtime re-planning
(skew joins, partition coalescing), shuffle partitions default to the local
core count but should be ~2-3x total cluster cores at 100 TB, and Arrow is
on for the few Pandas-UDF paths (multimodal decode, stateful streaming).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "logpump_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    On a real cluster, drop ``master`` and submit with spark-submit; every
    other conf below is cluster-appropriate as-is.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cpus))
    )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # r15: allow shuffled hash join where its size conditions hold
        # (the optimization guide's baseline): both sides still shuffle,
        # but neither is SORTED — measured 0.79x over the 19 join-heavy
        # registry ids at sf0.1 (13.1 -> 10.3 s, every fact-fact TPC-H
        # shape 0.54-0.85x, none worse than 1.10x), and the win is
        # scale-independent (the sort it removes grows n log n).  The
        # planner only picks SHJ when a build side fits per-partition
        # memory (plus AQE's runtime rewrite), so the OOM risk the
        # default guards against stays bounded; sort-merge remains for
        # large-per-partition builds.
        .config("spark.sql.join.preferSortMergeJoin", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
