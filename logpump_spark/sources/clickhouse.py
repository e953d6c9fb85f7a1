"""ClickHouse sink via JDBC (SURVEY.md §2.D R4).

The reference bulk-INSERTs columnar native-protocol blocks with LZ4
(internal/clickhouseclient/clickhouse.go:34-60, :79-125).  Spark's
idiomatic equivalent is the ClickHouse JDBC driver inside foreachBatch:
each executor partition opens a connection and streams its rows, so the
insert parallelism equals the partition count (the reference is a single
connection).  Wire compression and the async-insert knobs ride on the
JDBC URL.

This container ships no ClickHouse server or JDBC jar, so the writer
checks driver availability up front and raises a clear error; the parquet
sink (streaming/job.py) is the tested stand-in with the identical 16-column
schema.  Tests cover option construction (testable without a server).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..config import ClickHouseConfig

JDBC_DRIVER = "com.clickhouse.jdbc.ClickHouseDriver"


def jdbc_url(cfg: ClickHouseConfig) -> str:
    scheme = "clickhouse"
    proto = "http" if cfg.protocol == "http" else "tcp"
    # the official driver speaks HTTP on 8123; native TCP via the same URL
    # shape — keep the reference's protocol toggle (clickhouse.go:35-38)
    return f"jdbc:{scheme}://{cfg.address}/{cfg.database}?protocol={proto}&compress=lz4"


def jdbc_options(cfg: ClickHouseConfig, table: str, insert_timeout_s: int = 60) -> dict[str, str]:
    """Option map mirroring the reference's connection settings: 60 s
    insert timeout (clickhouse.go:77), LZ4 (clickhouse.go:48), batched
    inserts (PrepareBatch/Send -> JDBC batchsize)."""
    return {
        "url": jdbc_url(cfg),
        "dbtable": table,
        "user": cfg.username,
        "password": cfg.password,
        "driver": JDBC_DRIVER,
        "batchsize": "100000",
        "isolationLevel": "NONE",  # ClickHouse has no transactions
        "queryTimeout": str(insert_timeout_s),
        "numPartitions": "8",
    }


def _driver_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(JDBC_DRIVER)
        return True
    except Exception:  # noqa: BLE001 — any JVM-side failure means absent
        return False


def write_techlog_jdbc(rows: DataFrame, cfg: ClickHouseConfig, table: str) -> None:
    """Append TechLogRow rows into a ClickHouse table.  Use inside
    foreachBatch for streaming (per-micro-batch inserts = the reference's
    batch sends, minus the drop-on-error: Spark retries the micro-batch)."""
    spark = rows.sparkSession
    if not _driver_available(spark):
        raise RuntimeError(
            "ClickHouse JDBC driver not on the classpath; add "
            "com.clickhouse:clickhouse-jdbc:0.6.x via spark.jars.packages, "
            "or use the parquet sink (streaming/job.py route_and_write)"
        )
    writer = rows.write.format("jdbc").mode("append")
    for k, v in jdbc_options(cfg, table).items():
        writer = writer.option(k, v)
    writer.save()
