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


# ---------------------------------------------------------------------------
# JDBC-free HTTP INSERT path (round 6).
#
# ClickHouse's HTTP interface accepts
#   POST /?query=INSERT INTO t (cols...) FORMAT TabSeparated
# with TSV rows as the body — the documented public wire format.  This
# path needs no jar, so the 16-column INSERT body the reference builds
# (internal/clickhouseclient/clickhouse.go:80-83 analog) is byte-testable
# offline against a stdlib http.server mock (tests/test_clickhouse_http.py).
#
# Scale shape: serialization is ONE codegen'd projection (escape +
# concat_ws, no Python per-row work); each executor partition POSTs its
# own batch, so insert parallelism = partition count, and a partition
# failure retries with its Spark task.  TSV escaping follows the
# TabSeparated spec: \ -> \\, tab -> \t, newline -> \n, CR -> \r,
# NULL -> \N; Date as yyyy-MM-dd; DateTime64(6) with 6 fraction digits.

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

TECHLOG_INSERT_COLUMNS = (
    "EventDate EventTime EventType Duration User InfoBase SessionID ClientID "
    "ConnectionID ExceptionType ErrorText SQLText Rows RowsAffected Context "
    "ProcessName"
).split()


def insert_statement(table: str) -> str:
    """The reference's hard-coded 16-column INSERT list, HTTP form."""
    cols = ", ".join(TECHLOG_INSERT_COLUMNS)
    return f"INSERT INTO {table} ({cols}) FORMAT TabSeparated"


def _tsv_cell(name: str, dtype: T.DataType) -> Column:
    c = F.col(name)
    if isinstance(dtype, T.DateType):
        s = F.date_format(c, "yyyy-MM-dd")
    elif isinstance(dtype, T.TimestampType):
        s = F.date_format(c, "yyyy-MM-dd HH:mm:ss.SSSSSS")
    elif isinstance(dtype, T.StringType):
        # order matters: escape backslashes before introducing new ones
        s = c
        for raw, esc in (("\\", "\\\\"), ("\t", "\\t"), ("\n", "\\n"), ("\r", "\\r")):
            s = F.replace(s, F.lit(raw), F.lit(esc))
    else:
        s = c.cast("string")
    return F.coalesce(s, F.lit("\\N"))


def techlog_tsv_lines(rows: DataFrame) -> DataFrame:
    """One `line` string column per TechLogRow, in INSERT column order —
    a single whole-stage-codegen projection."""
    dtypes = {f.name: f.dataType for f in rows.schema.fields}
    missing = [c for c in TECHLOG_INSERT_COLUMNS if c not in dtypes]
    if missing:
        raise ValueError(f"TechLogRow columns missing for INSERT: {missing}")
    cells = [_tsv_cell(c, dtypes[c]) for c in TECHLOG_INSERT_COLUMNS]
    return rows.select(F.concat_ws("\t", *cells).alias("line"))


def write_techlog_http(
    rows: DataFrame,
    cfg: ClickHouseConfig,
    table: str,
    insert_timeout_s: int = 60,
    max_post_bytes: int = 32 * 1024 * 1024,
) -> None:
    """Append TechLogRow rows via the ClickHouse HTTP interface: each
    partition streams its serialized TSV in POSTs of at most
    ``max_post_bytes`` (reference semantics: 60 s insert timeout,
    clickhouse.go:77; batch-per-send, :79-125).  The cap bounds
    executor-Python memory to one batch regardless of partition size —
    a 500 MB partition becomes ~16 sequential 32 MB INSERTs, each an
    independent ClickHouse insert block.  ``urlopen`` raises
    ``HTTPError`` on any non-2xx, so a failed INSERT fails the Spark
    task and task retry re-sends (strictly stronger than the
    reference's drop-on-error)."""
    import urllib.parse

    address = cfg.address
    user, password = cfg.username, cfg.password
    database = cfg.database
    stmt = insert_statement(table)

    def post_partition(it) -> None:
        import urllib.request

        q = urllib.parse.urlencode({"query": stmt, "database": database})

        def send(chunks: list[bytes]) -> None:
            req = urllib.request.Request(
                f"http://{address}/?{q}",
                data=b"".join(chunks),
                headers={
                    "X-ClickHouse-User": user,
                    "X-ClickHouse-Key": password,
                    "Content-Type": "text/tab-separated-values",
                },
                method="POST",
            )
            # raises urllib.error.HTTPError on non-2xx -> task retry
            with urllib.request.urlopen(req, timeout=insert_timeout_s):
                pass

        buf: list[bytes] = []
        size = 0
        for r in it:
            b = (r["line"] + "\n").encode("utf-8")
            buf.append(b)
            size += len(b)
            if size >= max_post_bytes:
                send(buf)
                buf, size = [], 0
        if buf:
            send(buf)

    techlog_tsv_lines(rows).foreachPartition(post_partition)
