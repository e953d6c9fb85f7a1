"""True append-tailing source: byte-offset resume, partial-record
hold-back, growth across micro-batches, checkpoint restart."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from logpump_spark.sources.tail_source import (
    TechlogTailReader,
    _complete_records,
    register,
)

R1 = "07:15.123456-2500,DBMSSQL,0,Usr=ivanov,Sql='SELECT 1'"
R2_L1 = "07:16.000001-10,EXCP,3,Usr=petrov"
R2_L2 = "continuation line of record 2"
R3 = "07:17.000002-20,CALL,1,Usr=x"


def test_complete_records_holds_back_tail():
    chunk = (R1 + "\n" + R2_L1 + "\n" + R2_L2 + "\n").encode("utf-8")
    records, consumed = _complete_records(chunk)
    # R1 completes when R2's start line arrives; R2 stays buffered
    assert records == [R1]
    assert chunk[:consumed] == (R1 + "\n").encode("utf-8")


def test_byte_offsets_survive_invalid_utf8(tmp_path):
    # an invalid UTF-8 byte is 1 byte on disk but would re-encode as a
    # 3-byte U+FFFD; offsets must stay in the bytes domain so the next
    # micro-batch resumes at a real file position (no mid-record reads)
    d = str(tmp_path)
    p = f"{d}/25052607.log"
    bad = "07:15.123456-5,CALL,1,Usr=".encode("utf-8") + b"\xff\xfe" + b"bad"
    with open(p, "wb") as f:
        f.write(bad + b"\n" + R2_L1.encode("utf-8") + b"\n")

    reader = TechlogTailReader({"path": d})
    rows1, off1 = reader._read_new({})
    # record 1 (with replacement chars) completes when R2's start arrives
    assert len(rows1) == 1 and rows1[0][1].startswith("07:15.123456-5")
    # committed offset = byte length of record 1 + newline, NOT the
    # re-encoded length (which would be 4 bytes longer)
    assert off1["offsets"][p] == len(bad) + 1

    # growth resumes exactly at R2's start: R2 completes, no garbled reads
    with open(p, "ab") as f:
        f.write((R3 + "\n").encode("utf-8"))
    rows2, _ = reader._read_new(off1["offsets"])
    assert rows2 == [("25052607.log", R2_L1)]


def test_reader_resumes_from_byte_offset(tmp_path):
    d = str(tmp_path)
    p = f"{d}/25052607.log"
    with open(p, "w", encoding="utf-8") as f:
        f.write(R1 + "\n" + R2_L1 + "\n")

    reader = TechlogTailReader({"path": d})
    rows1, off1 = reader._read_new({})
    assert rows1 == [("25052607.log", R1)]  # R2 incomplete -> held back

    # file grows: R2's continuation + R3's start line
    with open(p, "a", encoding="utf-8") as f:
        f.write(R2_L2 + "\n" + R3 + "\n")
    rows2, off2 = reader._read_new(off1["offsets"])
    assert rows2 == [("25052607.log", R2_L1 + "\n" + R2_L2)]
    # R3 still open; offset parked at R3's start
    with open(p, "rb") as f:
        raw = f.read()
    assert raw[off2["offsets"][p] :].decode() == R3 + "\n"

    # nothing new -> no rows, offset stable
    rows3, off3 = reader._read_new(off2["offsets"])
    assert rows3 == [] and off3 == off2


def test_emit_tail_flushes_open_record(tmp_path):
    d = str(tmp_path)
    with open(f"{d}/25052607.log", "w", encoding="utf-8") as f:
        f.write(R1 + "\n" + R2_L1 + "\n")
    reader = TechlogTailReader({"path": d, "emittail": "true"})
    rows, _ = reader._read_new({})
    assert rows == [("25052607.log", R1), ("25052607.log", R2_L1)]


def test_streaming_tail_end_to_end(spark, tmp_path):
    src = str(tmp_path / "logs")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    p = f"{src}/25052607.log"
    with open(p, "w", encoding="utf-8") as f:
        f.write(R1 + "\n" + R2_L1 + "\n")

    register(spark)

    def drain():
        stream = (
            spark.readStream.format("techlog_tail").option("path", src).load()
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, _e: df.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    got = sorted(r.record for r in spark.read.parquet(out).collect())
    assert got == [R1]

    # append across restarts: offsets come back from the CHECKPOINT
    with open(p, "a", encoding="utf-8") as f:
        f.write(R2_L2 + "\n" + R3 + "\n" + "59:59.999999-1,END,0,Usr=end\n")
    drain()
    got = sorted(r.record for r in spark.read.parquet(out).collect())
    # R1 exactly once (no re-emission), R2 assembled multi-line, R3 closed
    # by the END record start; END itself still open -> held back
    assert got == sorted([R1, R2_L1 + "\n" + R2_L2, R3])


def test_tail_then_parse_pipeline(spark, tmp_path):
    """The tailed stream feeds the SAME parse plan as the batch path."""
    from logpump_spark.techlog.parser import parse_records

    src = str(tmp_path / "logs2")
    os.makedirs(src)
    with open(f"{src}/25052607.log", "w", encoding="utf-8") as f:
        f.write(R1 + "\n" + R2_L1 + "\n" + R3 + "\n")

    register(spark)
    stream = spark.readStream.format("techlog_tail").option("path", src).load()
    entries = parse_records(stream)
    q = (
        entries.writeStream.format("memory")
        .queryName("tail_entries")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r.Component: r for r in spark.sql("SELECT * FROM tail_entries").collect()}
    assert rows["DBMSSQL"].SQL == "SELECT 1"
    assert rows["EXCP"].User == "petrov"
