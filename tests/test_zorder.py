"""Z-order clustering: key correctness + two-dimensional locality
(a Z-ordered layout bounds BOTH columns' spread per file; a one-column
sort only bounds its own)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from logpump_spark.operators.zorder import morton_key, zorder_write


def test_morton_key_interleaves_bits(spark):
    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "a long, b long"
    ).select("a", "b", morton_key("a", "b").alias("z")).collect()
    got = {(r.a, r.b): r.z for r in rows}
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1  # a occupies even bits
    assert got[(0, 1)] == 2  # b occupies odd bits
    # 3=0b11, 5=0b101 -> interleave(a=11, b=101): z = 100111 = 39
    assert got[(3, 5)] == 0b100111
    assert got[(65535, 65535)] == 0xFFFFFFFF


def test_zorder_layout_bounds_both_dims(spark, tmp_path):
    n = 1 << 12
    df = spark.range(n).select(
        (F.col("id") % 64).alias("x"),
        ((F.col("id") * 7919) % 64).alias("y"),
        F.col("id").alias("payload"),
    )
    zpath = str(tmp_path / "z")
    zorder_write(df, zpath, "x", "y", n_files=8)

    files = sorted(glob.glob(f"{zpath}/part-*.parquet"))
    assert len(files) >= 4
    spans_x, spans_y = [], []
    for f in files:
        stats = spark.read.parquet(f).agg(
            F.min("x"), F.max("x"), F.min("y"), F.max("y")
        ).collect()[0]
        spans_x.append(stats[1] - stats[0])
        spans_y.append(stats[3] - stats[2])
    # Z-ordered files each cover a bounded rectangle: the AVERAGE span in
    # both dimensions must be well below the full domain (63) — a plain
    # sort on x would leave y spans at ~63 everywhere
    assert sum(spans_x) / len(spans_x) < 40
    assert sum(spans_y) / len(spans_y) < 40


def test_zorder_preserves_rows(spark, tmp_path):
    df = spark.range(1000).select(
        (F.col("id") % 32).alias("x"),
        (F.col("id") % 57).alias("y"),
        F.col("id").alias("payload"),
    )
    p = str(tmp_path / "z2")
    zorder_write(df, p, "x", "y")
    back = spark.read.parquet(p)
    assert back.count() == 1000
    assert sorted(r.payload for r in back.collect()) == list(range(1000))
