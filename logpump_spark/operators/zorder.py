"""Z-order (Morton) clustering without Delta (SURVEY.md §2.F: MergeTree
ORDER BY gives one clustering dimension; ZORDER gives multi-column
locality).

``morton_key(a, b)`` interleaves the bits of two non-negative integer
columns (16 bits each -> one 32-bit key).  Sorting/range-partitioning by
the key places rows close in BOTH dimensions into the same parquet row
groups, so min/max stats prune scans filtered on either column — the
query pattern "WHERE user_id = X" AND/OR "WHERE day = Y" over a sink
written once.

Pure Column arithmetic (shift/mask), codegen-friendly, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread16(c: Column) -> Column:
    """Spread the low 16 bits of ``c`` so bit i lands at position 2i —
    the classic Morton bit-twiddle, expressed as Column ops."""
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def morton_key(a: Column | str, b: Column | str) -> Column:
    """Interleaved 32-bit Z-order key of two 16-bit non-negative values
    (clip wider inputs with a modulo/bucket upstream)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return _spread16(ca).bitwiseOR(F.shiftleft(_spread16(cb), 1))


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    compression: str = "zstd",
) -> None:
    """Write ``df`` clustered by the Z-order of (col_a, col_b):
    range-partition on the key (equal-size output files), sort within
    each, drop the key.  Readers filtering on either column skip row
    groups via parquet min/max stats."""
    keyed = df.withColumn("_z", morton_key(col_a, col_b))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(path)
    )
