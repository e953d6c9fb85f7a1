"""Generic as-of join (SURVEY.md §2.G join: range/theta/as-of).

``asof_join(left, right, on, left_ts, right_ts)`` attaches, to every left
row, the latest right row at-or-before its timestamp within the same key.

Implementation: the union+window trick — tag both inputs, union, sort per
key by time with right rows winning ties, and carry the last-seen right
value forward with a running ``last(ignorenulls)``.  ONE shuffle on the
key columns, no range self-join, no per-key blow-up: the 100 TB-safe
formulation (a correlated subquery or range join is quadratic per key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row: columns ``<v><suffix>`` = value of ``v`` from
    the latest right row with ``right_ts <= left_ts`` sharing ``on``.

    Left rows keep all their columns; unmatched rows get NULLs (like the
    reference's missing-key defaults, parser.go:91-96, but typed)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    overlap = set(left.columns) & set(value_cols)
    if overlap:
        raise ValueError(f"value columns collide with left columns: {overlap}")

    # Carry the whole right row as ONE struct: the struct is non-null for
    # every right row even when individual value columns are NULL, so
    # last(ignorenulls) tracks row-level recency — the latest matching
    # right row's NULL value stays NULL instead of leaking a stale
    # earlier value (standard as-of semantics).
    rv_type = right.select(F.struct(*value_cols).alias("_rv")).schema["_rv"].dataType

    l_tag = left.select(
        *on,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(rv_type).alias("_rv"),
        F.struct(*left.columns).alias("_row"),
    )
    r_tag = right.select(
        *on,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.struct(*value_cols).alias("_rv"),
        F.lit(None).cast(l_tag.schema["_row"].dataType).alias("_row"),
    )
    # right rows sort before left rows at equal _ts => inclusive <=
    w = (
        W.partitionBy(*on)
        .orderBy("_ts", "_is_left")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        "_is_left",
        "_row",
        F.last("_rv", ignorenulls=True).over(w).alias("_rv_last"),
    )
    out_cols: list[Column] = [
        F.col("_row")[c].alias(c) for c in left.columns
    ] + [F.col("_rv_last")[c].alias(f"{c}{suffix}") for c in value_cols]
    return carried.filter(F.col("_is_left") == 1).select(*out_cols)
