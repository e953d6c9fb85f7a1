"""Oracle-stable numeric helpers.

The driver hash-compares Spark results against DuckDB values.  Two
engine-dependent effects break naive double aggregation:

1. SUM(double) is order-dependent (Spark merges partition partials in
   nondeterministic order) — last-ULP wobble.
2. CAST(double AS DECIMAL(p,s)) rounds near-midpoints differently (Spark
   converts via the exact BigDecimal expansion with HALF_UP; DuckDB scales
   in double arithmetic), observed on ~0.7% of rows for 3-factor products.

Fix both at once by quantizing with FLOOR: ``floor(x * 10^s)`` of an
identical IEEE double is identical in every engine (no rounding mode in
play), the integer sum is exact and order-independent, and the final
``CAST(sum AS DOUBLE) / 10^s`` is one identical IEEE division.  The
quantization (truncation at s decimals) is a defined engine semantic, the
same one the reference applies to its numeric fields via silent integer
parses (/root/reference/internal/parser/parser.go:98-116).

Scale notes: per-row ``x*10^4`` stays exact below 2^53 for |x| < 9e11;
Spark sums longs into long (watch overflow past ~9e18 — at 100 TB switch
``_SCALE`` down or sum into decimal(38,0); DuckDB already widens to
HUGEINT automatically).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALE = 4
_MULT = 10**_SCALE


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def quant(col: Column | str) -> Column:
    """Engine-stable integer quantization of a double at 10^-4 resolution."""
    return F.floor(_c(col) * F.lit(_MULT)).cast("long")


def dsum(col: Column | str) -> Column:
    """Order- and engine-independent double sum."""
    return F.sum(quant(col)).cast("double") / F.lit(float(_MULT))


def davg(col: Column | str) -> Column:
    """Order- and engine-independent double mean (identical IEEE division
    of identical operands in both engines)."""
    c = _c(col)
    return dsum(c) / F.count(c)


def sql_quant(expr: str) -> str:
    return f"CAST(FLOOR(({expr}) * {_MULT}) AS BIGINT)"


def sql_dsum(expr: str) -> str:
    return f"(CAST(SUM({sql_quant(expr)}) AS DOUBLE) / {float(_MULT)})"


def sql_davg(expr: str) -> str:
    return f"({sql_dsum(expr)} / COUNT({expr}))"
