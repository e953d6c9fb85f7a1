"""Driver-facing query registry.

Each submodule exposes ``SPARK_QUERIES`` (name -> callable(spark, sf_dir)
-> DataFrame) and ``ORACLE_SQL`` (name -> DuckDB SQL over the same parquet
views).  ``all_queries()`` / ``all_oracles()`` merge them for
``__spark_entry__``.  Queries without an oracle entry get the driver's
weaker rows-only check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from . import (
    analytics_q,
    coverage2_q,
    coverage_q,
    curation_q,
    functions2_q,
    functions3_q,
    functions_q,
    llm_q,
    parse_q,
    quality_q,
    relational2_q,
    relational_q,
    streaming_q,
    timeseries_q,
    windows_q,
)

# Order matters: the driver's CORRECTNESS gate verifies the first 50
# registry entries per round, so modules whose queries have not yet
# received a driver-green row go FIRST.  Round 1 verified the relational /
# window / scalar-function modules (CORRECTNESS_r01.json); round 2 rotates
# the parse plane, streaming, LLM-data, and coverage modules into the
# window (48 ids, leaving 2 slots for q1_pricing_summary / join_inner).
_MODULES = (
    parse_q,
    streaming_q,
    llm_q,
    coverage_q,
    coverage2_q,
    relational_q,
    relational2_q,
    windows_q,
    functions_q,
    functions2_q,
    functions3_q,
    # new modules join BEHIND the verified window; they rotate forward
    # once the current window's ids are driver-green
    curation_q,
    analytics_q,
    timeseries_q,
    quality_q,
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = merged.keys() & mod.SPARK_QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query ids across modules: {overlap}")
        merged.update(mod.SPARK_QUERIES)
    return merged


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _MODULES:
        merged.update(mod.ORACLE_SQL)
    return merged
