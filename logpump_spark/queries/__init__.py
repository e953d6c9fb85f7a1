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
    pq_q,
    quality_q,
    relational2_q,
    relational_q,
    streaming_q,
    timeseries_q,
    windows_q,
)

# Order matters: the driver's CORRECTNESS gate verifies the first 50
# registry entries per round, so modules whose queries have not yet
# received a driver-green row go FIRST.  Round 4 window: the 15
# never-driver-verified curation/analytics/timeseries/quality ids, then
# the parse plane + windows + functions modules that regressed to `err`
# in round 3 (Spark 4.1 TIMESTAMP_NTZ, fixed in tables.load), then
# relational_q whose leading ids (q1_pricing_summary, join_inner, ...)
# fill the remaining slots as long-green regression canaries.
_MODULES = (
    curation_q,  # 6
    analytics_q,  # 2
    timeseries_q,  # 3
    quality_q,  # 4
    pq_q,  # 1 (new this round: sim_pq_adc)
    parse_q,  # 11 (r3 err -> re-verify post-NTZ-fix)
    windows_q,  # 5 (win_lag / win_range_frame were r3 err)
    functions_q,  # 8 (fn_date_suite was r3 err)
    relational_q,  # 18; first ~9 land in the window as canaries
    streaming_q,
    llm_q,
    coverage_q,
    coverage2_q,
    relational2_q,
    functions2_q,
    functions3_q,
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
