"""Driver-canonicalization contract: the driver's correctness gate sorts a
pandas frame of each oracle-checked query's result and hashes cell values —
which crashes on unhashable cells (``TypeError: unhashable type: 'list'``;
the r05 ``agg_sum_map`` red row).  So every query with an ``oracle_sql()``
twin must return a schema whose TOP-LEVEL fields are scalar: no ArrayType /
MapType / StructType.  Rows-only queries (no oracle entry — count check
only) may return complex columns.

Schema resolution is lazy (plan build only), so this walks all ~200
registered queries cheaply at sf0.001; queries that do eager fitting at
construction run at the smallest SF.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

import __spark_entry__ as se

from .conftest import SF_SMALL

_QUERIES = se.queries()
_ORACLES = se.oracle_sql()

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", sorted(n for n in _QUERIES if n in _ORACLES))
def test_oracle_checked_query_has_scalar_schema(name, spark):
    df = _QUERIES[name](spark, SF_SMALL)
    bad = [
        f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)
    ]
    assert not bad, (
        f"{name}: top-level complex columns {bad} would crash the driver's "
        "pandas canonicalizer — serialize them (array_join / to_json) or "
        "drop the oracle entry to take the rows-only check"
    )
