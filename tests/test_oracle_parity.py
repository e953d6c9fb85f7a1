"""The local mirror of the driver's correctness gate: every queries() entry
with an oracle must match DuckDB exactly (rows, columns, canonical values)
at the driver's correctness scale factor (sf0.01 by default)."""

from __future__ import annotations

import pytest

import __spark_entry__ as se
from tools.parity import compare_one

from .conftest import SF_ORACLE

_QUERIES = se.queries()
_ORACLES = se.oracle_sql()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    ok, msg = compare_one(name, spark, duck, SF_ORACLE, _QUERIES, _ORACLES)
    assert ok, f"{name}: {msg}"
