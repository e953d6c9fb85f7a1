"""Smoke tests for the driver contract surface."""

from __future__ import annotations

import __spark_entry__ as se


def test_entry_returns_rows(spark):
    df = se.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = df.columns
    assert cols[:2] == ["l_returnflag", "l_linestatus"]
    assert "sum_qty" in cols and "count_order" in cols


def test_registry_consistency():
    qs, oracles = se.queries(), se.oracle_sql()
    assert qs, "no queries registered"
    # every oracle key must have a matching query
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        assert callable(fn), name
