"""Static type sweep over every DuckDB oracle: no output column may be
HUGEINT/UHUGEINT (INT128).  The external driver compares Spark and
DuckDB results through the pandas bridge, and duckdb's ``.df()`` renders
INT128 as float64 — so an uncast ``SUM(BIGINT)`` (HUGEINT in DuckDB)
hash-fails against Spark's int64 on every row even when the values are
identical.  This is exactly how ``timeseries_rate`` and
``skew_key_histogram`` went driver-red in round 8; the fix discipline is
``CAST(SUM(...) AS BIGINT)`` at the oracle site.

``DESCRIBE (<sql>)`` only binds/plans the query (no execution), so this
sweeps all ~250 oracles in seconds.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as se

_BANNED = ("HUGEINT", "UHUGEINT", "INT128")
_ORACLES = se.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_has_no_int128_output(name, duck):
    rows = duck.execute(f"DESCRIBE ({_ORACLES[name]})").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in rows
        if any(b in typ.upper() for b in _BANNED)
    ]
    assert not bad, (
        f"{name}: oracle outputs INT128-class columns {bad} — the driver's "
        "pandas bridge widens these to float64 and the value hash diverges "
        "from Spark's int64; CAST the aggregate to BIGINT in the oracle SQL"
    )


def test_sweep_catches_planted_uncast_sum(duck):
    """Self-test: an uncast SUM(BIGINT) must be flagged by this sweep."""
    rows = duck.execute(
        "DESCRIBE (SELECT SUM(o_custkey) AS s FROM orders)"
    ).fetchall()
    assert any("HUGEINT" in typ.upper() for _, typ, *_ in rows), (
        "planted uncast SUM no longer yields HUGEINT — duckdb semantics "
        "changed; revisit whether this sweep is still needed"
    )
