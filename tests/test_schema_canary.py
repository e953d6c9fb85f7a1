"""Engine-upgrade canary: `tables.load()` must present EXACTLY these
schemas whatever Spark/parquet version is underneath.

Round 3 regressed 15 query ids because Spark 4.1 started reading the
events TIMESTAMP(NANOS) column natively as TIMESTAMP_NTZ and the
normalization branch silently stopped firing — every `unix_micros(ts)`
then failed analysis at driver time.  This test turns that class of
silent upgrade break into one loud, named failure pointing at
logpump_spark/tables.py."""

from __future__ import annotations

import pytest

from logpump_spark.tables import load

from .conftest import SF_SMALL

_EXPECTED = {
    "events": {
        "event_id": "bigint",
        "ts": "timestamp",  # NEVER timestamp_ntz / bigint — see tables.load()
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
    "lineitem": None,  # presence + load-ability only
    "orders": None,
    "customer": None,
    "supplier": None,
    "part": None,
    "nation": None,
    "region": None,
}


@pytest.mark.parametrize("table", sorted(_EXPECTED))
def test_table_schema_stable_across_engine_upgrades(spark, table):
    df = load(spark, SF_SMALL, table)
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = _EXPECTED[table]
    if want is None:
        assert len(got) > 0
        return
    assert got == want, (
        f"{table} schema drifted (likely a Spark/parquet upgrade changed "
        f"a type mapping): {got} != {want}; fix the normalization in "
        "logpump_spark/tables.py:load, NOT the queries"
    )
