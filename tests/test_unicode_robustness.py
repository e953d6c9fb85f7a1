"""Unicode robustness: an LLM-data engine meets CJK, emoji, combining
accents, RTL text, and full-casing characters (straße) — the ASCII-only
fixtures can't catch engine divergences there.

Round 6 swept the registry against a unicode-injected documents twin:
225/226 agreed (md5/length/split/upper are UTF-8-consistent across
Spark and DuckDB); the one divergence was the word-boundary regex
surface — Java's \\b is Unicode-aware while RE2's is ASCII — now pinned
to an explicitly ASCII-sanitized projection in fn_regexp_suite.  This
test rebuilds the twin and re-runs the text-plane queries.
"""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

import __spark_entry__ as se
from tools.parity import compare_one

_TEXT_PLANE = [
    "fn_regexp_suite",  # the formerly-diverging id
    "fn_string_suite", "fn_string_suite2", "fn_hash_suite",
    "fn_encoding_suite", "fn_array", "fn_array2_suite",
    "text_stats", "text_token_bpe", "doc_fingerprint", "text_tfidf",
    "text_quality_gopher", "text_repetition", "dedup_exact",
    "dedup_minhash_lsh", "text_pmi_pairs", "corpus_vocab", "chunk_docs",
    "sample_dsir",
]

_INJECT = """
COPY (
  SELECT doc_id,
         CASE doc_id % 12
           WHEN 0 THEN '数据 处理 straße ' || text
           WHEN 5 THEN 'café naïve 🚀 émoji ' || text
           WHEN 9 THEN 'مرحبا بالعالم ' || text
           ELSE text END AS text,
         lang, source,
         CASE doc_id % 12
           WHEN 0 THEN length('数据 处理 straße ') + n_chars
           WHEN 5 THEN length('café naïve 🚀 émoji ') + n_chars
           WHEN 9 THEN length('مرحبا بالعالم ') + n_chars
           ELSE n_chars END AS n_chars
  FROM '{src}'
) TO '{dst}' (FORMAT PARQUET)
"""


@pytest.fixture(scope="module")
def unicode_env(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sfuni"))
    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    for t in tables:
        src = f"/root/testdata/sf0.001/{t}.parquet"
        if t == "documents":
            con.sql(_INJECT.format(src=src, dst=f"{out}/{t}.parquet"))
        else:
            shutil.copy(src, f"{out}/{t}.parquet")
    oracle = duckdb.connect()
    for t in tables:
        oracle.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(out, t)}.parquet')"
        )
    return out, oracle


@pytest.mark.parametrize("name", _TEXT_PLANE)
def test_text_query_survives_unicode(name, spark, unicode_env):
    sf_dir, con = unicode_env
    ok, msg = compare_one(
        name, spark, con, sf_dir, se.queries(), se.oracle_sql()
    )
    assert ok, f"{name} diverges on unicode text: {msg}"
