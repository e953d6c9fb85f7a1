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

import pytest

import __spark_entry__ as se
from tools.parity import compare_one
from tools.perturb import build, oracle_views

_TEXT_PLANE = [
    "fn_regexp_suite",  # the formerly-diverging id
    "fn_string_suite", "fn_string_suite2", "fn_hash_suite",
    "fn_encoding_suite", "fn_array", "fn_array2_suite",
    "text_stats", "text_token_bpe", "doc_fingerprint", "text_tfidf",
    "text_quality_gopher", "text_repetition", "dedup_exact",
    "dedup_minhash_lsh", "text_pmi_pairs", "corpus_vocab", "chunk_docs",
    "sample_dsir",
    # round-8 additions (lttb/funnel are text-free but ride the same twin)
    "skew_key_histogram", "funnel_steps_capped", "timeseries_lttb_exact",
]

@pytest.fixture(scope="module")
def unicode_env(tmp_path_factory):
    out = build("unicode", "/root/testdata/sf0.001",
                str(tmp_path_factory.mktemp("sfuni")))
    return out, oracle_views(out)


@pytest.mark.parametrize("name", _TEXT_PLANE)
def test_text_query_survives_unicode(name, spark, unicode_env):
    sf_dir, con = unicode_env
    ok, msg = compare_one(
        name, spark, con, sf_dir, se.queries(), se.oracle_sql()
    )
    assert ok, f"{name} diverges on unicode text: {msg}"
