"""Property-based tests: the Column-expression parser vs a direct Python
model of the Go semantics (strconv grammar, ParseLogRecord splitting,
extractSQL escape scan, extractContext last-quote).

The Python models here are TEST ORACLES transliterating the documented
behavior of /root/reference/internal/parser/*.go for verification only —
the engine itself never executes them.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from logpump_spark.techlog.parser import parse_int32, parse_uint, split_record

# ---------------------------------------------------------------------------
# Python models of the Go behavior
# ---------------------------------------------------------------------------

def go_parse_uint(s: str, max_value: int) -> int:
    # strconv.ParseUint: syntax error -> 0; range error -> bit-size max
    # (the reference discards the error and keeps the value)
    if not re.fullmatch(r"[0-9]+", s or ""):
        return 0
    n = int(s)
    return n if n <= max_value else max_value


def go_parse_int32(s: str) -> int:
    # strconv.ParseInt: syntax error -> 0; range error -> MaxInt32/MinInt32
    if not re.fullmatch(r"[+-]?[0-9]+", s or ""):
        return 0
    n = int(s)
    if n > 2**31 - 1:
        return 2**31 - 1
    if n < -(2**31):
        return -(2**31)
    return n


def go_extract_sql(s: str, quote: str) -> tuple[str, str]:
    out, i, in_escape = [], 0, False
    while i < len(s):
        c = s[i]
        if c == quote and not in_escape:
            sql = re.sub(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}", "", "".join(out)).strip()
            return sql, s[i + 1 :]
        if c == "\\" and not in_escape:
            in_escape = True
        else:
            in_escape = False
            out.append(c)
        i += 1
    sql = re.sub(r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}", "", "".join(out)).strip()
    return sql, ""


def go_extract_context(s: str) -> str:
    idx = s.find(",Context='")
    if idx == -1:
        return ""
    ctx = s[idx + len(",Context='") :]
    end = ctx.rfind("'")
    return ctx if end == -1 else ctx[:end]


def go_split_record(raw: str) -> tuple[str, str, str]:
    sql_idx = raw.find("Sql=")
    if sql_idx == -1:
        return raw, "", go_extract_context(raw)
    header = raw[:sql_idx]
    rest = raw[sql_idx + 4 :]
    if not rest:
        return header, "", ""
    quote, rest = rest[0], rest[1:]
    if quote not in ("'", '"'):
        # engine supports ' and " delimiters; Go would scan for any byte.
        # Restricted generators below keep the property space aligned.
        raise NotImplementedError
    sql, after = go_extract_sql(rest, quote)
    return header, sql, go_extract_context(after)


# ---------------------------------------------------------------------------
# Spark evaluation helper: run the Column expressions over a literal batch
# ---------------------------------------------------------------------------

def _eval_numeric(spark, values: list[str]):
    df = spark.createDataFrame([(v,) for v in values], "s string")
    rows = df.select(
        parse_uint(F.col("s"), 4_294_967_295).alias("u"),
        parse_int32(F.col("s")).alias("i"),
    ).collect()
    return [(r.u, r.i) for r in rows]


def _eval_split(spark, records: list[str]):
    df = spark.createDataFrame([(r,) for r in records], "record string")
    h, s, c = split_record(F.col("record"))
    return [
        (r.h, r.s, r.c)
        for r in df.select(h.alias("h"), s.alias("s"), c.alias("c")).collect()
    ]


num_strings = st.one_of(
    st.text(alphabet="0123456789+- x", max_size=24),
    st.integers(min_value=-(2**64), max_value=2**64).map(str),
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(num_strings, min_size=1, max_size=40))
def test_numeric_grammar_matches_go(spark, values):
    got = _eval_numeric(spark, values)
    want = [(go_parse_uint(v, 4_294_967_295), go_parse_int32(v)) for v in values]
    assert got == want


# record bodies: printable-ish text incl. commas, equals, quotes, escapes,
# newlines — the space split_record actually faces
body = st.text(
    alphabet=st.sampled_from(list("abcZ19 ,='\\\"\nФ.:-()")), max_size=60
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(body, min_size=1, max_size=25))
def test_split_record_matches_go(spark, bodies):
    records, want = [], []
    for b in bodies:
        try:
            want.append(go_split_record(b))
            records.append(b)
        except NotImplementedError:
            continue  # non-quote delimiter after Sql=: out of modeled space
    if not records:
        return
    got = _eval_split(spark, records)
    for rec, g, w in zip(records, got, want):
        assert g == w, f"record {rec!r}: spark={g} go={w}"


# ---------------------------------------------------------------------------
# r14: the split (two-codegen-stage) and fused projection shapes of the
# FULL 24-field parse_records must agree on arbitrary record bodies, not
# just the golden corpus — same expressions over the same intermediates
# is the correctness argument for the C2-storm plan-shape fix, so pin it
# property-style where the golden file can't reach (adversarial quoting,
# truncated headers, unicode, embedded newlines).


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(body, min_size=1, max_size=20))
def test_parse_records_split_and_fused_agree(spark, bodies):
    from logpump_spark.techlog.parser import parse_records

    df = spark.createDataFrame(
        [(b, f"f{i}.log") for i, b in enumerate(bodies)],
        "record string, filename string",
    )
    split = parse_records(df, split_stages=True).drop("InsertedAt")
    fused = parse_records(df, split_stages=False).drop("InsertedAt")
    assert split.schema == fused.schema
    key = lambda r: tuple(str(v) for v in r)
    assert sorted(split.collect(), key=key) == sorted(fused.collect(), key=key)
