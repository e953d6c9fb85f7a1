"""Scalar function coverage, batch 2: extended string ops, math, regex,
date part extraction (SURVEY.md §2.C completion).

Parity notes: exp/ln are rounded 6dp (libm vs JVM may differ in the last
ULP); sqrt is IEEE-correctly-rounded everywhere so it stays raw; pow is
avoided in favor of explicit multiplication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load


def fn_string_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.lpad("lang", 6, "*").alias("lang_lpad"),
        F.rpad("source", 8, "-").alias("source_rpad"),
        F.repeat("lang", 3).alias("lang_x3"),
        F.translate("lang", "aeiou", "AEIOU").alias("lang_vowels"),
        F.levenshtein("lang", F.lit("en")).alias("lev_to_en"),
        F.expr("split_part(text, ' ', 2)").alias("second_word"),
        F.left(F.col("text"), F.lit(5)).alias("left5"),
        F.right(F.col("text"), F.lit(5)).alias("right5"),
        F.ascii("lang").alias("lang_ascii"),
        F.lower(F.upper("source")).alias("roundtrip"),
        F.startswith(F.col("text"), F.lit("the")).cast("int").alias("starts_the"),
        F.endswith(F.col("source"), F.lit("1")).cast("int").alias("ends_1"),
    )


_FN_STRING2_SQL = """
SELECT doc_id,
  lpad(lang, 6, '*') AS lang_lpad,
  rpad(source, 8, '-') AS source_rpad,
  repeat(lang, 3) AS lang_x3,
  translate(lang, 'aeiou', 'AEIOU') AS lang_vowels,
  levenshtein(lang, 'en') AS lev_to_en,
  split_part(text, ' ', 2) AS second_word,
  left(text, 5) AS left5,
  right(text, 5) AS right5,
  ascii(lang) AS lang_ascii,
  lower(upper(source)) AS roundtrip,
  CAST(starts_with(text, 'the') AS INT) AS starts_the,
  CAST(ends_with(source, '1') AS INT) AS ends_1
FROM documents ORDER BY doc_id
"""


def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    v = F.col("value")
    return ev.select(
        "event_id",
        F.abs(v - 50).alias("abs_c"),
        F.signum(v - 50).alias("sign_c"),
        F.ceil(v).alias("ceil_v"),
        F.floor(v).alias("floor_v"),
        F.sqrt(v).alias("sqrt_v"),
        (v * v).alias("v_sq"),
        F.pmod(F.col("user_id"), F.lit(7)).alias("mod7"),
        F.round(F.exp(v / 100), 6).alias("exp_v"),
        F.round(F.log(v + 1), 6).alias("ln_v"),
        F.greatest(v, F.lit(50.0)).alias("g50"),
        F.least(v, F.lit(50.0)).alias("l50"),
    ).orderBy("event_id")


_FN_MATH_SQL = """
SELECT event_id,
  abs(value - 50) AS abs_c,
  CASE WHEN value IS NULL THEN NULL
       WHEN value - 50 > 0 THEN 1.0 WHEN value - 50 < 0 THEN -1.0
       ELSE 0.0 END AS sign_c,
  CAST(ceil(value) AS BIGINT) AS ceil_v,
  CAST(floor(value) AS BIGINT) AS floor_v,
  sqrt(value) AS sqrt_v,
  value * value AS v_sq,
  user_id % 7 AS mod7,
  round(exp(value / 100), 6) AS exp_v,
  round(ln(value + 1), 6) AS ln_v,
  greatest(value, 50.0) AS g50,
  least(value, 50.0) AS l50
FROM events WHERE event_id < 2000 ORDER BY event_id
"""


def fn_regexp_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""\b/\w are engine-divergent OUTSIDE ASCII (Java's \b is
    Unicode-aware, RE2's is ASCII — 'straße' matches differently), so
    the word-boundary surface is pinned to an explicitly ASCII-sanitized
    projection (identity on ASCII text; non-ASCII maps to space in both
    engines)."""
    docs = load(spark, sf_dir, "documents")
    t = F.regexp_replace(F.col("text"), r"[^\x00-\x7F]", " ")
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(r"\bdata\b")).alias("n_data"),
        F.regexp_extract(t, r"(\w+) (\w+)", 2).alias("second_tok"),
        t.rlike("join.*table").cast("int").alias("has_join_table"),
        F.regexp_replace(t, r"\b(\w)(\w*)\b", "$1").alias("initials_only"),
        F.size(F.regexp_extract_all(t, F.lit(r"\b\w{5}\b"), 0)).alias(
            "n_5letter"
        ),
    )


_FN_REGEXP_SQL = r"""
WITH t AS (
  SELECT doc_id, regexp_replace(text, '[^\x00-\x7F]', ' ', 'g') AS text
  FROM documents
)
SELECT doc_id,
  len(regexp_extract_all(text, '\bdata\b', 0)) AS n_data,
  regexp_extract(text, '(\w+) (\w+)', 2) AS second_tok,
  CAST(regexp_matches(text, 'join.*table') AS INT) AS has_join_table,
  regexp_replace(text, '\b(\w)(\w*)\b', '\1', 'g') AS initials_only,
  len(regexp_extract_all(text, '\b\w{5}\b', 0)) AS n_5letter
FROM t ORDER BY doc_id
"""


def fn_date_suite2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.quarter("ts").alias("q"),
        F.dayofyear("ts").alias("doy"),
        F.weekofyear("ts").alias("woy"),
        F.last_day("ts").cast("string").alias("month_end"),
        F.add_months("ts", 2).cast("string").alias("plus_2mo"),
        F.date_trunc("month", F.col("ts")).alias("month_start"),
        F.make_date(F.year("ts"), F.month("ts"), F.lit(1)).cast("string").alias(
            "first_of_month"
        ),
        (F.col("ts") - F.expr("INTERVAL 90 MINUTE")).alias("minus_90m"),
    ).orderBy("event_id")


_FN_DATE2_SQL = """
SELECT event_id,
  CAST(quarter(ts) AS INT) AS q,
  CAST(dayofyear(ts) AS INT) AS doy,
  CAST(weekofyear(ts) AS INT) AS woy,
  CAST(last_day(ts) AS VARCHAR) AS month_end,
  CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE)::VARCHAR AS plus_2mo,
  CAST(date_trunc('month', ts) AS TIMESTAMP) AS month_start,
  CAST(make_date(CAST(year(ts) AS INT), CAST(month(ts) AS INT), 1) AS VARCHAR) AS first_of_month,
  ts - INTERVAL 90 MINUTE AS minus_90m
FROM events WHERE event_id < 2000 ORDER BY event_id
"""


SPARK_QUERIES = {
    "fn_string_suite2": fn_string_suite2,
    "fn_math_suite": fn_math_suite,
    "fn_regexp_suite": fn_regexp_suite,
    "fn_date_suite2": fn_date_suite2,
}

ORACLE_SQL = {
    "fn_string_suite2": _FN_STRING2_SQL,
    "fn_math_suite": _FN_MATH_SQL,
    "fn_regexp_suite": _FN_REGEXP_SQL,
    "fn_date_suite2": _FN_DATE2_SQL,
}
