"""Scalar function suites (SURVEY.md §2.C): every string/date/regex/cast
call the reference makes, re-expressed as built-in Column expressions.

These all run inside whole-stage codegen — no UDFs anywhere — so they cost
one projection over the scan at any scale.  Each suite cites the Go calls it
covers (file:line in /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load


def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface: instr/trim/split-join/replace/substr/upper/md5.

    Covers strings.Index (parser.go:52,81), TrimSpace (parser.go:72-83),
    ReplaceAll (tail.go:98), Contains (tail.go:99), Join (parser.go:14),
    Sprintf (transform.go:20,36) via format_string/concat_ws.
    """
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.upper(F.col("lang")).alias("lang_upper"),
            F.length("text").alias("text_len"),
            F.substring("text", 1, 12).alias("prefix12"),
            F.instr(F.col("text"), "data").alias("pos_data"),
            F.col("text").contains("join").cast("int").alias("has_join"),
            F.replace(F.col("text"), F.lit("data"), F.lit("DATA")).alias("replaced"),
            # coalesce: Spark concat() NULLs the padded string on NULL
            # lang while DuckDB CONCAT() skips the NULL part
            F.trim(
                F.concat(
                    F.lit("  "), F.coalesce(F.col("lang"), F.lit("")), F.lit("  ")
                )
            ).alias("trimmed"),
            F.concat_ws("|", "lang", "source").alias("lang_source"),
            F.md5(F.col("text")).alias("text_md5"),
            F.regexp_replace(F.col("text"), "[0-9]+", "#").alias("no_digits"),
        )
    )


_FN_STRING_SQL = """
SELECT
  doc_id,
  UPPER(lang) AS lang_upper,
  LENGTH(text) AS text_len,
  SUBSTRING(text, 1, 12) AS prefix12,
  STRPOS(text, 'data') AS pos_data,
  CAST(CONTAINS(text, 'join') AS INT) AS has_join,
  REPLACE(text, 'data', 'DATA') AS replaced,
  TRIM(CONCAT('  ', lang, '  ')) AS trimmed,
  CONCAT_WS('|', lang, source) AS lang_source,
  MD5(text) AS text_md5,
  REGEXP_REPLACE(text, '[0-9]+', '#', 'g') AS no_digits
FROM documents
ORDER BY doc_id
"""


def fn_date_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time surface: extraction, truncation, formatting, arithmetic,
    epoch conversion.  Covers time.Parse/Format (transform.go:38-45,57) and
    the EventDate/EventTime derivations (§2.F: DateTime64(6) <-> Spark µs
    timestamps are an exact precision match)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return (
        ev.select(
            "event_id",
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.dayofmonth("ts").alias("d"),
            F.hour("ts").alias("h"),
            F.minute("ts").alias("mi"),
            F.second("ts").alias("s"),
            F.to_date("ts").cast("string").alias("event_date"),
            F.date_trunc("hour", F.col("ts")).alias("ts_hour"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_fmt"),
            (F.col("ts") + F.expr("INTERVAL 1 DAY")).alias("ts_plus_day"),
            F.unix_micros(F.col("ts")).alias("epoch_us"),
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
                "days_since_jan1"
            ),
        )
        .orderBy("event_id")
    )


_FN_DATE_SQL = """
SELECT
  event_id,
  CAST(year(ts) AS INT) AS y,
  CAST(month(ts) AS INT) AS m,
  CAST(day(ts) AS INT) AS d,
  CAST(hour(ts) AS INT) AS h,
  CAST(minute(ts) AS INT) AS mi,
  CAST(floor(second(ts)) AS INT) AS s,
  CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
  date_trunc('hour', ts) AS ts_hour,
  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_fmt,
  ts + INTERVAL 1 DAY AS ts_plus_day,
  epoch_us(ts) AS epoch_us,
  CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT) AS days_since_jan1
FROM events
WHERE event_id < 2000
ORDER BY event_id
"""


def fn_cast_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast surface with the reference's SILENT-ZERO semantics: Go
    strconv.Parse* ignores errors and leaves 0 (parser.go:98-116), so every
    numeric parse here is coalesce(try_cast(...), 0) — plain CAST would
    yield NULL and diverge (SURVEY.md §7.3 risk #1).

    Also covers double->int truncation (Go int() truncates toward zero;
    Spark CAST truncates; DuckDB CAST rounds — oracle uses TRUNC to pin the
    same semantics)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    num_str = F.regexp_extract(F.col("props"), '"k": (\\d+)', 1)
    return (
        ev.select(
            "event_id",
            F.coalesce(num_str.try_cast("long"), F.lit(0)).alias("k_silent_zero"),
            F.coalesce(F.col("event_type").try_cast("long"), F.lit(0)).alias(
                "bad_parse_zero"
            ),
            F.col("event_type").try_cast("long").alias("bad_parse_null"),
            F.col("value").cast("int").alias("value_trunc"),
            F.col("value").cast("string").alias("value_str"),
            F.round(F.col("value"), 2).alias("value_round2"),
            F.col("user_id").cast("double").alias("user_id_dbl"),
            (F.col("user_id") % 256).cast("int").alias("user_mod"),
        )
        .orderBy("event_id")
    )


_FN_CAST_SQL = """
SELECT
  event_id,
  COALESCE(TRY_CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT), 0) AS k_silent_zero,
  COALESCE(TRY_CAST(event_type AS BIGINT), 0) AS bad_parse_zero,
  TRY_CAST(event_type AS BIGINT) AS bad_parse_null,
  CAST(TRUNC(value) AS INT) AS value_trunc,
  CAST(value AS VARCHAR) AS value_str,
  ROUND(value, 2) AS value_round2,
  CAST(user_id AS DOUBLE) AS user_id_dbl,
  CAST(user_id % 256 AS INT) AS user_mod
FROM events
WHERE event_id < 2000
ORDER BY event_id
"""


def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props (the reference keeps its SQL
    payload opaque; a queryable engine must crack JSON).  get_json_object
    is JVM-side JsonPath — no Python in the loop."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            F.get_json_object("props", "$.k").cast("long").alias("k_int"),
            F.get_json_object("props", "$.missing").alias("missing_key"),
            F.schema_of_json(F.lit('{"k": 1}')).alias("schema_lit"),
        )
        .orderBy("event_id")
    )


_FN_JSON_SQL = """
SELECT
  event_id,
  json_extract_string(props, '$.k') AS k_str,
  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
  json_extract_string(props, '$.missing') AS missing_key,
  'STRUCT<k: BIGINT>' AS schema_lit
FROM events
WHERE event_id < 2000
ORDER BY event_id
"""


def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface incl. higher-order functions: tokenize text, measure,
    sort/slice/join, and fold token lengths with aggregate().  The oracle
    cross-checks the fold with an independent formulation
    (length(replace(text,' ','')) == sum of token lengths)."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return (
        docs.select(
            "doc_id",
            F.size(toks).alias("n_tokens"),
            F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
            F.array_contains(toks, "data").cast("int").alias("has_data_tok"),
            F.element_at(toks, 1).alias("first_tok"),
            F.element_at(toks, -1).alias("last_tok"),
            F.array_join(F.slice(F.array_sort(toks), 1, 3), " ").alias("sorted3"),
            F.aggregate(
                toks, F.lit(0), lambda acc, x: acc + F.length(x)
            ).alias("sum_tok_len"),
            F.size(F.filter(toks, lambda x: F.length(x) > 4)).alias("n_long_tokens"),
        )
    )


_FN_ARRAY_SQL = """
SELECT
  doc_id,
  len(string_split(text, ' ')) AS n_tokens,
  len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens,
  CAST(list_contains(string_split(text, ' '), 'data') AS INT) AS has_data_tok,
  string_split(text, ' ')[1] AS first_tok,
  string_split(text, ' ')[-1] AS last_tok,
  array_to_string(list_sort(string_split(text, ' '))[1:3], ' ') AS sorted3,
  CAST(LENGTH(REPLACE(text, ' ', '')) AS INT) AS sum_tok_len,
  len(list_filter(string_split(text, ' '), x -> LENGTH(x) > 4)) AS n_long_tokens
FROM documents
ORDER BY doc_id
"""


def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode / UNNEST: token frequency across the corpus (the lateral-view
    shape used later by MinHash shingling).  posexplode is checked via the
    position of each doc's first token."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n") >= 10)
    )


_FN_EXPLODE_SQL = """
SELECT tok, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents)
GROUP BY tok
HAVING COUNT(*) >= 10
ORDER BY n DESC, tok ASC
"""


def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map surface: the reference's parsed header is a map[string]string
    (parser.go:51); here a map column is built, key-projected, and sized.
    map_from_entries/str_to_map mirror parseSimpleHeader (parser.go:80-86)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    # NULL-safe parts: Spark concat() NULLs the whole string on any
    # NULL arg while DuckDB CONCAT() skips NULLs — coalesce to '' so
    # both engines build the identical header text
    ety = F.coalesce(F.col("event_type"), F.lit(""))
    uid = F.coalesce(F.col("user_id").cast("string"), F.lit(""))
    kv = F.concat(F.lit("type="), ety, F.lit(",user="), uid)
    m = F.expr(
        "map_from_entries(transform(split(concat('type=', coalesce(event_type, ''), ',user=', coalesce(CAST(user_id AS STRING), '')), ','), p -> struct(split(p, '=')[0] AS key, split(p, '=')[1] AS value)))"
    )
    return (
        ev.select(
            "event_id",
            kv.alias("kv_raw"),
            m.getItem("type").alias("m_type"),
            m.getItem("user").alias("m_user"),
            F.size(m).alias("m_size"),
        )
        .orderBy("event_id")
    )


_FN_MAP_SQL = """
SELECT
  event_id,
  CONCAT('type=', event_type, ',user=', CAST(user_id AS VARCHAR)) AS kv_raw,
  COALESCE(event_type, '') AS m_type,
  COALESCE(CAST(user_id AS VARCHAR), '') AS m_user,
  2 AS m_size
FROM events
WHERE event_id < 2000
ORDER BY event_id
"""


def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE/when, nullif, nvl/coalesce, least/greatest — the null-handling
    glue used throughout the TechLogRow projection (nullable sink fields,
    models.go:48-53)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return (
        ev.select(
            "event_id",
            F.when(F.col("value") > 75, "high")
            .when(F.col("value") > 25, "mid")
            .otherwise("low")
            .alias("value_band"),
            F.nullif(F.col("event_type"), F.lit("error")).alias("type_or_null"),
            F.coalesce(F.nullif(F.col("event_type"), F.lit("error")), F.lit("ERR")).alias(
                "type_defaulted"
            ),
            F.least(F.col("value"), F.lit(50.0)).alias("capped50"),
            F.greatest(F.col("value"), F.lit(50.0)).alias("floored50"),
            F.lit(None).cast("string").alias("always_null"),
        )
        .orderBy("event_id")
    )


_FN_CONDITIONAL_SQL = """
SELECT
  event_id,
  CASE WHEN value > 75 THEN 'high' WHEN value > 25 THEN 'mid' ELSE 'low' END AS value_band,
  NULLIF(event_type, 'error') AS type_or_null,
  COALESCE(NULLIF(event_type, 'error'), 'ERR') AS type_defaulted,
  LEAST(value, 50.0) AS capped50,
  GREATEST(value, 50.0) AS floored50,
  CAST(NULL AS VARCHAR) AS always_null
FROM events
WHERE event_id < 2000
ORDER BY event_id
"""


SPARK_QUERIES = {
    "fn_string_suite": fn_string_suite,
    "fn_date_suite": fn_date_suite,
    "fn_cast_suite": fn_cast_suite,
    "fn_json": fn_json,
    "fn_array": fn_array,
    "fn_explode": fn_explode,
    "fn_map": fn_map,
    "fn_conditional": fn_conditional,
}

ORACLE_SQL = {
    "fn_string_suite": _FN_STRING_SQL,
    "fn_date_suite": _FN_DATE_SQL,
    "fn_cast_suite": _FN_CAST_SQL,
    "fn_json": _FN_JSON_SQL,
    "fn_array": _FN_ARRAY_SQL,
    "fn_explode": _FN_EXPLODE_SQL,
    "fn_map": _FN_MAP_SQL,
    "fn_conditional": _FN_CONDITIONAL_SQL,
}
