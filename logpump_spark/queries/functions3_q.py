"""Scalar coverage batch 3: bitwise ops, hex encoding, structured
to_json/from_json round-trips."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import load


def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    e = F.col("event_id")
    return ev.select(
        "event_id",
        e.bitwiseAND(F.lit(0xFF)).alias("and_ff"),
        e.bitwiseOR(F.lit(0x10)).alias("or_10"),
        e.bitwiseXOR(F.col("user_id")).alias("xor_uid"),
        F.shiftleft(e, 3).alias("shl3"),
        F.shiftright(e, 2).alias("shr2"),
        F.bit_count(e).alias("popcount"),
        F.hex(F.col("user_id")).alias("uid_hex"),
    ).orderBy("event_id")


_FN_BITWISE_SQL = """
SELECT event_id,
  event_id & 255 AS and_ff,
  event_id | 16 AS or_10,
  xor(event_id, user_id) AS xor_uid,
  event_id << 3 AS shl3,
  event_id >> 2 AS shr2,
  bit_count(event_id) AS popcount,
  hex(user_id) AS uid_hex
FROM events WHERE event_id < 2000 ORDER BY event_id
"""


def fn_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a typed struct, transform, re-serialize with
    to_json — both engines render compact JSON identically for
    int/string fields."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    parsed = F.from_json(F.col("props"), "k INT")
    # ignoreNullFields=false: Spark's default OMITS null fields while
    # DuckDB's to_json renders "k2":null — align on the explicit form
    rebuilt = F.to_json(
        F.struct(
            F.col("event_id").alias("id"),
            F.col("event_type").alias("t"),
            (parsed["k"] * 2).alias("k2"),
        ),
        {"ignoreNullFields": "false"},
    )
    return ev.select(
        "event_id",
        parsed["k"].alias("k_typed"),
        rebuilt.alias("json_out"),
    ).orderBy("event_id")


_FN_JSON_ROUNDTRIP_SQL = """
SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
  to_json(struct_pack(
    id := event_id,
    t := event_type,
    k2 := CAST(json_extract_string(props, '$.k') AS INT) * 2
  )) AS json_out
FROM events WHERE event_id < 2000 ORDER BY event_id
"""


def fn_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact decimal arithmetic (the money-typed path a ClickHouse user
    expects): cast to DECIMAL(12,2), multiply/add exactly, aggregate in
    decimal.  Outputs are presented as double because the two engines'
    pandas bridges disagree on decimal objects (Spark keeps Decimal,
    DuckDB narrows to float64) — the ARITHMETIC is decimal end-to-end and
    therefore exact/order-independent either way."""
    li = load(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast("decimal(12,2)")
    q = F.col("l_quantity").cast("decimal(12,2)")
    line_total = (p * q).cast("decimal(24,4)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(line_total).cast("double").alias("sum_line_total"),
            F.max(p).cast("double").alias("max_price"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


_FN_DECIMAL_SQL = """
SELECT l_returnflag,
  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(24,4))) AS DOUBLE) AS sum_line_total,
  CAST(MAX(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price,
  COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


SPARK_QUERIES = {
    "fn_bitwise": fn_bitwise,
    "fn_json_roundtrip": fn_json_roundtrip,
    "fn_decimal": fn_decimal,
}

ORACLE_SQL = {
    "fn_bitwise": _FN_BITWISE_SQL,
    "fn_json_roundtrip": _FN_JSON_ROUNDTRIP_SQL,
    "fn_decimal": _FN_DECIMAL_SQL,
}


def agg_sum_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sumMap`` analog: map-valued aggregation.  Each event
    carries a metrics map (synthesized in-plan from its columns); the
    aggregate sums the maps KEY-WISE per event_type and returns the
    CH shape — parallel sorted-keys / summed-values arrays, serialized
    to CSV strings (the driver canonicalizer hashes scalar cells; the
    ``fn_array`` suite set this serialization precedent).

    Spark has no map-sum aggregate; the scale-honest expression is
    explode -> (group, key) sum (map-side partials on the flat rows) ->
    re-collect sorted.  The per-group map width is bounded by the
    metric vocabulary, not the corpus."""
    ev = load(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("cnt"), F.lit(1).cast("long"),
        F.lit("val_milli"), F.floor(F.col("value") * 1000).cast("long"),
        F.lit("k"), F.get_json_object("props", "$.k").cast("long"),
    )
    flat = ev.select("event_type", F.explode(m).alias("mk", "mv"))
    per_key = flat.groupBy("event_type", "mk").agg(F.sum("mv").alias("total"))
    return (
        per_key.groupBy("event_type")
        .agg(
            F.array_sort(F.collect_list(F.struct("mk", "total"))).alias("kv")
        )
        .select(
            "event_type",
            F.array_join(
                F.transform("kv", lambda s: s["mk"]), ","
            ).alias("map_keys"),
            # NULL totals serialize as literal 'null' — array_join /
            # string_agg would otherwise DROP the element and silently
            # desynchronize values from map_keys
            F.array_join(
                F.transform(
                    "kv",
                    lambda s: F.coalesce(
                        s["total"].cast("string"), F.lit("null")
                    ),
                ),
                ",",
            ).alias("map_sums"),
        )
        .orderBy("event_type")
    )


_AGG_SUM_MAP_SQL = """
WITH flat AS (
  SELECT event_type, u.mk,
         CASE u.mk
           WHEN 'cnt' THEN 1
           WHEN 'val_milli' THEN CAST(FLOOR(value * 1000) AS BIGINT)
           ELSE CAST(json_extract_string(props, '$.k') AS BIGINT)
         END AS mv
  FROM events, UNNEST(['cnt', 'val_milli', 'k']) AS u(mk)
),
per_key AS (
  SELECT event_type, mk, SUM(mv) AS total FROM flat GROUP BY event_type, mk
)
SELECT event_type,
       string_agg(mk, ',' ORDER BY mk) AS map_keys,
       string_agg(COALESCE(CAST(CAST(total AS BIGINT) AS VARCHAR), 'null'),
                  ',' ORDER BY mk) AS map_sums
FROM per_key GROUP BY event_type ORDER BY event_type
"""

SPARK_QUERIES["agg_sum_map"] = agg_sum_map
ORACLE_SQL["agg_sum_map"] = _AGG_SUM_MAP_SQL


def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (most frequent value, ties to the
    smallest): the most common daily event count per event_type.  Spark
    4's ``mode()`` breaks ties arbitrarily, so the engine-exact form is
    count + rank — same shape both engines, same winner always."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("x"))
    freq = daily.groupBy("event_type", "x").agg(F.count(F.lit(1)).alias("f"))
    w = W.partitionBy("event_type").orderBy(F.col("f").desc(), F.col("x").asc())
    return (
        freq.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("x").alias("mode_daily_count"), F.col("f").alias("n_days_at_mode"))
        .orderBy("event_type")
    )


_AGG_MODE_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
  FROM events GROUP BY 1, 2
),
freq AS (
  SELECT event_type, x, COUNT(*) AS f FROM daily GROUP BY 1, 2
)
SELECT event_type, x AS mode_daily_count, f AS n_days_at_mode FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY f DESC, x ASC) AS rn
  FROM freq
) WHERE rn = 1 ORDER BY event_type
"""

SPARK_QUERIES["agg_mode"] = agg_mode
ORACLE_SQL["agg_mode"] = _AGG_MODE_SQL


def fn_url_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing surface: scheme/host/path/query-param extraction over
    URLs synthesized from document metadata.  Uses regexp extraction
    (RE2-portable, identical in DuckDB) rather than ``parse_url`` so the
    oracle checks values, not just shape — ``F.parse_url`` exists for
    users and returns the same components for these URLs."""
    docs = load(spark, sf_dir, "documents")
    # NULL-safe URL build: Spark concat() NULLs the whole URL on any
    # NULL part while DuckDB || does too — but downstream regexp_extract
    # then diverges (Spark NULL vs DuckDB '') — so pin empty strings
    url = F.concat(
        F.lit("https://"), F.coalesce(F.col("source"), F.lit("")),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="),
        F.coalesce(F.col("lang"), F.lit("")),
        F.lit("&v=2"),
    )
    d = docs.select("doc_id", url.alias("url"))
    return d.select(
        "doc_id",
        "url",
        F.regexp_extract("url", r"^([a-z]+)://", 1).alias("scheme"),
        F.regexp_extract("url", r"^[a-z]+://([^/]+)/", 1).alias("host"),
        F.regexp_extract("url", r"^[a-z]+://[^/]+(/[^?]*)", 1).alias("path"),
        F.regexp_extract("url", r"[?&]lang=([^&]*)", 1).alias("q_lang"),
        F.regexp_extract("url", r"[?&]v=([^&]*)", 1).alias("q_v"),
    )


_FN_URL_SQL = """
WITH d AS (
  SELECT doc_id,
         'https://' || COALESCE(source, '') || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
         || '?lang=' || COALESCE(lang, '') || '&v=2' AS url
  FROM documents
)
SELECT doc_id, url,
       COALESCE(regexp_extract(url, '^([a-z]+)://', 1), '') AS scheme,
       COALESCE(regexp_extract(url, '^[a-z]+://([^/]+)/', 1), '') AS host,
       COALESCE(regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1), '') AS path,
       COALESCE(regexp_extract(url, '[?&]lang=([^&]*)', 1), '') AS q_lang,
       COALESCE(regexp_extract(url, '[?&]v=([^&]*)', 1), '') AS q_v
FROM d ORDER BY doc_id
"""

SPARK_QUERIES["fn_url_suite"] = fn_url_suite
ORACLE_SQL["fn_url_suite"] = _FN_URL_SQL


def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface (the engine's semi-structured type —
    ClickHouse JSON/Object analog): JSON built from columns parses to
    VARIANT once and every downstream access is a typed variant_get
    (binary-encoded traversal, no re-parsing) — scalar, nested object,
    and array-index paths.  The oracle extracts the same paths from the
    same JSON text."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    j = F.concat(
        F.lit('{"a": '),
        F.col("user_id").cast("string"),
        F.lit(', "b": {"c": '),
        F.floor(F.col("value") * 1000).cast("long").cast("string"),
        F.lit(', "tags": ["x", "'),
        F.col("event_type"),
        F.lit('"]}}'),
    )
    v = F.parse_json(j)
    return (
        ev.select(
            "event_id",
            F.try_variant_get(v, "$.a", "long").alias("a"),
            F.try_variant_get(v, "$.b.c", "long").alias("c"),
            F.try_variant_get(v, "$.b.tags[1]", "string").alias("tag1"),
            F.try_variant_get(v, "$.missing", "long").alias("absent"),
        )
    )


_FN_VARIANT_SQL = """
WITH j AS (
  SELECT event_id,
         '{"a": ' || CAST(user_id AS VARCHAR) || ', "b": {"c": '
         || CAST(CAST(FLOOR(value * 1000) AS BIGINT) AS VARCHAR)
         || ', "tags": ["x", "' || event_type || '"]}}' AS js
  FROM events WHERE user_id < 100
)
SELECT event_id,
       CAST(js ->> '$.a' AS BIGINT) AS a,
       CAST(js ->> '$.b.c' AS BIGINT) AS c,
       js ->> '$.b.tags[1]' AS tag1,
       CAST(js ->> '$.missing' AS BIGINT) AS absent
FROM j ORDER BY event_id
"""

SPARK_QUERIES["fn_variant"] = fn_variant
ORACLE_SQL["fn_variant"] = _FN_VARIANT_SQL


def fn_hash_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine hash surface: md5, sha2-256, and a deterministic
    UUID-shaped stable row id derived from md5 hex — the content-
    addressed identity every dedup/lineage pipeline needs (xxhash64 is
    Spark-only; md5/sha256 are the portable pair)."""
    docs = load(spark, sf_dir, "documents")
    h = F.md5(F.col("text"))
    return docs.select(
        "doc_id",
        h.alias("md5"),
        F.sha2(F.col("text"), 256).alias("sha256"),
        F.concat_ws(
            "-",
            F.substring(h, 1, 8),
            F.substring(h, 9, 4),
            F.substring(h, 13, 4),
            F.substring(h, 17, 4),
            F.substring(h, 21, 12),
        ).alias("stable_uuid"),
    )


_FN_HASH_SQL = """
SELECT doc_id,
       md5(text) AS md5,
       sha256(text) AS sha256,
       substr(md5(text), 1, 8) || '-' || substr(md5(text), 9, 4) || '-'
       || substr(md5(text), 13, 4) || '-' || substr(md5(text), 17, 4) || '-'
       || substr(md5(text), 21, 12) AS stable_uuid
FROM documents ORDER BY doc_id
"""

SPARK_QUERIES["fn_hash_suite"] = fn_hash_suite
ORACLE_SQL["fn_hash_suite"] = _FN_HASH_SQL


def fn_array2_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface round 2 (ClickHouse arrayDifference / arrayCumSum /
    arrayIntersect family): consecutive differences and cumulative sums
    over the token-length array via zip_with/slice/aggregate, and
    set-algebra (intersect/except/union/overlap) between the raw and
    uppercased token arrays — all codegen'd higher-order expressions,
    no UDFs."""
    docs = load(spark, sf_dir, "documents")
    # Higher-order array expressions are interpreted (no whole-stage
    # codegen), so Catalyst's subexpression elimination never sees them:
    # referencing split(text) from eight output columns re-splits the
    # text eight times per row.  Materializing toks/toks_u/lens as
    # NAMED columns in prior projections pins one evaluation each —
    # CollapseProject refuses to inline a non-cheap alias referenced
    # more than once, so the layering survives optimization (measured
    # 4.1s -> 1.1s at sf0.1).
    base = docs.select("doc_id", F.split(F.col("text"), " ").alias("toks")).filter(
        F.size("toks") >= 2
    )
    # upper() commutes with the space split, so uppercase the tokens
    # instead of regex-splitting the full text a second time
    base = base.select(
        "doc_id",
        "toks",
        F.transform("toks", F.upper).alias("toks_u"),
        F.transform("toks", lambda x: F.length(x)).alias("lens"),
        F.size("toks").alias("n"),
    )
    toks, toks_u = F.col("toks"), F.col("toks_u")
    lens, n = F.col("lens"), F.col("n")
    diffs = F.zip_with(
        F.slice(lens, 2, n - 1), F.slice(lens, 1, n - 1), lambda a, b: a - b
    )
    # O(n) closed forms, value-identical to the naive prefix-sum array
    # (the per-i slice+fold construction is O(n^2) per row — a 10^5-token
    # doc would cost 10^10 ops; scale-killer, so it is banned here):
    #   cumsum[n]   = sum(lens)
    #   sum(cumsum) = sum_i lens[i] * (n - i + 1)
    weighted = F.zip_with(
        lens, F.sequence(F.lit(1), n), lambda l, i: l * (n - i + 1)
    )
    return (
        base.select(
            "doc_id",
            F.aggregate(diffs, F.lit(0), lambda a, x: a + x).alias("diff_sum"),
            F.aggregate(lens, F.lit(0), lambda a, x: a + x).alias("cumsum_last"),
            F.aggregate(
                weighted, F.lit(0), lambda a, x: a + x
            ).alias("cumsum_total"),
            F.size(F.array_intersect(toks, toks_u)).alias("n_case_invariant"),
            F.size(F.array_except(toks, toks_u)).alias("n_cased"),
            F.size(F.array_union(toks, toks_u)).alias("n_union"),
            F.arrays_overlap(toks, toks_u).alias("overlaps"),
        )
    )


_FN_ARRAY2_SQL = """
WITH base AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), x -> length(x)) AS lens,
         string_split(text, ' ') AS toks,
         string_split(upper(text), ' ') AS toks_u
  FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
ext AS (
  SELECT doc_id, lens, toks, toks_u, len(lens) AS n FROM base
)
SELECT doc_id,
       CAST(list_sum(list_transform(range(2, n + 1),
            i -> lens[i] - lens[i-1])) AS INT) AS diff_sum,
       CAST(list_sum(lens) AS INT) AS cumsum_last,
       CAST(list_sum(list_transform(range(1, n + 1),
            i -> lens[i] * (n - i + 1))) AS INT) AS cumsum_total,
       CAST(len(list_filter(list_distinct(toks),
            x -> list_contains(toks_u, x))) AS INT) AS n_case_invariant,
       CAST(len(list_filter(list_distinct(toks),
            x -> NOT list_contains(toks_u, x))) AS INT) AS n_cased,
       CAST(len(list_distinct(list_concat(toks, toks_u))) AS INT) AS n_union,
       len(list_filter(toks, x -> list_contains(toks_u, x))) > 0 AS overlaps
FROM ext
ORDER BY doc_id
"""

SPARK_QUERIES["fn_array2_suite"] = fn_array2_suite
ORACLE_SQL["fn_array2_suite"] = _FN_ARRAY2_SQL


def fn_try_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRY error-safe function family (Spark 4 ANSI-mode
    companions): try_divide by a sometimes-zero denominator,
    try_cast of a sometimes-non-numeric string, try_add at int64
    boundaries, try_element_at past the end — NULL instead of error,
    the behavior a long-running pipeline needs under ANSI SQL.  The
    techlog parse plane's silent-zero casts (techlog/parser.py P7) are
    the strict reference semantics; this suite is the ANSI-safe
    engine surface."""
    ev = load(spark, sf_dir, "events")
    denom = F.col("user_id") % 7  # 0 for every 7th user
    mixed = F.when(
        F.col("event_id") % 3 == 0, F.concat(F.lit("x"), F.col("event_id"))
    ).otherwise(F.col("event_id").cast("string"))
    big = F.lit(9_223_372_036_854_775_807)
    toks = F.split(F.col("event_type"), "")
    return (
        ev.filter(F.col("event_id") < 1000)
        .select(
            "event_id",
            F.try_divide(F.floor(F.col("value") * 100), denom).alias("safe_div"),
            mixed.try_cast("long").alias("safe_cast"),
            F.try_add(big, F.col("event_id") + 1).alias("safe_add"),
            F.try_element_at(toks, F.lit(100)).alias("safe_elem"),
        )
        .orderBy("event_id")
    )


_FN_TRY_SQL = """
SELECT event_id,
       CAST(FLOOR(value * 100) AS DOUBLE) / NULLIF(user_id % 7, 0) AS safe_div,
       TRY_CAST(CASE WHEN event_id % 3 = 0
                     THEN 'x' || CAST(event_id AS VARCHAR)
                     ELSE CAST(event_id AS VARCHAR) END AS BIGINT) AS safe_cast,
       CAST(NULL AS BIGINT) AS safe_add,
       CAST(NULL AS VARCHAR) AS safe_elem
FROM events
WHERE event_id < 1000
ORDER BY event_id
"""

SPARK_QUERIES["fn_try_suite"] = fn_try_suite
ORACLE_SQL["fn_try_suite"] = _FN_TRY_SQL


def agg_minmax_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``minMap``/``maxMap`` analogs completing the *Map
    aggregate family next to agg_sum_map: key-wise minima and maxima of
    per-event metric maps per event_type, returned in the CH
    parallel-arrays shape serialized to CSV scalars.  Same scale shape
    as agg_sum_map — explode to (group, key) rows, partial-aggregated
    min/max, re-collect sorted; group state bounded by the metric
    vocabulary."""
    ev = load(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("val_milli"), F.floor(F.col("value") * 1000).cast("long"),
        F.lit("k"), F.get_json_object("props", "$.k").cast("long"),
        F.lit("uid"), F.col("user_id").cast("long"),
    )
    flat = ev.select("event_type", F.explode(m).alias("mk", "mv"))
    per_key = flat.groupBy("event_type", "mk").agg(
        F.min("mv").alias("lo"), F.max("mv").alias("hi")
    )
    return (
        per_key.groupBy("event_type")
        .agg(
            F.array_sort(F.collect_list(F.struct("mk", "lo", "hi"))).alias("kv")
        )
        .select(
            "event_type",
            F.array_join(
                F.transform("kv", lambda s: s["mk"]), ","
            ).alias("map_keys"),
            # NULL min/max (an all-NULL key) serializes as 'null' so the
            # value CSVs can never desynchronize from map_keys
            F.array_join(
                F.transform(
                    "kv",
                    lambda s: F.coalesce(s["lo"].cast("string"), F.lit("null")),
                ),
                ",",
            ).alias("map_mins"),
            F.array_join(
                F.transform(
                    "kv",
                    lambda s: F.coalesce(s["hi"].cast("string"), F.lit("null")),
                ),
                ",",
            ).alias("map_maxs"),
        )
        .orderBy("event_type")
    )


_AGG_MINMAX_MAP_SQL = """
WITH flat AS (
  SELECT event_type, u.mk,
         CASE u.mk
           WHEN 'val_milli' THEN CAST(FLOOR(value * 1000) AS BIGINT)
           WHEN 'k' THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
           ELSE user_id
         END AS mv
  FROM events, UNNEST(['val_milli', 'k', 'uid']) AS u(mk)
),
per_key AS (
  SELECT event_type, mk, MIN(mv) AS lo, MAX(mv) AS hi
  FROM flat GROUP BY event_type, mk
)
SELECT event_type,
       string_agg(mk, ',' ORDER BY mk) AS map_keys,
       string_agg(COALESCE(CAST(lo AS VARCHAR), 'null'), ',' ORDER BY mk) AS map_mins,
       string_agg(COALESCE(CAST(hi AS VARCHAR), 'null'), ',' ORDER BY mk) AS map_maxs
FROM per_key GROUP BY event_type ORDER BY event_type
"""

SPARK_QUERIES["agg_minmax_map"] = agg_minmax_map
ORACLE_SQL["agg_minmax_map"] = _AGG_MINMAX_MAP_SQL


def fn_encoding_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary/text encoding surface (CH base64Encode/hex/unhex + printf
    formatting): base64 and hex over the UTF-8 bytes of document
    prefixes, a decode round-trip check, printf-style formatting, and
    string reversal — all codegen'd, byte-identical across engines
    because both sides encode the same UTF-8."""
    docs = load(spark, sf_dir, "documents")
    head40 = F.substring(F.col("text"), 1, 40)
    head16 = F.substring(F.col("text"), 1, 16)
    b64 = F.base64(F.encode(head40, "utf-8"))
    return (
        docs.select(
            "doc_id",
            b64.alias("b64"),
            F.hex(F.encode(head16, "utf-8")).alias("hex16"),
            (F.decode(F.unbase64(b64), "utf-8") == head40).alias("roundtrip_ok"),
            F.format_string(
                "%s|%05d", F.coalesce(F.col("source"), F.lit("")), F.col("doc_id")
            ).alias("tagged"),
            F.reverse(F.col("source")).alias("rev_source"),
        )
    )


_FN_ENCODING_SQL = """
SELECT doc_id,
       base64(encode(substr(text, 1, 40))) AS b64,
       hex(encode(substr(text, 1, 16))) AS hex16,
       decode(from_base64(base64(encode(substr(text, 1, 40)))))
         = substr(text, 1, 40) AS roundtrip_ok,
       printf('%s|%05d', COALESCE(source, ''), doc_id) AS tagged,
       reverse(source) AS rev_source
FROM documents ORDER BY doc_id
"""

SPARK_QUERIES["fn_encoding_suite"] = fn_encoding_suite
ORACLE_SQL["fn_encoding_suite"] = _FN_ENCODING_SQL
