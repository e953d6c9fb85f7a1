"""Final §2.G odds and ends: collection aggregates, min_by/max_by,
generator functions (stack/explode_outer/sequence), unionByName with
missing columns."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import load


def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set/collect_list as SORTED, comma-joined strings (unsorted
    collections are nondeterministic across partitioning — sort_array
    makes them hash-stable; the join to a scalar keeps the result frame
    canonicalizable, since the driver's pandas-based compare cannot sort
    array-typed columns)."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    return (
        ev.groupBy("user_id")
        .agg(
            F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias(
                "types"
            ),
            F.size(F.collect_list("event_id")).alias("n_events"),
        )
        .orderBy("user_id")
    )


_AGG_COLLECT_SQL = """
SELECT user_id,
  list_aggregate(list_sort(list(DISTINCT event_type)), 'string_agg', ',') AS types,
  len(list(event_id)) AS n_events
FROM events WHERE user_id < 30
GROUP BY user_id ORDER BY user_id
"""


def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by: the argmin/argmax aggregate.  Tie-broken through a
    unique composite ordering key (value, event_id) — raw min_by on a
    non-unique key is nondeterministic in a distributed engine."""
    ev = load(spark, sf_dir, "events")
    # unique ordering key: value is not unique, event_id is
    key = F.col("value") * 1_000_000_000 + F.col("event_id")
    return (
        ev.groupBy("event_type")
        .agg(
            F.min_by("event_id", key).alias("min_event"),
            F.max_by("event_id", key).alias("max_event"),
        )
        .orderBy("event_type")
    )


_AGG_MIN_MAX_BY_SQL = """
SELECT event_type,
  arg_min(event_id, value * 1000000000 + event_id) AS min_event,
  arg_max(event_id, value * 1000000000 + event_id) AS max_event
FROM events GROUP BY event_type ORDER BY event_type
"""


def fn_generators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator functions: sequence + explode_outer (NULL-preserving)
    over a derived array that is empty for some rows."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    # 0..(user_id%3 - 1): empty when user_id%3 == 0
    arr = F.when(
        F.col("user_id") % 3 > 0,
        F.sequence(F.lit(0), (F.col("user_id") % 3) - 1),
    )
    return (
        ev.select("event_id", F.explode_outer(arr).alias("gen"))
        .orderBy("event_id", F.col("gen").asc_nulls_first())
    )


_FN_GENERATORS_SQL = """
SELECT event_id, CAST(u.gen AS BIGINT) AS gen
FROM (
  SELECT event_id,
    CASE WHEN user_id % 3 > 0
         THEN range(0, user_id % 3)
         ELSE NULL END AS xs
  FROM events WHERE event_id < 200
) t
LEFT JOIN LATERAL UNNEST(COALESCE(t.xs, [NULL])) AS u(gen) ON TRUE
ORDER BY event_id, gen NULLS FIRST
"""


def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns: schema-mismatched sources
    merge with NULL fill — the multi-source ingestion shape."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    a = ev.select("event_id", "event_type", "value")
    b = ev.filter(F.col("event_type") == "error").select(
        "event_id", F.col("user_id").alias("uid")
    )
    return (
        a.unionByName(b.withColumn("src", F.lit("b")), allowMissingColumns=True)
        .withColumn("src", F.coalesce(F.col("src"), F.lit("a")))
        .orderBy("src", "event_id")
    )


_SETOP_UNION_BY_NAME_SQL = """
SELECT event_id, event_type, value, CAST(NULL AS BIGINT) AS uid, 'a' AS src
FROM events WHERE event_id < 500
UNION ALL
SELECT event_id, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE), user_id, 'b'
FROM events WHERE event_id < 500 AND event_type = 'error'
ORDER BY src, event_id
"""


def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.G grouped-map UDF surface: applyInPandas computes a per-group
    rank with deterministic pandas ops (stable sort on a unique composite
    key), so the oracle can replicate it with ROW_NUMBER.  This is the
    template for group-local algorithms Spark lacks natively; each group
    arrives as ONE Arrow batch, so group cardinality must be bounded
    (here: events per type per day)."""
    import pandas as pd

    ev = load(spark, sf_dir, "events").filter(F.col("event_id") < 2000)

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["value", "event_id"], ascending=[False, True])
        pdf = pdf.reset_index(drop=True)
        pdf["grp_rank"] = pdf.index + 1
        return pdf[["event_type", "event_id", "grp_rank"]]

    return (
        ev.select("event_type", "event_id", "value")
        .groupBy("event_type")
        .applyInPandas(rank_group, "event_type string, event_id long, grp_rank long")
        .orderBy("event_type", "grp_rank")
    )


_UDF_GROUPED_MAP_SQL = """
SELECT event_type, event_id,
  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS grp_rank
FROM events WHERE event_id < 2000
ORDER BY event_type, grp_rank
"""


def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram + boolean aggregates per event type —
    the metric-distribution query shape over tech-log Durations."""
    ev = load(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 100), F.lit(5)).cast("int")
    return (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
            F.bool_or(F.col("value") > 400).alias("any_gt400"),
        )
    )


_AGG_HISTOGRAM_SQL = """
SELECT event_type,
  CAST(LEAST(FLOOR(value / 100), 5) AS INT) AS bucket,
  COUNT(*) AS n,
  bool_and(value >= 0) AS all_nonneg,
  bool_or(value > 400) AS any_gt400
FROM events
GROUP BY 1, 2
ORDER BY event_type, bucket
"""


def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the mergeable-sketch quantile for 100 TB (the
    exact form in agg_percentile needs a per-group sort).  Spark's
    GK-style sketch and DuckDB's approx_quantile give different
    approximations by design, so the sketch value itself cannot be
    hash-matched; instead (the agg_hll_native pattern) the checked
    columns are the EXACT percentiles plus flags verifying the sketch's
    ACTUAL contract — rank error, not value error: the rank interval of
    the returned value among the group's values must intersect
    p*n ± max(1.5, 0.02n) (the sketch promises <= n/accuracy = n/10000,
    far tighter).  Value-relative or interpolated-quantile brackets are
    both wrong: the sketch returns an order statistic, and on a tiny or
    heavy-tailed group adjacent order statistics differ by any factor
    while interpolation lands between them (the NULL-twin sweep caught
    a 5-row group where approx p90 = max, 47% above the interpolated
    value — correct sketch behavior).  Verification is a second pass
    over the same scan with the 5-row approx table broadcast back;
    null-safe join keys keep the NULL group checked.  This upgrades the
    registry's last rows-only id to a full value oracle."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")

    g = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("_a50"),
        F.percentile_approx("value", 0.9, 10000).alias("_a90"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50_exact"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90_exact"),
    )
    j = ev.alias("e").join(
        F.broadcast(g).alias("g"),
        F.col("e.event_type").eqNullSafe(F.col("g.event_type")),
    )

    def _cnt(cond: F.Column) -> F.Column:
        return F.sum(F.when(cond, 1).otherwise(0))

    v = F.col("e.value")
    ranks = j.groupBy("g.event_type").agg(
        F.first("g.p50_exact").alias("p50_exact"),
        F.first("g.p90_exact").alias("p90_exact"),
        F.first("g._a50").alias("_a50"),
        F.first("g._a90").alias("_a90"),
        _cnt(v.isNotNull()).alias("_n"),
        _cnt(v < F.col("g._a50")).alias("_lt50"),
        _cnt(v <= F.col("g._a50")).alias("_le50"),
        _cnt(v < F.col("g._a90")).alias("_lt90"),
        _cnt(v <= F.col("g._a90")).alias("_le90"),
    )

    def ok(p: float, approx: F.Column, lt: F.Column, le: F.Column) -> F.Column:
        n = F.col("_n")
        target = F.lit(p) * n
        tol = F.greatest(F.lit(1.5), n * 0.02)
        # the value's feasible rank interval is [lt+1, le]; the sketch
        # is sound iff it intersects [target - tol, target + tol]
        in_band = (le >= target - tol) & ((lt + 1) <= target + tol)
        return F.when(approx.isNull(), n == 0).otherwise(in_band)

    return ranks.select(
        F.col("event_type"),
        "p50_exact",
        "p90_exact",
        ok(0.5, F.col("_a50"), F.col("_lt50"), F.col("_le50")).alias("p50_ok"),
        ok(0.9, F.col("_a90"), F.col("_lt90"), F.col("_le90")).alias("p90_ok"),
    ).orderBy("event_type")


_AGG_APPROX_PERCENTILE_SQL = """
SELECT event_type,
  ROUND(quantile_cont(CAST(value AS DOUBLE), 0.5), 6) AS p50_exact,
  ROUND(quantile_cont(CAST(value AS DOUBLE), 0.9), 6) AS p90_exact,
  TRUE AS p50_ok,
  TRUE AS p90_ok
FROM events GROUP BY event_type ORDER BY event_type
"""


SPARK_QUERIES = {
    "agg_histogram": agg_histogram,
    "agg_approx_percentile": agg_approx_percentile,
    "udf_grouped_map": udf_grouped_map,
    "agg_collect": agg_collect,
    "agg_min_max_by": agg_min_max_by,
    "fn_generators": fn_generators,
    "setop_union_by_name": setop_union_by_name,
}

ORACLE_SQL = {
    "agg_histogram": _AGG_HISTOGRAM_SQL,
    "agg_approx_percentile": _AGG_APPROX_PERCENTILE_SQL,
    "udf_grouped_map": _UDF_GROUPED_MAP_SQL,
    "agg_collect": _AGG_COLLECT_SQL,
    "agg_min_max_by": _AGG_MIN_MAX_BY_SQL,
    "fn_generators": _FN_GENERATORS_SQL,
    "setop_union_by_name": _SETOP_UNION_BY_NAME_SQL,
}


def xform_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (user_id, event_id mod 2^16)
    — the multi-column-locality sink layout (operators/zorder.py); the
    oracle replays the exact bit-interleave, so the key arithmetic that
    decides row-group placement is value-checked."""
    from ..operators.zorder import morton_key

    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        morton_key(
            F.col("user_id") % 65536, F.col("event_id") % 65536
        ).alias("zkey"),
    )


def _spread_sql(expr: str) -> str:
    x = f"({expr} & 65535)"
    for sh, m in (
        (8, 0x00FF00FF),
        (4, 0x0F0F0F0F),
        (2, 0x33333333),
        (1, 0x55555555),
    ):
        x = f"((({x} | ({x} << {sh})) & {m}))"
    return x


_ZORDER_SQL = f"""
SELECT event_id,
       CAST(({_spread_sql('(user_id % 65536)')}
             | ({_spread_sql('(event_id % 65536)')} << 1)) AS BIGINT) AS zkey
FROM events ORDER BY event_id
"""

SPARK_QUERIES["xform_zorder_key"] = xform_zorder_key
ORACLE_SQL["xform_zorder_key"] = _ZORDER_SQL


def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): two small
    per-bucket aggregates with NULL buckets on both sides join so that
    NULL matches NULL — the semantics plain equi-joins silently drop.
    Sides are aggregated FIRST (bounded bucket cardinality), so the
    null-bucket match is a tiny-to-tiny join, never a corpus-scale
    null-key hotspot."""
    ev = load(spark, sf_dir, "events")
    bucket_a = F.when(F.col("user_id") % 5 == 0, F.lit(None)).otherwise(
        F.col("user_id") % 7
    )
    bucket_b = F.when(F.col("user_id") % 3 == 0, F.lit(None)).otherwise(
        F.col("user_id") % 7
    )
    a = ev.groupBy(bucket_a.alias("bucket")).agg(F.count(F.lit(1)).alias("n_a"))
    b = ev.groupBy(bucket_b.alias("bucket")).agg(F.count(F.lit(1)).alias("n_b"))
    return (
        a.join(b, a["bucket"].eqNullSafe(b["bucket"]))
        .select(a["bucket"].alias("bucket"), "n_a", "n_b")
    )


_JOIN_NULL_SAFE_SQL = """
WITH a AS (
  SELECT CASE WHEN user_id % 5 = 0 THEN NULL ELSE user_id % 7 END AS bucket,
         COUNT(*) AS n_a
  FROM events GROUP BY 1
),
b AS (
  SELECT CASE WHEN user_id % 3 = 0 THEN NULL ELSE user_id % 7 END AS bucket,
         COUNT(*) AS n_b
  FROM events GROUP BY 1
)
SELECT a.bucket, a.n_a, b.n_b
FROM a JOIN b ON a.bucket IS NOT DISTINCT FROM b.bucket
ORDER BY a.bucket ASC NULLS FIRST
"""

SPARK_QUERIES["join_null_safe"] = join_null_safe
ORACLE_SQL["join_null_safe"] = _JOIN_NULL_SAFE_SQL


def agg_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate surface: count_if / bool_and / bool_or /
    every-any per event_type over value predicates."""
    ev = load(spark, sf_dir, "events")
    pos = F.col("value") > 0
    big = F.col("value") > 100
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_if(pos).alias("n_pos"),
            F.bool_and(pos).alias("all_pos"),
            F.bool_or(big).alias("any_big"),
            F.count_if(F.col("props").isNotNull()).alias("n_props"),
        )
        .orderBy("event_type")
    )


_AGG_BOOL_SQL = """
SELECT event_type,
       COUNT(*) FILTER (WHERE value > 0) AS n_pos,
       BOOL_AND(value > 0) AS all_pos,
       BOOL_OR(value > 100) AS any_big,
       COUNT(*) FILTER (WHERE props IS NOT NULL) AS n_props
FROM events GROUP BY event_type ORDER BY event_type
"""

SPARK_QUERIES["agg_bool"] = agg_bool
ORACLE_SQL["agg_bool"] = _AGG_BOOL_SQL


def cdc_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ReplacingMergeTree analog: latest-wins upsert
    compaction.  Events replayed with updates (every 4th user's rows
    duplicated with bumped values and later timestamps) collapse to ONE
    row per (user_id, event_type) — the newest by (ts, event_id), both
    engines deterministic via the id tiebreak.  This is the CDC /
    mutable-dimension compaction a log-structured sink needs; shape =
    one shuffle on the key, row_number, filter (WindowGroupLimit prunes
    per input partition before the shuffle on Spark 4)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id", "value"
    )
    updates = ev.filter(F.col("user_id") % 4 == 0).select(
        "user_id",
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 400 DAYS")).alias("ts"),
        (F.col("event_id") + 10_000_000).alias("event_id"),
        (F.col("value") + 1000).alias("value"),
    )
    merged = ev.unionByName(updates).filter(F.col("user_id") < 100)
    w = W.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("latest_event_id"),
            F.floor(F.col("value") * 10000).cast("long").alias("latest_value_q"),
        )
    )


_CDC_LATEST_SQL = """
WITH merged AS (
  SELECT user_id, event_type, ts, event_id, value FROM events
  UNION ALL
  SELECT user_id, event_type, ts + INTERVAL 400 DAY AS ts,
         event_id + 10000000 AS event_id, value + 1000 AS value
  FROM events WHERE user_id % 4 = 0
)
SELECT user_id, event_type,
       event_id AS latest_event_id,
       CAST(FLOOR(value * 10000) AS BIGINT) AS latest_value_q
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM merged WHERE user_id < 100
) WHERE rn = 1
ORDER BY user_id, event_type
"""

SPARK_QUERIES["cdc_latest_wins"] = cdc_latest_wins
ORACLE_SQL["cdc_latest_wins"] = _CDC_LATEST_SQL


def udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function) surface — the third leg of the UDF
    trio beside the scalar pandas_udf and applyInPandas ids: each doc
    expands to one row per '. '-separated sentence with index and exact
    counts, via a registered UDTF in a LATERAL join.  Sentence-splitting
    logic itself is trivial (the oracle replays it with string ops) —
    the thing under test is the UDTF execution path: per-row Python
    generators producing a TABLE, joined laterally."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id long, sent_no int, sentence string, n_chars int, n_words int")
    class SplitSentences:
        def eval(self, doc_id: int, text: str):
            for i, s in enumerate((text or "").split(". ")):
                yield doc_id, i, s, len(s), len(s.split(" "))

    spark.udtf.register("split_sentences", SplitSentences)
    load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).createOrReplaceTempView(
        "docs_udtf"
    )
    return spark.sql(
        """
        SELECT s.doc_id, s.sent_no, s.sentence, s.n_chars, s.n_words
        FROM docs_udtf d, LATERAL split_sentences(d.doc_id, d.text) s
        ORDER BY s.doc_id, s.sent_no
        """
    )


_UDTF_SENTENCES_SQL = """
SELECT doc_id,
       CAST(i - 1 AS INT) AS sent_no,
       s AS sentence,
       CAST(length(s) AS INT) AS n_chars,
       CAST(len(string_split(s, ' ')) AS INT) AS n_words
FROM (
  SELECT doc_id, UNNEST(string_split(text, '. ')) AS s,
         UNNEST(generate_series(1, len(string_split(text, '. ')))) AS i
  FROM documents WHERE doc_id < 100
)
ORDER BY doc_id, sent_no
"""

SPARK_QUERIES["udtf_sentences"] = udtf_sentences
ORACLE_SQL["udtf_sentences"] = _UDTF_SENTENCES_SQL


def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmap-aggregate distinct counting (Spark 3.5+ bitmap surface,
    the ClickHouse groupBitmap analog): per (group, bucket) a 32k-bit
    bitmap is OR-aggregated from bit positions, then distinct = sum of
    per-bucket popcounts.  The two-level shape is the point at 100 TB:
    bitmaps pre-aggregate map-side into fixed 4 KB values and merge by
    OR, so re-aggregating distinct counts across groups never rescans
    rows (the MERGEABLE sketch countDistinct lacks).  The oracle checks
    the bitmap path against plain COUNT(DISTINCT)."""
    ev = load(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bkt")
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm")
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("n_distinct_users"))
        .orderBy("event_type")
    )


_AGG_BITMAP_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_users
FROM events GROUP BY event_type ORDER BY event_type
"""

SPARK_QUERIES["agg_bitmap_distinct"] = agg_bitmap_distinct
ORACLE_SQL["agg_bitmap_distinct"] = _AGG_BITMAP_SQL


def win_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist over customer balances per nation (completes the
    ranking-window family beside rank/percent_rank/ntile); the fraction
    is count-derived, so both engines produce identical doubles."""
    cust = load(spark, sf_dir, "customer")
    # asc_nulls_last: DuckDB's ASC default is NULLS LAST, Spark's is
    # NULLS FIRST — bare asc() flips every rank below a NULLed balance
    # the moment the null robustness twin touches c_acctbal (10 permille)
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").asc_nulls_last(), F.col("c_custkey").asc()
    )
    return (
        cust.select(
            "c_custkey",
            "c_nationkey",
            # floor-quantize, not round: k/n can land exactly on a
            # .xxxxx5 boundary where Spark rounds half-up and DuckDB
            # half-even; floor of the identical double is mode-free
            F.floor(F.cume_dist().over(w) * 1000000).cast("long").alias("cume_ppm"),
        )
        .filter(F.col("c_custkey") % 7 == 0)
    )


_WIN_CUME_SQL = """
SELECT c_custkey, c_nationkey, cume_ppm FROM (
  SELECT c_custkey, c_nationkey,
         CAST(FLOOR(CUME_DIST() OVER (PARTITION BY c_nationkey
                    ORDER BY c_acctbal ASC, c_custkey ASC) * 1000000) AS BIGINT)
           AS cume_ppm
  FROM customer
) WHERE c_custkey % 7 = 0 ORDER BY c_custkey
"""

SPARK_QUERIES["win_cume_dist"] = win_cume_dist
ORACLE_SQL["win_cume_dist"] = _WIN_CUME_SQL
