"""Sketch-based frequency queries (ClickHouse ``topK`` analog): count-min
heavy hitters with the exact count alongside, so the CMS invariant
(est >= exact, bounded overestimate) is part of the checked result."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..llmdata.dedup import _MH_P, _MH_PARAMS
from ..operators.sketch import cms_build, cms_estimate
from ..tables import load

_CMS_DEPTH = 4
_CMS_WIDTH = 256
_TOPN = 20


def freq_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 (event_type, user) keys by exact count, each with its
    count-min estimate from a 4x256 sketch built in one raw-row pass.
    The estimate column makes the sketch itself the thing under test:
    both engines must land identical bucket collisions."""
    ev = load(spark, sf_dir, "events")
    # NULL-safe key: concat_ws SKIPS null parts in Spark while DuckDB's
    # || NULLs the whole key — coalesce each part so both engines build
    # the identical key for NULL-bearing rows
    keyed = ev.select(
        F.concat_ws(
            ":",
            F.coalesce(F.col("event_type"), F.lit("~")),
            F.coalesce(F.col("user_id").cast("string"), F.lit("~")),
        ).alias("key")
    )
    sketch = cms_build(keyed, F.col("key"), _CMS_DEPTH, _CMS_WIDTH)
    exact = (
        keyed.groupBy("key")
        .agg(F.count(F.lit(1)).alias("exact"))
        .orderBy(F.col("exact").desc(), F.col("key").asc())
        .limit(_TOPN)
    )
    # exact count rides through the estimate (carry_cols), so the top-20
    # aggregate is derived once — no self-join re-derivation
    est = cms_estimate(
        exact, "key", sketch, _CMS_DEPTH, _CMS_WIDTH, carry_cols=("exact",)
    )
    return est.select("key", "exact", "est").orderBy(
        F.col("exact").desc(), F.col("key").asc()
    )


# DuckDB twin of dedup.md5_hash60
_MD5I = "CAST(concat('0x', substr(md5({s}), 2, 15)) AS BIGINT)"


def _cms_oracle_sql() -> str:
    hm = f"({_MD5I.format(s='key')} % {_MH_P})"
    cell_selects = "\n    UNION ALL\n".join(
        f"    SELECT key, {r} AS r, "
        f"((({a} * hm + {b}) % {_MH_P}) % {_CMS_WIDTH}) AS b FROM hashed"
        for r, (a, b) in enumerate(_MH_PARAMS[:_CMS_DEPTH])
    )
    return f"""
WITH keyed AS (
  SELECT COALESCE(event_type, '~') || ':' ||
         COALESCE(CAST(user_id AS VARCHAR), '~') AS key FROM events
),
hashed AS (SELECT key, {hm} AS hm FROM keyed),
cells AS (
{cell_selects}
),
sketch AS (SELECT r, b, COUNT(*) AS c FROM cells GROUP BY r, b),
exact AS (
  SELECT key, COUNT(*) AS exact FROM keyed GROUP BY key
  ORDER BY exact DESC, key ASC LIMIT {_TOPN}
),
ehash AS (SELECT key, exact, {hm} AS hm FROM exact),
ecells AS (
{cell_selects.replace('FROM hashed', 'FROM ehash')}
),
est AS (
  SELECT e.key, MIN(s.c) AS est
  FROM ecells e JOIN sketch s ON s.r = e.r AND s.b = e.b
  GROUP BY e.key
)
SELECT x.key AS key, x.exact AS exact, est.est AS est
FROM exact x JOIN est ON est.key = x.key
ORDER BY x.exact DESC, x.key ASC
"""


SPARK_QUERIES = {
    "freq_heavy_hitters": freq_heavy_hitters,
}

ORACLE_SQL = {
    "freq_heavy_hitters": _cms_oracle_sql(),
}


_QH_BUCKETS = 64
_QH_QS = (50, 90, 99)  # percentiles


def agg_quantile_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram-sketch quantiles (the deterministic cousin of
    ClickHouse's approximate quantile* family, next to the exact
    `agg_percentile`): per event_type, values quantize to int64, bucket
    into 64 equal-width bins over the group's [min, max], and each
    requested percentile reports its bin's LOWER BOUND — pure integer
    arithmetic end to end, so the sketch replays exactly in any engine.

    Scale shape: one agg for per-group (min, max, n) broadcast back, one
    agg for bin counts, and a per-group sorted fold over <= 64 bins via
    collect_list — per-group state is bounded by the bin count, never by
    row count (the reason to sketch at 100 TB instead of sorting)."""
    # quantiles are over NON-NULL values in any engine; un-filtered, a
    # NULL bucket crashes the element_at fold and shifts oracle bins
    ev = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    qv = F.floor(F.col("value") * 10000).cast("long")
    base = ev.select("event_type", qv.alias("qv"))
    rng = base.groupBy("event_type").agg(
        F.min("qv").alias("lo"), F.max("qv").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    w = (F.col("hi") - F.col("lo") + 1)
    binned = (
        base.join(F.broadcast(rng), "event_type")
        .select(
            "event_type",
            "n",
            "lo",
            "hi",
            F.floor(
                (F.col("qv") - F.col("lo")) * _QH_BUCKETS / w
            ).cast("long").alias("b"),
        )
        .groupBy("event_type", "n", "lo", "hi", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    hist = binned.groupBy("event_type", "n", "lo", "hi").agg(
        F.array_sort(F.collect_list(F.struct("b", "c"))).alias("bins")
    )
    # cumulative walk over <= 64 bins with higher-order functions:
    # percentile p -> first bin whose cumulative count reaches ceil(p*n/100)
    cum = F.expr(
        f"""transform(bins, x -> named_struct(
              'b', x.b,
              'cum', aggregate(filter(bins, y -> y.b <= x.b), 0L, (a, y) -> a + y.c)))"""
    )
    out = hist.withColumn("cbins", cum)
    cols = [
        F.element_at(
            F.filter(
                F.col("cbins"),
                lambda x: x["cum"] >= F.ceil(F.col("n") * p / 100),
            ),
            1,
        )["b"].alias(f"b{p}")
        for p in _QH_QS
    ]
    est = out.select("event_type", "n", "lo", "hi", *cols)
    for p in _QH_QS:
        est = est.withColumn(
            f"p{p}_est",
            (
                F.col("lo")
                + F.floor(
                    F.col(f"b{p}") * (F.col("hi") - F.col("lo") + 1) / _QH_BUCKETS
                ).cast("long")
            ),
        )
    return est.select(
        "event_type", "n", "p50_est", "p90_est", "p99_est"
    )


def _quantile_hist_oracle_sql() -> str:
    b = _QH_BUCKETS
    ests = []
    for p in _QH_QS:
        ests.append(
            f"""(SELECT lo + CAST(FLOOR(MIN(b) * (hi - lo + 1) / {b}.0) AS BIGINT)
     FROM cumul c2
     WHERE c2.event_type = g.event_type AND c2.cum >= CEIL(g.n * {p} / 100.0))
       AS p{p}_est"""
        )
    est_cols = ",\n  ".join(ests)
    return f"""
WITH base AS (
  SELECT event_type, CAST(FLOOR(value * 10000) AS BIGINT) AS qv
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
),
rng AS (
  SELECT event_type, MIN(qv) AS lo, MAX(qv) AS hi, COUNT(*) AS n
  FROM base GROUP BY event_type
),
binned AS (
  SELECT b.event_type,
         CAST(FLOOR((b.qv - r.lo) * {b} / (r.hi - r.lo + 1)) AS BIGINT) AS b,
         COUNT(*) AS c
  FROM base b JOIN rng r ON r.event_type = b.event_type
  GROUP BY 1, 2
),
cumul AS (
  SELECT event_type, b,
         SUM(c) OVER (PARTITION BY event_type ORDER BY b
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM binned
)
SELECT g.event_type, g.n,
  {est_cols}
FROM rng g ORDER BY g.event_type
"""


SPARK_QUERIES["agg_quantile_hist"] = agg_quantile_hist
ORACLE_SQL["agg_quantile_hist"] = _quantile_hist_oracle_sql()


def topk_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``topKWeighted`` analog: top-20 (event_type, user)
    keys by total WEIGHT (quantized event value), each with the
    weighted count-min estimate from the same 4x256 sketch base as
    freq_heavy_hitters — cells sum weights instead of counting rows
    (operators/sketch.py cms_build(weight=...)).  Same bounded
    depth*width state, same mergeability; est >= exact holds for
    weights exactly as for counts."""
    ev = load(spark, sf_dir, "events")
    keyed = ev.select(
        F.concat_ws(
            ":",
            F.coalesce(F.col("event_type"), F.lit("~")),
            F.coalesce(F.col("user_id").cast("string"), F.lit("~")),
        ).alias("key"),
        F.floor(F.coalesce(F.col("value"), F.lit(0.0)) * 100)
        .cast("long").alias("w"),
    )
    sketch = cms_build(
        keyed, F.col("key"), _CMS_DEPTH, _CMS_WIDTH, weight=F.col("w")
    )
    exact = (
        keyed.groupBy("key")
        .agg(F.sum("w").alias("exact_w"))
        .orderBy(F.col("exact_w").desc(), F.col("key").asc())
        .limit(_TOPN)
    )
    est = cms_estimate(
        exact, "key", sketch, _CMS_DEPTH, _CMS_WIDTH, carry_cols=("exact_w",)
    )
    return est.select("key", "exact_w", "est").orderBy(
        F.col("exact_w").desc(), F.col("key").asc()
    )


def _topk_weighted_oracle_sql() -> str:
    hm = f"({_MD5I.format(s='key')} % {_MH_P})"
    cell_selects = "\n    UNION ALL\n".join(
        f"    SELECT key, w, {r} AS r, "
        f"((({a} * hm + {b}) % {_MH_P}) % {_CMS_WIDTH}) AS b FROM hashed"
        for r, (a, b) in enumerate(_MH_PARAMS[:_CMS_DEPTH])
    )
    return f"""
WITH keyed AS (
  SELECT COALESCE(event_type, '~') || ':' ||
         COALESCE(CAST(user_id AS VARCHAR), '~') AS key,
         CAST(FLOOR(COALESCE(value, 0.0) * 100) AS BIGINT) AS w
  FROM events
),
hashed AS (SELECT key, w, {hm} AS hm FROM keyed),
cells AS (
{cell_selects}
),
sketch AS (SELECT r, b, SUM(w) AS c FROM cells GROUP BY r, b),
exact AS (
  SELECT key, SUM(w) AS exact_w FROM keyed GROUP BY key
  ORDER BY exact_w DESC, key ASC LIMIT {_TOPN}
),
ehash AS (SELECT key, exact_w, {hm} AS hm FROM exact),
ecells AS (
{cell_selects.replace('FROM hashed', 'FROM ehash').replace('SELECT key, w,', 'SELECT key, exact_w,')}
),
est AS (
  SELECT e.key, MIN(s.c) AS est
  FROM ecells e JOIN sketch s ON s.r = e.r AND s.b = e.b
  GROUP BY e.key
)
SELECT x.key AS key, CAST(x.exact_w AS BIGINT) AS exact_w,
       CAST(est.est AS BIGINT) AS est
FROM exact x JOIN est ON est.key = x.key
ORDER BY x.exact_w DESC, x.key ASC
"""


SPARK_QUERIES["topk_weighted"] = topk_weighted
ORACLE_SQL["topk_weighted"] = _topk_weighted_oracle_sql()


_UUT_CAPS = (10, 100)


def agg_uniq_upto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``uniqUpTo(N)`` analog: exact distinct users per
    (event_type, weekday) while the count is <= N, saturating at N+1 —
    the "is this group small or not" primitive that replaces a full
    uniq when only a threshold matters.

    Scale shape: ONE distinct shuffle on the (group, user) pair with
    map-side partial dedup, then a scalar count per group — per-group
    state after the distinct is one counter, never a user set (CH keeps
    <= N+1 elements per group; the two-phase distinct is how the same
    bound falls out of Spark's execution model)."""
    ev = load(spark, sf_dir, "events")
    # NULL users are not distinct members (COUNT(DISTINCT) semantics in
    # any SQL engine ignores NULLs; the explicit filter makes the Spark
    # side match even though the fixtures carry no NULL user_id)
    d = (
        ev.filter(F.col("user_id").isNotNull())
        .select("event_type", F.dayofweek("ts").alias("dow"), "user_id")
        .distinct()
    )
    n = d.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n_distinct")
    )
    out = n.select(
        "event_type",
        "dow",
        *[
            F.least(F.col("n_distinct"), F.lit(c + 1)).alias(f"uniq_upto_{c}")
            for c in _UUT_CAPS
        ],
    )
    return out


_UNIQ_UPTO_SQL = f"""
SELECT event_type,
       CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
       {", ".join(f"LEAST(COUNT(DISTINCT user_id), {c + 1}) AS uniq_upto_{c}" for c in _UUT_CAPS)}
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""

SPARK_QUERIES["agg_uniq_upto"] = agg_uniq_upto
ORACLE_SQL["agg_uniq_upto"] = _UNIQ_UPTO_SQL


# quantileTiming layout: 1 ms bins below 1024 ms, 16 ms bins to 30720 ms,
# clamped above — the CH request-latency sketch (fixed GLOBAL bin layout,
# so unlike agg_quantile_hist no min/max pre-pass is needed and sketches
# from different partitions/days merge by plain cell addition).
_QT_FINE = 1024
_QT_COARSE_STEP = 16
_QT_CAP = 30720
_QT_QS = (50, 90, 99)


def timing_bin(ms) -> F.Column:
    """The quantileTiming layout bin of an integer-ms column: identity
    below 1024 ms, 16 ms buckets to 30720 ms, capped above.  Cells keyed
    on this merge by plain addition across shards/days/micro-batches."""
    return (
        F.when(ms < _QT_FINE, ms)
        .when(
            ms < _QT_CAP,
            (F.floor(ms / _QT_COARSE_STEP) * _QT_COARSE_STEP).cast("long"),
        )
        .otherwise(F.lit(_QT_CAP).cast("long"))
    )


def quantile_timing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``quantileTiming`` analog over synthetic latencies
    (value*10 -> ms): per event_type, each requested percentile reports
    the LOWER BOUND of the first layout bin whose cumulative count
    reaches ceil(p*n/100).  Integer-exact end to end.

    Scale shape: one (group, bin) aggregation with map-side partials
    (state <= ~2900 bins per group regardless of row count), a
    group-partitioned cumulative window over those bins, and one final
    per-group fold — the timing sketch a 100 TB request log serves its
    p99 dashboards from."""
    ev = load(spark, sf_dir, "events")
    ms = F.floor(F.col("value") * 10).cast("long")
    b = timing_bin(ms)
    binned = (
        ev.select("event_type", b.alias("b"))
        .groupBy("event_type", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = (
        W.partitionBy("event_type")
        .orderBy("b")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wn = W.partitionBy("event_type")
    cum = binned.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "n", F.sum("c").over(wn)
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            *[
                F.min(
                    F.when(
                        F.col("cum") >= F.ceil(F.col("n") * p / 100),
                        F.col("b"),
                    )
                ).alias(f"p{p}_ms")
                for p in _QT_QS
            ],
        )
        .orderBy("event_type")
    )


_QUANTILE_TIMING_SQL = f"""
WITH base AS (
  SELECT event_type,
         CASE WHEN ms < {_QT_FINE} THEN ms
              WHEN ms < {_QT_CAP}
                THEN CAST(FLOOR(ms / {_QT_COARSE_STEP}) * {_QT_COARSE_STEP} AS BIGINT)
              ELSE {_QT_CAP} END AS b
  FROM (SELECT event_type, CAST(FLOOR(value * 10) AS BIGINT) AS ms FROM events)
),
binned AS (SELECT event_type, b, COUNT(*) AS c FROM base GROUP BY 1, 2),
cum AS (
  SELECT event_type, b, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY b
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM binned
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       {", ".join(f"MIN(CASE WHEN cum >= CEIL(n * {p} / 100.0) THEN b END) AS p{p}_ms" for p in _QT_QS)}
FROM cum GROUP BY event_type ORDER BY event_type
"""

SPARK_QUERIES["quantile_timing"] = quantile_timing
ORACLE_SQL["quantile_timing"] = _QUANTILE_TIMING_SQL
