"""Sketch-based frequency queries (ClickHouse ``topK`` analog): count-min
heavy hitters with the exact count alongside, so the CMS invariant
(est >= exact, bounded overestimate) is part of the checked result."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
    keyed = ev.select(
        F.concat_ws(":", F.col("event_type"), F.col("user_id").cast("string")).alias(
            "key"
        )
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
  SELECT event_type || ':' || CAST(user_id AS VARCHAR) AS key FROM events
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
