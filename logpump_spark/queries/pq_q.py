"""Product-quantization (PQ) compression + asymmetric-distance (ADC)
top-k search — the codebook-compressed complement to the IVF path
(llm_q.sim_ivf_topk) and SQ8 (quality_q.embed_quantize_sq8).

The whole fit runs in the floor(x*1e6) integer domain with rank-order
init and (dist, cid) tie-breaks (llmdata/pq.py), so the DuckDB oracle
replays the exact codebooks, codes, and ADC rankings CTE by CTE — the
fit itself is correctness-checked, not just the search.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..llmdata.pq import pq_adc_topk
from ..tables import load

_QUERY_IDS = list(range(10))
_N_SUB = 4
_K = 8
_ITERS = 2
_DIM = 64
_TOPK = 5
_WIDTH = _DIM // _N_SUB


def sim_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC ANN: fit ``n_sub x k`` integer-exact codebooks (2 Lloyd
    iterations per subspace), encode the corpus to 4 codes per vector,
    and rank neighbors by the sum of precomputed query-to-centroid
    subdistances — per corpus row it's ``n_sub`` table lookups, never a
    full-dimension distance."""
    emb = load(spark, sf_dir, "embeddings")
    return pq_adc_topk(
        emb, _QUERY_IDS, topk=_TOPK, n_sub=_N_SUB, k=_K, iters=_ITERS, dim=_DIM
    )


def _pq_fit_cte(n_sub: int, k: int, iters: int, width: int) -> str:
    """CTE chain replaying fit_pq exactly: quantize -> subvectors ->
    rank-init -> (assign, update) x iters -> codes."""
    dist = (
        "CAST(list_sum(list_transform(list_zip(s.sq, c.c),"
        " p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT)"
    )
    parts = [
        f"""base AS (
  SELECT vec_id, list_transform(embedding,
         x -> CAST(FLOOR(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS q
  FROM embeddings WHERE len(embedding) = {n_sub * width}
),
sub AS (
  SELECT vec_id, m, list_slice(q, m*{width}+1, m*{width}+{width}) AS sq
  FROM base CROSS JOIN (SELECT unnest(range({n_sub})) AS m)
),
seed AS (
  SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
  FROM (SELECT DISTINCT vec_id FROM sub)
  QUALIFY ROW_NUMBER() OVER (ORDER BY vec_id) <= {k}
),
cent0 AS (
  SELECT s.m, r.cid, s.sq AS c FROM sub s JOIN seed r USING (vec_id)
)"""
    ]
    for i in range(1, iters + 1):
        parts.append(f"""d{i} AS (
  SELECT s.vec_id, s.m, c.cid, {dist} AS dist
  FROM sub s JOIN cent{i - 1} c ON s.m = c.m
),
a{i} AS (
  SELECT vec_id, m, cid AS cell FROM (
    SELECT vec_id, m, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id, m ORDER BY dist, cid) rn
    FROM d{i}
  ) WHERE rn = 1
),
cent{i} AS (
  SELECT m, cid, list(cv ORDER BY pos) AS c FROM (
    SELECT m, cell AS cid, pos,
           CAST(FLOOR(CAST(SUM(val) AS BIGINT) / COUNT(*)) AS BIGINT) AS cv
    FROM (
      SELECT a.m, a.cell, generate_subscripts(s.sq, 1) AS pos, unnest(s.sq) AS val
      FROM a{i} a JOIN sub s ON a.vec_id = s.vec_id AND a.m = s.m
    ) GROUP BY m, cell, pos
  ) GROUP BY m, cid
)""")
    parts.append(f"""codes AS (
  SELECT vec_id, m, cid AS cell FROM (
    SELECT s.vec_id, s.m, c.cid,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY {dist}, c.cid) rn
    FROM sub s JOIN cent{iters} c ON s.m = c.m
  ) WHERE rn = 1
)""")
    return ",\n".join(parts)


_SIM_PQ_SQL = f"""
WITH {_pq_fit_cte(_N_SUB, _K, _ITERS, _WIDTH)},
qsub AS (
  SELECT vec_id AS query_id, m, sq AS qsq FROM sub WHERE vec_id < 10
),
dtable AS (
  SELECT q.query_id, q.m, c.cid AS cell,
         CAST(list_sum(list_transform(list_zip(q.qsq, c.c),
              p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d
  FROM qsub q JOIN cent{_ITERS} c ON q.m = c.m
),
scored AS (
  SELECT t.query_id, co.vec_id AS neighbor_id, CAST(SUM(t.d) AS BIGINT) AS adc_dist
  FROM codes co JOIN dtable t ON co.m = t.m AND co.cell = t.cell
  WHERE co.vec_id != t.query_id
  GROUP BY t.query_id, co.vec_id
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, adc_dist, rank FROM ranked
WHERE rank <= {_TOPK} ORDER BY query_id, rank
"""

SPARK_QUERIES = {"sim_pq_adc": sim_pq_adc}
ORACLE_SQL = {"sim_pq_adc": _SIM_PQ_SQL}
