"""Product quantization (PQ) for embedding compression + ADC search.

PQ splits each vector into ``n_sub`` subvectors and vector-quantizes each
subspace independently (k-means, ``k`` centroids), so a 64-dim float
vector compresses to ``n_sub`` small codes.  Search uses asymmetric
distance computation (ADC): the query stays exact, and its distance to a
corpus vector is the sum of precomputed query-to-centroid subdistances —
a table lookup per subspace instead of a 64-dim scan.

Like ``similarity.fit_ivf``, the whole fit runs in the floor(x*1e6)
integer domain with deterministic rank-order init (first ``k`` ids) and
tie-breaks (smallest centroid id), so a SQL oracle replays the exact
codebooks, codes, and ADC rankings — no RNG, no float accumulation
order anywhere.

Scale shape (mirrors fit_ivf):
- centroids live on the DRIVER between Lloyd iterations (n_sub x k
  rows — bounded), so each iteration is ONE fused mapInPandas corpus
  pass (numpy assignment + per-batch partial sums over every subspace)
  plus an (n_sub*k*width)-row aggregation — no corpus crossJoin, no
  interpreted per-element arithmetic, no recursive plan replayed per
  action;
- encode: one Arrow-batched pass emitting ``n_sub`` codes per vector;
- ADC search: the distance TABLE (queries x n_sub x k rows) is computed
  once against centroids and broadcast; the corpus side only joins its
  codes to the table — per corpus row it's n_sub lookups, never a
  full-dimension distance, and never a corpus self-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .similarity import _collect_fit_frame, _np_quantize, _sqdist, quantize


def _np_sub_cells(
    S: np.ndarray, cent: dict[int, tuple[np.ndarray, np.ndarray]]
) -> dict[int, np.ndarray]:
    """Per-subspace nearest-centroid cells for a (b, n_sub, w) block;
    exact int64 distances, ties to the smallest cid (cids ascending +
    argmin-takes-first)."""
    out = {}
    for m, (cids, C) in cent.items():
        d2 = ((S[:, m, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        out[m] = cids[np.argmin(d2, axis=1)]
    return out


def fit_pq(
    emb: DataFrame,
    n_sub: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Fit PQ codebooks and encode the corpus.

    Returns ``(codes, centroids)``: codes = (_id, m, cell) — ``n_sub``
    codes per vector; centroids = (m, cid, c: array<long>).  Same exact
    integer arithmetic as ``fit_ivf`` (floored integer means, (dist, cid)
    tie-break); init = the ``k`` smallest-id vectors in RANK order
    (cid = rank-1, so ids need not be contiguous)."""
    spark = emb.sparkSession
    width = dim // n_sub
    base = emb.filter(F.size(F.col(vec_col)) == dim)

    # r15: bounded corpora run the whole sub-Lloyd driver-side — one
    # collect replaces init + one mapInPandas+shuffle+collect action per
    # iteration; same kernels, bit-identical codebooks (see
    # similarity._collect_fit_frame and tests/test_driver_fit.py).
    frame = _collect_fit_frame(base, id_col, vec_col)
    cent: dict[int, tuple[np.ndarray, np.ndarray]]
    if frame is not None:
        ids, Q = frame
        S = Q.reshape(len(ids), n_sub, width)
        order = np.argsort(ids, kind="stable")
        k_eff = min(k, len(ids))
        Q0 = S[order[:k_eff]]
        cent = {
            m: (np.arange(k_eff, dtype=np.int64), Q0[:, m, :].copy())
            for m in range(n_sub)
        }
        for _ in range(iters):
            cells = _np_sub_cells(S, cent)
            new_cent: dict[int, tuple[np.ndarray, np.ndarray]] = {}
            for m in range(n_sub):
                cm = cells[m]
                o = np.argsort(cm, kind="stable")
                cs = cm[o]
                uniq, starts = np.unique(cs, return_index=True)
                sums = np.add.reduceat(S[o, m, :], starts, axis=0).astype(
                    np.int64, copy=False
                )
                counts = np.diff(np.append(starts, len(cs)))
                # identical to the distributed FLOOR(s / n): int64 ->
                # float64 conversion + IEEE divide + floor
                cv = np.floor(
                    sums.astype(np.float64) / counts[:, None].astype(np.float64)
                ).astype(np.int64)
                new_cent[m] = (uniq.astype(np.int64), cv)
            cent = new_cent
        return _pq_encode(spark, base, cent, n_sub, width, id_col, vec_col)

    init_rows = (
        base.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("v"))
        .orderBy("_id")
        .limit(k)
        .collect()
    )
    # graceful degradation (matches the oracle's rank-limited seed CTE):
    # a corpus smaller than k seeds one centroid per vector; an EMPTY
    # corpus yields empty codes/codebooks so downstream ADC searches
    # return empty instead of crashing on a data-less partition
    if not init_rows:
        empty_codes = spark.createDataFrame([], "_id long, m long, cell long")
        empty_cent = spark.createDataFrame([], "m long, cid long, c array<long>")
        return empty_codes, empty_cent
    k = min(k, len(init_rows))
    # driver-side quantization of k tiny init vectors — same floor(x*1e6)
    # int64 math as the executor path
    Q0 = np.vstack(
        [
            np.floor(np.asarray(r.v, dtype=np.float64) * 1_000_000).astype(np.int64)
            for r in init_rows
        ]
    ).reshape(k, n_sub, width)
    cent: dict[int, tuple[np.ndarray, np.ndarray]] = {
        m: (np.arange(k, dtype=np.int64), Q0[:, m, :].copy()) for m in range(n_sub)
    }

    vec_only = base.select(F.col(vec_col))
    for _ in range(iters):
        snapshot = {m: (c[0].copy(), c[1].copy()) for m, c in cent.items()}

        def _partials(batches, _cent=snapshot):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                S = _np_quantize(pdf[vec_col]).reshape(len(pdf), n_sub, width)
                cells = _np_sub_cells(S, _cent)
                for m in range(n_sub):
                    for cell in np.unique(cells[m]):
                        mask = cells[m] == cell
                        s = S[mask, m, :].sum(axis=0, dtype=np.int64)
                        yield pd.DataFrame(
                            {
                                "m": np.full(width, m, dtype=np.int64),
                                "cell": np.full(width, cell, dtype=np.int64),
                                "pos": np.arange(width, dtype=np.int64),
                                "s": s,
                                "n": np.full(width, int(mask.sum()), dtype=np.int64),
                            }
                        )

        updated = (
            vec_only.mapInPandas(_partials, "m long, cell long, pos long, s long, n long")
            .groupBy("m", "cell", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            # exact integer mean, floored: long/long division is double in
            # Spark and DuckDB alike, operands are exact -> identical
            .withColumn("cv", F.floor(F.col("s") / F.col("n")).cast("long"))
            .collect()
        )
        by_mc: dict[tuple[int, int], dict[int, int]] = {}
        for r in updated:
            by_mc.setdefault((int(r.m), int(r.cell)), {})[int(r.pos)] = int(r.cv)
        cent = {}
        for m in range(n_sub):
            pairs = sorted(
                (cell, [d[p] for p in sorted(d)])
                for (mm, cell), d in by_mc.items()
                if mm == m
            )
            cent[m] = (
                np.array([c for c, _ in pairs], dtype=np.int64),
                np.array([v for _, v in pairs], dtype=np.int64),
            )

    return _pq_encode(spark, base, cent, n_sub, width, id_col, vec_col)


def _pq_encode(
    spark,
    base: DataFrame,
    cent: dict[int, tuple[np.ndarray, np.ndarray]],
    n_sub: int,
    width: int,
    id_col: str,
    vec_col: str,
) -> tuple[DataFrame, DataFrame]:
    """Encode the corpus against fitted codebooks (shared tail of the
    driver-side and distributed fits): one Arrow-batched pass emitting
    ``n_sub`` codes per vector, plus the bounded centroid frame."""
    final_cent = {m: (c[0].copy(), c[1].copy()) for m, c in cent.items()}

    def _codes_gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            S = _np_quantize(pdf[vec_col]).reshape(len(pdf), n_sub, width)
            cells = _np_sub_cells(S, final_cent)
            ids = pdf["_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "_id": np.repeat(ids, n_sub),
                    "m": np.tile(np.arange(n_sub, dtype=np.int64), len(pdf)),
                    "cell": np.stack([cells[m] for m in range(n_sub)], axis=1).ravel(),
                }
            )

    codes = base.select(F.col(id_col).alias("_id"), F.col(vec_col)).mapInPandas(
        _codes_gen, "_id long, m long, cell long"
    )
    cent_rows = [
        (m, int(cid), [int(x) for x in vec])
        for m in range(n_sub)
        for cid, vec in zip(cent[m][0], cent[m][1])
    ]
    cent_df = spark.createDataFrame(cent_rows, "m long, cid long, c array<long>")
    return codes, cent_df


def pq_adc_topk(
    emb: DataFrame,
    query_ids: list[int],
    topk: int = 5,
    n_sub: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """ADC top-k: exact queries against the PQ-compressed corpus.

    The per-query distance table (n_sub * k subdistances) is broadcast;
    corpus rows contribute their codes only.  Output ranks ascending by
    integer ADC distance, ties to the smaller neighbor id."""
    width = dim // n_sub
    codes, cent = fit_pq(emb, n_sub, k, iters, id_col, vec_col, dim)
    q = quantize(F.col(vec_col))
    parts = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"), F.slice(q, m * width + 1, width).alias("sq")
            )
            for m in range(n_sub)
        ]
    )
    qsub = (
        emb.filter(F.col(id_col).isin(query_ids) & (F.size(F.col(vec_col)) == dim))
        .select(F.col(id_col).alias("query_id"), F.explode(parts).alias("p"))
        .select("query_id", "p.m", F.col("p.sq").alias("qsq"))
    )
    dtable = qsub.join(F.broadcast(cent), "m").select(
        "query_id", "m", F.col("cid").alias("cell"), _sqdist("qsq", "c").alias("d")
    )
    scored = (
        codes.join(F.broadcast(dtable), ["m", "cell"])
        .filter(F.col("_id") != F.col("query_id"))
        .groupBy("query_id", "_id")
        .agg(F.sum("d").alias("adc_dist"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            "query_id", F.col("_id").alias("neighbor_id"), "adc_dist", "rank"
        )
    )
