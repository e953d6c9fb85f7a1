"""Standing pins for the r13 numpy kernel rewrites (VERDICT r13,
"What's wrong" #1: the one-off A/B certifying ``_np_cells``' BLAS
norm-expansion path was not a test, and the big-magnitude int64
fallback branch was dead in every test and fixture).

Pinned here, in CI, against an independent exact reference:

- BLAS path == exact per-row int64 reference on random batches with
  k >= 256 (past the 64-centroid fallback chunk and the 2048-row batch
  chunk), planted exact-tie centroids (duplicates AND equidistant
  rows), argmin-takes-first -> smallest cid, non-contiguous cids.
- The ``exact_float=False`` fallback branch EXECUTES (magnitudes past
  the 2^53 guard) and matches the same reference.
- The guard boundary itself: d*(2*max_abs)^2 == 2^53 exactly stays on
  the BLAS path, one past it flips to the fallback, both exact.
- ``fit_ivf`` with ``fit_stride > 1`` at k > 8 == a naive driver-side
  reference Lloyd (same quantize / modulo sample / rank init /
  floored-double mean / empty-cell drop semantics).
- ``fit_stride > 1`` rejects non-integral id columns (ADVICE r13).
"""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from logpump_spark.llmdata.similarity import _np_cells, fit_ivf


def _ref_cells(Q: np.ndarray, cids: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Independent exact reference: per-row int64 tensor distances (no
    BLAS, no chunking), argmin takes the first minimum."""
    out = np.empty(len(Q), dtype=np.int64)
    for i in range(len(Q)):
        diff = Q[i][None, :] - C
        d2 = (diff * diff).sum(axis=1)
        out[i] = cids[int(np.argmin(d2))]
    return out


def _guard_exact_float(Q: np.ndarray, C: np.ndarray) -> bool:
    """Replicates the kernel's branch condition so the tests can assert
    WHICH path ran, not just that the output is right."""
    d = Q.shape[1]
    max_abs = max(int(np.abs(Q).max(initial=0)), int(np.abs(C).max(initial=0)))
    return d * (2 * max_abs) ** 2 <= 2**53


def _plant_ties(rng: np.random.RandomState, Q: np.ndarray, C: np.ndarray) -> None:
    """Exact ties of both kinds: duplicate centroids (equal distance to
    EVERYTHING) and rows equidistant between two centroids 2 apart."""
    k = len(C)
    C[k // 2 + 1] = C[k // 2]          # duplicate pair
    C[k // 2 + 2] = C[k // 2]          # triplicate
    for i in range(min(8, len(Q))):    # rows sitting ON a centroid
        Q[i] = C[rng.randint(0, k)]
    C[3] = C[2].copy()
    C[3][0] += 2                       # two centroids 2 apart on dim 0
    Q[10] = C[2].copy()
    Q[10][0] += 1                      # exactly midway: d2 = 1 to both
    # drift-sensitive ties: equal distance, VERY different dot products,
    # so any factor/term drift in |q|^2 - 2 q.c + |c|^2 moves d2 by
    # ~|drift|*2t^2 (far above one ulp of d2) and flips argmin in one of
    # the two mirrored plants regardless of the drift's sign.  The
    # midway plant above cannot catch this: its d2 shift under a 1e-7
    # factor drift is ~0.2, below d2's ulp at these magnitudes.
    t, r = 900_000, 500_000
    C[4:8] = 0
    Q[11] = 0
    Q[11][0] = t
    C[4][0], C[4][1] = 2 * t, r        # dot 2t^2, tie-WINNER: neg drift flips
    C[5][1] = r                        # dot 0, same d2 = t^2 + r^2
    Q[12] = 0
    Q[12][2] = t
    C[6][3] = r                        # dot 0 (Q[12] ties C5/C6/C7; C5 wins)
    C[7][2], C[7][3] = 2 * t, r        # dot 2t^2: pos drift flips Q[12]'s tie


def test_np_cells_blas_path_matches_exact_reference_with_ties():
    rng = np.random.RandomState(1413)
    n, k, d = 3000, 317, 64            # n past the 2048 row chunk
    Q = rng.randint(-1_000_000, 1_000_001, size=(n, d)).astype(np.int64)
    C = rng.randint(-1_000_000, 1_000_001, size=(k, d)).astype(np.int64)
    _plant_ties(rng, Q, C)
    cids = np.arange(k, dtype=np.int64) * 3 + 7   # ascending, non-contiguous
    assert _guard_exact_float(Q, C), "fixture must exercise the BLAS branch"
    got = _np_cells(Q, cids, C)
    want = _ref_cells(Q, cids, C)
    assert np.array_equal(got, want)
    # the planted midway row resolved to the FIRST (smallest-cid) of the pair
    assert got[10] == cids[2]


def test_np_cells_int64_fallback_branch_executes_and_matches():
    rng = np.random.RandomState(1414)
    # magnitudes past the guard (64*(2e7)^2 ~ 2.6e16 > 2^53) but with
    # worst-case distances ~2.6e16 << 2^63, so int64 stays exact
    n, k, d = 2500, 70, 64             # k past the 64-centroid chunk
    Q = rng.randint(-10_000_000, 10_000_001, size=(n, d)).astype(np.int64)
    C = rng.randint(-10_000_000, 10_000_001, size=(k, d)).astype(np.int64)
    _plant_ties(rng, Q, C)
    cids = np.arange(k, dtype=np.int64)
    assert not _guard_exact_float(Q, C), "fixture must force the fallback"
    assert np.array_equal(_np_cells(Q, cids, C), _ref_cells(Q, cids, C))


def test_np_cells_guard_boundary_both_sides_exact():
    # d=2: the guard d*(2m)^2 <= 2^53 holds with EQUALITY at m = 2^25
    # and flips one past it — both sides must match the reference
    rng = np.random.RandomState(1415)
    for m, expect_blas in ((2**25, True), (2**25 + 1, False)):
        Q = rng.randint(-m, m + 1, size=(300, 2)).astype(np.int64)
        C = rng.randint(-m, m + 1, size=(9, 2)).astype(np.int64)
        Q[0] = (m, -m)                 # pin max_abs at exactly m
        C[0] = (-m, m)                 # ... and the worst-case diff 2m
        cids = np.arange(9, dtype=np.int64)
        assert _guard_exact_float(Q, C) is expect_blas
        assert np.array_equal(_np_cells(Q, cids, C), _ref_cells(Q, cids, C))


# ---------------------------------------------------------------------------
# fit_ivf sampled-fit vs a naive reference Lloyd


def _naive_lloyd(rows, n_cells, iters, stride, offset):
    """Driver-side reference replaying fit_ivf's documented semantics:
    floor(x*1e6) quantize, modulo fit sample, rank init, exact-int
    assignment with ties to the smallest cid, floored DOUBLE-division
    mean (the cross-engine contract), empty cells drop, final
    assignment over the FULL corpus."""
    q = {i: [math.floor(x * 1_000_000) for x in v] for i, v in rows}
    sample = sorted(i for i in q if (i - offset) % stride == 0)
    cent = [(cid, q[i]) for cid, i in enumerate(sample[:n_cells])]

    def assign(vec, cent_rows):
        best_cid, best_d = None, None
        for cid, c in cent_rows:       # cent_rows sorted by cid: first min wins
            d2 = sum((a - b) * (a - b) for a, b in zip(vec, c))
            if best_d is None or d2 < best_d:
                best_cid, best_d = cid, d2
        return best_cid

    for _ in range(iters):
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for i in sample:
            cid = assign(q[i], cent)
            if cid not in sums:
                sums[cid] = [0] * len(q[i])
                counts[cid] = 0
            counts[cid] += 1
            for p, x in enumerate(q[i]):
                sums[cid][p] += x
        cent = [
            (cid, [math.floor(s / counts[cid]) for s in sums[cid]])
            for cid in sorted(sums)
        ]
    cells = {i: assign(q[i], cent) for i in q}
    return cells, cent


def test_fit_ivf_stride_matches_naive_reference_k16(spark):
    rng = random.Random(1416)
    dim, n_cells, iters, stride = 8, 16, 2, 4
    ids = [1000 + 3 * i for i in range(240)]   # non-contiguous, min=1000
    rows = [
        (i, [round(rng.uniform(-1, 1), 4) for _ in range(dim)]) for i in ids
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cells_df, cent_df = fit_ivf(
        emb, n_cells=n_cells, iters=iters, fit_stride=stride, fit_offset=1000
    )
    got_cells = {r.vec_id: r.cell for r in cells_df.collect()}
    got_cent = {r.cid: list(r.c) for r in cent_df.collect()}

    # the reference quantizes the FLOAT32 values Spark stored, so read
    # them back rather than trusting the python doubles we created
    stored = [(r.vec_id, list(r.embedding)) for r in emb.collect()]
    want_cells, want_cent = _naive_lloyd(stored, n_cells, iters, stride, 1000)
    assert got_cells == want_cells
    assert got_cent == {cid: c for cid, c in want_cent}


def test_fit_ivf_stride_rejects_non_integral_ids(spark):
    emb = spark.createDataFrame(
        [(1.5, [0.1, 0.2]), (2.5, [0.3, 0.4])],
        "vec_id double, embedding array<float>",
    )
    with pytest.raises(TypeError, match="integral"):
        fit_ivf(emb, n_cells=2, fit_stride=2)
    # stride=1 (full fit) keeps working on any id type
    cells, _ = fit_ivf(emb, n_cells=2, fit_stride=1)
    assert cells.count() == 2
