"""Distributed connected components for duplicate clustering.

Pairwise near-dup detection (MinHash/SimHash/Jaccard — dedup.py) yields
EDGES; corpus curation needs CLUSTERS: if A~B and B~C, one canonical doc
must survive out of {A, B, C} even though (A, C) was never scored.  That
transitive step is connected components over the near-dup graph.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the standard
shuffle-friendly CC for data too big for one machine:

- large-star: every node connects its LARGER neighbors to the minimum of
  its neighborhood (including itself);
- small-star: every node connects its smaller-or-equal neighbors to the
  minimum of its neighborhood.

Each star is ONE window-min over the node key plus the output distinct —
two shuffles — instead of the groupBy+join+distinct formulation (the
min over a neighborhood multiset equals the min over its set, so the
pre-join distincts the textbook shape needs are dropped and dedup
happens once, on the output).  Iterative rounds are dominated by fixed
per-stage overhead, so fewer shuffles per round is what makes the loop
cheap at ANY data size.  The edge count never grows above the input
edge count.  Convergence is O(log^2 n) rounds worst-case and 2-4 rounds
on real near-dup graphs (components are small and star-like).  At
convergence every component is a star centered on its minimum id, so
labels fall out of the edge list directly.

Each round ``localCheckpoint``s the new edge set: iterative DataFrame
loops otherwise stack lineage until planning itself dominates (the
classic iterative-algorithm trap on Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from ..operators.materialize import materialize as _mat

# Budget for the driver-side union-find short-circuit: 2M edges x 2
# longs ~ 32 MB through Arrow — far under the driver's headroom, far
# over any near-dup graph the bench or driver fixtures produce.
CC_DRIVER_MAX_EDGES = 2_000_000


def _large_star(e: DataFrame) -> DataFrame:
    """(u,v) edges (any direction) -> edges connecting each node's larger
    neighbors to min(neighborhood ∪ {self}).  One window-min shuffle +
    the output distinct."""
    und = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mn = F.least(F.col("u"), F.min("v").over(W.partitionBy("u")))
    return (
        und.withColumn("m", mn)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Directed (larger -> smaller) edges -> edges connecting each node's
    smaller neighbors (and itself) to min(neighborhood).  One window-min
    shuffle + the output distinct."""
    d = e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")).filter(
        F.col("u") != F.col("v")
    )
    j = d.withColumn("mn", F.min("v").over(W.partitionBy("u")))
    nbr = j.filter(F.col("v") != F.col("mn")).select(
        F.col("v").alias("u"), F.col("mn").alias("v")
    )
    own = j.select("u", F.col("mn").alias("v"))
    return nbr.union(own).filter(F.col("u") != F.col("v")).distinct()


def _driver_components(cur: DataFrame) -> DataFrame | None:
    """Union-find the edge set on the driver when it is small enough to
    collect, or ``None`` to keep the distributed star loop.

    Why (r15, the ``_collect_fit_frame`` precedent): each star round is
    2 shuffles plus a probe action over an edge set that near-dup
    detection has ALREADY reduced to pairs — at bench scale a few
    thousand rows.  The loop's wall is round-count x fixed per-action
    cost, not data.  One bounded collect plus union-to-min on the
    driver produces the identical (node, component = min reachable id)
    labels; graphs over the budget (or conf
    ``logpump.cc.driverUnionFind=false``) take the distributed loop
    unchanged, so the 100 TB path is untouched."""
    spark = cur.sparkSession
    if spark.conf.get("logpump.cc.driverUnionFind", "true").lower() != "true":
        return None
    # cur is the entry localCheckpoint — the count runs over
    # materialized blocks, and doubles as the materialization the first
    # star round would have paid.
    n = cur.count()
    if n > CC_DRIVER_MAX_EDGES:
        return None
    import numpy as np
    import pandas as pd

    pdf = cur.toPandas()
    # r16 (ADVICE r15): the per-edge pure-Python union-find loop took
    # ~9 s at the 2M-edge budget boundary; this vectorized min-label
    # propagation with pointer jumping computes the identical labels
    # (component = min reachable id) in ~5 s there and is equally exact
    # on small graphs (verified equal on 2M random edges, and pinned
    # driver == distributed in tests/test_driver_cc.py).  np.unique
    # returns nodes SORTED, so index order equals id order and the
    # minimum factorized label IS the minimum node id.
    u = pdf["u"].to_numpy(dtype=np.int64, copy=False)
    v = pdf["v"].to_numpy(dtype=np.int64, copy=False)
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[: len(u)], inv[len(u):]
    label = np.arange(len(nodes), dtype=np.int64)
    while True:
        m = np.minimum(label[ui], label[vi])
        before = label.copy()
        np.minimum.at(label, ui, m)
        np.minimum.at(label, vi, m)
        while True:  # pointer jumping: compress chains to their roots
            nxt = label[label]
            if np.array_equal(nxt, label):
                break
            label = nxt
        if np.array_equal(label, before):
            break
    out = pd.DataFrame({"node": nodes, "component": nodes[label]})
    return spark.createDataFrame(out, schema="node long, component long")


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Label every node reachable through ``edges`` with the minimum id of
    its component.  Returns (node, component); nodes with no edges are
    absent (callers left-join and coalesce to self).

    The loop runs until the edge set is a fixpoint (star graphs), checked
    with an exact exceptAll — at most ``max_iter`` rounds as a runaway
    guard (log^2 n bound; 20 covers any realistic corpus)."""
    cur = (
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .transform(_mat, eager=True)
    )
    drv = _driver_components(cur)
    if drv is not None:
        return drv
    for i in range(max_iter):
        # lazy checkpoint: the convergence probe below is the ONE action
        # per probed round — it materializes the pending checkpoints and
        # tests the fixpoint in the same job (driver-side action count is
        # what dominates the loop's fixed cost; the data per round is
        # tiny relative to the corpus)
        nxt = _small_star(_large_star(cur)).transform(_mat)
        prev = cur
        cur = nxt
        # probe every SECOND round (and the last): star rounds are cheap
        # relative to a driver action, and applying stars to an
        # already-converged edge set is idempotent, so the worst case of
        # a skipped probe is one extra cheap round — halving the loop's
        # fixed action cost (r7 verdict item 6).  Real near-dup graphs
        # converge in 2-4 rounds, so the i==1 probe catches them first.
        if i % 2 == 0 and i != max_iter - 1:
            continue
        # both edge sets are distinct, so they are equal iff no (u, v)
        # appears an odd number of times in their concatenation
        diff = (
            cur.union(prev)
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("c"))
            .filter(F.col("c") != 2)
        )
        if len(diff.take(1)) == 0:
            break
    # converged: every edge is (member, root); roots label themselves
    members = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = cur.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    return members.union(roots).distinct()


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    scale: int = 10**9,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Integer-exact PageRank, ``iters`` unrolled power iterations.

    Exactness contract (same family as fit_ivf / zscore): ranks are
    int64 at ``scale``; each iteration's contribution is ONE floored
    division floor(pr_u * d_num / (d_den * outdeg_u)) of exact integers,
    and the per-target sum is an int64 sum — so any engine replays the
    ranks bit-identically, no double-accumulation drift.  Teleport mass
    is floor(scale * (d_den-d_num) / d_den) per node; dangling-node mass
    is dropped (simplified PageRank — ranks compare, they don't sum to
    1, which is what top-k ranking needs).

    Scale shape: per iteration, one join of the rank vector with edges
    on the source key and one groupBy on the target key; a driver loop
    with localCheckpoint (the connected_components pattern above)
    replaces plan unrolling when iters grows beyond a handful.

    r15: the edge list, node set, and out-degree table are materialized
    once (localCheckpoint, the same entry treatment
    connected_components has always had) — the unrolled plan references
    the caller's edge subtree up to 2 + 2 x iters times (each
    iteration's join + the node left-join), and graph_pagerank's edge
    list is itself a join+distinct that was re-planned per reference.
    Interleaved A/B at sf0.1: 4.59 -> 3.28 s (0.71x), ranks exact."""
    e = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).transform(_mat)
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .transform(_mat)
    )
    outdeg = (
        e.groupBy("u")
        .agg(F.count(F.lit(1)).alias("deg"))
        .transform(_mat)
    )
    base = (scale * (damping_den - damping_num)) // damping_den
    pr = nodes.select("node", F.lit(scale).cast("long").alias("pr"))
    for _ in range(iters):
        contrib = (
            e.join(pr.withColumnRenamed("node", "u"), "u")
            .join(outdeg, "u")
            .select(
                F.col("v").alias("node"),
                F.floor(
                    F.col("pr") * damping_num / (F.lit(damping_den) * F.col("deg"))
                ).cast("long").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        pr = nodes.join(contrib, "node", "left").select(
            "node",
            (F.lit(base).cast("long") + F.coalesce(F.col("inflow"), F.lit(0))).alias(
                "pr"
            ),
        )
    return pr
