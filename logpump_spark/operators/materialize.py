"""One conf-aware lineage-truncation point for every bounded
intermediate the engine materializes (r16, VERDICT r15 "What's wrong
#3" / "Next round #4").

r15 added ~10 materialize-once sites (PageRank's edge/degree tables,
the CC edge set, the tokenize-once stream, the bigram count table, the
interval boundary table, the MAD multiplicity tables, the triangle
edge sets, the capped funnel prefix, the sampled fit frame) that
called ``DataFrame.localCheckpoint`` directly.  ``localCheckpoint``
stores blocks on executors and TRUNCATES lineage: on a multi-hour
cluster job an executor loss after materialization fails the query
instead of recomputing.  ``skewguard.ranged_blocks`` already had the
deployment toggle (``logpump.segmented.reliableCheckpoint``) that
upgrades the materialization to a reliable ``checkpoint()`` written to
``sparkContext.setCheckpointDir`` — but the new sites bypassed it.

``materialize()`` is now the single routing point: every internal
materialization site calls it, and ONE session conf flips the whole
engine between local (bench default — zero extra I/O) and reliable
(long cluster jobs — blocks re-read from replicated storage on
executor loss).  Confs honored, either being "true" engages reliable:

- ``logpump.reliableCheckpoint`` — the global name (r16);
- ``logpump.segmented.reliableCheckpoint`` — the r14 name, kept so
  existing deployments' conf keeps working (it predates the non-
  segmented sites).

Exactness is unaffected: both forms materialize the same rows; the
toggle only changes where the blocks live.  Pinned in
tests/test_materialize.py (conf flipped -> RDD is reliably
checkpointed; default -> locally checkpointed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CONF_KEYS = (
    "logpump.reliableCheckpoint",
    "logpump.segmented.reliableCheckpoint",
)


def reliable_requested(df: DataFrame) -> bool:
    """True when the session conf asks for reliable checkpoints."""
    conf = df.sparkSession.conf
    return any(conf.get(k, "false").lower() == "true" for k in _CONF_KEYS)


def materialize(
    df: DataFrame, eager: bool = False, reliable: bool | None = None
) -> DataFrame:
    """Materialize a bounded intermediate, truncating lineage.

    ``reliable=None`` (the default) reads the session conf; an explicit
    boolean wins over the conf (``ranged_blocks`` uses this to honor
    its caller-level parameter precedence).  Reliable mode requires a
    configured ``sparkContext.setCheckpointDir`` and raises up-front
    rather than failing at first action.

    The checkpoint subtree is PLANNED WITH AQE DISABLED (r16): under
    AQE, ``Dataset.checkpoint(eager=False)`` calls
    ``AdaptiveSparkPlanExec.execute()``, which materializes every
    intermediate shuffle stage AT THE CALL — i.e. at plan-construction
    time, outside bench.py's timed window for any query not in its
    eager_construction set (measured: timeseries_mad ran 5 jobs /
    ~1.1 s and graph_pagerank 6 jobs / ~2.0 s during construction).
    A non-AQE physical plan's ``execute()`` is lazy RDD construction,
    so with the conf flipped for just this planning call the
    materialization runs at the FIRST ACTION — inside the timed
    region, where the r1 bench contract expects real work.  The
    toggle only affects the checkpointed subtree's own plan (fixed
    shuffle partitions instead of AQE coalescing — these frames are
    single-aggregate subtrees where that is immaterial); every
    consumer query still plans with AQE.
    """
    if reliable is None:
        reliable = reliable_requested(df)
    if reliable:
        sc = df.sparkSession.sparkContext
        if sc.getCheckpointDir() is None:
            raise RuntimeError(
                "materialize(reliable=True) needs "
                "sparkContext.setCheckpointDir(<replicated path>) — "
                "a reliable checkpoint has nowhere to write"
            )
    conf = df.sparkSession.conf
    prev = conf.get("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.enabled", "false")
    try:
        if reliable:
            return df.checkpoint(eager=eager)
        return df.localCheckpoint(eager=eager)
    finally:
        conf.set("spark.sql.adaptive.enabled", prev)
