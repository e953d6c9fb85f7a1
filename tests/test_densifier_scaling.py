"""r12 corpus-derived partition vocabularies (SCALING.md §10): the 10x
decade probe measured sim_neardup 25.6x / dedup_semantic 12.2x /
join_interval_bucketed 12.9x because their pair-mining spaces were
partitioned by FIXED vocabularies (label cells, fit-k k-means cells,
calendar buckets) that the densifying harness outgrew.  These tests pin
the r12 fixes:

- sim_neardup: sub-cell SRP sign bits derived from the largest label
  cell's row count — b=0 below the target (byte-identical to the old
  operator), b>0 above it, with a DuckDB twin replaying the identical
  derivation on the DENSIFIED corpus (the regime the static sf0.01
  oracle never reaches).
- dedup_semantic: n_cells derived from the corpus count (k grows with
  the corpus so expected cell population stays ~constant), same
  dynamic-twin strategy.
- join_interval_bucketed: rewritten from the pair-materializing bucket
  join to a two-stage boundary-sweep prefix sum — the aggregate output
  needs no pair enumeration at all, so cost is ~linear in rows even
  when true containments grow quadratically.  The unchanged naive-join
  oracle pins exactness.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from logpump_spark.llmdata.similarity import (
    NEARDUP_SUBCELL_TARGET,
    embedding_neardup_pairs,
    subcell_bits,
)


def test_subcell_bits_integer_derivation():
    # b = |{i in [0,16): mx > target * 2^i}| == max(0, ceil(log2(mx/t)))
    t = 256
    assert subcell_bits(0, t) == 0
    assert subcell_bits(256, t) == 0  # at the target: no split
    assert subcell_bits(257, t) == 1
    assert subcell_bits(512, t) == 1
    assert subcell_bits(513, t) == 2
    assert subcell_bits(600, t) == 2
    assert subcell_bits(2180, t) == 4  # the 10x-decade max cell
    assert subcell_bits(256 << 16, t) == 16  # clamped at the bit budget


def _dense_emb(spark, n_per_label=600, n_labels=3, dims=16, seed=7):
    """A corpus whose label cells EXCEED the sub-cell target, with
    planted exact-duplicate pairs (same sign bits by construction, so
    the split must retain them)."""
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for lbl in range(n_labels):
        for _ in range(n_per_label):
            v = rng.standard_normal(dims).astype(np.float32)
            rows.append((vid, [float(x) for x in v], lbl))
            vid += 1
    # planted twins: duplicate every 97th vector under a fresh id
    twins = [(10_000 + i, rows[i][1], rows[i][2]) for i in range(0, vid, 97)]
    pdf = pd.DataFrame(rows + twins, columns=["vec_id", "embedding", "label"])
    df = spark.createDataFrame(
        pdf, "vec_id long, embedding array<float>, label int"
    )
    return pdf, df


def test_neardup_subcell_engages_and_matches_duckdb_twin(spark):
    # 618 rows/label > 512 -> b=2 (4 sub-cells); the DuckDB twin replays
    # the identical derivation, so this pins the b>0 regime the static
    # sf0.01 oracle (b=0) never exercises
    pdf, df = _dense_emb(spark)
    got = (
        embedding_neardup_pairs(
            df, threshold=0.9, subcell_target=NEARDUP_SUBCELL_TARGET
        )
        .orderBy("id_a", "id_b")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("embeddings", pdf)
    from logpump_spark.queries.llm_q import _COS, _sign_bits_sql

    want = con.execute(
        f"""
WITH params AS (
  SELECT (SELECT COUNT(*) FROM range(16) t(i)
          WHERE mx > 256 * (CAST(1 AS BIGINT) << CAST(i AS INT))) AS b
  FROM (SELECT COALESCE(MAX(c), 0) AS mx FROM
        (SELECT COUNT(*) AS c FROM embeddings GROUP BY label))
),
sub AS (
  SELECT vec_id, label, embedding,
         substring({_sign_bits_sql('embedding', 16)}, 1,
                   (SELECT CAST(b AS INT) FROM params)) AS sc
  FROM embeddings
),
capped AS (
  SELECT * FROM sub
  QUALIFY ROW_NUMBER() OVER (PARTITION BY label, sc ORDER BY vec_id) <= 10000
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS cell,
       ROUND({_COS.format(a='a.embedding', b='b.embedding')}, 6) AS cos
FROM capped a JOIN capped b
  ON a.label = b.label AND a.sc = b.sc AND a.vec_id < b.vec_id
WHERE ROUND({_COS.format(a='a.embedding', b='b.embedding')}, 6) >= 0.9
ORDER BY id_a, id_b
"""
    ).df()
    assert len(got) == len(want) and len(got) > 0
    assert (got["id_a"].values == want["id_a"].values).all()
    assert (got["id_b"].values == want["id_b"].values).all()
    assert np.allclose(got["cos"].values, want["cos"].values, atol=1e-6)
    # every planted exact twin shares all sign bits -> must be retained
    planted = {(i, 10_000 + i) for i in range(0, 1800, 97)}
    found = set(zip(got["id_a"], got["id_b"]))
    assert planted <= found


def test_neardup_below_target_keeps_old_plan_and_results(spark):
    # small cells -> b=0: no _sc column in the plan, results identical
    # to an explicit no-subcell call
    pdf, df = _dense_emb(spark, n_per_label=40, n_labels=4)
    out = embedding_neardup_pairs(
        df, threshold=0.9, subcell_target=NEARDUP_SUBCELL_TARGET
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "_sc" not in plan
    base = embedding_neardup_pairs(df, threshold=0.9, subcell_target=None)
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, base.collect()))
    assert a == b


def test_neardup_pair_growth_is_subquadratic_under_densification(spark):
    # replicate the corpus 4x into the SAME labels (the decade probe's
    # densification); candidate pairs must grow ~linearly (<= ~8x with
    # ceil slack), not ~16x quadratically
    def n_candidates(df):
        # count candidate pairs BEFORE the cosine threshold by running
        # with an impossible threshold and counting at threshold -1
        return embedding_neardup_pairs(
            df, threshold=-1.0, subcell_target=NEARDUP_SUBCELL_TARGET
        ).count()

    _, df1 = _dense_emb(spark, n_per_label=300, n_labels=2)
    reps = [
        df1.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000))
        for i in range(4)
    ]
    df4 = reps[0]
    for r in reps[1:]:
        df4 = df4.unionByName(r)
    c1, c4 = n_candidates(df1), n_candidates(df4)
    assert c4 < 8 * c1, (c1, c4)


def test_semantic_n_cells_derivation():
    from logpump_spark.llmdata.similarity import semantic_n_cells

    assert semantic_n_cells(0) == 8
    assert semantic_n_cells(500) == 8      # sf0.01 fixture -> the old constant
    assert semantic_n_cells(2000) == 8     # sf0.1 fixture -> unchanged
    assert semantic_n_cells(2001) == 9
    assert semantic_n_cells(20_000) == 80  # the 10x decade
    assert semantic_n_cells(10**9) == 4096  # driver-safety clamp


def test_semantic_dedup_derived_k_matches_oracle_on_densified_corpus(spark):
    # 2600 rows -> derived k=11 (the regime the sf0.01 oracle's own
    # derivation must follow); run the REGISTERED oracle SQL verbatim on
    # the densified frame and compare
    from logpump_spark.llmdata.similarity import semantic_dedup
    from logpump_spark.queries.llm_q import _DEDUP_SEMANTIC_SQL

    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.standard_normal(12).astype(np.float32)], i % 5)
        for i in range(2600)
    ]
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<float>, label int")
    got = (
        semantic_dedup(df, threshold=0.9)
        .orderBy("vec_id")
        .toPandas()
    )
    assert got["cell"].nunique() > 8  # derived k engaged (k=11 fitted)
    con = duckdb.connect()
    con.register("embeddings", pdf)
    want = con.execute(_DEDUP_SEMANTIC_SQL.replace("0.35", "0.9")).df()
    assert len(got) == len(want)
    for c in ["vec_id", "cell", "keep"]:
        assert (got[c].values == want[c].values).all(), c
    kb_g = got["kept_by"].fillna(-1).astype("int64")
    kb_w = want["kept_by"].fillna(-1).astype("int64")
    assert (kb_g.values == kb_w.values).all()


def test_interval_sweep_exact_on_densified_events(spark, tmp_path):
    # 4x-densify the sf0.001 events into the SAME time span (the decade
    # probe's growth mode: true containments grow ~16x) and pin the
    # sweep against the naive pair join run by DuckDB on the same frame
    src = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    reps = []
    for i in range(4):
        r = src.copy()
        r["event_id"] = r["event_id"] + i * 10**8
        reps.append(r)
    dense = pd.concat(reps, ignore_index=True)
    d = tmp_path / "sfdense"
    d.mkdir()
    dense.to_parquet(d / "events.parquet")

    from logpump_spark.queries.mining_q import _IVB_LEN_US, join_interval_bucketed

    got = join_interval_bucketed(spark, str(d)).toPandas()
    con = duckdb.connect()
    con.register("events", dense)
    want = con.execute(
        f"""
WITH purchases AS (
  SELECT event_id AS win_id, epoch_us(ts) AS lo,
         epoch_us(ts) + {_IVB_LEN_US} AS hi
  FROM events WHERE event_type = 'purchase'
),
clicks AS (
  SELECT event_id AS click_id, epoch_us(ts) AS cus
  FROM events WHERE event_type = 'click'
),
joined AS (
  SELECT c.click_id, p.win_id, c.cus
  FROM clicks c JOIN purchases p ON c.cus >= p.lo AND c.cus < p.hi
)
SELECT CAST(CAST(make_timestamp(cus) AS DATE) AS VARCHAR) AS day,
       COUNT(*) AS n_containments,
       COUNT(DISTINCT click_id) AS n_clicks_covered
FROM joined GROUP BY 1 ORDER BY 1
"""
    ).df()
    assert len(got) == len(want) and len(got) > 0
    assert (got["day"].values == want["day"].values).all()
    assert (
        got["n_containments"].astype("int64").values
        == want["n_containments"].astype("int64").values
    ).all()
    assert (
        got["n_clicks_covered"].astype("int64").values
        == want["n_clicks_covered"].astype("int64").values
    ).all()


def test_sign_bits_short_vector_matches_duckdb_under_ansi(spark):
    # vectors SHORTER than the 16-bit budget: F.get returns NULL out of
    # bounds in both ANSI modes (element_at would THROW under the
    # vanilla driver's ANSI default), and DuckDB's list index returns
    # NULL — both engines emit '0' bits for the missing dims
    from logpump_spark.llmdata.similarity import sign_bits_col

    df = spark.createDataFrame(
        [(1, [1.0, -2.0]), (2, None)], "vec_id long, embedding array<float>"
    )
    got = {
        r.vec_id: r.b
        for r in df.select(
            "vec_id", sign_bits_col("embedding", 16).alias("b")
        ).collect()
    }
    assert got[1] == "10" + "0" * 14
    assert got[2] == "0" * 16
    from logpump_spark.queries.llm_q import _sign_bits_sql

    con = duckdb.connect()
    con.register("e", pd.DataFrame({"vec_id": [1], "embedding": [[1.0, -2.0]]}))
    want = con.execute(
        f"SELECT {_sign_bits_sql('embedding', 16)} AS b FROM e"
    ).fetchone()[0]
    assert want == got[1]


def test_cap_window_skipped_when_provably_slack(spark):
    # r16: with the detector's max cell count under max_cell_size the
    # adversarial cap cannot bind, so the rank window is skipped — the
    # plan loses both per-side Window sorts and results are identical.
    pdf, df = _dense_emb(spark, n_per_label=40, n_labels=4)
    gated = embedding_neardup_pairs(
        df, threshold=0.9, subcell_target=NEARDUP_SUBCELL_TARGET
    )
    plan = gated._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" not in plan  # cap window gone
    # forced-cap arm: max_cell_size below the detector's count keeps
    # the window, and the cap then genuinely binds
    forced = embedding_neardup_pairs(
        df, threshold=0.9, subcell_target=NEARDUP_SUBCELL_TARGET,
        max_cell_size=7,
    )
    fplan = forced._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" in fplan
    # ungated twin (no detector -> window compiled, cap slack): same rows
    base = embedding_neardup_pairs(df, threshold=0.9, subcell_target=None)
    assert sorted(map(tuple, gated.collect())) == sorted(
        map(tuple, base.collect())
    )


def test_semantic_dedup_inner_cap_elided(spark):
    # r16: semantic_dedup caps cells itself before the pair scan, so
    # the operator's inner rank window is redundant — assume_capped
    # elides it; the OUTER cap window (output-set contract) remains.
    from logpump_spark.llmdata.similarity import semantic_dedup

    pdf, df = _dense_emb(spark, n_per_label=50, n_labels=3)
    out = semantic_dedup(df, threshold=0.9, n_cells=3, max_cell_size=20)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    # the outer output-cap window subtree fans out to the pair scan's
    # two sides plus the keep join; with the inner cap elided every
    # remaining rank window is an instance of that ONE outer chain —
    # they all rank by the same single window spec.  The un-elided
    # shape stacked a second rank (inner cap) on top of the outer one.
    # the per-branch chains are single-window: nowhere do two rank
    # windows stack (the old inner+outer shape printed Window above
    # Window in one branch)
    import re

    assert not re.search(
        r"Window \[row_number.*\n\s*\+- (?:Filter [^\n]*\n\s*\+- )?Window \[row_number",
        plan,
    ), "stacked rank windows — inner cap not elided"
    # capped semantics hold: no cell reports more than max_cell_size rows
    import collections

    per_cell = collections.Counter(r.cell for r in out.collect())
    assert max(per_cell.values()) <= 20
