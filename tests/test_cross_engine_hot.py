"""Cross-engine evidence for the r11 segmented operators: on a planted
hot corpus with the segmented branch ENGAGED, sessionize and
moving_rows_frame must match DuckDB's own window SQL — an independent
engine, not the plain-Spark twin the property pins use.  The driver's
parity gate never exercises the hot branch (its fixtures are uniform),
so this test is the standing oracle for the segmented code path."""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pandas as pd

from logpump_spark.operators.funnel import (
    sequence_count_adjacent,
    window_funnel_strict,
)
from logpump_spark.operators.segwin import moving_rows_frame
from logpump_spark.operators.sessionize import sessionize

T0 = dt.datetime(2024, 1, 1)


def _hot_corpus(hot_rows=30_000, n_users=120, seed=42):
    rng = random.Random(seed)
    rows, eid, t = [], 0, T0
    for _ in range(hot_rows):  # user 0: ties + exact-gap edges
        t = t + dt.timedelta(seconds=rng.choice([0, 0, 1, 59, 1800, 1801]))
        rows.append((eid, t, 0, rng.randint(-99, 99)))
        eid += 1
    for u in range(1, n_users + 1):
        t = T0
        for _ in range(rng.randint(1, 20)):
            t = t + dt.timedelta(seconds=rng.randint(1, 4000))
            rows.append((eid, t, u, rng.randint(-99, 99)))
            eid += 1
    return pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "qv"])


def test_segmented_paths_match_duckdb_on_hot_corpus(spark):
    pdf = _hot_corpus()
    df = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("ev", pdf)

    # threshold below the hot user's volume -> segmented branch engaged
    got = (
        sessionize(df, hot_key_threshold=20_000)
        .select("user_id", "event_id", "session_no")
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    want = (
        con.execute(
            """
        SELECT user_id, event_id,
          SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_no
        FROM (SELECT user_id, event_id, ts,
                CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                     THEN 1 ELSE 0 END AS is_new
              FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        """
        )
        .df()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (
        got["session_no"].astype("int64") == want["session_no"].astype("int64")
    ).all()

    got2 = (
        moving_rows_frame(df, "qv", frame_rows=7, hot_key_threshold=20_000)
        .select("user_id", "event_id", "frame_sum", "frame_n")
        .toPandas()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    want2 = (
        con.execute(
            """
        SELECT user_id, event_id, SUM(qv) OVER w AS frame_sum,
               COUNT(*) OVER w AS frame_n
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        """
        )
        .df()
        .sort_values(["user_id", "event_id"])
        .reset_index(drop=True)
    )
    assert len(got2) == len(want2)
    assert (
        got2["frame_sum"].astype("int64") == want2["frame_sum"].astype("int64")
    ).all()
    assert (
        got2["frame_n"].astype("int64") == want2["frame_n"].astype("int64")
    ).all()


def test_segmented_lead_family_matches_duckdb_on_hot_corpus(spark):
    # r12: strict funnel + sequenceCount on the segmented lead path,
    # against DuckDB's own lead() SQL — the independent-engine twin for
    # the lead-chain family (same role as the sessionize twin above)
    import numpy as np

    pdf = _hot_corpus()
    pdf["et"] = np.where(
        pdf["qv"] % 4 == 0, "a",
        np.where(pdf["qv"] % 4 == 1, "b",
                 np.where(pdf["qv"] % 4 == 2, "c", "x")),
    )
    df = spark.createDataFrame(pdf)
    con = duckdb.connect()
    con.register("ev", pdf)

    from pyspark.sql import functions as F

    steps = [F.col("et") == "a", F.col("et") == "b", F.col("et") == "c"]
    got = (
        window_funnel_strict(df, steps, hot_key_threshold=20_000)
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        con.execute(
            """
        WITH lbl AS (
          SELECT user_id, ts, event_id,
                 CASE et WHEN 'a' THEN 1 WHEN 'b' THEN 2 WHEN 'c' THEN 3
                         ELSE 0 END AS lbl
          FROM ev
        ),
        led AS (
          SELECT *, LEAD(lbl, 1) OVER w AS n1, LEAD(lbl, 2) OVER w AS n2
          FROM lbl WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        anchors AS (
          SELECT user_id, ts AS anchor_ts,
                 CASE WHEN n1 = 2 AND n2 = 3 THEN 3
                      WHEN n1 = 2 THEN 2 ELSE 1 END AS level,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM led WHERE lbl = 1
        )
        SELECT user_id, anchor_ts, CAST(level AS INT) AS level
        FROM anchors WHERE rn = 1
        """
        )
        .df()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    assert (got["user_id"].values == want["user_id"].values).all()
    assert (got["level"].values == want["level"].values).all()
    assert (
        got["anchor_ts"].values.astype("datetime64[us]")
        == want["anchor_ts"].values.astype("datetime64[us]")
    ).all()

    got2 = (
        sequence_count_adjacent(
            df, F.col("et") == "a", F.col("et") == "b", hot_key_threshold=20_000
        )
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want2 = (
        con.execute(
            """
        WITH lbl AS (
          SELECT user_id, ts, event_id,
                 CASE et WHEN 'a' THEN 1 WHEN 'b' THEN 2 ELSE 0 END AS lbl
          FROM ev
        ),
        led AS (
          SELECT *, LEAD(lbl) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
          FROM lbl
        )
        SELECT user_id,
               SUM(CASE WHEN lbl = 1 AND nxt = 2 THEN 1 ELSE 0 END) AS n_matches
        FROM led GROUP BY user_id
        """
        )
        .df()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert len(got2) == len(want2)
    assert (got2["user_id"].values == want2["user_id"].values).all()
    assert (
        got2["n_matches"].astype("int64").values
        == want2["n_matches"].astype("int64").values
    ).all()
