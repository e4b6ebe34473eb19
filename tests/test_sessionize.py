from __future__ import annotations

import datetime as dt

import pandas as pd

from pyspark.sql import functions as F

from pyppi_spark.operators import with_session_id
from pyppi_spark.schema import TRANSCRIPTS


def _mk(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    return spark.createDataFrame(pdf, schema=TRANSCRIPTS)


def t(s: float):
    return dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s)


def test_gap_boundary_is_strictly_greater(spark):
    # gap == 1800 stays in-session; gap == 1800.001 starts a new one
    df = _mk(
        spark,
        [
            ("c", 0, "user", "a", None, t(0)),
            ("c", 1, "assistant", "b", None, t(1800)),      # gap exactly 1800 → same
            ("c", 2, "user", "c", None, t(3600.001)),       # gap 1800.001 → new
        ],
    )
    out = (
        with_session_id(df, gap_s=1800.0)
        .orderBy("turn_idx")
        .select("session_id")
        .toPandas()["session_id"]
        .tolist()
    )
    assert out == [0, 0, 1]


def test_ties_on_ts_use_turn_idx(spark):
    df = _mk(
        spark,
        [
            ("c", 1, "assistant", "b", None, t(10)),
            ("c", 0, "user", "a", None, t(10)),  # same ts, lower idx → first
            ("c", 2, "user", "c", None, t(20)),
        ],
    )
    out = with_session_id(df).orderBy("turn_idx").toPandas()
    assert out["turn_in_session"].tolist() == [1, 2, 3]
    assert out["session_id"].tolist() == [0, 0, 0]


def test_single_turn_conversation(spark):
    df = _mk(spark, [("solo", 0, "user", "hi", None, t(0))])
    out = with_session_id(df).toPandas()
    assert out["session_id"].tolist() == [0]
    assert out["turn_in_session"].tolist() == [1]


def test_cumsum_matches_session_window_builtin(spark, tiny_df):
    """Two-definition cross-check (the reference's ASA-vs-distance interface
    double-definition idea, /root/reference/pyPPI/sqls/createInterface.sql):
    cumsum session ids must induce the same grouping as Spark's built-in
    session_window (which merges windows that touch, i.e. a gap of exactly
    the threshold stays in-session — the same strictly-greater boundary as
    this engine's default)."""
    df = tiny_df
    mine = with_session_id(df, gap_s=1800.0)
    n_mine = mine.groupBy("conv_id", "session_id").count()
    builtin = df.groupBy(
        F.session_window("ts", "1800 seconds").alias("w"), F.col("conv_id")
    ).count()
    # same number of sessions per conversation
    a = n_mine.groupBy("conv_id").count().orderBy("conv_id").toPandas()
    b = builtin.groupBy("conv_id").count().orderBy("conv_id").toPandas()
    pd_a = a.set_index("conv_id")["count"]
    pd_b = b.set_index("conv_id")["count"]
    assert pd_a.equals(pd_b)
