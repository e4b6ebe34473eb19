from __future__ import annotations

import datetime as dt

import pandas as pd

from pyppi_spark.plans.annotate import annotate, conv_annotation_features
from pyppi_spark.schema import TRANSCRIPTS


def t(s):
    return dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s)


def _mk(spark):
    rows = [
        ("c", 0, "user", "a", None, t(0)),          # generic user → input 1.0
        ("c", 1, "tool", "b", "python", t(1)),      # specific tool/python → action 3.0
        ("c", 2, "tool", "c", "unknown_tool", t(2)),  # falls back to generic tool → observation 1.0
        ("c", 3, "assistant", "d", "search", t(3)),  # assistant+tool: no (assistant, search) row → generic assistant
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]),
        schema=TRANSCRIPTS,
    )


def test_specific_then_generic_lookup(spark):
    out = annotate(_mk(spark)).orderBy("turn_idx").toPandas()
    assert out["category"].tolist() == ["input", "action", "observation", "response"]
    assert out["weight"].tolist() == [1.0, 3.0, 1.0, 1.5]


def test_conv_annotation_features(spark):
    out = conv_annotation_features(_mk(spark)).toPandas()
    assert out["n_turns"].tolist() == [4]
    assert out["weight_total"].tolist() == [6.5]
    r = out.iloc[0]
    assert r["n_cat_action"] == 1 and r["w_cat_action"] == 3.0
    assert r["n_cat_input"] == 1 and r["n_cat_response"] == 1
    assert r["n_cat_observation"] == 1


def test_annotation_join_is_broadcast(spark, tiny_df):
    plan = annotate(tiny_df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
