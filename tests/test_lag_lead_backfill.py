from __future__ import annotations

import datetime as dt

import pandas as pd

from pyppi_spark.operators import bfill, ffill, with_lag_lead
from pyppi_spark.schema import TRANSCRIPTS


def t(s: float):
    return dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s)


def _mk(spark, rows):
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    return spark.createDataFrame(pdf, schema=TRANSCRIPTS)


def test_multi_offset_lag_lead(spark):
    df = _mk(
        spark,
        [
            ("c", 0, "user", "a", None, t(0)),
            ("c", 1, "assistant", "b", None, t(1)),
            ("c", 2, "tool", "c", "bash", t(2)),
            ("c", 3, "assistant", "d", None, t(3)),
        ],
    )
    out = (
        with_lag_lead(df, ["role"], offsets=(-2, -1, 1, 2))
        .orderBy("turn_idx")
        .toPandas()
    )
    assert out["prev_role"].where(out["prev_role"].notna(), None).tolist() == [None, "user", "assistant", "tool"]
    assert out["next_role"].where(out["next_role"].notna(), None).tolist() == ["assistant", "tool", "assistant", None]
    assert out["role_m2"].where(out["role_m2"].notna(), None).tolist() == [None, None, "user", "assistant"]
    assert out["role_p2"].where(out["role_p2"].notna(), None).tolist() == ["tool", "assistant", None, None]


def test_ffill_bfill_null_runs(spark):
    df = _mk(
        spark,
        [
            ("c", 0, "user", "a", None, t(0)),       # leading nulls stay null on ffill
            ("c", 1, "tool", "b", "search", t(1)),
            ("c", 2, "user", "c", None, t(2)),
            ("c", 3, "user", "d", None, t(3)),
            ("c", 4, "tool", "e", "python", t(4)),
            ("c", 5, "user", "f", None, t(5)),
        ],
    )
    out = ffill(bfill(df, ["tool"]), ["tool"]).orderBy("turn_idx").toPandas()
    ff = out["tool_ffill"].where(out["tool_ffill"].notna(), None).tolist()
    bf = out["tool_bfill"].where(out["tool_bfill"].notna(), None).tolist()
    assert ff == [None, "search", "search", "search", "python", "python"]
    assert bf == ["search", "search", "python", "python", "python", None]


def test_ffill_respects_ordering_not_physical_layout(spark):
    # rows deliberately out of order: the operator must sort by (ts, turn_idx)
    df = _mk(
        spark,
        [
            ("c", 2, "user", "c", None, t(2)),
            ("c", 0, "tool", "a", "sql", t(0)),
            ("c", 1, "user", "b", None, t(1)),
        ],
    )
    out = ffill(df, ["tool"]).orderBy("turn_idx").toPandas()
    assert out["tool_ffill"].tolist() == ["sql", "sql", "sql"]
