"""Forward-fill / back-fill over ordered conversations — the analog of the
reference's "last preceding valid row" anchor
(``/root/reference/pyPPI/ASA.py:166-176``: the last atom before a missing
run anchors recomputation).

Pure window formulation: ``last(col, ignorenulls=True)`` over an unbounded
preceding frame (and the ``first`` mirror for bfill). No Python, one shuffle
per (key, ordering), shared across multiple filled columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from .sessionize import _keys


def ffill(
    df: DataFrame,
    cols: Sequence[str],
    conv_col="conv_id",
    ts_col: str = "ts",
    idx_col: str = "turn_idx",
    suffix: str = "_ffill",
) -> DataFrame:
    w = (
        Window.partitionBy(*_keys(conv_col))
        .orderBy(ts_col, idx_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(f"{c}{suffix}", F.last(c, ignorenulls=True).over(w))
    return out


def bfill(
    df: DataFrame,
    cols: Sequence[str],
    conv_col="conv_id",
    ts_col: str = "ts",
    idx_col: str = "turn_idx",
    suffix: str = "_bfill",
) -> DataFrame:
    w = (
        Window.partitionBy(*_keys(conv_col))
        .orderBy(ts_col, idx_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    out = df
    for c in cols:
        out = out.withColumn(f"{c}{suffix}", F.first(c, ignorenulls=True).over(w))
    return out
