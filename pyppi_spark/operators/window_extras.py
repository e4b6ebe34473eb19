"""Remaining window-operator analogs from SURVEY.md §2.5/§2.4.

- ``with_table_driven_offsets`` (W2): the reference looks up lag/lead
  offsets from a dimension table (donor hydrogens at declared forward
  offsets, acceptor neighbors at negative ones —
  ``/root/reference/pyPPI/donorAcceptor.py:71-89`` driven by
  ``/root/reference/pyPPI/DonAcc2.txt``). Here: a per-role offset spec
  decides which neighboring turn each row reads. Implemented by computing
  lag/lead once per distinct offset (shared window) and selecting per row
  with a broadcast-map lookup — no per-row Python, no extra shuffles.

- ``bounded_lookahead`` (W3): first non-null value within the next K rows
  of the SAME session (the reference's forward scan that stops at the run
  boundary, ``/root/reference/pyPPI/donorAcceptor.py:75-82``).

- ``with_group_normalized`` (W7/A9): value / max(value) over the entity —
  the reference's periphery normalization
  (``/root/reference/pyPPI/surfaceComplementarity/interfaceDepth.py:57-66``).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window, functions as F

from .sessionize import _keys


def with_table_driven_offsets(
    df: DataFrame,
    offset_spec: Mapping[str, int],
    value_col: str = "role",
    out_col: str = "offset_value",
    spec_key_col: str = "role",
    conv_col="conv_id",
    ts_col: str = "ts",
    idx_col: str = "turn_idx",
) -> DataFrame:
    """``offset_spec``: key (e.g. role) → signed row offset. Each row reads
    ``value_col`` from the row at its key's offset; keys absent from the
    spec yield null."""
    w = Window.partitionBy(*_keys(conv_col)).orderBy(ts_col, idx_col)
    offsets = sorted(set(offset_spec.values()))
    shifted: dict[int, Column] = {}
    for k in offsets:
        if k == 0:
            shifted[k] = F.col(value_col)
        elif k < 0:
            shifted[k] = F.lag(value_col, -k).over(w)
        else:
            shifted[k] = F.lead(value_col, k).over(w)
    spec_map = F.create_map(
        *[x for key, off in sorted(offset_spec.items()) for x in (F.lit(key), F.lit(off))]
    )
    row_offset = F.element_at(spec_map, F.col(spec_key_col))
    expr = F.lit(None).cast(df.schema[value_col].dataType)
    for k in offsets:
        expr = F.when(row_offset == k, shifted[k]).otherwise(expr)
    return df.withColumn(out_col, expr)


def bounded_lookahead(
    df: DataFrame,
    value_col: str = "tool",
    k: int = 3,
    session_col: str = "session_id",
    out_col: str | None = None,
    conv_col="conv_id",
    ts_col: str = "ts",
    idx_col: str = "turn_idx",
) -> DataFrame:
    """First non-null ``value_col`` within the next ``k`` rows of the same
    session (frame ``rowsBetween(1, k)`` + session-equality guard via a
    session-partitioned window)."""
    out_col = out_col or f"{value_col}_next{k}_in_session"
    w = (
        Window.partitionBy(*_keys(conv_col), session_col)
        .orderBy(ts_col, idx_col)
        .rowsBetween(1, k)
    )
    return df.withColumn(out_col, F.first(value_col, ignorenulls=True).over(w))


def with_group_normalized(
    df: DataFrame,
    value_col: str,
    out_col: str | None = None,
    conv_col="conv_id",
) -> DataFrame:
    """value / max(value) over the whole entity partition (frame = entire
    partition); null-safe (null max → null ratio)."""
    out_col = out_col or f"{value_col}_norm"
    w = Window.partitionBy(*_keys(conv_col)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    mx = F.max(value_col).over(w)
    return df.withColumn(
        out_col, F.when(mx > 0, F.col(value_col) / mx).otherwise(F.lit(None))
    )
