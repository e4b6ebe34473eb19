"""Gap-based sessionization — the transcript analog of the reference's
contiguous residue runs (``/root/reference/pyPPI/resReduce.py:97-106``:
a new run starts whenever the run key changes; here a new session starts
whenever the inter-turn gap exceeds a threshold).

Formulation: window cumulative sum over change flags — one shuffle on the
entity key, no Python. ``session_window`` (Spark ≥3.2) is used as an
independent cross-check in tests only; the cumsum form is the engine's
because it yields a stable per-conversation ordinal usable as a join key.

Semantics (pinned; the reference's squared-vs-unsquared cutoff confusion at
``/root/reference/pyPPI/pdbReader.py:15`` vs ``bin/setupPpiDb.py:37`` is the
cautionary tale): a turn starts a NEW session iff ``ts - prev_ts > gap_s``
(strictly greater — a gap of exactly ``gap_s`` stays in-session). Units are
seconds on both sides. ``session_id`` is 0-based per conversation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.time import epoch_seconds

DEFAULT_GAP_S = 1800.0


def _keys(conv_col) -> list:
    """Accept a single key or a composite (e.g. ["_bkt", "conv_id"] for the
    balanced-bucket layout — the bucket id is a pure function of conv_id, so
    prepending it never changes semantics, only physical distribution)."""
    return [conv_col] if isinstance(conv_col, str) else list(conv_col)


def _order_window(conv_col, ts_col: str, idx_col: str):
    return Window.partitionBy(*_keys(conv_col)).orderBy(ts_col, idx_col)


def new_session_flag(
    ts_col: str = "ts",
    gap_s: float = DEFAULT_GAP_S,
    w=None,
) -> Column:
    prev = F.lag(F.col(ts_col)).over(w)
    gap = epoch_seconds(F.col(ts_col)) - epoch_seconds(prev)
    return F.when(prev.isNull() | (gap > F.lit(float(gap_s))), F.lit(1)).otherwise(F.lit(0))


def with_session_id(
    df: DataFrame,
    gap_s: float = DEFAULT_GAP_S,
    conv_col="conv_id",
    ts_col: str = "ts",
    idx_col: str = "turn_idx",
    out_col: str = "session_id",
) -> DataFrame:
    """Add 0-based ``session_id`` and 1-based ``turn_in_session``.

    Everything shares ONE window partitioning and ordering (= one shuffle,
    one sort): ``turn_in_session`` is derived as ``row_number - anchor + 1``
    where ``anchor`` is the row_number of the session's first row
    (``last(when(flag,rn)) ignoreNulls`` over the cumulative frame), instead
    of a second window keyed on (conv, session_id) that would force another
    sort."""
    w = _order_window(conv_col, ts_col, idx_col)
    flag = new_session_flag(ts_col, gap_s, w)
    cum = Window.partitionBy(*_keys(conv_col)).orderBy(ts_col, idx_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    rn = F.row_number().over(w)
    df = (
        df.withColumn("_rn", rn)
        .withColumn("_flag", flag)
        .withColumn(out_col, (F.sum("_flag").over(cum) - F.lit(1)).cast("long"))
        .withColumn(
            "turn_in_session",
            (
                F.col("_rn")
                - F.last(F.when(F.col("_flag") == 1, F.col("_rn")), ignorenulls=True).over(cum)
                + 1
            ).cast("long"),
        )
        .drop("_rn", "_flag")
    )
    return df


def session_bounds(
    df_with_sessions: DataFrame,
    conv_col="conv_id",
    ts_col: str = "ts",
    session_col: str = "session_id",
) -> DataFrame:
    """Per-session summary rows (start/end/length) — partial-agg friendly."""
    return df_with_sessions.groupBy(*_keys(conv_col), session_col).agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("session_len"),
    )
