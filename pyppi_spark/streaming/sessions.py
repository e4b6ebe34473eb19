"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.10 — no streaming construct
exists in it), so this module is intentionally thin: the one semantic the
engine owes a streaming form is gap-based sessionization, which Spark
expresses natively as ``session_window`` + watermark. The batch cumsum
formulation (``operators.sessionize``) remains the engine's primary path;
tests assert the two agree on the same data (the engine's standing
two-definition cross-check).

Late data: rows older than the watermark are dropped by Spark; the
watermark must exceed the session gap or sessions can close early.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.sessionize import DEFAULT_GAP_S


def streaming_session_aggregates(
    stream: DataFrame,
    gap_s: float = DEFAULT_GAP_S,
    watermark: str = "2 hours",
    conv_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(conv, session) aggregates over a streaming DataFrame using the
    built-in session window (merge-on-touch: a gap of exactly ``gap_s``
    stays in-session, matching the batch operator's strictly-greater
    boundary)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), f"{gap_s} seconds").alias("w"),
            F.col(conv_col),
        )
        .agg(
            F.count(F.lit(1)).alias("session_len"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
        .select(conv_col, "session_start", "session_end", "session_len")
    )


def streaming_turn_counts(
    stream: DataFrame,
    watermark: str = "2 hours",
    window: str = "10 minutes",
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    role_col: str = "role",
) -> DataFrame:
    """Tumbling-window per-role turn counts (the streaming form of the
    per-conv role-count aggregates)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(conv_col), F.col(role_col))
        .count()
        .select(
            conv_col,
            F.col("w.start").alias("window_start"),
            role_col,
            F.col("count").alias("n_turns"),
        )
    )
