"""Point-in-time (PIT) feature snapshots — the training-data core use case:
"the feature vector of this conversation exactly as it looked at time T",
with zero temporal leakage.

Composition: cumulative per-turn state via windows (one shuffle on
``conv_id``), then the engine's as-of join delivers the state at-or-before
each probe timestamp. This is the reference's
nearest-neighbor-feature-readback pattern (probe atoms against the other
side's kd-tree, ``/root/reference/bin/setupPpiDb.py:134-143``) transplanted
to the time axis.

Leakage contract: every feature at ``probe_ts`` is computed only from turns
with ``ts <= probe_ts`` (inclusive as-of); probes before a conversation's
first turn yield all-null features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.time import epoch_micros, epoch_seconds
from ..operators.asof import asof_join
from ..operators.sessionize import DEFAULT_GAP_S, with_session_id

PIT_STATE_COLS = [
    "ts",
    "n_turns_so_far",
    "n_sessions_so_far",
    "gap_mean_so_far_s",
    "gap_max_so_far_s",
    "last_role",
    "last_tool",
]


def cumulative_state(transcripts: DataFrame, gap_s: float = DEFAULT_GAP_S) -> DataFrame:
    """Per-turn running feature state (all windows share one partitioning)."""
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t = epoch_micros("ts")
    df = with_session_id(transcripts, gap_s=gap_s)
    # gaps accumulate as exact int64 µs (associativity-free); divide by 1e6
    # once at the end → means bitwise-stable across engines/parallelism
    gap = t - F.lag(t).over(w)
    return (
        df.withColumn("_gap", gap)
        .select(
            "conv_id",
            "turn_idx",
            "ts",
            F.row_number().over(w).cast("long").alias("n_turns_so_far"),
            (F.col("session_id") + 1).cast("long").alias("n_sessions_so_far"),
            (F.sum("_gap").over(cum) / F.lit(1e6) / F.count("_gap").over(cum)).alias("gap_mean_so_far_s"),
            (F.max("_gap").over(cum) / F.lit(1e6)).alias("gap_max_so_far_s"),
            F.col("role").alias("last_role"),
            F.last("tool", ignorenulls=True).over(cum).alias("last_tool"),
        )
    )


def pit_features(
    probes: DataFrame,
    transcripts: DataFrame,
    gap_s: float = DEFAULT_GAP_S,
    strategy: str = "union",
) -> DataFrame:
    """Per-probe PIT feature vector: the cumulative state at-or-before
    ``probe_ts`` plus staleness (``time_since_last_turn_s``)."""
    state = cumulative_state(transcripts, gap_s=gap_s)
    out = asof_join(
        probes,
        state,
        probe_ts="probe_ts",
        build_ts="ts",
        by=("conv_id",),
        payload=PIT_STATE_COLS,
        inclusive=True,
        tiebreak="turn_idx",
        prefix="",
        strategy=strategy,
    )
    return out.withColumn(
        "time_since_last_turn_s",
        epoch_seconds("probe_ts") - epoch_seconds("ts"),
    )
