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


def session_window_aggregates(
    df: DataFrame,
    gap_s: float = DEFAULT_GAP_S,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(conv, session) aggregates via the built-in ``session_window`` —
    works on BATCH and streaming DataFrames alike (merge-on-touch: a gap of
    exactly ``gap_s`` stays in-session, matching the cumsum operator's
    strictly-greater boundary; the agreement of the two sessionization
    definitions is under the driver's oracle gate via the
    ``session_window_agg`` query). One shuffle on ``conv_col``; the
    session merge happens inside the aggregation, no window-function
    pass."""
    return (
        df.groupBy(
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


def streaming_session_aggregates(
    stream: DataFrame,
    gap_s: float = DEFAULT_GAP_S,
    watermark: str = "2 hours",
    conv_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming form of ``session_window_aggregates`` (adds the watermark
    that bounds session state and drops late rows)."""
    return session_window_aggregates(
        stream.withWatermark(ts_col, watermark), gap_s=gap_s,
        conv_col=conv_col, ts_col=ts_col,
    )


def running_state_batch(
    df: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    role_col: str = "role",
    idx_col: str = "turn_idx",
) -> DataFrame:
    """Batch form of ``streaming_running_state``: one row per TURN carrying
    the running per-conversation state after that turn (the stateful
    operator's snapshot stream when fed one-turn micro-batches in event
    order). Pure cumulative windows over one exchange — fully relational,
    so the batch≡stateful semantics sit under the driver's DuckDB oracle
    gate (query ``running_state``), not just pytest.

    Exactness contract shared with the stateful path: gaps accumulate as
    int64 µs and are divided once at the end, so the two forms agree
    bitwise (asserted in tests/test_streaming.py)."""
    from pyspark.sql import Window

    from ..functions.time import epoch_micros

    w = Window.partitionBy(conv_col).orderBy(ts_col, idx_col)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t = epoch_micros(ts_col)
    gap = t - F.lag(t).over(w)
    n_gaps = F.count("_gap").over(cum)
    return df.withColumn("_gap", gap).select(
        F.col(conv_col),
        F.col(idx_col),
        F.row_number().over(w).cast("long").alias("n_turns"),
        # exact int64-µs currency first (cross-engine hash-stable; a
        # 6dp-rounded mean of µs values lands on half-way boundaries),
        # derived seconds alongside for callers
        F.coalesce(F.sum("_gap").over(cum), F.lit(0)).cast("long").alias("gap_sum_us"),
        F.coalesce(F.max("_gap").over(cum), F.lit(0)).cast("long").alias("gap_max_us"),
        F.when(n_gaps > 0, F.sum("_gap").over(cum) / F.lit(1e6) / n_gaps).alias(
            "gap_mean_s"
        ),
        F.when(n_gaps > 0, F.max("_gap").over(cum) / F.lit(1e6)).alias("gap_max_s"),
        F.col(role_col).alias("last_role"),
        t.alias("last_ts_us"),
    )


RUNNING_STATE_OUTPUT = (
    "conv_id string, n_turns long, gap_mean_s double, gap_max_s double, "
    "last_role string, last_ts_us long"
)
RUNNING_STATE_STATE = "n_turns long, last_ts_us long, gap_sum_us long, gap_max_us long, last_role string"


def streaming_running_state(
    stream: DataFrame,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    role_col: str = "role",
    idx_col: str = "turn_idx",
) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``): per-conversation
    RUNNING feature state — turn count, exact int64-µs gap accumulation
    (same currency as the batch ``plans/pit.cumulative_state``), last role —
    emitting one snapshot row per conversation per micro-batch.

    This is the streaming form of the PIT cumulative state: state is a flat
    tuple (algebraic — merging batches is exact), rows within a micro-batch
    are sorted by event time before folding, and cross-batch ordering is
    arrival order (the standard structured-streaming contract for custom
    state; a production deployment feeds this from a log already partitioned
    and ordered per conversation, e.g. Kafka keyed by conv_id).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        n_turns, last_ts_us, gap_sum_us, gap_max_us, last_role = (
            state.get if state.exists else (0, None, 0, 0, None)
        )
        for pdf in pdfs:
            if not len(pdf):
                continue
            # total order (ts, turn_idx) within the batch — the repo-wide
            # tie rule; across batches ordering is arrival order (the
            # structured-streaming custom-state contract)
            pdf = pdf.sort_values([ts_col, idx_col], kind="mergesort")
            ts_us = (pdf[ts_col].astype("int64") // 1000).tolist()
            roles = pdf[role_col].tolist()
            for t, r in zip(ts_us, roles):
                if last_ts_us is not None:
                    gap = t - last_ts_us
                    gap_sum_us += gap
                    gap_max_us = max(gap_max_us, gap)
                last_ts_us = t
                last_role = r
                n_turns += 1
        state.update((n_turns, last_ts_us, gap_sum_us, gap_max_us, last_role))
        n_gaps = n_turns - 1
        yield pd.DataFrame(
            [
                {
                    "conv_id": key[0],
                    "n_turns": n_turns,
                    "gap_mean_s": (gap_sum_us / 1e6 / n_gaps) if n_gaps > 0 else None,
                    "gap_max_s": (gap_max_us / 1e6) if n_gaps > 0 else None,
                    "last_role": last_role,
                    "last_ts_us": last_ts_us,
                }
            ]
        )

    return (
        stream.select(conv_col, ts_col, role_col, idx_col)
        .groupBy(conv_col)
        .applyInPandasWithState(
            fold,
            outputStructType=RUNNING_STATE_OUTPUT,
            stateStructType=RUNNING_STATE_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
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


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming form of ``operators.dedup.exact_dedup``: drop rows whose
    normalized-content key was already seen within the watermark horizon
    (``dropDuplicatesWithinWatermark`` — state is bounded by the watermark,
    the streaming analog of the batch operator's keep-first rule; across
    horizons a batch exact_dedup pass remains the ground truth).

    Same (hash, length) composite key as the batch operator, so the two
    definitions agree on what "identical" means."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    keyed = stream.withColumn("_k", F.xxhash64(norm)).withColumn(
        "_kl", F.length(norm)
    )
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_k", "_kl"])
        .drop("_k", "_kl")
    )
