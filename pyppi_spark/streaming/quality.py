"""Streaming quality filter: score every micro-batch against a FROZEN
corpus LM and keep only the mid-band — the Structured-Streaming form of
the CCNet quality screen, where the LM is trained once on a clean
reference corpus (``quality_lm.unigram_counts``, persisted as parquet)
and each arriving batch is scored against it (the
``unigram_surprisal(vocab=...)`` foreign-LM path: OOV tokens take the
tf=1 max-surprisal floor, so scores are total, not partial).

The vocabulary artifact is read once per batch and BROADCAST into the
scoring join (vocab grows ~O(corpus^0.5) — Heaps' law — and the frozen
LM does not grow at all), so per-batch cost is O(batch) with no
token-keyed shuffle and no state store: unlike the streaming dedup
family there is nothing incremental to persist, which is exactly why the
frozen-LM setup is the production-stable one (a self-updating streaming
LM would make document scores depend on arrival order).

Fault tolerance: same contract as ``streaming/dedup.py`` — writes are
keyed by ``batch_id`` (one parquet subdirectory per batch), so a
``foreachBatch`` replay overwrites its own partition byte-identically
(the score is a pure function of batch content and the frozen vocab).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.quality_lm import surprisal_band_filter, unigram_surprisal


def quality_filter_batch(
    batch_df: DataFrame,
    batch_id: int,
    vocab_path: str,
    output_dir: str,
    low_bits: float,
    high_bits: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_survivors: bool = True,
) -> int | None:
    """The ``foreachBatch`` body, exposed as a plain function so it is
    testable (and reusable from a batch driver) without a streaming
    query: score the batch against the frozen vocab, keep the
    ``[low_bits, high_bits]`` mean-surprisal band, write survivors (with
    their scores, for audit) under ``batch_id=<n>``. Returns the number
    of survivors, or None with ``count_survivors=False`` — the streaming
    wiring passes False so the hot path never pays a read-back count
    job whose result nobody consumes."""
    spark = batch_df.sparkSession
    vocab = spark.read.parquet(vocab_path)
    scored = unigram_surprisal(
        batch_df, text_col=text_col, id_col=id_col, vocab=vocab, broadcast_vocab=True
    )
    kept = surprisal_band_filter(scored, low_bits, high_bits)
    out = batch_df.join(kept.select(id_col, "n_tokens", "mean_bits"), id_col)
    out_path = f"{output_dir}/batch_id={batch_id}"
    out.write.mode("overwrite").parquet(out_path)
    if not count_survivors:
        return None
    return spark.read.parquet(out_path).count()


def streaming_quality_filter(
    stream: DataFrame,
    vocab_path: str,
    output_dir: str,
    checkpoint_dir: str,
    low_bits: float,
    high_bits: float,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Wire ``quality_filter_batch`` into a streaming query (returns the
    started ``StreamingQuery``). Survivors land under
    ``output_dir/batch_id=*`` with their scores; read the filtered corpus
    back with ``spark.read.parquet(output_dir)``."""

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        quality_filter_batch(
            batch_df,
            batch_id,
            vocab_path,
            output_dir,
            low_bits,
            high_bits,
            id_col=id_col,
            text_col=text_col,
            count_survivors=False,
        )

    return (
        stream.writeStream.foreachBatch(_body)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
