"""Streaming quality filter: micro-batches scored against a FROZEN
corpus LM (batch ≡ batch-function, gibberish dropped, replay
idempotence, wired streaming query end-to-end)."""
from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyppi_spark.operators.quality_lm import (
    surprisal_band_filter,
    unigram_counts,
    unigram_surprisal,
)
from pyppi_spark.streaming import quality_filter_batch, streaming_quality_filter

CLEAN = [
    (100 + i, f"the quick brown fox number {i % 5} jumps over the lazy dog")
    for i in range(30)
]
GOOD = "the quick brown fox jumps over the lazy dog today"
SALAD = "zzq9 xkcd7 qqfl3 wvnm1 hrtp8 llgw2 mmvv4 ppzz6 rrkk5 ttgg0"


def _mk_vocab(spark, tmp):
    ref = spark.createDataFrame(CLEAN, "doc_id long, text string")
    path = f"{tmp}/vocab"
    unigram_counts(ref).write.mode("overwrite").parquet(path)
    return ref, path


def _band(spark, ref, vocab_path, batch_rows):
    """Reference thresholds: wide enough to admit target-like text, tight
    enough to cut the OOV salad (every salad token takes the tf=1 floor)."""
    vocab = spark.read.parquet(vocab_path)
    df = spark.createDataFrame(batch_rows, "doc_id long, text string")
    scored = unigram_surprisal(df, vocab=vocab)
    return df, scored


def test_batch_function_filters_salad_keeps_fluent(spark, tmp_path):
    tmp = str(tmp_path)
    _, vocab_path = _mk_vocab(spark, tmp)
    rows = [(1, GOOD), (2, SALAD), (3, GOOD + " again")]
    df, scored = _band(spark, None, vocab_path, rows)
    by_id = {r.doc_id: r.mean_bits for r in scored.collect()}
    # the salad doc scores strictly above any fluent doc (OOV floor)
    assert by_id[2] > max(by_id[1], by_id[3])
    hi = (by_id[2] + max(by_id[1], by_id[3])) / 2
    n = quality_filter_batch(
        df, 0, vocab_path, f"{tmp}/out", low_bits=0.0, high_bits=hi
    )
    assert n == 2
    kept = spark.read.parquet(f"{tmp}/out")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]
    assert "mean_bits" in kept.columns  # scores shipped for audit
    # batch body ≡ the batch operators it composes
    want = sorted(
        r.doc_id
        for r in surprisal_band_filter(scored, 0.0, hi).collect()
    )
    assert sorted(r.doc_id for r in kept.collect()) == want


def test_replay_overwrites_identically(spark, tmp_path):
    tmp = str(tmp_path)
    _, vocab_path = _mk_vocab(spark, tmp)
    rows = [(1, GOOD), (2, SALAD)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = quality_filter_batch(df, 5, vocab_path, f"{tmp}/out", 0.0, 7.5)
    b = quality_filter_batch(df, 5, vocab_path, f"{tmp}/out", 0.0, 7.5)
    assert a == b
    kept = spark.read.parquet(f"{tmp}/out")
    assert kept.count() == a  # overwritten, not appended


def test_streaming_quality_filter_end_to_end(spark, tmp_path):
    tmp = str(tmp_path)
    _, vocab_path = _mk_vocab(spark, tmp)
    src = f"{tmp}/in"
    os.makedirs(src)
    spark.createDataFrame(
        [(1, GOOD), (2, SALAD)], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{src}/f0")
    spark.createDataFrame(
        [(3, GOOD + " again"), (4, SALAD + " more")], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{src}/f1")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = streaming_quality_filter(
        stream, vocab_path, f"{tmp}/out", f"{tmp}/ckpt",
        low_bits=0.0, high_bits=7.5,
    )
    q.awaitTermination(120)
    assert not q.isActive
    kept = spark.read.parquet(f"{tmp}/out")
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]
    assert "batch_id" in kept.columns
