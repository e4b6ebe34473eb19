"""Streaming incremental dedup: every micro-batch deduped against the
key artifacts grown by all prior batches (old text never re-read).

Covers the foreachBatch body directly (cross-batch exact + near dups,
replay idempotence) and the wired streaming query end-to-end."""
from __future__ import annotations

import os

import pytest

from pyppi_spark.streaming import incremental_dedup_batch, streaming_incremental_dedup

BASE = "the quick brown fox jumps over the lazy dog near the river bank"
NEAR = "the quick brown fox jumps over the lazy cat near the river bank"
OTHER = "completely different text about spark window functions and joins"
FRESH = "another unrelated document mentioning parquet bucketing layouts"

# generous radius so the 1-word NEAR variant is inside the Hamming ball
# while the unrelated docs stay far outside (verified by test_dedup.py's
# pigeonhole-exactness test; here we test the streaming composition)
R = 12


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _run(spark, df, batch_id, tmp):
    return incremental_dedup_batch(
        df,
        batch_id,
        artifacts_dir=f"{tmp}/artifacts",
        output_dir=f"{tmp}/kept",
        max_hamming=R,
    )


def test_incremental_dedup_batch_cross_batch(spark, tmp_path):
    tmp = str(tmp_path)
    n0 = _run(spark, _batch(spark, [(0, BASE), (1, BASE), (4, OTHER)]), 0, tmp)
    assert n0 == 2  # 1 is an exact dup of 0 within the batch

    # batch 1: 10 = exact dup of batch-0's doc 0 (content-key anti-join),
    # 11 = near dup of it (simhash vs persisted keys), 12 = fresh
    n1 = _run(spark, _batch(spark, [(10, BASE), (11, NEAR), (12, FRESH)]), 1, tmp)
    assert n1 == 1

    kept = spark.read.parquet(f"{tmp}/kept")
    assert "batch_id" in kept.columns  # partitioned corpus readback
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == [0, 4, 12]


def test_incremental_dedup_batch_replay_idempotent(spark, tmp_path):
    """foreachBatch re-executes a batch after failure: a replay must see
    exactly the pre-batch artifact state and rewrite identical output."""
    tmp = str(tmp_path)
    _run(spark, _batch(spark, [(0, BASE)]), 0, tmp)
    b1 = _batch(spark, [(10, NEAR), (12, FRESH)])
    first = _run(spark, b1, 1, tmp)
    replay = _run(spark, b1, 1, tmp)  # artifacts now contain batch 1's own
    assert first == replay == 1  # rows, which the batch_id<1 filter hides
    kept = spark.read.parquet(f"{tmp}/kept")
    assert sorted(r.doc_id for r in kept.collect()) == [0, 12]
    # key artifacts hold exactly one row set per batch (overwritten, not
    # appended): batch 1 kept 1 doc -> 1 content key in its partition
    keys = spark.read.parquet(f"{tmp}/artifacts/content_keys")
    assert keys.where("batch_id = 1").count() == 1


def test_streaming_incremental_dedup_end_to_end(spark, tmp_path):
    tmp = str(tmp_path)
    src = f"{tmp}/in"
    os.makedirs(src)
    # one file per micro-batch (maxFilesPerTrigger=1) with planted
    # cross-batch duplicates
    _batch(spark, [(0, BASE), (4, OTHER)]).coalesce(1).write.parquet(f"{src}/f0")
    _batch(spark, [(10, BASE), (11, NEAR), (12, FRESH)]).coalesce(1).write.parquet(
        f"{src}/f1"
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = streaming_incremental_dedup(
        stream,
        artifacts_dir=f"{tmp}/artifacts",
        output_dir=f"{tmp}/kept",
        checkpoint_dir=f"{tmp}/ckpt",
        max_hamming=R,
    )
    q.awaitTermination(120)
    assert not q.isActive
    kept = spark.read.parquet(f"{tmp}/kept")
    got = sorted(r.doc_id for r in kept.collect())
    # file listing order is lexicographic (f0 then f1): batch 0 keeps
    # {0,4}; batch 1 drops the exact dup 10 and the near dup 11
    assert got == [0, 4, 12]
    assert kept.select("doc_id").distinct().count() == 3
