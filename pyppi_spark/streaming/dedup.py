"""Streaming incremental near-dedup: every micro-batch is a corpus
increment deduped against persisted key artifacts that the stream itself
grows — the Structured-Streaming composition of the batch incremental
family (``exact_dedup_incremental`` + ``simhash_near_dup_incremental``).

Why the SimHash family: its verify step is pure bit arithmetic on the
persisted 8-byte ``(id, simhash_hi, simhash_lo)`` keys, so a micro-batch
never reads frozen-corpus text at all — per-batch cost is
O(batch + |keys| band rows), the only incremental family cheap enough to
sit inside a streaming trigger. (MinHash's Jaccard verify would re-open
old documents every batch; MOSS's fingerprint table works too but is
~50× larger per doc than a SimHash key.)

Fault-tolerance contract: ``foreachBatch`` re-executes a batch after a
failure, so every write is keyed by ``batch_id`` (one parquet
subdirectory per batch) and the artifact read for batch N filters to
``batch_id < N`` — a replay overwrites its own partition and sees
exactly the pre-batch state, making the sink effectively-once without a
transactional table format. The reference's staged-readback pattern
(/root/reference/bin/setupPpiDb.py:234-249) is the batch ancestor of
this artifact layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.dedup import (
    content_keys,
    exact_dedup_incremental,
    simhash_keys,
    simhash_near_dup_incremental,
)

_KEYS_SCHEMA = "_k long, _kl int, batch_id long"
_SIMHASH_SCHEMA_FMT = "{id_schema}, simhash_hi long, simhash_lo long, batch_id long"


def _read_partitioned(spark, path: str, schema: str, before_batch: int) -> DataFrame:
    """All artifact rows written by batches STRICTLY BEFORE ``before_batch``
    (replay isolation); empty frame with the right schema if the artifact
    does not exist yet (first batch). Existence is probed through the
    Hadoop FileSystem API (works on hdfs://s3a:// too) rather than
    catching AnalysisException, so real read errors still surface."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return spark.createDataFrame([], schema)
    df = spark.read.schema(schema).parquet(path)
    return df.where(F.col("batch_id") < before_batch)


def incremental_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    artifacts_dir: str,
    output_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    hash_mode: str = "fast",
    max_bucket_size: int | None = 10_000,
) -> int:
    """The ``foreachBatch`` body, exposed as a plain function so it is
    testable (and reusable from a batch driver) without a streaming query:
    exact-dedup the batch against all prior batches' content keys, then
    SimHash near-dedup against all prior batches' simhash keys (old text
    never read), write survivors + this batch's key rows under
    ``batch_id=<n>`` subdirectories. Returns the number of survivors.

    Deterministic given (batch content, batch_id, prior artifacts) — a
    replayed batch rewrites byte-identical outputs over its own
    partition."""
    spark = batch_df.sparkSession
    id_schema = f"{id_col} {batch_df.schema[id_col].dataType.simpleString()}"
    keys = _read_partitioned(
        spark, f"{artifacts_dir}/content_keys", _KEYS_SCHEMA, batch_id
    ).select("_k", "_kl")
    skeys = _read_partitioned(
        spark,
        f"{artifacts_dir}/simhash_keys",
        _SIMHASH_SCHEMA_FMT.format(id_schema=id_schema),
        batch_id,
    ).select(id_col, "simhash_hi", "simhash_lo")

    step1 = exact_dedup_incremental(
        batch_df, keys, text_col=text_col, id_col=id_col
    )
    kept = simhash_near_dup_incremental(
        step1,
        old_keys=skeys,
        text_col=text_col,
        id_col=id_col,
        max_hamming=max_hamming,
        hash_mode=hash_mode,
        max_bucket_size=max_bucket_size,
    )
    # one shuffle-free local checkpoint boundary per batch would be nice,
    # but the three writes below share scan+dedup work via parquet
    # materialization instead: survivors are written first, then re-read
    # so the key derivations scan the (small) materialized output, not
    # the full dedup lineage twice.
    out_path = f"{output_dir}/batch_id={batch_id}"
    kept.write.mode("overwrite").parquet(out_path)
    kept_mat = spark.read.parquet(out_path)
    content_keys(kept_mat, text_col=text_col).write.mode("overwrite").parquet(
        f"{artifacts_dir}/content_keys/batch_id={batch_id}"
    )
    simhash_keys(
        kept_mat, text_col=text_col, id_col=id_col, hash_mode=hash_mode
    ).write.mode("overwrite").parquet(
        f"{artifacts_dir}/simhash_keys/batch_id={batch_id}"
    )
    return kept_mat.count()


def streaming_incremental_dedup(
    stream: DataFrame,
    artifacts_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    hash_mode: str = "fast",
    max_bucket_size: int | None = 10_000,
):
    """Wire ``incremental_dedup_batch`` into a streaming query (returns
    the started ``StreamingQuery``; caller controls the trigger via the
    source options / ``availableNow`` semantics of the input stream).
    Survivors land under ``output_dir/batch_id=*``; read the deduped
    corpus back with ``spark.read.parquet(output_dir)``."""

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        incremental_dedup_batch(
            batch_df,
            batch_id,
            artifacts_dir,
            output_dir,
            id_col=id_col,
            text_col=text_col,
            max_hamming=max_hamming,
            hash_mode=hash_mode,
            max_bucket_size=max_bucket_size,
        )

    return (
        stream.writeStream.foreachBatch(_body)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
