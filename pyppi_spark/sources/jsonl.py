"""Newline-delimited JSON (JSONL) document source — the de-facto ingest
format of LLM training corpora (one document object per line).

The reference's ingest surface is fixed-width positional text + a
manifest (``/root/reference/pyPPI/pdbReader.py``,
``/root/reference/bin/setupPpiDb.py:163`` file loop); a transcript/LLM
pipeline's equivalent raw feed is JSONL, so this source applies the same
contract the fixed-width reader pins: explicit schema, malformed-record
quarantine, and zero silent drops.

Scale rules encoded here:

- **Explicit schema, never inference.** ``inferSchema`` makes Spark read
  the data TWICE (one full pass just to guess types) and can guess
  differently between runs as the corpus grows — at 100 TB both are
  disqualifying. Callers pass the schema (DDL string) and the reader
  appends the corrupt-record column.
- **newline-delimited only** (``multiLine=False``): line-delimited JSON
  is splittable — every executor seeks to a line boundary and parses its
  own byte range; a multi-line JSON array is ONE unsplittable record and
  would serialize the scan.
- **PERMISSIVE + quarantine, not DROPMALFORMED.** Malformed lines land in
  ``corrupt_col`` with the payload preserved; ``split_corrupt`` returns
  (valid, quarantined) so a production run can count/inspect its bad rows
  instead of silently losing them (DROPMALFORMED hides corruption, and
  FAILFAST turns one bad scrape line into a dead 100 TB job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_jsonl_documents(
    spark: SparkSession,
    path: str,
    schema: str = "doc_id bigint, text string",
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Read newline-delimited JSON documents with an explicit ``schema``
    (DDL string) and malformed lines captured in ``corrupt_col``.

    Returns every input line as a row: parsed fields for valid lines,
    NULL fields + the raw line in ``corrupt_col`` for malformed ones.
    Compose with ``split_corrupt`` to separate the two streams."""
    full_schema = f"{schema}, {corrupt_col} string"
    return (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("multiLine", "false")
        .json(path)
    )


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: str = "doc_id bigint, text string",
    corrupt_col: str = "_corrupt_record",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured-Streaming form of ``read_jsonl_documents`` — the
    continuously-arriving corpus feed (a crawler dropping JSONL shards
    into a landing directory). Identical schema/quarantine contract to
    the batch reader (tested batch ≡ stream over the same files);
    ``max_files_per_trigger`` bounds per-microbatch input for backfill
    runs over a large landing prefix."""
    reader = (
        spark.readStream.schema(f"{schema}, {corrupt_col} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("multiLine", "false")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)


def split_corrupt(
    df: DataFrame, corrupt_col: str = "_corrupt_record", cache: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined): valid rows with the quarantine column
    dropped, and the malformed lines as (``corrupt_col``) rows for a
    bad-row ledger.

    ``cache=True`` (default) truncates lineage with a lazy
    ``localCheckpoint`` first — Spark REFUSES corrupt-column-only queries
    against a raw JSON scan
    (``UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN``; column
    pruning would make the parser skip the very parse that detects
    corruption), and both sides then read the one materialized parse.
    localCheckpoint blocks are released when the DataFrame is
    garbage-collected (ContextCleaner), unlike ``persist()`` whose cache
    entry would pin executor memory for the session lifetime unless the
    caller remembered to unpersist — this function hands out no handle,
    so it must not create unbounded-lifetime state. Pass ``cache=False``
    only if the caller persists ``df`` itself."""
    if cache and not df.isStreaming:  # streaming plans cannot checkpoint
        df = df.localCheckpoint(eager=False)
    valid = df.where(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.where(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return valid, bad
