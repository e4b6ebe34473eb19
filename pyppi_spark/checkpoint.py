"""Per-partition checkpoint ledger — the engine's resumable-execution
substrate (FIXTURES.md §6).

The reference resumes by skipping stages whose output file already exists
(``/root/reference/bin/setupPpiDb.py:76,152-154,255-257,289-291`` — a
whole-stage, all-or-nothing marker). At 100 TB a stage is thousands of
partitions, so the ledger tracks *partition ranges* (hash buckets of the
entity key): a run that dies mid-stage resumes by anti-joining completed
buckets and recomputing only the rest.

Protocol (exactly-once per bucket):
1. plan: enumerate buckets = ``xxhash64(conv_id) pmod n_buckets``.
2. for each pending bucket: compute → write output partition
   (``partitionBy(bucket)``, dynamic overwrite = idempotent on retry)
   → append ``done`` ledger row (write-then-commit ordering: the ledger row
   is written only after the data lands, so a crash between the two leaves
   the bucket pending and it is safely overwritten on resume).
3. resume: pending = all buckets − ledger ``done`` buckets for (run_id,
   input_lineage).

Lineage = hash of (input snapshot fingerprint, code version, params): a
changed input or operator invalidates prior progress automatically.

Storage is a parquet directory (an Iceberg catalog is not available in this
sandbox; the layout — append-only status rows, latest-wins — is the same
pattern an Iceberg table would give with ACID appends).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .schema import CHECKPOINT_LEDGER

LEDGER_SCHEMA = CHECKPOINT_LEDGER


def bucket_of(conv_col: str, n_buckets: int):
    return F.pmod(F.xxhash64(F.col(conv_col)), F.lit(n_buckets)).cast("int")


def lineage_id(input_fingerprint: str, code_version: str, params: dict) -> str:
    import hashlib

    payload = json.dumps(
        {"input": input_fingerprint, "code": code_version, "params": params},
        sort_keys=True,
    )
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


class CheckpointLedger:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _read(self) -> DataFrame:
        if not os.path.exists(self.path):
            return self.spark.createDataFrame([], schema=LEDGER_SCHEMA)
        return self.spark.read.schema(LEDGER_SCHEMA).parquet(self.path)

    def done_buckets(self, run_id: str, lineage: str) -> set[int]:
        rows = (
            self._read()
            .where((F.col("run_id") == run_id) & (F.col("input_lineage") == lineage))
            .where(F.col("status") == "done")
            .select("partition_key")
            .collect()
        )
        return {int(r.partition_key) for r in rows}

    def mark(
        self,
        run_id: str,
        bucket: int,
        status: str,
        lineage: str,
        rows_in: int | None = None,
        rows_out: int | None = None,
        metrics: dict | None = None,
    ) -> None:
        import datetime as dt

        row = [
            (
                run_id,
                str(bucket),
                status,
                rows_in,
                rows_out,
                lineage,
                json.dumps(metrics or {}),
                dt.datetime.utcnow(),
            )
        ]
        self.spark.createDataFrame(row, schema=LEDGER_SCHEMA).write.mode("append").parquet(
            self.path
        )


def run_with_checkpoints(
    spark: SparkSession,
    inputs: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    output_path: str,
    ledger_path: str,
    run_id: str,
    lineage: str,
    conv_col: str = "conv_id",
    n_buckets: int = 8,
    fail_after: int | None = None,
) -> int:
    """Execute ``transform`` bucket-by-bucket with resume.

    Buckets are processed independently; output partitions are written with
    dynamic partition overwrite so a retried bucket is idempotent. Returns
    the number of buckets computed in this invocation (0 on a fully-resumed
    run). ``fail_after`` kills the run after N buckets (for resume tests —
    the mid-run-kill scenario from SURVEY.md §5.3 item 4).

    Scale note: one Spark job per bucket is deliberate — each job is a
    narrow scan (bucket pruning by hash predicate pushes to the parquet/
    Iceberg scan when the table is bucket-partitioned) and the ledger write
    is tiny; at 1000 executors, buckets are sized so each job still fills
    the cluster (n_buckets ≈ total_size / (executors × task_target)).
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    ledger = CheckpointLedger(spark, ledger_path)
    done = ledger.done_buckets(run_id, lineage)
    computed = 0
    with_bucket = inputs.withColumn("_bucket", bucket_of(conv_col, n_buckets))
    for b in range(n_buckets):
        if b in done:
            continue
        if fail_after is not None and computed >= fail_after:
            raise RuntimeError(f"simulated failure after {computed} buckets")
        t0 = time.perf_counter()
        part = with_bucket.where(F.col("_bucket") == b).drop("_bucket")
        out = transform(part).withColumn("_bucket", F.lit(b))
        out.write.mode("overwrite").partitionBy("_bucket").option(
            "partitionOverwriteMode", "dynamic"
        ).parquet(output_path)
        n_out = spark.read.parquet(output_path).where(F.col("_bucket") == b).count()
        ledger.mark(
            run_id,
            b,
            "done",
            lineage,
            rows_out=n_out,
            metrics={"wall_s": round(time.perf_counter() - t0, 3)},
        )
        computed += 1
    return computed
