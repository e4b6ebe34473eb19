"""Explicit schemas — the engine never infers schema (the reference's schemas
are likewise fixed/declared everywhere: positional parse columns at
``/root/reference/pyPPI/pdbReader.py:54-58`` and DDL at
``/root/reference/pyPPI/sqls/createDB.sql``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Primary input: multi-turn conversation / agent transcripts
# (shape fixed by BASELINE.json `input_hint`).
TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

# As-of join probe side (FIXTURES.md §2).
PROBES = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("probe_ts", T.TimestampType(), False),
        T.StructField("probe_id", T.StringType(), False),
    ]
)

# Small broadcast dimension table (FIXTURES.md §3) — the analog of the
# reference's donor/acceptor matrix (/root/reference/pyPPI/DonAcc2.txt).
ANNOTATIONS = T.StructType(
    [
        T.StructField("role", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("category", T.StringType(), False),
        T.StructField("weight", T.DoubleType(), False),
    ]
)

ANNOTATION_ROWS = [
    ("user", None, "input", 1.0),
    ("assistant", None, "response", 1.5),
    ("system", None, "control", 0.25),
    ("tool", "search", "observation", 2.0),
    ("tool", "browser", "observation", 2.0),
    ("tool", "python", "action", 3.0),
    ("tool", "bash", "action", 3.0),
    ("tool", "sql", "action", 2.5),
    ("tool", None, "observation", 1.0),
]

# Checkpoint ledger (FIXTURES.md §6) — the Spark version of the reference's
# skip-if-exists stage markers (/root/reference/bin/setupPpiDb.py:76,152-154).
CHECKPOINT_LEDGER = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_out", T.LongType(), True),
        T.StructField("input_lineage", T.StringType(), True),
        T.StructField("metrics_json", T.StringType(), True),
        T.StructField("updated_at", T.TimestampType(), False),
    ]
)
