"""Sequence packing: concatenate documents (by token count) into
fixed-length training sequences — the GPT-style packing step between
chunking/tokenization and batch assembly. Emits the ASSIGNMENT table
(which token span of which document lands at which offset of which
sequence); the downstream tokenizer materializes the actual token
arrays from it, so no token ever crosses a shuffle here.

Scale design: a single global running sum would be one task (a window
with no partition key). Instead documents are hash-sharded into
``n_groups`` independent packing groups and the prefix sum runs PER
GROUP — the classic parallel-prefix decomposition. Cost: at most one
partially-filled trailing sequence per group (waste ≤ n_groups × seq_len
tokens, negligible against a corpus), in exchange for full parallelism
and placement that is a pure function of (seed, doc_id, token counts) —
independent of physical layout and cluster size. Reference analog: the
run-partitioned layout step of ``/root/reference/bin/setupPpiDb.py``'s
staged pipeline (stage outputs packed into fixed work units).

Everything is expressible in ANSI SQL (seeded hash → window sum →
sequence-range explode), so the operator sits under a DuckDB value
oracle as the ``pack_sequences`` driver query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    n_groups: int = 64,
    seed: int = 42,
    hash_mode: str = "fast",
) -> DataFrame:
    """Assign each document's tokens to fixed-length sequences →
    one row per (document, overlapped sequence):

    - ``group_id``: the document's packing shard (seeded hash),
    - ``seq_id``: sequence index within the group,
    - ``slice_start`` / ``slice_end``: the half-open token span of THIS
      document that lands in this sequence (a document longer than the
      remaining space splits across consecutive sequences — standard
      GPT-style packing, no padding except the last sequence per group),
    - ``seq_offset``: where the span starts inside the sequence.

    Invariants (tested): every token of every document is placed exactly
    once; every (group, seq, offset) cell is covered at most once; all
    sequences except the last of each group are exactly ``seq_len``
    tokens. Documents with no tokens are dropped. Placement is a pure
    function of (seed, ids, token counts) — stable across partitioning,
    cluster size, AND corpus order.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be > 0, got {seq_len}")
    key = F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string"))
    if hash_mode == "portable":
        h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    elif hash_mode == "fast":
        h = F.xxhash64(key)
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    staged = (
        df.select(
            F.col(id_col),
            F.col(tokens_col).cast("long").alias("_nt"),
            F.pmod(h, F.lit(n_groups)).cast("int").alias("group_id"),
            h.alias("_h"),
        )
        .where(F.col("_nt") > 0)
    )
    w = (
        Window.partitionBy("group_id")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = staged.select(
        id_col,
        "group_id",
        "_nt",
        (F.sum("_nt").over(w) - F.col("_nt")).alias("_start"),
        F.sum("_nt").over(w).alias("_end"),
    )
    L = F.lit(seq_len).cast("long")
    # integer `div`, not floor(double /): a group's running token sum can
    # exceed 2^53 at the operator's target scale, where double division
    # rounds and would emit spurious/missing trailing slices (the oracle
    # uses exact integer `//`)
    s0 = F.expr(f"_start div {seq_len}")
    s1 = F.expr(f"(_end - 1) div {seq_len}")
    exploded = spans.select(
        id_col,
        "group_id",
        "_nt",
        "_start",
        F.explode(F.sequence(s0, s1)).alias("seq_id"),
    )
    seq_lo = F.col("seq_id") * L
    place_start = F.greatest(F.col("_start"), seq_lo)
    place_end = F.least(F.col("_start") + F.col("_nt"), seq_lo + L)
    return exploded.select(
        "group_id",
        F.col("seq_id").cast("long"),
        F.col(id_col),
        (place_start - F.col("_start")).alias("slice_start"),
        (place_end - F.col("_start")).alias("slice_end"),
        (place_start - seq_lo).alias("seq_offset"),
    )
