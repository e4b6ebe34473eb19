"""Sequence packing invariants: exactly-once token placement, dense
sequences, determinism across partitioning and corpus growth shape."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pyppi_spark.operators.packing import pack_sequences


def _docs(spark, n=300, seed=3):
    rng = np.random.default_rng(seed)
    rows = [(int(i), int(t)) for i, t in enumerate(rng.integers(1, 400, size=n))]
    rows += [(10_000, 0)]  # token-less doc: must be dropped
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_pack_sequences_invariants(spark):
    L = 128
    docs = _docs(spark)
    out = pack_sequences(docs, seq_len=L, n_groups=4, seed=7).toPandas()

    # every token of every doc placed exactly once
    placed = out.groupby("doc_id").apply(
        lambda g: int((g.slice_end - g.slice_start).sum()), include_groups=False
    )
    want = {r.doc_id: r.n_tokens for r in docs.where(F.col("n_tokens") > 0).collect()}
    assert placed.to_dict() == want
    assert 10_000 not in set(out.doc_id)

    # per-doc slices are contiguous from 0..n_tokens across consecutive seqs
    for doc, g in out.groupby("doc_id"):
        g = g.sort_values("seq_id")
        assert g.slice_start.iloc[0] == 0
        assert (g.slice_start.values[1:] == g.slice_end.values[:-1]).all()
        assert (np.diff(g.seq_id.values) == 1).all()

    # sequence cells never overlap and every seq except the group's last
    # is exactly L tokens with no holes
    for (grp, seq), g in out.groupby(["group_id", "seq_id"]):
        g = g.sort_values("seq_offset")
        sizes = (g.slice_end - g.slice_start).values
        assert g.seq_offset.iloc[0] == 0
        assert (g.seq_offset.values[1:] == (g.seq_offset.values[:-1] + sizes[:-1])).all()
        total = sizes.sum()
        last_seq = out[out.group_id == grp].seq_id.max()
        assert total == L or seq == last_seq
        assert total <= L

    # determinism: physical layout must not matter
    out2 = pack_sequences(docs.repartition(13), seq_len=L, n_groups=4, seed=7).toPandas()
    key = ["group_id", "seq_id", "doc_id"]
    a = out.sort_values(key).reset_index(drop=True)
    b = out2.sort_values(key).reset_index(drop=True)
    assert a.equals(b)

    # growth stability: docs keep their placement ORDER when new docs
    # hash into other positions — at minimum, same seed + same corpus
    # slice gives identical assignment (pure function)
    out3 = pack_sequences(docs, seq_len=L, n_groups=4, seed=7).toPandas()
    assert a.equals(out3.sort_values(key).reset_index(drop=True))


def test_seq_index_arithmetic_exact_past_2p53(spark):
    """The sequence-index computation uses integer `div`, not
    floor(double /): past 2^53 double division rounds. This pins the
    expression-level claim (a cumulative corpus token offset is a long;
    documents themselves stay small, so only the offsets get huge)."""
    # doubles at 2^53 are spaced by 2: 2^53+127 rounds UP to 2^53+128,
    # crossing a 128-token sequence boundary the exact path does not
    x = (1 << 53) + 127
    row = spark.sql(
        f"SELECT {x}L div 128 AS exact, floor({x}L / 128) AS via_double"
    ).collect()[0]
    assert row.exact == x // 128 == (1 << 46)
    assert row.via_double == (1 << 46) + 1  # the rounded double's sequence
    assert row.exact != row.via_double
