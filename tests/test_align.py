"""Alignment kernel vs an independent quadratic Needleman-Wunsch reference
(J11/W8 analog — SURVEY §2.3/§2.5)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from pyppi_spark.operators.align import align_conversations, _nw_align


def t(s: float):
    return dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s)


def naive_nw(lt, rt, lr, rr, match=2.0, sub_role=0.0, mismatch=-1.0, gap=-1.0):
    """Plain-loop DP — independent of the vectorized prefix-max kernel."""
    n, m = len(lt), len(rt)
    H = [[0.0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        H[i][0] = i * gap
    for j in range(m + 1):
        H[0][j] = j * gap
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            s = match if lt[i - 1] == rt[j - 1] else (sub_role if lr[i - 1] == rr[j - 1] else mismatch)
            H[i][j] = max(H[i - 1][j - 1] + s, H[i - 1][j] + gap, H[i][j - 1] + gap)
    return H[n][m]


@pytest.mark.parametrize(
    "lt,rt",
    [
        (["a b", "c d", "e f", "g h"], ["a b", "c X", "g h"]),       # sub + del
        (["a", "b", "c"], ["z", "a", "b", "c"]),                      # ins at front
        (["a", "a", "b"], ["a", "b"]),                                # dup ambiguity
        ([], ["a", "b"]),                                             # empty left
        (["a", "b"], []),                                             # empty right
        (["x"] * 7, ["x"] * 3),                                       # heavy dups
    ],
)
def test_kernel_total_matches_naive(lt, rt):
    lr = ["user"] * len(lt)
    rr = ["user"] * len(rt)
    ops, total = _nw_align(lt, rt, lr, rr, 2.0, 0.0, -1.0, -1.0)
    assert total == naive_nw(lt, rt, lr, rr)
    assert sum(p for _, _, _, p in ops) == total
    # every left and right position consumed exactly once, in order
    ls = [a for a, _, _, _ in ops if a is not None]
    rs = [b for _, b, _, _ in ops if b is not None]
    assert ls == list(range(len(lt))) and rs == list(range(len(rt)))


def test_align_conversations_end_to_end(spark):
    cols = ["conv_id", "turn_idx", "role", "text", "ts"]
    left = spark.createDataFrame(
        pd.DataFrame(
            [
                ("c1", 0, "user", "hello there", t(0)),
                ("c1", 1, "assistant", "hi", t(1)),
                ("c1", 2, "user", "bye", t(2)),
                ("c2", 0, "user", "solo", t(0)),
            ],
            columns=cols,
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            [
                ("c1", 10, "user", "hello there", t(0)),     # match
                ("c1", 11, "assistant", "hi EDITED", t(1)),  # sub (same role)
                ("c1", 12, "user", "bye", t(2)),             # match
                ("c1", 13, "tool", "injected", t(3)),        # ins (right-only)
            ],
            columns=cols,
        )
    )
    out = align_conversations(left, right).toPandas()
    c1 = out[out.conv_id == "c1"].sort_values(["left_idx", "right_idx"], na_position="last")
    by_op = c1.groupby("op").size().to_dict()
    assert by_op == {"match": 2, "sub": 1, "ins": 1}
    assert c1.total_score.iloc[0] == 2.0 + 0.0 + 2.0 - 1.0
    assert c1[c1.op == "ins"].right_idx.iloc[0] == 13
    # conversation only on the left side: all deletions
    c2 = out[out.conv_id == "c2"]
    assert set(c2.op) == {"del"} and len(c2) == 1


def test_subsequence_right_gives_only_matches_and_dels(spark):
    cols = ["conv_id", "turn_idx", "role", "text", "ts"]
    rows = [("c", i, "user", f"turn {i}", t(i)) for i in range(20)]
    left = spark.createDataFrame(pd.DataFrame(rows, columns=cols))
    right = spark.createDataFrame(
        pd.DataFrame([r for r in rows if r[1] % 5 != 0], columns=cols)
    )
    out = align_conversations(left, right).toPandas()
    assert (out[out.op == "match"].left_idx % 5 != 0).all()
    assert sorted(out[out.op == "del"].left_idx) == [0, 5, 10, 15]
    assert out.total_score.iloc[0] == 2.0 * 16 - 4


def test_kernel_property_random_sequences():
    """Property: vectorized prefix-max DP total == naive quadratic DP on
    random sequences with dup-heavy small alphabets (worst case for tie
    handling), and traceback ops always reconstruct the total."""
    from hypothesis import given, settings, strategies as st

    token = st.sampled_from(["a", "b", "c", "aa"])
    role = st.sampled_from(["user", "assistant"])
    seqs = st.tuples(
        st.lists(st.tuples(token, role), max_size=12),
        st.lists(st.tuples(token, role), max_size=12),
    )

    @settings(max_examples=150, deadline=None)
    @given(seqs)
    def check(pair):
        l, r = pair
        lt, lr = [x[0] for x in l], [x[1] for x in l]
        rt, rr = [x[0] for x in r], [x[1] for x in r]
        ops, total = _nw_align(lt, rt, lr, rr, 2.0, 0.0, -1.0, -1.0)
        assert total == naive_nw(lt, rt, lr, rr)
        assert sum(p for _, _, _, p in ops) == total
        assert [a for a, _, _, _ in ops if a is not None] == list(range(len(lt)))
        assert [b for _, b, _, _ in ops if b is not None] == list(range(len(rt)))

    check()


def test_kernel_non_integral_scoring_params():
    """Regression: non-integral scoring parameters perturb the prefix-max
    DP rows by ~1 ULP; the traceback must still emit a VALID alignment
    (every position consumed once, total == sum of ops, near-optimal) and
    never walk out of bounds."""
    import numpy as np

    rng = np.random.default_rng(3)
    toks = ["a", "b", "c", "d"]
    for _ in range(300):
        lt = [toks[i] for i in rng.integers(0, 4, size=rng.integers(0, 11))]
        rt = [toks[i] for i in rng.integers(0, 4, size=rng.integers(0, 11))]
        lr = ["user"] * len(lt)
        rr = ["user"] * len(rt)
        ops, total = _nw_align(lt, rt, lr, rr, 2.3, 0.1, -1.1, -0.7)
        opt = naive_nw(lt, rt, lr, rr, 2.3, 0.1, -1.1, -0.7)
        assert abs(total - sum(p for _, _, _, p in ops)) < 1e-9
        assert total <= opt + 1e-6 and total >= opt - 1e-6 * (1 + len(lt) + len(rt))
        assert [a for a, _, _, _ in ops if a is not None] == list(range(len(lt)))
        assert [b for _, b, _, _ in ops if b is not None] == list(range(len(rt)))


def test_hirschberg_linear_equals_full_dp_total():
    """The linear-memory Hirschberg path returns an OPTIMAL alignment:
    total score bit-equal to the full DP (integral params → exact), ops a
    valid monotone alignment covering both sequences exactly once."""
    import numpy as np
    from pyppi_spark.operators.align import _nw_align, _nw_align_linear

    rng = np.random.default_rng(11)
    for trial in range(20):
        n, m = int(rng.integers(0, 40)), int(rng.integers(0, 40))
        lt = [f"t{int(x)}" for x in rng.integers(0, 6, n)]
        rt = [f"t{int(x)}" for x in rng.integers(0, 6, m)]
        lro = [f"r{int(x)}" for x in rng.integers(0, 2, n)]
        rro = [f"r{int(x)}" for x in rng.integers(0, 2, m)]
        args = (lt, rt, lro, rro, 2.0, 0.0, -1.0, -1.0)
        ops_full, tot_full = _nw_align(*args)
        # base_cells=1 forces the divide-and-conquer everywhere
        ops_lin, tot_lin = _nw_align_linear(*args, base_cells=1)
        assert tot_lin == tot_full, trial
        # validity: left positions of match/sub/del ops are 0..n-1 in
        # order; right positions of match/sub/ins are 0..m-1 in order
        assert [a for a, _, k, _ in ops_lin if k in ("match", "sub", "del")] == list(range(n))
        assert [b for _, b, k, _ in ops_lin if k in ("match", "sub", "ins")] == list(range(m))
        # per-op scores are consistent with the op kinds
        for a, b, k, ps in ops_lin:
            if k in ("match", "sub"):
                want = 2.0 if lt[a] == rt[b] else (0.0 if lro[a] == rro[b] else -1.0)
                assert ps == want and (k == "match") == (lt[a] == rt[b])
            else:
                assert ps == -1.0
        # determinism
        assert _nw_align_linear(*args, base_cells=1)[0] == ops_lin


def test_align_conversations_linear_mode_end_to_end(spark, tiny_df):
    """Forcing max_dp_cells=1 routes every pair through Hirschberg: the
    per-conversation total_score must equal the full-DP run (op sequences
    may differ only among co-optimal alignments)."""
    from pyspark.sql import functions as F
    from pyppi_spark.operators.align import align_conversations

    right = tiny_df.where(F.col("turn_idx") % 3 != 0)  # edited copy
    full = align_conversations(tiny_df, right)
    lin = align_conversations(tiny_df, right, max_dp_cells=1)
    key = lambda df: {r.conv_id: r.total for r in df.groupBy("conv_id").agg(
        F.first("total_score").alias("total")).collect()}
    assert key(full) == key(lin)
    # both runs cover every left turn exactly once
    n_left = tiny_df.count()
    for out in (full, lin):
        assert out.where(F.col("left_idx").isNotNull()).count() == n_left
