from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from pyppi_spark.operators import asof_join
from pyppi_spark.oracle import oracle_asof
from pyppi_spark.schema import PROBES, TRANSCRIPTS

PAYLOAD = ["role", "text", "tool"]


def t(s: float):
    return dt.datetime(2025, 1, 1) + dt.timedelta(seconds=s)


def _cmp(got: pd.DataFrame, want: pd.DataFrame):
    got = got.sort_values("probe_id").reset_index(drop=True)
    want = want.sort_values("probe_id").reset_index(drop=True)
    for c in ["matched_role", "matched_text", "matched_tool"]:
        g = got[c].where(got[c].notna(), None).tolist()
        w = want[c].where(want[c].notna(), None).tolist()
        assert g == w, f"column {c}: {g} != {w}"


@pytest.mark.parametrize("strategy", ["union", "merge"])
@pytest.mark.parametrize("inclusive", [True, False])
def test_asof_vs_bruteforce_oracle(spark, tiny_df, tiny_pdf, probes_df, probes_pdf, strategy, inclusive):
    got = asof_join(
        probes_df, tiny_df, strategy=strategy, payload=PAYLOAD, inclusive=inclusive
    ).toPandas()
    want = oracle_asof(probes_pdf, tiny_pdf, PAYLOAD, inclusive=inclusive)
    _cmp(got, want)


@pytest.mark.parametrize("strategy", ["union", "merge"])
def test_exact_tie_semantics(spark, strategy):
    build = spark.createDataFrame(
        pd.DataFrame(
            [
                ("c", 0, "user", "first", None, t(10)),
                ("c", 1, "assistant", "second", None, t(10)),  # same ts, higher idx wins
                ("c", 2, "user", "later", None, t(30)),
            ],
            columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
        ),
        schema=TRANSCRIPTS,
    )
    probes = spark.createDataFrame(
        pd.DataFrame(
            [("c", t(10), "on_tie"), ("c", t(9.999), "before"), ("c", t(20), "between")],
            columns=["conv_id", "probe_ts", "probe_id"],
        ),
        schema=PROBES,
    )
    inc = (
        asof_join(probes, build, strategy=strategy, payload=["text"], inclusive=True)
        .toPandas()
        .set_index("probe_id")["matched_text"]
    )
    assert inc["on_tie"] == "second"  # inclusive sees both tie rows, picks max turn_idx
    assert inc["between"] == "second"
    assert pd.isna(inc["before"]) or inc["before"] is None

    strict = (
        asof_join(probes, build, strategy=strategy, payload=["text"], inclusive=False)
        .toPandas()
        .set_index("probe_id")["matched_text"]
    )
    assert pd.isna(strict["on_tie"]) or strict["on_tie"] is None  # ts==probe_ts excluded
    assert strict["between"] == "second"


def test_zero_temporal_leakage_property(spark, tiny_df, probes_df):
    """Every inclusive match satisfies matched.ts <= probe_ts (checked by
    carrying ts through as payload); no match from the future, ever."""
    got = asof_join(probes_df, tiny_df, payload=["ts", "turn_idx"]).toPandas()
    m = got.dropna(subset=["matched_ts"])
    assert (m["matched_ts"] <= m["probe_ts"]).all()


def test_future_shift_does_not_change_past(spark, tiny_df, probes_df):
    """Shifting all strictly-future rows (ts > probe horizon) must not change
    any match — the leakage invariance property from SURVEY.md §5.3."""
    from pyspark.sql import functions as F

    horizon = t(10**9 / 2)  # far-future split unnecessary; use per-probe check instead
    base = asof_join(probes_df, tiny_df, payload=["ts", "turn_idx"]).toPandas()
    shifted_build = tiny_df.withColumn(
        "ts",
        F.when(
            F.col("ts") > F.lit(dt.datetime(2025, 2, 1)),
            F.col("ts") + F.expr("INTERVAL 365 DAYS"),
        ).otherwise(F.col("ts")),
    )
    probes_past = probes_df.where(F.col("probe_ts") <= F.lit(dt.datetime(2025, 2, 1)))
    shifted = asof_join(probes_past, shifted_build, payload=["ts", "turn_idx"]).toPandas()
    merged = base.merge(shifted, on="probe_id", suffixes=("_a", "_b"))
    assert len(merged) == len(shifted)
    ok = (
        merged["matched_turn_idx_a"].fillna(-1) == merged["matched_turn_idx_b"].fillna(-1)
    )
    assert ok.all()


def test_empty_build_side(spark, probes_df):
    empty = spark.createDataFrame([], schema=TRANSCRIPTS)
    for strategy in ["union", "merge"]:
        out = asof_join(probes_df, empty, strategy=strategy, payload=PAYLOAD).toPandas()
        assert len(out) == probes_df.count()
        assert out["matched_role"].isna().all()


@pytest.mark.parametrize("strategy", ["union", "merge"])
@pytest.mark.parametrize("inclusive", [True, False])
def test_forward_direction(spark, strategy, inclusive):
    build = spark.createDataFrame(
        pd.DataFrame(
            [
                ("c", 0, "user", "early", None, t(10)),
                ("c", 1, "assistant", "tie_lo", None, t(20)),
                ("c", 2, "user", "tie_hi", None, t(20)),
                ("c", 3, "user", "late", None, t(40)),
            ],
            columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
        ),
        schema=TRANSCRIPTS,
    )
    probes = spark.createDataFrame(
        pd.DataFrame(
            [("c", t(20), "on_tie"), ("c", t(15), "between"), ("c", t(50), "after_all")],
            columns=["conv_id", "probe_ts", "probe_id"],
        ),
        schema=PROBES,
    )
    out = (
        asof_join(
            probes, build, strategy=strategy, payload=["text"],
            inclusive=inclusive, direction="forward",
        )
        .toPandas()
        .set_index("probe_id")["matched_text"]
    )
    # forward ties take the SMALLEST turn_idx at the matching timestamp
    assert out["between"] == "tie_lo"
    assert out["on_tie"] == ("tie_lo" if inclusive else "late")
    assert pd.isna(out["after_all"]) or out["after_all"] is None


@pytest.mark.parametrize("inclusive", [True, False])
def test_forward_union_matches_merge(spark, tiny_df, probes_df, inclusive):
    a = (
        asof_join(probes_df, tiny_df, strategy="union", payload=["turn_idx"],
                  inclusive=inclusive, direction="forward")
        .toPandas().sort_values("probe_id").reset_index(drop=True)
    )
    b = (
        asof_join(probes_df, tiny_df, strategy="merge", payload=["turn_idx"],
                  inclusive=inclusive, direction="forward")
        .toPandas().sort_values("probe_id").reset_index(drop=True)
    )
    assert a["matched_turn_idx"].fillna(-1).tolist() == b["matched_turn_idx"].fillna(-1).tolist()


@pytest.mark.parametrize("strategy", ["union", "merge"])
@pytest.mark.parametrize("inclusive", [True, False])
def test_nearest_direction(spark, strategy, inclusive):
    build = spark.createDataFrame(
        pd.DataFrame(
            [
                ("c", 0, "user", "past", None, t(10)),
                ("c", 1, "assistant", "exact", None, t(20)),
                ("c", 2, "user", "future", None, t(31)),
            ],
            columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
        ),
        schema=TRANSCRIPTS,
    )
    probes = spark.createDataFrame(
        pd.DataFrame(
            [
                ("c", t(20), "on_exact"),     # Δ=0 backward (inclusive only)
                ("c", t(24), "lean_back"),    # Δback=4 < Δfwd=7
                ("c", t(28), "lean_fwd"),     # Δback=8 > Δfwd=3
                ("c", t(25.5), "equidistant") # Δ=5.5 both → backward wins
            ],
            columns=["conv_id", "probe_ts", "probe_id"],
        ),
        schema=PROBES,
    )
    out = (
        asof_join(
            probes, build, strategy=strategy, payload=["text"],
            inclusive=inclusive, direction="nearest",
        )
        .toPandas()
        .set_index("probe_id")["matched_text"]
    )
    # strict mode excludes the Δ=0 exact row; next-nearest is past (Δ10) vs future (Δ11)
    assert out["on_exact"] == ("exact" if inclusive else "past")
    assert out["lean_back"] == "exact"
    assert out["lean_fwd"] == "future"
    assert out["equidistant"] == "exact"  # pinned: equal |Δt| → backward


@pytest.mark.parametrize("inclusive", [True, False])
def test_nearest_union_matches_merge(spark, tiny_df, probes_df, inclusive):
    a = (
        asof_join(probes_df, tiny_df, strategy="union", payload=["turn_idx"],
                  inclusive=inclusive, direction="nearest")
        .toPandas().sort_values("probe_id").reset_index(drop=True)
    )
    b = (
        asof_join(probes_df, tiny_df, strategy="merge", payload=["turn_idx"],
                  inclusive=inclusive, direction="nearest")
        .toPandas().sort_values("probe_id").reset_index(drop=True)
    )
    assert a["matched_turn_idx"].fillna(-1).tolist() == b["matched_turn_idx"].fillna(-1).tolist()


@pytest.mark.parametrize("strategy", ["union", "merge"])
@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_tolerance_boundaries(spark, strategy, direction):
    """Band-limited matching: |Δt| == tolerance stays matched (inclusive
    band, the pd.merge_asof contract); one µs beyond is null. Exercised in
    all three directions with on-boundary, in-band, and out-of-band
    probes."""
    build = spark.createDataFrame(
        pd.DataFrame(
            [("c", 0, "user", "at100", None, t(100))],
            columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
        ),
        schema=TRANSCRIPTS,
    )
    probes = spark.createDataFrame(
        pd.DataFrame(
            [
                ("c", t(100), "exact"),        # Δt = 0
                ("c", t(105), "in_band_b"),    # 5 s after build
                ("c", t(110), "boundary_b"),   # exactly tol after build
                ("c", t(110.000001), "out_b"), # 1 µs beyond
                ("c", t(95), "in_band_f"),     # 5 s before build
                ("c", t(90), "boundary_f"),    # exactly tol before build
                ("c", t(89.999999), "out_f"),  # 1 µs beyond
            ],
            columns=["conv_id", "probe_ts", "probe_id"],
        ),
        schema=PROBES,
    )
    got = asof_join(
        probes, build, strategy=strategy, payload=["text"],
        direction=direction, tolerance=10.0,
    ).toPandas().set_index("probe_id")["matched_text"]
    backward_visible = {"exact", "in_band_b", "boundary_b"}
    forward_visible = {"exact", "in_band_f", "boundary_f"}
    expect = {
        "backward": backward_visible,
        "forward": forward_visible,
        "nearest": backward_visible | forward_visible,
    }[direction]
    for pid in got.index:
        if pid in expect:
            assert got[pid] == "at100", f"{pid} should match within band"
        else:
            assert got[pid] is None or pd.isna(got[pid]), f"{pid} must be out of band"


@pytest.mark.parametrize("inclusive", [True, False])
def test_tolerance_union_matches_merge(spark, tiny_df, probes_df, inclusive):
    for direction in ["backward", "forward", "nearest"]:
        u = asof_join(
            probes_df, tiny_df, strategy="union", payload=PAYLOAD,
            direction=direction, inclusive=inclusive, tolerance=45.0,
        ).toPandas()
        m = asof_join(
            probes_df, tiny_df, strategy="merge", payload=PAYLOAD,
            direction=direction, inclusive=inclusive, tolerance=45.0,
        ).toPandas()
        _cmp(u, m)
        # the band must actually bite on this fixture, else the test is vacuous
        assert u["matched_text"].isna().any(), f"{direction}: tolerance never applied"


def test_reserved_payload_name_rejected(spark, tiny_df, probes_df):
    bad = tiny_df.withColumn("_bt", tiny_df.turn_idx)
    with pytest.raises(ValueError, match="reserve"):
        asof_join(probes_df, bad, payload=["text", "_bt"])


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_same_name_ts_merge_equals_union(spark, direction):
    """probe_ts == build_ts (both literally 'ts') — the driver-query shape.
    pd.merge_asof keeps only the left's column for a shared key name, so
    the merge strategy must carry the matched build ts separately or
    nearest selection and tolerance banding silently read Δt = 0."""
    build = spark.createDataFrame(
        pd.DataFrame(
            [
                ("c", 0, "user", "early", None, t(100)),
                ("c", 1, "assistant", "late", None, t(300)),
            ],
            columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
        ),
        schema=TRANSCRIPTS,
    )
    probes = spark.createDataFrame(
        [("c", t(100), "p_on"), ("c", t(180), "p_near_early"),
         ("c", t(250), "p_near_late"), ("c", t(1000), "p_far")],
        "conv_id string, ts timestamp, probe_id string",
    )
    kw = dict(probe_ts="ts", build_ts="ts", payload=["text"], tolerance=60.0,
              direction=direction)
    u = asof_join(probes, build, strategy="union", **kw).toPandas()
    m = asof_join(probes, build, strategy="merge", **kw).toPandas()
    _cmp_cols = ["matched_text"]
    u = u.sort_values("probe_id").reset_index(drop=True)
    m = m.sort_values("probe_id").reset_index(drop=True)
    for c in _cmp_cols:
        gu = u[c].where(u[c].notna(), None).tolist()
        gm = m[c].where(m[c].notna(), None).tolist()
        assert gu == gm, f"{direction}/{c}: union {gu} != merge {gm}"
    got = dict(zip(m.probe_id, m.matched_text))
    if direction == "nearest":
        # p_near_late is 50 s before 'late' (in band) and 150 s after
        # 'early' — nearest must pick 'late'; p_far is out of band
        assert got == {"p_on": "early", "p_near_early": None,
                       "p_near_late": "late", "p_far": None}


def test_merge_rejects_probe_column_named_build_ts(spark, tiny_df):
    """A probe payload column sharing build_ts's name (probe_ts !=
    build_ts) would make pd.merge_asof suffix both — contract error up
    front instead of a KeyError mid-kernel."""
    import pytest
    from pyspark.sql import functions as F
    from pyppi_spark.operators.asof import asof_join_merge

    probe = tiny_df.select(
        "conv_id", F.col("ts").alias("probe_ts"), F.col("ts").alias("ts")
    )
    with pytest.raises(ValueError, match="build-side timestamp name"):
        asof_join_merge(probe, tiny_df, probe_ts="probe_ts", build_ts="ts")


def test_merge_chunked_equals_unchunked(spark):
    """chunk_rows splits probes and carries only the boundary build rows:
    the result must be identical to the single-cogroup plan across all
    directions × tie modes × tolerance (ties on both sides planted)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyppi_spark.operators.asof import asof_join_merge

    rng = np.random.default_rng(7)
    probe_rows, build_rows = [], []
    for c in range(5):
        for i in range(int(rng.integers(5, 40))):
            build_rows.append((f"c{c}", float(rng.integers(0, 50)), i, f"p{i % 3}"))
        for j in range(int(rng.integers(5, 40))):
            probe_rows.append((f"c{c}", float(rng.integers(0, 50)), j))
    build = spark.createDataFrame(
        build_rows, "conv_id string, ts double, turn_idx long, val string"
    )
    probe = spark.createDataFrame(
        probe_rows, "conv_id string, probe_ts double, probe_id long"
    )
    key = lambda df: df.sort_values(
        ["conv_id", "probe_ts", "probe_id"], kind="mergesort"
    ).reset_index(drop=True)
    for direction in ("backward", "forward", "nearest"):
        for inclusive in (True, False):
            for tol in (None, 5.0):
                kw = dict(
                    probe_ts="probe_ts", build_ts="ts", by=("conv_id",),
                    payload=["val", "ts"], tiebreak="turn_idx",
                    inclusive=inclusive, direction=direction, tolerance=tol,
                )
                a = asof_join_merge(probe, build, **kw).toPandas()
                b = asof_join_merge(probe, build, chunk_rows=4, **kw).toPandas()
                pd.testing.assert_frame_equal(
                    key(a)[sorted(a.columns)], key(b)[sorted(b.columns)],
                    obj=f"{direction} inclusive={inclusive} tol={tol}",
                )


def test_merge_chunked_giant_conversation(spark):
    """A 10^6-turn single conversation completes under capped Arrow groups
    (chunk_rows bounds each cogroup) and every probe matches its known
    backward neighbor."""
    from pyspark.sql import functions as F
    from pyppi_spark.operators.asof import asof_join_merge

    n = 1_000_000
    build = spark.range(n).select(
        F.lit("giant").alias("conv_id"),
        (F.col("id") * 2.0).alias("ts"),
        F.col("id").alias("turn_idx"),
        (F.col("id") % 7).cast("string").alias("val"),
    )
    probe = spark.range(0, n, 10).select(
        F.lit("giant").alias("conv_id"),
        (F.col("id") * 2.0 + 1.0).alias("probe_ts"),
        F.col("id").alias("probe_id"),
    )
    out = asof_join_merge(
        probe, build, probe_ts="probe_ts", build_ts="ts", by=("conv_id",),
        payload=["ts", "val"], tiebreak="turn_idx", chunk_rows=10_000,
    )
    agg = out.select(
        F.sum((F.col("matched_ts") == F.col("probe_ts") - 1.0).cast("long")).alias("ok"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert agg.n == 100_000 and agg.ok == 100_000


def test_merge_chunked_shared_lineage(spark, tiny_df):
    """Probe and build derived from the SAME plan (the common production
    shape): the chunked path's bounds join and cogroup must not trip the
    ambiguous-self-join check, and must equal the unchunked result."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyppi_spark.operators.asof import asof_join_merge

    probe = tiny_df.where(F.col("role") == "user").select(
        "conv_id", F.col("ts").alias("probe_ts"), F.col("turn_idx").alias("probe_idx")
    )
    build = tiny_df.select("conv_id", "ts", "turn_idx", "role")
    kw = dict(by=("conv_id",), payload=["role"], tiebreak="turn_idx")
    key = lambda df: df.sort_values(
        ["conv_id", "probe_ts", "probe_idx"], kind="mergesort"
    ).reset_index(drop=True)
    a = asof_join_merge(probe, build, **kw).toPandas()
    b = asof_join_merge(probe, build, chunk_rows=3, **kw).toPandas()
    pd.testing.assert_frame_equal(key(a)[sorted(a.columns)], key(b)[sorted(b.columns)])


def test_union_skew_contract_and_chunked_escape(spark):
    """The documented skew contract: the union strategy's window shuffles
    ONCE on the entity key and cannot be AQE-split for a single giant
    key (window partitions are not skew-splittable) — the plan shows one
    hashpartitioning exchange on the key feeding a sort; a skewed corpus
    (one conversation holding ~90% of rows) still returns results equal
    to the chunked merge path, which is the supported parallel escape."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyppi_spark.operators.asof import asof_join_merge, asof_join_union

    rows = [("giant", float(i), i) for i in range(2000)]
    rows += [(f"c{j}", float(j % 7), 0) for j in range(200)]
    build = spark.createDataFrame(rows, "conv_id string, ts double, turn_idx long")
    build = build.withColumn("val", F.col("ts") * 2 + F.col("turn_idx"))
    probe = build.select(
        "conv_id", (F.col("ts") + 0.5).alias("probe_ts"),
        F.col("turn_idx").alias("probe_idx"),
    )
    kw = dict(probe_ts="probe_ts", by=("conv_id",), payload=["val"],
              tiebreak="turn_idx", inclusive=True)
    out_union = asof_join_union(probe, build, **kw)
    plan = out_union._jdf.queryExecution().executedPlan().toString()
    # exactly one exchange family on the entity key: the union plan
    # shuffles the tagged union once (hashpartitioning on conv_id), sorts,
    # and windows — no join, so AQE's skew-join splitting never applies
    assert "hashpartitioning(conv_id" in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    a = out_union.toPandas().sort_values(["conv_id", "probe_ts", "probe_idx"]).reset_index(drop=True)
    b = (
        asof_join_merge(probe, build, chunk_rows=256, **kw)
        .toPandas().sort_values(["conv_id", "probe_ts", "probe_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False)
