"""Property-based tests (hypothesis) for the core ordering/leakage
invariants — randomized inputs, bounded example counts to keep Spark
round-trips cheap (SURVEY.md §5.3 item 3)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from pyppi_spark.oracle import oracle_turn_features
from pyppi_spark.schema import PROBES, TRANSCRIPTS

BASE = dt.datetime(2025, 1, 1)

# gaps chosen adversarially around the 1800 s boundary, plus ties (0)
gap_strategy = st.sampled_from([0.0, 0.001, 1.0, 1799.999, 1800.0, 1800.001, 5000.0])
roles = st.sampled_from(["user", "assistant", "system", "tool"])


@st.composite
def conv_frames(draw):
    n_convs = draw(st.integers(1, 4))
    rows = []
    for c in range(n_convs):
        n = draw(st.integers(1, 12))
        gaps = draw(st.lists(gap_strategy, min_size=n, max_size=n))
        t = 0.0
        for i in range(n):
            t += gaps[i] if i else 0.0
            rows.append(
                (
                    f"c{c}",
                    i,
                    draw(roles),
                    f"t{c}_{i}",
                    None,
                    BASE + dt.timedelta(seconds=t),
                )
            )
    return pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(pdf=conv_frames())
def test_sessionize_boundary_and_monotonicity(spark, pdf):
    from pyppi_spark.operators import with_session_id

    df = spark.createDataFrame(pdf, schema=TRANSCRIPTS)
    out = (
        with_session_id(df, gap_s=1800.0)
        .orderBy("conv_id", "ts", "turn_idx")
        .toPandas()
    )
    for _, g in out.groupby("conv_id"):
        ts = g["ts"].astype("int64").to_numpy() / 1e9
        sid = g["session_id"].to_numpy()
        assert sid[0] == 0
        for i in range(1, len(g)):
            gap = ts[i] - ts[i - 1]
            if gap > 1800.0 + 1e-9:
                assert sid[i] == sid[i - 1] + 1, (gap, i)
            else:
                assert sid[i] == sid[i - 1], (gap, i)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(pdf=conv_frames(), offsets_s=st.lists(st.integers(-4000, 4000), min_size=3, max_size=6))
def test_asof_never_leaks_future(spark, pdf, offsets_s):
    from pyppi_spark.operators import asof_join

    probes = []
    for j, off in enumerate(offsets_s):
        probes.append(("c0", pdf[pdf.conv_id == "c0"]["ts"].iloc[0] + dt.timedelta(seconds=off), f"p{j}"))
    probes_df = spark.createDataFrame(
        pd.DataFrame(probes, columns=["conv_id", "probe_ts", "probe_id"]), schema=PROBES
    )
    build = spark.createDataFrame(pdf, schema=TRANSCRIPTS)
    for strategy in ("union", "merge"):
        out = asof_join(probes_df, build, strategy=strategy, payload=["ts", "turn_idx"]).toPandas()
        m = out.dropna(subset=["matched_ts"])
        assert (m["matched_ts"] <= m["probe_ts"]).all()


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(pdf=conv_frames())
def test_turn_features_agree_with_oracle(spark, pdf):
    from pyppi_spark.plans import turn_features

    import numpy as np

    df = spark.createDataFrame(pdf, schema=TRANSCRIPTS)
    got = turn_features(df).orderBy("conv_id", "turn_idx").toPandas()
    want = oracle_turn_features(pdf).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got["session_id"].tolist() == want["session_id"].tolist()
    assert np.allclose(
        got["gap_prev_s"].astype(float),
        want["gap_prev_s"].astype(float),
        rtol=1e-9, atol=1e-9, equal_nan=True,
    )


def test_new_operators_deterministic_across_partitioning(spark, tiny_df):
    """Round-2 operators must obey the repo invariant: identical output
    regardless of physical partitioning."""
    from pyppi_spark.operators.align import align_conversations
    from pyppi_spark.operators.dedup import winnow_fingerprints
    from pyspark.sql import functions as F

    docs = tiny_df.select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id"), F.col("text")
    )
    right = tiny_df.where(F.col("turn_idx") % 3 != 0)

    def run(df_docs, df_l, df_r):
        fp = winnow_fingerprints(df_docs).toPandas().sort_values(
            ["doc_id", "fingerprint"]).reset_index(drop=True)
        al = (
            align_conversations(df_l, df_r)
            .groupBy("conv_id")
            .agg(F.sum(F.when(F.col("op") == "match", 1).otherwise(0)).alias("m"),
                 F.max("total_score").alias("s"))
            .toPandas().sort_values("conv_id").reset_index(drop=True)
        )
        return fp, al

    fp1, al1 = run(docs, tiny_df, right)
    fp2, al2 = run(docs.repartition(17), tiny_df.repartition(13), right.repartition(7))
    assert fp1.equals(fp2)
    assert al1.equals(al2)


@st.composite
def asof_case(draw):
    """Build + probe frames with adversarial tolerance-boundary gaps
    (probe timestamps land exactly on, 1 ms inside, and 1 ms outside the
    band around build rows)."""
    pdf = draw(conv_frames())
    probes = []
    tol = 900.0
    offsets = [-tol - 0.001, -tol, -1.0, 0.0, 1.0, tol, tol + 0.001]
    for c in pdf["conv_id"].unique():
        g = pdf[pdf.conv_id == c]
        anchor = g["ts"].iloc[draw(st.integers(0, len(g) - 1))]
        for j, off in enumerate(draw(st.lists(st.sampled_from(offsets), min_size=2, max_size=4))):
            probes.append((c, anchor + dt.timedelta(seconds=off), f"p_{c}_{j}"))
    return pdf, pd.DataFrame(probes, columns=["conv_id", "probe_ts", "probe_id"]), tol


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(case=asof_case())
def test_asof_tolerance_vs_bruteforce_all_directions(spark, case):
    """Both engine strategies must equal the naive O(n·m) oracle for every
    direction under tolerance banding, on boundary-adversarial inputs."""
    from pyppi_spark.operators import asof_join
    from pyppi_spark.oracle import oracle_asof

    pdf, probes_pdf, tol = case
    build = spark.createDataFrame(pdf, schema=TRANSCRIPTS)
    probes = spark.createDataFrame(probes_pdf, schema=PROBES)
    for direction in ["backward", "forward", "nearest"]:
        want = oracle_asof(
            probes_pdf, pdf, ["text"], direction=direction, tolerance=tol
        ).sort_values("probe_id").reset_index(drop=True)
        # chunk_rows=2 exercises chunk boundaries + carry rows on every
        # conversation; must stay oracle-exact like the plain strategies
        for strategy, extra in [("union", {}), ("merge", {}), ("merge", {"chunk_rows": 2})]:
            got = (
                asof_join(
                    probes, build, strategy=strategy, payload=["text"],
                    direction=direction, tolerance=tol, **extra,
                )
                .toPandas().sort_values("probe_id").reset_index(drop=True)
            )
            g = got["matched_text"].where(got["matched_text"].notna(), None).tolist()
            w = want["matched_text"].where(want["matched_text"].notna(), None).tolist()
            assert g == w, f"{strategy}/{extra}/{direction}: {g} != {w}"
