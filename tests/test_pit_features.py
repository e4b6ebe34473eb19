"""PIT feature snapshots: engine (incremental cumulative windows + as-of)
vs oracle (recompute-from-prefix) — two genuinely different formulations."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyppi_spark.oracle import oracle_pit_features
from pyppi_spark.plans.pit import pit_features


@pytest.mark.parametrize("strategy", ["union", "merge"])
def test_pit_vs_prefix_oracle(spark, tiny_df, tiny_pdf, probes_df, probes_pdf, strategy):
    got = (
        pit_features(probes_df, tiny_df, strategy=strategy)
        .toPandas()
        .sort_values("probe_id")
        .reset_index(drop=True)
    )
    want = oracle_pit_features(probes_pdf, tiny_pdf).sort_values("probe_id").reset_index(drop=True)
    assert len(got) == len(want)
    for c in ["last_role", "last_tool"]:
        g = got[c].where(got[c].notna(), None).tolist()
        w = want[c].where(want[c].notna(), None).tolist()
        assert g == w, c
    # nullable ints surface as float64 in pandas — compare with equal_nan
    for c in [
        "n_turns_so_far",
        "n_sessions_so_far",
        "gap_mean_so_far_s",
        "gap_max_so_far_s",
        "time_since_last_turn_s",
    ]:
        assert np.allclose(
            got[c].astype("float64"),
            want[c].astype("float64"),
            rtol=1e-9,
            atol=1e-9,
            equal_nan=True,
        ), c


def test_pit_probe_before_first_turn_all_null(spark, tiny_df, probes_df):
    from pyspark.sql import functions as F

    out = pit_features(probes_df, tiny_df).where(F.col("probe_id").endswith("#p0"))
    pdf = out.toPandas()
    assert len(pdf) > 0
    for c in ["n_turns_so_far", "last_role", "gap_mean_so_far_s"]:
        assert pdf[c].isna().all(), c
