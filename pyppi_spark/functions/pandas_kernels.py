"""Arrow-vectorized pandas UDF kernels (SURVEY.md §2.9).

The reference *is* one big per-row Python kernel library; the graft
contract demands those become Arrow-batched kernels. The engine's default
is JVM expressions (``functions/vectors.py``, ``plans/features.py``); this
module provides the pandas-UDF forms for the cases where numpy genuinely
wins (wide matrix math) and as cross-checks of the JVM paths:

- ``cosine_pandas_udf``: scalar pandas_udf — batches of embedding pairs hit
  numpy dot products (the vectorized form of the reference's pairwise
  kernels, e.g. Coulomb ``/root/reference/pyPPI/electrostat.py:41-43``).
- ``conv_latency_stats``: grouped-map ``applyInPandas`` — one conversation
  in, one feature row out (the shape of the reference's per-complex
  emitters, ``/root/reference/bin/setupPpiDb.py:318-359``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
import pyspark.sql.types as T


@pandas_udf(T.DoubleType())
def cosine_pandas_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batch cosine similarity over two array<float/double> columns."""
    am = np.stack(a.to_numpy())
    bm = np.stack(b.to_numpy())
    num = np.einsum("ij,ij->i", am, bm)
    den = np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1)
    return pd.Series(num / np.where(den == 0, np.nan, den))


CONV_LATENCY_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("n_turns", T.LongType(), False),
        T.StructField("gap_mean_s", T.DoubleType(), True),
        T.StructField("gap_p95_s", T.DoubleType(), True),
        T.StructField("gap_std_s", T.DoubleType(), True),
    ]
)


def conv_latency_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation latency stats via grouped-map numpy (an independent
    formulation of the JVM aggregate path, used as a cross-check)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
        ts = (pdf["ts"].astype("int64") // 1000).to_numpy(dtype="float64") / 1e6
        gaps = np.diff(ts)
        return pd.DataFrame(
            [
                {
                    "conv_id": pdf["conv_id"].iloc[0],
                    "n_turns": len(pdf),
                    "gap_mean_s": float(gaps.mean()) if len(gaps) else None,
                    "gap_p95_s": float(np.percentile(gaps, 95)) if len(gaps) else None,
                    "gap_std_s": float(gaps.std(ddof=1)) if len(gaps) > 1 else None,
                }
            ]
        )

    return (
        transcripts.select("conv_id", "turn_idx", "ts")
        .groupBy("conv_id")
        .applyInPandas(kernel, schema=CONV_LATENCY_SCHEMA)
    )
