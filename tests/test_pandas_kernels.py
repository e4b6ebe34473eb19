"""The Arrow-kernel paths must agree with the JVM-expression paths —
two genuinely different implementations of the same math."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from pyppi_spark.functions.pandas_kernels import conv_latency_stats, cosine_pandas_udf
from pyppi_spark.functions.vectors import cosine_similarity


def test_cosine_pandas_udf_matches_jvm(spark):
    rng = np.random.default_rng(11)
    rows = [
        ([float(x) for x in rng.standard_normal(8)], [float(x) for x in rng.standard_normal(8)])
        for _ in range(100)
    ]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    out = df.select(
        cosine_similarity(F.col("a"), F.col("b")).alias("jvm"),
        cosine_pandas_udf("a", "b").alias("arrow"),
    ).toPandas()
    assert np.allclose(out["jvm"], out["arrow"], rtol=1e-12)


def test_grouped_map_latency_matches_jvm_agg(spark, tiny_df):
    got = conv_latency_stats(tiny_df).orderBy("conv_id").toPandas()
    want = (
        tiny_df.selectExpr(
            "conv_id",
            "unix_micros(ts)/1e6 as t",
            "turn_idx",
        )
        .withColumn(
            "gap",
            F.col("t") - F.lag("t").over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("conv_id").orderBy("t", "turn_idx")
            ),
        )
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.avg("gap").alias("gap_mean_s"),
            F.expr("percentile(gap, 0.95)").alias("gap_p95_s"),
            F.stddev("gap").alias("gap_std_s"),
        )
        .orderBy("conv_id")
        .toPandas()
    )
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["n_turns"].tolist() == want["n_turns"].tolist()
    for c in ["gap_mean_s", "gap_p95_s", "gap_std_s"]:
        assert np.allclose(
            got[c].astype(float), want[c].astype(float), rtol=1e-9, atol=1e-9, equal_nan=True
        ), c
