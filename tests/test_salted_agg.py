from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F

from pyppi_spark.operators.salted_agg import salted_agg


def test_salted_agg_matches_plain_agg(spark, tiny_df):
    from pyppi_spark.functions.time import epoch_seconds

    df = tiny_df.withColumn("v", epoch_seconds("ts"))
    got = (
        salted_agg(
            df,
            ["conv_id"],
            {
                "n": ("count", "*"),
                "v_sum": ("sum", "v"),
                "v_min": ("min", "v"),
                "v_max": ("max", "v"),
                "v_avg": ("avg", "v"),
            },
            salt_buckets=8,
        )
        .orderBy("conv_id")
        .toPandas()
    )
    want = (
        df.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("v_sum"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
            F.avg("v").alias("v_avg"),
        )
        .orderBy("conv_id")
        .toPandas()
    )
    assert got["n"].tolist() == want["n"].tolist()
    for c in ["v_sum", "v_min", "v_max", "v_avg"]:
        assert np.allclose(got[c], want[c], rtol=1e-12), c
