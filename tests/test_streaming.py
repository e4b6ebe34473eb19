"""Streaming sessionization cross-checked against the batch cumsum
operator (two-definition agreement, SURVEY.md §5.3 item 2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyppi_spark.operators import with_session_id
from pyppi_spark.schema import TRANSCRIPTS
from pyppi_spark.streaming import streaming_session_aggregates


def test_streaming_sessions_match_batch(spark, tiny_pdf, tmp_path):
    src = str(tmp_path / "src")
    spark.createDataFrame(tiny_pdf, schema=TRANSCRIPTS).write.parquet(src)

    stream = spark.readStream.schema(TRANSCRIPTS).parquet(src)
    agg = streaming_session_aggregates(stream, gap_s=1800.0, watermark="1 day")
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = (
        spark.table("sess_stream")
        .groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("session_len").alias("n_turns"))
        .orderBy("conv_id")
        .toPandas()
    )
    batch = with_session_id(spark.createDataFrame(tiny_pdf, schema=TRANSCRIPTS), gap_s=1800.0)
    want = (
        batch.groupBy("conv_id")
        .agg((F.max("session_id") + 1).alias("n_sessions"), F.count(F.lit(1)).alias("n_turns"))
        .orderBy("conv_id")
        .toPandas()
    )
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["n_sessions"].tolist() == want["n_sessions"].tolist()
    assert got["n_turns"].tolist() == want["n_turns"].tolist()
