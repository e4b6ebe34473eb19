from __future__ import annotations

from pyspark.sql import functions as F

from pyppi_spark.plans.training_set import build_training_set, clean_documents


def test_clean_documents_filters_and_dedups(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog and runs to the green hill by the river"),
        (1, "the quick brown fox jumps over the lazy dog and runs to the green hill by the river"),  # dup of 0
        (2, "la casa es muy grande y los perros corren en el jardin todos los dias del verano"),      # es
        (3, "x"),  # too short → low quality
        (4, "completely different english text about the spark engine and the query planner of it"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = clean_documents(docs, min_quality=0.3, languages=("en",))
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert ids == [0, 4]


def test_build_training_set_tables(spark, tiny_df, probes_df):
    tables = build_training_set(tiny_df, probes=probes_df)
    assert set(tables) == {"turn_features", "conv_features", "pit_features"}
    n_turns = tiny_df.count()
    assert tables["turn_features"].count() == n_turns
    assert tables["conv_features"].count() == tiny_df.select("conv_id").distinct().count()
    assert tables["pit_features"].count() == probes_df.count()
