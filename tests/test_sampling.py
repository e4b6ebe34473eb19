"""Deterministic sampling/split operators (driver queries:
stratified_sample, deterministic_sample, dataset_split)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pyppi_spark.operators.sampling import dataset_split, stratified_sample


def test_dataset_split_deterministic_and_stable_under_growth(spark):
    """Split membership is a pure function of (seed, id): identical across
    runs AND unchanged when the corpus grows — the property randomSplit
    lacks."""
    small = spark.range(1000).select(F.col("id").alias("doc_id"))
    big = spark.range(5000).select(F.col("id").alias("doc_id"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r.doc_id: r.split for r in dataset_split(small, w, id_col="doc_id").collect()}
    a2 = {r.doc_id: r.split for r in dataset_split(small, w, id_col="doc_id").collect()}
    b = {r.doc_id: r.split for r in dataset_split(big, w, id_col="doc_id").collect()}
    assert a == a2
    assert all(b[k] == v for k, v in a.items())  # growth keeps old rows' splits
    # shape: ~80/10/10 within binomial tolerance
    from collections import Counter

    c = Counter(b.values())
    assert 0.75 < c["train"] / 5000 < 0.85
    assert 0.07 < c["val"] / 5000 < 0.13
    assert 0.07 < c["test"] / 5000 < 0.13
    # zero shuffle: pure projection
    plan = dataset_split(big, w, id_col="doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dataset_split_modes_and_validation(spark):
    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    w = {"train": 0.9, "test": 0.1}
    fast = dataset_split(docs, w, id_col="doc_id", hash_mode="fast")
    assert set(r.split for r in fast.select("split").distinct().collect()) <= {"train", "test"}
    with pytest.raises(ValueError, match="sum to 1"):
        dataset_split(docs, {"a": 0.5, "b": 0.6}, id_col="doc_id")
    with pytest.raises(ValueError, match="hash_mode"):
        dataset_split(docs, w, id_col="doc_id", hash_mode="nope")


def test_stratified_sample_caps_each_group(spark):
    df = spark.createDataFrame(
        [(i, f"g{i % 3}") for i in range(90)], "doc_id long, grp string"
    )
    out = stratified_sample(df, ["grp"], n_per_group=5, id_col="doc_id")
    counts = {r.grp: r.n for r in out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"g0": 5, "g1": 5, "g2": 5}
    # deterministic across calls
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(r.doc_id for r in stratified_sample(df, ["grp"], 5, "doc_id").collect())
    assert ids1 == ids2


def test_split_bounds_exact_and_validated():
    """Bounds use exact rational partial sums; bad weights are rejected
    up front instead of yielding non-monotonic or empty bands."""
    import pytest
    from fractions import Fraction
    from pyppi_spark.operators.sampling import split_bounds

    b = split_bounds({"train": 0.8, "val": 0.1, "test": 0.1})
    assert b == [int(Fraction(0.8) * (1 << 32)),
                 int((Fraction(0.8) + Fraction(0.1)) * (1 << 32))]
    assert b[0] < b[1] < (1 << 32)
    # an awkward weight set: bounds strictly increasing, never collapsing
    b2 = split_bounds({"a": 0.3, "b": 0.3, "c": 0.3, "d": 0.1})
    assert all(x < y for x, y in zip(b2, b2[1:]))
    with pytest.raises(ValueError, match="> 0"):
        split_bounds({"a": 0.5, "b": 0.0, "c": 0.5})
    with pytest.raises(ValueError, match="> 0"):
        split_bounds({"a": 1.2, "b": -0.2})
    with pytest.raises(ValueError, match="sum to 1"):
        split_bounds({"a": 0.5, "b": 0.6})
