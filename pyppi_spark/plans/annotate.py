"""Annotation enrichment — the broadcast dimension-table join of FIXTURES.md
§3, the analog of the reference's donor/acceptor matrix lookup
(``/root/reference/pyPPI/DonAcc2.txt`` parsed at
``/root/reference/pyPPI/donorAcceptor.py:12-43`` and keyed by atom class).

Lookup rule: the most specific row wins — ``(role, tool)`` exact match
first, then ``(role, tool=NULL)`` as the wildcard. Two broadcast hash joins
+ coalesce; the dim is tiny by contract, so neither join shuffles the fact
side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..schema import ANNOTATIONS, ANNOTATION_ROWS


def default_annotations(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ANNOTATION_ROWS, schema=ANNOTATIONS)


def annotate(transcripts: DataFrame, annotations: DataFrame | None = None) -> DataFrame:
    """Add ``category`` and ``weight`` columns to every turn."""
    ann = annotations if annotations is not None else default_annotations(transcripts.sparkSession)
    specific = ann.where(F.col("tool").isNotNull()).select(
        F.col("role").alias("_r"),
        F.col("tool").alias("_t"),
        F.col("category").alias("_cat_s"),
        F.col("weight").alias("_w_s"),
    )
    generic = ann.where(F.col("tool").isNull()).select(
        F.col("role").alias("_r"),
        F.col("category").alias("_cat_g"),
        F.col("weight").alias("_w_g"),
    )
    out = (
        transcripts.join(
            F.broadcast(specific),
            (transcripts["role"] == specific["_r"]) & (transcripts["tool"] == specific["_t"]),
            "left",
        )
        .drop("_r", "_t")
        .join(F.broadcast(generic), transcripts["role"] == generic["_r"], "left")
        .drop("_r")
    )
    return out.select(
        *transcripts.columns,
        F.coalesce("_cat_s", "_cat_g").alias("category"),
        F.coalesce("_w_s", "_w_g").alias("weight"),
    )


def conv_annotation_features(
    transcripts: DataFrame, annotations: DataFrame | None = None
) -> DataFrame:
    """Per-conversation weighted category features (the FIXTURES §4
    'weighted transition features' surface): counts and weight sums per
    category, flattened."""
    ann = annotate(transcripts, annotations)
    cats = ["input", "response", "control", "observation", "action"]
    aggs = []
    for c in cats:
        aggs.append(F.sum(F.when(F.col("category") == c, 1).otherwise(0)).alias(f"n_cat_{c}"))
        aggs.append(
            F.round(
                F.sum(F.when(F.col("category") == c, F.col("weight")).otherwise(0.0)), 6
            ).alias(f"w_cat_{c}")
        )
    return ann.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.round(F.sum("weight"), 6).alias("weight_total"),
        *aggs,
    )
