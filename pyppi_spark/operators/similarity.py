"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k (exact) — broadcast the query side, JVM
``zip_with``/``aggregate`` math, window top-k. Scale paths:

- ``lsh_topk``: random-hyperplane LSH — bucket both sides by sign bits of
  seeded random projections, equi-join on (table, bucket), exact cosine
  only within buckets. Recall/cost tuned by (n_tables, n_bits).
- ``ivf_topk``: IVF-flat — k-means-lite centroids (seeded sample, fixed
  Lloyd iterations), assign every vector to its nearest centroid, probe
  ``n_probe`` nearest centroids per query. The coarse quantizer is the
  analog of the reference's kd-tree candidate pruning
  (``/root/reference/pyPPI/kdtree.py:8-48``): bound the candidate set,
  then apply the exact kernel.

All math stays in JVM higher-order functions except centroid training,
which is a driver-side numpy k-means over a bounded sample (seeded).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vectors import cosine_similarity, dot


def _as_double(col):
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    q = queries.select(
        F.col(id_col).alias(query_id_col), _as_double(vec_col).alias("_q")
    )
    c = candidates.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("_c"))
    pairs = c.join(F.broadcast(q), F.col("neighbor_id") != F.col(query_id_col))
    scored = pairs.select(
        query_id_col,
        "neighbor_id",
        cosine_similarity(F.col("_q"), F.col("_c")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id_col, "neighbor_id", "rk", "cos_sim")
    )


def _random_planes(dim: int, n_tables: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def _bucket_expr(vec, planes: np.ndarray):
    """Sign-bit bucket id for one LSH table: packed bits of dot(vec, plane)>0."""
    bucket = F.lit(0).cast("long")
    for b in range(planes.shape[0]):
        plane = F.array(*[F.lit(float(x)) for x in planes[b]])
        positive = dot(vec, plane) > 0
        bucket = bucket.bitwiseOR(
            F.when(positive, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_tables: int = 8,
    n_bits: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: exact cosine within random-hyperplane buckets.

    Join key is (table_idx, bucket) — a pure equi-join, shuffled-hash/SMJ,
    AQE-skew-splittable. A (query, candidate) pair can collide in several
    tables → dedup before scoring.
    """
    if dim is None:
        dim = len(candidates.select(vec_col).first()[0])
    planes = _random_planes(dim, n_tables, n_bits, seed)

    def banded(df: DataFrame, ident: str) -> DataFrame:
        v = _as_double(vec_col)
        tables = F.array(*[_bucket_expr(v, planes[t]) for t in range(n_tables)])
        return df.select(
            F.col(id_col).alias(ident),
            v.alias(f"_v_{ident}"),
            F.posexplode(tables).alias("_tbl", "_bkt"),
        )

    qb = banded(queries, query_id_col)
    cb = banded(candidates, "neighbor_id")
    cand_pairs = (
        qb.join(cb, ["_tbl", "_bkt"], "inner")
        .where(F.col("neighbor_id") != F.col(query_id_col))
        .select(query_id_col, "neighbor_id", f"_v_{query_id_col}", "_v_neighbor_id")
        .dropDuplicates([query_id_col, "neighbor_id"])
    )
    scored = cand_pairs.select(
        query_id_col,
        "neighbor_id",
        cosine_similarity(F.col(f"_v_{query_id_col}"), F.col("_v_neighbor_id")).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id_col, "neighbor_id", "rk", "cos_sim")
    )


def train_centroids(
    candidates: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    sample_rows: int = 10_000,
    iters: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """Driver-side seeded k-means over a bounded sample (IVF coarse
    quantizer). At 100 TB the sample is still bounded — this is a
    deliberately driver-cheap trainer, not MLlib."""
    sample = np.array(
        candidates.select(_as_double(vec_col).alias("v"))
        .limit(sample_rows)
        .toPandas()["v"]
        .tolist()
    )
    rng = np.random.default_rng(seed)
    cent = sample[rng.choice(len(sample), n_centroids, replace=False)]
    for _ in range(iters):
        d = sample @ cent.T
        norms = np.linalg.norm(sample, axis=1, keepdims=True) * np.linalg.norm(cent.T, axis=0, keepdims=True)
        assign = np.argmax(d / np.maximum(norms, 1e-12), axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def _nearest_centroids_expr(vec, centroids: np.ndarray, n: int):
    """Array of the ids of the ``n`` nearest centroids (by cosine)."""
    sims = F.array(
        *[
            cosine_similarity(vec, F.array(*[F.lit(float(x)) for x in c]))
            for c in centroids
        ]
    )
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    pairs = F.arrays_zip(sims.alias("s"), idx.alias("i"))
    ordered = F.reverse(F.array_sort(pairs))
    return F.slice(F.transform(ordered, lambda p: p["i"]), 1, n)


def ivf_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-flat: candidates assigned to their nearest centroid cell; each
    query probes its ``n_probe`` nearest cells; exact cosine within cells."""
    if centroids is None:
        centroids = train_centroids(candidates, n_centroids, vec_col, seed=seed)

    cv = _as_double(vec_col)
    c_assigned = candidates.select(
        F.col(id_col).alias("neighbor_id"),
        cv.alias("_vc"),
        F.element_at(_nearest_centroids_expr(cv, centroids, 1), 1).alias("_cell"),
    )
    q_assigned = queries.select(
        F.col(id_col).alias(query_id_col),
        cv.alias("_vq"),
        F.explode(_nearest_centroids_expr(cv, centroids, n_probe)).alias("_cell"),
    )
    pairs = q_assigned.join(c_assigned, "_cell").where(
        F.col("neighbor_id") != F.col(query_id_col)
    )
    scored = pairs.select(
        query_id_col,
        "neighbor_id",
        cosine_similarity(F.col("_vq"), F.col("_vc")).alias("cos_sim"),
    ).dropDuplicates([query_id_col, "neighbor_id"])
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id_col, "neighbor_id", "rk", "cos_sim")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    n_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b) above ``threshold``:
    LSH-bucketed candidate generation + exact cosine verification."""
    dim = len(df.select(vec_col).first()[0])
    planes = _random_planes(dim, n_tables, n_bits, seed)
    v = _as_double(vec_col)
    tables = F.array(*[_bucket_expr(v, planes[t]) for t in range(n_tables)])
    banded = df.select(
        F.col(id_col), v.alias("_v"), F.posexplode(tables).alias("_tbl", "_bkt")
    )
    a = banded.select(F.col(id_col).alias("a"), F.col("_v").alias("_va"), "_tbl", "_bkt")
    b = banded.select(F.col(id_col).alias("b"), F.col("_v").alias("_vb"), "_tbl", "_bkt")
    return (
        a.join(b, ["_tbl", "_bkt"])
        .where(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
        .withColumn("cos_sim", cosine_similarity(F.col("_va"), F.col("_vb")))
        .where(F.col("cos_sim") >= threshold)
        .select("a", "b", F.round("cos_sim", 6).alias("cos_sim"))
    )
