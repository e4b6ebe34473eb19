"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k (exact) — broadcast the query side,
fold-dot scoring with per-row norms, window top-k. Scale paths:

- ``lsh_topk``: random-hyperplane LSH — bucket both sides by sign bits of
  seeded random projections, equi-join on (table, bucket), exact cosine
  only within buckets. Recall/cost tuned by (n_tables, n_bits).
- ``ivf_topk``: IVF-flat — k-means-lite centroids (seeded deterministic
  sample, fixed Lloyd iterations), assign every vector to its nearest
  centroid, probe ``n_probe`` nearest centroids per query. The coarse
  quantizer is the analog of the reference's kd-tree candidate pruning
  (``/root/reference/pyPPI/kdtree.py:8-48``): bound the candidate set,
  then apply the exact kernel.

Row-side vector math uses the higher-order fold (``functions/vectors.py``
— MEASURED 3-6× faster than unrolled codegen on 64-dim doubles, whose
giant generated methods never JIT); per-row norms are computed once
upstream of any join so per-pair work is a single dot; bulk all-pairs
scoring goes through dense BLAS (``threshold_pairs_exact``). ``dim`` is
passed explicitly wherever plane/centroid shapes are built (no ``first()``
driver peeks: a driver action in a plan-building function is both a hidden
job and a layout-dependence hazard).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vectors import cosine_similarity, dot, dot_literal, l2_norm


def _as_double(col):
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


def _cos(a, b, na, nb, dim: int | None):
    """Pair score from pre-computed per-row norms: dot/(na*nb) — the same
    expression order as ``cosine_similarity`` (bitwise identical), but the
    per-PAIR work is one fold dot; norms are computed once per ROW
    upstream (a full per-pair cosine does 3× the element work)."""
    return dot(a, b, dim) / (na * nb)


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int | None = None,
    ts_col: str | None = None,
    inclusive: bool = False,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small by contract) query side,
    one fold dot per pair (norms precomputed per row), window top-k.

    ``ts_col`` adds the point-in-time causality constraint (see
    ``pit_topk`` for the semantics and scale discussion) — both operators
    share this one implementation so the machinery cannot drift."""
    qcols = [
        F.col(id_col).alias(query_id_col),
        _as_double(vec_col).alias("_q"),
        l2_norm(_as_double(vec_col), dim).alias("_qn"),
    ]
    ccols = [
        F.col(id_col).alias("neighbor_id"),
        _as_double(vec_col).alias("_c"),
        l2_norm(_as_double(vec_col), dim).alias("_cn"),
    ]
    cond = F.col("neighbor_id") != F.col(query_id_col)
    if ts_col is not None:
        qcols.append(F.col(ts_col).alias("_qts"))
        ccols.append(F.col(ts_col).alias("_cts"))
        causal = (
            (F.col("_cts") <= F.col("_qts")) if inclusive
            else (F.col("_cts") < F.col("_qts"))
        )
        cond = causal & cond
    q = queries.select(*qcols)
    c = candidates.select(*ccols)
    pairs = c.join(F.broadcast(q), cond)
    scored = pairs.select(
        query_id_col,
        "neighbor_id",
        _cos(F.col("_q"), F.col("_c"), F.col("_qn"), F.col("_cn"), dim).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id_col, "neighbor_id", "rk", "cos_sim")
    )


def pit_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ts_col: str = "ts",
    query_id_col: str = "query_id",
    inclusive: bool = False,
    dim: int | None = None,
) -> DataFrame:
    """Point-in-time (leak-free) similarity retrieval: for each query
    row, the top-k most cosine-similar candidates whose timestamp is
    strictly before the query's (``inclusive=True`` allows ties in time —
    the probe-side tie flag, same contract as the as-of joins).  This is
    the retrieval primitive for building retrieval-augmented TRAINING
    examples: the retrieved context must not come from the query's
    future, so the causality predicate lives inside the join — zero
    temporal leakage by construction, the repo-wide as-of invariant
    applied to vector search.

    Exact-retrieval contract, same as ``brute_force_topk``: the query set
    broadcasts (small by contract — a probe/eval set), candidates stream
    map-side, per-pair work is ONE fold dot (norms precomputed per row),
    and the causality comparison is a cheap predicate so it is safe
    inside the BroadcastNestedLoopJoin condition (the expensive cosine
    stays in a projection above it).  Scale escape: for large query sets
    run ``ivf_topk``/``lsh_topk`` buckets first and apply the ts
    predicate before the per-bucket top-k — note the recall interaction:
    the top-k AMONG PAST rows may need a deeper ``n_probe`` when the
    unconstrained nearest neighbors are mostly future rows.

    Output: ``(query_id, neighbor_id, rk, cos_sim)`` — rank ordered by
    (cosine desc, neighbor_id), rows with no admissible history are
    absent (no NULL padding), also the as-of convention.  Delegates to
    ``brute_force_topk(ts_col=...)`` — one shared implementation."""
    return brute_force_topk(
        queries, candidates, k=k, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col, dim=dim, ts_col=ts_col, inclusive=inclusive,
    )


def _random_planes(dim: int, n_tables: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_bits, dim))


def _bucket_expr(vec, planes: np.ndarray):
    """Sign-bit bucket id for one LSH table: packed bits of dot(vec, plane)>0.
    Coefficients are literals → pure codegen multiply-adds."""
    bucket = F.lit(0).cast("long")
    for b in range(planes.shape[0]):
        positive = dot_literal(vec, planes[b]) > 0
        bucket = bucket.bitwiseOR(
            F.when(positive, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(F.lit(0).cast("long"))
        )
    return bucket


def _banded(
    df: DataFrame,
    ident: str,
    id_col: str,
    vec_col: str,
    planes: np.ndarray,
    dim: int,
    bucket_strategy: str = "blas",
) -> DataFrame:
    """One row per (vector, LSH table): ident, vector, its norm, (_tbl, _bkt).

    ``blas`` (default): sign bits via one dense matmul per Arrow batch in
    ``mapInPandas`` — V @ P.T then bit-pack, ~100× the per-row JVM
    expression throughput (the vector crosses Arrow once and rides along).
    ``jvm``: pure-JVM fold dots — no Python workers, for deployments that
    forbid them. Either way the table fan-out (posexplode) happens JVM-side
    so the Arrow transfer is one row per vector, not per (vector, table).
    """
    import pandas as pd

    n_tables, n_bits = planes.shape[0], planes.shape[1]
    v = _as_double(vec_col)
    if bucket_strategy == "jvm":
        staged = df.select(
            F.col(id_col).alias(ident),
            v.alias(f"_v_{ident}"),
            l2_norm(v, dim).alias(f"_n_{ident}"),
            *[_bucket_expr(v, planes[t]).alias(f"_b{t}") for t in range(n_tables)],
        )
    elif bucket_strategy == "blas":
        P = planes.reshape(-1, planes.shape[-1]).T  # (D, T*B)
        weights = (1 << np.arange(n_bits)).astype(np.int64)
        id_type = df.select(F.col(id_col)).schema[0].dataType.simpleString()
        schema = (
            f"{ident} {id_type}, _v_{ident} array<double>, _n_{ident} double, "
            + ", ".join(f"_b{t} long" for t in range(n_tables))
        )

        def kernel(batches):
            for b in batches:
                if not len(b):
                    continue
                V = np.stack(b["_v"].to_numpy())
                bits = (V @ P) > 0
                buckets = bits.reshape(len(b), n_tables, n_bits) @ weights
                out = {
                    ident: b["_id"].to_numpy(),
                    f"_v_{ident}": b["_v"].to_numpy(),
                    f"_n_{ident}": np.linalg.norm(V, axis=1),
                }
                for t in range(n_tables):
                    out[f"_b{t}"] = buckets[:, t]
                yield pd.DataFrame(out)

        staged = df.select(F.col(id_col).alias("_id"), v.alias("_v")).mapInPandas(
            kernel, schema=schema
        )
    else:
        raise ValueError(f"unknown bucket_strategy {bucket_strategy!r}")
    return staged.select(
        ident,
        f"_v_{ident}",
        f"_n_{ident}",
        F.posexplode(F.array(*[F.col(f"_b{t}") for t in range(n_tables)])).alias("_tbl", "_bkt"),
    )


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
    bucket_strategy: str = "blas",
) -> DataFrame:
    """Approximate top-k: exact cosine within random-hyperplane buckets.

    ``dim`` is REQUIRED (no silent default): planes built for the wrong
    width make the jvm strategy degenerate silently (null-padded dots put
    every vector in bucket 0 → an O(n²) cross join per table).

    Join key is (table_idx, bucket) — a pure equi-join, shuffled-hash/SMJ,
    AQE-skew-splittable. A (query, candidate) pair can collide in several
    tables → dedup before scoring.
    """
    if dim is None:
        raise ValueError("pass the embedding dim explicitly (e.g. dim=64)")
    planes = _random_planes(dim, n_tables, n_bits, seed)

    qb = _banded(queries, query_id_col, id_col, vec_col, planes, dim, bucket_strategy)
    cb = _banded(candidates, "neighbor_id", id_col, vec_col, planes, dim, bucket_strategy)
    cand_pairs = (
        qb.join(cb, ["_tbl", "_bkt"], "inner")
        .where(F.col("neighbor_id") != F.col(query_id_col))
        .select(
            query_id_col, "neighbor_id",
            f"_v_{query_id_col}", "_v_neighbor_id",
            f"_n_{query_id_col}", "_n_neighbor_id",
        )
        .dropDuplicates([query_id_col, "neighbor_id"])
    )
    scored = cand_pairs.select(
        query_id_col,
        "neighbor_id",
        _cos(
            F.col(f"_v_{query_id_col}"), F.col("_v_neighbor_id"),
            F.col(f"_n_{query_id_col}"), F.col("_n_neighbor_id"), dim,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id_col, "neighbor_id", "rk", "cos_sim")
    )


def _kmeans(sample: np.ndarray, n_centroids: int, iters: int, seed: int) -> np.ndarray:
    """Seeded Lloyd iterations over a bounded in-memory sample (cosine
    assignment, mean update) — shared by the Spark-sampled and file-based
    trainers so both produce identical centroids from identical samples."""
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


def _bounded_sample(
    candidates: DataFrame,
    vec_col: str,
    id_col: str,
    sample_rows: int,
    seed: int,
) -> np.ndarray:
    """The trainers' deterministic bounded sample (shared by
    train_centroids / train_pq / train_ivf_pq so the selection convention
    cannot drift): rows whose seeded id-hash falls in the smallest
    buckets, pre-filtered to ~4x the target from a cheap count, ordered
    by the hash and truncated — unbiased w.r.t. physical layout,
    identical across parallelism levels, O(sample) driver memory."""
    side = candidates.select(_as_double(vec_col).alias("v"), F.col(id_col).alias("_id"))
    n = side.count()
    h = F.pmod(F.xxhash64(F.col("_id"), F.lit(seed)), F.lit(1_000_000))
    if n > 4 * sample_rows:
        side = side.where(h < int(4 * sample_rows / n * 1_000_000) + 1)
    return np.array(side.orderBy(h, "_id").limit(sample_rows).toPandas()["v"].tolist())


def _subspace_kmeans(X: np.ndarray, n_codes: int, iters: int, rng) -> np.ndarray:
    """Seeded Lloyd iterations with squared-L2 assignment (standard PQ —
    subvectors are not unit, unlike the cosine coarse quantizer)."""
    if len(X) < n_codes:
        raise ValueError(
            f"PQ training sample has {len(X)} rows < n_codes={n_codes}; "
            "lower n_codes or raise sample_rows"
        )
    cent = X[rng.choice(len(X), n_codes, replace=False)]
    for _ in range(iters):
        d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ cent.T) + (cent * cent).sum(1)[None, :]
        assign = np.argmin(d2, axis=1)
        for c in range(n_codes):
            members = X[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def _file_sample(
    path: str, vec_col: str, id_col: str, sample_rows: int, seed: int
) -> np.ndarray:
    """Deterministic bounded sample of a parquet file WITHOUT a Spark
    session (pyarrow + numpy) — the selection convention for every
    ``*_from_file`` trainer, used where a quantizer must be reproducible
    outside the engine (e.g. to pin literals into a SQL oracle).
    Sampling: rows ordered by md5 of the id, first N.

    The selection is a BOUNDED single pass: record batches stream through a
    size-``sample_rows`` max-heap keyed on (md5(seed|id), file_row_index) —
    O(sample_rows) memory regardless of table size (a full ``to_pandas()``
    here would be an unbounded driver materialization, the exact hazard the
    Spark-side trainer avoids). The tie-break on the file row index makes
    the result identical to a stable sort of the whole table by the md5 key
    truncated to ``sample_rows``."""
    import hashlib
    import heapq
    import pyarrow.parquet as pq

    # python heapq is a min-heap; to evict the LARGEST retained key we heap
    # on an order-inverted image of (hex_key, row_idx): each hex char maps
    # to 15-minus-its-value (so string order flips) and the index negates
    heap: list[tuple] = []
    inv = str.maketrans("0123456789abcdef", "fedcba9876543210")
    row_idx = 0
    pf = pq.ParquetFile(path)
    for batch in pf.iter_batches(columns=[id_col, vec_col], batch_size=8192):
        ids = batch.column(id_col).to_pylist()
        vecs = batch.column(vec_col).to_pylist()
        for x, v in zip(ids, vecs):
            key = hashlib.md5(f"{seed}|{x}".encode()).hexdigest()
            # max-heap via inverted key: heap[0] is the LARGEST (key, idx)
            item = (key.translate(inv), -row_idx, key, row_idx, v)
            if len(heap) < sample_rows:
                heapq.heappush(heap, item)
            elif (key, row_idx) < (heap[0][2], heap[0][3]):
                heapq.heapreplace(heap, item)
            row_idx += 1
    selected = sorted(heap, key=lambda it: (it[2], it[3]))
    return np.array([it[4] for it in selected], dtype=np.float64)


def train_centroids_from_file(
    path: str,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 10_000,
    iters: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """Train the IVF coarse quantizer as a PURE FUNCTION of a parquet file
    (no Spark session; ``_file_sample`` selection → ``_kmeans``)."""
    V = _file_sample(path, vec_col, id_col, sample_rows, seed)
    return _kmeans(V, n_centroids, iters, seed)


def train_centroids(
    candidates: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 10_000,
    iters: int = 5,
    seed: int = 42,
) -> np.ndarray:
    """Driver-side seeded k-means over a bounded sample (IVF coarse
    quantizer). At 100 TB the sample is still bounded — this is a
    deliberately driver-cheap trainer, not MLlib.

    The sample is a *deterministic pseudo-random* subset: rows whose seeded
    id-hash falls in the smallest buckets, sized from a cheap count()
    (parquet metadata), then ordered by that hash and truncated. Unlike
    ``limit()`` (first-partitions-only → biased, layout-dependent), this is
    unbiased w.r.t. physical layout and identical across parallelism
    levels; the hash pre-filter keeps the TakeOrdered network cost at
    O(sample) instead of O(partitions × sample).
    """
    sample = _bounded_sample(candidates, vec_col, id_col, sample_rows, seed)
    if len(sample) < n_centroids:
        raise ValueError(
            f"training sample has {len(sample)} rows < n_centroids="
            f"{n_centroids}; lower n_centroids or raise sample_rows"
        )
    return _kmeans(sample, n_centroids, iters, seed)


def _nearest_centroids_expr(vec, centroids: np.ndarray, n: int, vnorm=None):
    """Array of the ids of the ``n`` nearest centroids (by cosine). Centroid
    coefficients and norms are literals; pass ``vnorm`` (a pre-computed
    norm column) so the row vector's norm is computed once per row."""
    dim = centroids.shape[1]
    if vnorm is None:
        vnorm = l2_norm(vec, dim)
    sims = F.array(
        *[
            dot_literal(vec, c) / (vnorm * F.lit(float(np.linalg.norm(c))))
            for c in centroids
        ]
    )
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))
    pairs = F.arrays_zip(sims.alias("s"), idx.alias("i"))
    ordered = F.reverse(F.array_sort(pairs))
    return F.slice(F.transform(ordered, lambda p: p["i"]), 1, n)


def _assign_cells_blas(
    df: DataFrame,
    ident: str,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    n: int,
) -> DataFrame:
    """(id, vec, norm, n-nearest-centroid-id array) via one dense matmul
    per Arrow batch — the assignment path for LARGE coarse quantizers
    (≥~64 centroids), where per-row fold dots cost n_centroids × dim
    expression work per vector while BLAS does the whole batch in one
    V @ C.T. Tie order matches the expr path exactly (descending sim,
    then descending centroid id), via a stable argsort over the reversed
    column order."""
    import pandas as pd

    C = centroids.astype(np.float64)
    Cn = np.linalg.norm(C, axis=1)
    nc = len(C)
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{ident} {id_type}, _v array<double>, _n double, _cells array<int>"

    def kernel(batches):
        for b in batches:
            if not len(b):
                continue
            V = np.stack(b["_v"].to_numpy()).astype(np.float64)
            Vn = np.linalg.norm(V, axis=1)
            S = (V @ C.T) / np.maximum(Vn[:, None] * Cn[None, :], 1e-300)
            # ties → HIGHER centroid id first (the expr path's
            # reverse(array_sort) order): stable argsort over reversed
            # columns, indices mapped back
            ord_rev = np.argsort(-S[:, ::-1], axis=1, kind="stable")
            order = (nc - 1) - ord_rev
            yield pd.DataFrame(
                {
                    ident: b["_id"].to_numpy(),
                    "_v": b["_v"].to_numpy(),
                    "_n": Vn,
                    "_cells": list(order[:, :n].astype("int32")),
                }
            )

    return df.select(F.col(id_col).alias("_id"), _as_double(vec_col).alias("_v")).mapInPandas(
        kernel, schema=schema
    )


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
    assign_strategy: str = "expr",
) -> DataFrame:
    """IVF-flat: candidates assigned to their nearest centroid cell; each
    query probes its ``n_probe`` nearest cells; exact cosine within cells.

    ``assign_strategy``: ``expr`` (JVM fold dots per centroid — no Python
    workers, the oracle-stable default, right up to a few dozen centroids)
    or ``blas`` (one matmul per Arrow batch — the scale path when the
    quantizer has hundreds/thousands of cells; same tie order, but BLAS
    reduction order can flip an assignment whose two best cells are within
    1 ULP — irrelevant to an ANN contract). Final scoring is the exact JVM
    fold in both modes."""
    if centroids is None:
        centroids = train_centroids(candidates, n_centroids, vec_col, id_col=id_col, seed=seed)
    if assign_strategy not in ("expr", "blas"):
        raise ValueError(f"unknown assign_strategy {assign_strategy!r}")
    dim = centroids.shape[1]

    cv = _as_double(vec_col)
    if assign_strategy == "blas":
        # norms for SCORING are recomputed as the JVM fold (not the numpy
        # norm the kernel used for assignment): scores must be bitwise
        # identical across assignment strategies and to the oracle
        c_assigned = _assign_cells_blas(candidates, "neighbor_id", id_col, vec_col, centroids, 1).select(
            "neighbor_id", F.col("_v").alias("_vc"), l2_norm(F.col("_v"), dim).alias("_cn"),
            F.element_at("_cells", 1).alias("_cell"),
        )
        q_assigned = _assign_cells_blas(queries, query_id_col, id_col, vec_col, centroids, n_probe).select(
            query_id_col, F.col("_v").alias("_vq"), l2_norm(F.col("_v"), dim).alias("_qn"),
            F.explode("_cells").alias("_cell"),
        )
    else:
        c_assigned = candidates.select(
            F.col(id_col).alias("neighbor_id"), cv.alias("_vc"), l2_norm(cv, dim).alias("_cn")
        ).select(
            "neighbor_id", "_vc", "_cn",
            F.element_at(_nearest_centroids_expr(F.col("_vc"), centroids, 1, F.col("_cn")), 1).alias("_cell"),
        )
        q_assigned = queries.select(
            F.col(id_col).alias(query_id_col), cv.alias("_vq"), l2_norm(cv, dim).alias("_qn")
        ).select(
            query_id_col, "_vq", "_qn",
            F.explode(_nearest_centroids_expr(F.col("_vq"), centroids, n_probe, F.col("_qn"))).alias("_cell"),
        )
    pairs = q_assigned.join(c_assigned, "_cell").where(
        F.col("neighbor_id") != F.col(query_id_col)
    )
    scored = pairs.select(
        query_id_col,
        "neighbor_id",
        _cos(F.col("_vq"), F.col("_vc"), F.col("_qn"), F.col("_cn"), dim).alias("cos_sim"),
    ).dropDuplicates([query_id_col, "neighbor_id"])
    w = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(query_id_col, "neighbor_id", "rk", "cos_sim")
    )


def threshold_pairs_exact(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    guard: float = 1e-6,
    n_blocks: int | None = None,
    block_budget_bytes: int = 512 * 1024 * 1024,
) -> DataFrame:
    """EXACT all-pairs cosine threshold join (a < b), two-phase:

    1. **prune**: ``mapInPandas`` streams one side; each Arrow batch does a
       dense BLAS matmul against the other side held as a broadcast numpy
       matrix → candidate pairs with cos ≥ threshold − ``guard``. This is
       where the O(n²·d) flops happen — vectorized, ~100× the throughput of
       any per-pair JVM expression, and never inside a join condition
       (a theta-join would evaluate the dot interpreted per ordered pair
       inside BroadcastNestedLoopJoin).
    2. **verify**: the small survivor set joins back to the vectors and is
       re-scored with the sequential-order codegen dot — bitwise identical
       to a naive loop (and to DuckDB's ``list_dot_product``), so the exact
       ``>= threshold`` boundary and the reported value are engine-stable.

    BLAS reordering perturbs the score by ≲1e-12 for unit vectors, so any
    true pair survives the guarded prune; phase 2 re-applies the exact
    predicate, so no false pair survives either — the output equals the
    brute-force join exactly.

    Scale contract: driver and executors hold ``ceil(N / n_blocks)`` matrix
    rows at a time. ``n_blocks=1`` broadcasts the whole set (the broadcast
    hash join contract — one prune job); ``n_blocks>1`` partitions the
    matrix side by a deterministic id hash and runs one prune pass per
    block SEQUENTIALLY — each pass materializes its survivors (eager
    ``localCheckpoint``) and destroys its broadcast before the next loads,
    so peak memory is one block regardless of N while exactness is
    preserved (blocks partition the matrix side: every (a, b) pair is
    scored in exactly the one pass owning b). Wall cost is unchanged
    O(n²·d) flops + n_blocks job launches.

    ``n_blocks=None`` (default) SIZES ITSELF: one cheap ``count()``
    estimates the matrix bytes (N·d·8, doubled for the normalized copy +
    Arrow staging) and picks ``ceil(bytes / block_budget_bytes)`` — a
    hand-guessed block count that is too small is not a slow run, it is a
    driver/executor OOM in the ``toPandas`` materialization, so the
    default must never depend on the caller knowing N. Pass an explicit
    ``n_blocks`` to override (e.g. to force single-block for tiny inputs
    without paying the count). For sets where even O(n²) *scoring* is too
    much, switch to ``embedding_neardup_pairs`` (LSH).
    """
    import math

    import pandas as pd

    spark = df.sparkSession
    if n_blocks is None:
        n_rows = df.count()  # parquet-metadata cheap
        approx_bytes = 2 * n_rows * dim * 8
        n_blocks = max(1, math.ceil(approx_bytes / block_budget_bytes))
    if n_blocks < 1:
        raise ValueError("n_blocks must be >= 1")
    id_type = df.schema[id_col].dataType.simpleString()
    side = df.select(F.col(id_col).alias("_id"), _as_double(vec_col).alias("_v"))
    # the O(n²·d) matmul lives in the mapInPandas over THIS side — testdata
    # parquet is one row group (one scan partition), which would serialize
    # the whole prune onto a single core; spread the (id, vec) rows across
    # the cluster first (tiny shuffle, scale-adaptive width)
    stream = side.repartition(spark.sparkContext.defaultParallelism)
    cut = threshold - guard
    cand_schema = f"a {id_type}, b {id_type}"

    def make_prune(bc):
        def prune(batches):
            b_ids, b_Mn = bc.value
            for b in batches:
                if not len(b):
                    continue
                A = np.stack(b["_v"].to_numpy()).astype(np.float64)
                An = A / np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)
                S = An @ b_Mn.T
                ai, bi = np.nonzero(S >= cut)
                out = pd.DataFrame({"a": b["_id"].to_numpy()[ai], "b": b_ids[bi]})
                yield out[out.a < out.b]

        return prune

    cand = None
    for blk in range(n_blocks):
        block_side = (
            side
            if n_blocks == 1
            else side.where(F.pmod(F.xxhash64("_id"), F.lit(n_blocks)) == blk)
        )
        pdf = block_side.toPandas()  # bounded: one matrix block (see contract)
        if not len(pdf):
            continue
        ids = pdf["_id"].to_numpy()
        M = np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
        # ship the block as a real Spark broadcast — one copy per executor,
        # not re-pickled into every task closure
        bc = spark.sparkContext.broadcast((ids, Mn))
        blk_cand = stream.mapInPandas(make_prune(bc), schema=cand_schema)
        if n_blocks > 1:
            # run this block's prune NOW and pin only its (small) survivor
            # set, so the next block's broadcast replaces — not stacks on —
            # this one
            blk_cand = blk_cand.localCheckpoint(eager=True)
            bc.destroy()
        cand = blk_cand if cand is None else cand.unionByName(blk_cand)
    if cand is None:
        return spark.createDataFrame([], f"a {id_type}, b {id_type}, cos_sim double")
    va = df.select(
        F.col(id_col).alias("a"),
        _as_double(vec_col).alias("_va"),
        l2_norm(_as_double(vec_col), dim).alias("_na"),
    )
    vb = df.select(
        F.col(id_col).alias("b"),
        _as_double(vec_col).alias("_vb"),
        l2_norm(_as_double(vec_col), dim).alias("_nb"),
    )
    return (
        cand.join(va, "a").join(vb, "b")
        .withColumn("cos_sim", _cos(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb"), dim))
        .where(F.col("cos_sim") >= threshold)
        .select("a", "b", "cos_sim")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 8,
    n_bits: int = 8,
    seed: int = 42,
    dim: int | None = None,
    bucket_strategy: str = "blas",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b) above ``threshold``:
    LSH-bucketed candidate generation + exact cosine verification.
    ``dim`` is required — see lsh_topk. Note the two bucket strategies can
    disagree on pairs within 1 ULP of ``threshold`` (numpy vs JVM-fold
    norm summation order); the candidate-generation stage is approximate
    by construction either way."""
    if dim is None:
        raise ValueError("pass the embedding dim explicitly (e.g. dim=64)")
    planes = _random_planes(dim, n_tables, n_bits, seed)
    banded = _banded(df, "x", id_col, vec_col, planes, dim, bucket_strategy)
    a = banded.select(
        F.col("x").alias("a"), F.col("_v_x").alias("_va"), F.col("_n_x").alias("_na"),
        "_tbl", "_bkt",
    )
    b = banded.select(
        F.col("x").alias("b"), F.col("_v_x").alias("_vb"), F.col("_n_x").alias("_nb"),
        "_tbl", "_bkt",
    )
    return (
        a.join(b, ["_tbl", "_bkt"])
        .where(F.col("a") < F.col("b"))
        .dropDuplicates(["a", "b"])
        .withColumn("cos_sim", _cos(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb"), dim))
        .where(F.col("cos_sim") >= threshold)
        .select("a", "b", F.round("cos_sim", 6).alias("cos_sim"))
    )


def semantic_dedup_pairs(
    df: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    assign_strategy: str = "blas",
    guard: float = 1e-6,
    block_budget_bytes: int = 512 * 1024 * 1024,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    arXiv:2303.09540): assign every vector to its nearest k-means
    centroid by cosine, then compare pairs ONLY within a cluster —
    (a, b, cos_sim, cell) for within-cluster cosine >= ``threshold``,
    a < b. Unlike ``embedding_neardup_pairs`` (random-hyperplane LSH,
    probabilistic recall) the cluster structure is DATA-adapted: semantic
    duplicates concentrate in the same cell, and the miss mode is
    documented (a pair straddling a cell boundary), not random.

    100 TB shape: pairwise work is Σ|cell|² instead of N² — with
    k ≈ N / target_cell_size the scoring stays linear-ish in N.
    ``assign_strategy='blas'`` (the production path) scores within-cell
    pairs the same two-phase way as ``threshold_pairs_exact``: a
    ``mapInPandas`` BLAS prune (one dense matmul per (batch, cell) slice
    against the broadcast same-cell matrix, guarded by ``guard``) emits
    only candidate pairs, and the small survivor set is re-verified with
    the exact JVM fold dot over the kernel's numpy norms — bitwise
    identical to the naive within-cell join, at O(survivors) join cost
    instead of materializing Σ|cell|² vector-carrying rows (a cell
    self-join puts the interpreted HOF cosine in the join condition —
    the BNLJ trap, see BENCH/BASELINE.md). The broadcast matrix side is
    blocked by ``block_budget_bytes`` (sequential passes, peak memory
    one block — the threshold_pairs_exact contract). ``'expr'`` keeps
    the pure-JVM cell self-join (no Python workers); both use the
    identical assignment tie order (descending sim, then descending
    centroid id), so results are strategy-independent. Train centroids
    with ``train_centroids`` (Spark sample) or
    ``train_centroids_from_file`` (oracle-pinnable pure function of the
    parquet)."""
    import math

    import pandas as pd

    if dim is None:
        raise ValueError("pass the embedding dim explicitly (e.g. dim=64)")
    if assign_strategy == "blas":
        spark = df.sparkSession
        assigned = _assign_cells_blas(df, "x", id_col, vec_col, centroids, 1)
        assigned = assigned.select(
            "x", "_v", "_n", F.element_at("_cells", 1).alias("_cell")
        )
        # materialize the assignment ONCE (scale-adaptive width — the
        # testdata parquet is one row group, i.e. one scan partition): it
        # feeds the broadcast collect, the prune stream, and both verify
        # sides below; without the checkpoint the mapInPandas assignment
        # would re-run four times
        assigned = assigned.repartition(
            spark.sparkContext.defaultParallelism
        ).localCheckpoint(eager=True)
        n_rows = df.count()  # parquet-metadata cheap
        approx_bytes = 2 * n_rows * dim * 8
        n_blocks = max(1, math.ceil(approx_bytes / block_budget_bytes))
        id_type = df.schema[id_col].dataType.simpleString()
        cut = threshold - guard
        cand_schema = f"a {id_type}, b {id_type}, _cell int"

        def make_prune(bc):
            def prune(batches):
                groups = bc.value  # {cell: (ids, normalized matrix)}
                for bt in batches:
                    if not len(bt):
                        continue
                    cells = bt["_cell"].to_numpy()
                    ids_a = bt["x"].to_numpy()
                    V = np.stack(bt["_v"].to_numpy()).astype(np.float64)
                    Vn = V / np.maximum(
                        np.linalg.norm(V, axis=1, keepdims=True), 1e-300
                    )
                    for c in np.unique(cells):
                        grp = groups.get(int(c))
                        if grp is None:
                            continue
                        b_ids, Mn = grp
                        sel = cells == c
                        S = Vn[sel] @ Mn.T
                        ai, bi = np.nonzero(S >= cut)
                        if not len(ai):
                            continue
                        a_arr = ids_a[sel][ai]
                        b_arr = b_ids[bi]
                        keep = a_arr < b_arr
                        if not keep.any():
                            continue
                        yield pd.DataFrame(
                            {
                                "a": a_arr[keep],
                                "b": b_arr[keep],
                                "_cell": np.full(
                                    int(keep.sum()), c, dtype="int32"
                                ),
                            }
                        )

            return prune

        # blocks partition the MATRIX side (every (a, b) pair is scored in
        # exactly the one pass owning b), so peak broadcast memory is one
        # block regardless of N — same contract as threshold_pairs_exact
        cand = None
        for blk in range(n_blocks):
            block_side = (
                assigned
                if n_blocks == 1
                else assigned.where(F.pmod(F.xxhash64("x"), F.lit(n_blocks)) == blk)
            )
            pdf = block_side.select("x", "_cell", "_v").toPandas()
            if not len(pdf):
                continue
            groups = {}
            for c, sub in pdf.groupby("_cell"):
                M = np.stack(sub["_v"].to_numpy()).astype(np.float64)
                Mn = M / np.maximum(
                    np.linalg.norm(M, axis=1, keepdims=True), 1e-300
                )
                groups[int(c)] = (sub["x"].to_numpy(), Mn)
            bc = spark.sparkContext.broadcast(groups)
            blk_cand = assigned.select("x", "_v", "_cell").mapInPandas(
                make_prune(bc), schema=cand_schema
            )
            if n_blocks > 1:
                blk_cand = blk_cand.localCheckpoint(eager=True)
                bc.destroy()
            cand = blk_cand if cand is None else cand.unionByName(blk_cand)
        if cand is None:
            return spark.createDataFrame(
                [], f"a {id_type}, b {id_type}, cos_sim double, cell int"
            )
        # verify: survivors re-scored with the JVM fold dot over the SAME
        # kernel-computed numpy norms the join form used — bitwise
        # identical cos_sim, exact >= threshold boundary; cost is
        # O(survivors), not O(Σ|cell|²)
        va = assigned.select(
            F.col("x").alias("a"), F.col("_v").alias("_va"), F.col("_n").alias("_na")
        )
        vb = assigned.select(
            F.col("x").alias("b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb")
        )
        return (
            cand.join(va, "a")
            .join(vb, "b")
            .withColumn(
                "cos_sim",
                _cos(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb"), dim),
            )
            .where(F.col("cos_sim") >= threshold)
            .select(
                "a", "b", F.round("cos_sim", 6).alias("cos_sim"),
                F.col("_cell").cast("int").alias("cell"),
            )
        )
    elif assign_strategy == "expr":
        base = df.select(
            F.col(id_col).alias("x"), _as_double(vec_col).alias("_v")
        ).withColumn("_n", l2_norm(F.col("_v"), dim))
        assigned = base.withColumn(
            "_cell",
            F.element_at(
                _nearest_centroids_expr(F.col("_v"), centroids, 1, F.col("_n")), 1
            ),
        )
    else:
        raise ValueError(f"unknown assign_strategy {assign_strategy!r}")
    a = assigned.select(
        F.col("x").alias("a"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"), "_cell",
    )
    b = assigned.select(
        F.col("x").alias("b"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"), "_cell",
    )
    return (
        a.join(b, "_cell")
        .where(F.col("a") < F.col("b"))
        .withColumn(
            "cos_sim",
            _cos(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb"), dim),
        )
        .where(F.col("cos_sim") >= threshold)
        .select(
            "a", "b", F.round("cos_sim", 6).alias("cos_sim"),
            F.col("_cell").cast("int").alias("cell"),
        )
    )


def semantic_dedup(
    df: DataFrame,
    centroids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    assign_strategy: str = "blas",
) -> DataFrame:
    """SemDeDup end-to-end: within-cluster cosine pairs above
    ``threshold`` → transitive connected-component survivors (min id per
    component, the same representative rule as every other dedup family
    in this engine — deterministic, unlike the paper's random keeper).
    Returns the surviving rows of ``df`` (all columns)."""
    from .dedup import near_dedup_representatives

    pairs = semantic_dedup_pairs(
        df, centroids, threshold=threshold, id_col=id_col, vec_col=vec_col,
        dim=dim, assign_strategy=assign_strategy,
    )
    return near_dedup_representatives(df, pairs.select("a", "b"), id_col=id_col)


# ------------------------------------------------------------------ PQ

def train_pq(
    candidates: DataFrame,
    m: int = 16,
    n_codes: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 10_000,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """Train product-quantization codebooks (Jégou et al., "Product
    quantization for nearest neighbor search"): split the (L2-normalized)
    vector into ``m`` contiguous subvectors and run seeded k-means with
    ``n_codes`` centroids in each subspace → codebooks of shape
    (m, n_codes, dim/m). A PQ code stores a vector in m·log2(n_codes)
    bits — at the defaults 80 bits vs 64×8 bytes, the ~50× compression
    that lets a billion-vector index live in executor memory (the reason
    IVF-*flat* stops scaling: it re-reads full vectors per probe).

    Sampling and the per-subspace Lloyd loop reuse the IVF trainer's
    machinery (bounded deterministic sample, driver-side numpy — see
    ``train_centroids`` for why not MLlib). Vectors are L2-normalized
    BEFORE splitting so the asymmetric-distance dot approximates cosine.
    """
    sample = _bounded_sample(candidates, vec_col, id_col, sample_rows, seed)
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sample = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    sub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, n_codes, sub), dtype=np.float64)
    for j in range(m):
        books[j] = _subspace_kmeans(sample[:, j * sub:(j + 1) * sub], n_codes, iters, rng)
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): each vector L2-normalized, split into
    subvectors, each assigned its nearest codebook centroid (squared L2)
    — one BLAS pass per Arrow batch per subspace, broadcast codebooks,
    ZERO shuffle (encoding is row-local; the plan is scan → mapInPandas).
    The encoded table is what a 100 TB corpus materializes once and
    serves many query batches from."""
    import pandas as pd

    B = codebooks.astype(np.float64)
    m, n_codes, sub = B.shape
    id_type = df.schema[id_col].dataType.simpleString()
    bc = df.sparkSession.sparkContext.broadcast(B)

    def kernel(batches):
        books = bc.value
        for b in batches:
            if not len(b):
                continue
            V = np.stack(b["_v"].to_numpy()).astype(np.float64)
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(V), m), dtype=np.int32)
            for j in range(m):
                S = V[:, j * sub:(j + 1) * sub]
                C = books[j]
                d2 = (S * S).sum(1)[:, None] - 2.0 * (S @ C.T) + (C * C).sum(1)[None, :]
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame({id_col: b["_id"].to_numpy(), "codes": list(codes)})

    staged = df.select(F.col(id_col).alias("_id"), _as_double(vec_col).alias("_v"))
    return staged.mapInPandas(kernel, schema=f"{id_col} {id_type}, codes array<int>")


def _exact_rerank(
    shortlist: DataFrame,
    rerank: DataFrame,
    qids: list,
    Qraw: np.ndarray,
    dim: int,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    id_type: str,
) -> DataFrame:
    """Shared second stage of the PQ searchers: re-score the ADC
    shortlist with exact JVM-fold cosine against the original vectors and
    take the exact top-k. One inner join against the vector table (only
    shortlist rows are read back) + a broadcast of the tiny query set."""
    cv = _as_double(vec_col)
    cvec = rerank.select(
        F.col(id_col).alias("neighbor_id"), cv.alias("_vc"), l2_norm(cv, dim).alias("_cn")
    )
    qvec = rerank.sparkSession.createDataFrame(
        [(q, [float(x) for x in v]) for q, v in zip(qids, Qraw)],
        f"{query_id_col} {id_type}, _vq array<double>",
    ).select(query_id_col, "_vq", l2_norm(F.col("_vq"), dim).alias("_qn"))
    exact = (
        shortlist.join(cvec, "neighbor_id")
        .join(F.broadcast(qvec), query_id_col)
        .select(
            query_id_col, "neighbor_id",
            _cos(F.col("_vq"), F.col("_vc"), F.col("_qn"), F.col("_cn"), dim).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy(query_id_col).orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        exact.withColumn("rk", F.row_number().over(w2))
        .where(F.col("rk") <= k)
        .select(query_id_col, "neighbor_id", "rk", F.round("cos_sim", 6).alias("cos_sim"))
    )


def pq_topk(
    queries: DataFrame,
    codes_df: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
    dim: int | None = None,
    max_queries: int = 10_000,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: for each query build the
    m × n_codes lookup table LUT[j][c] = q_j · codebook[j][c] (driver-side,
    tiny), broadcast all LUTs, and score every encoded candidate with m
    table lookups + adds per vector — no decode, no full-vector reads.
    Per-partition top-k' in the kernel bounds the output at
    (queries × k' × partitions) rows before the exact global window.

    ``rerank``: pass the ORIGINAL vector table to re-score the top
    ``rerank_factor × k`` ADC candidates with exact JVM-fold cosine — the
    standard two-stage serving shape (ADC recall@4k is near-1, exact
    re-rank restores exact ordering). Output matches ``brute_force_topk``
    columns; ``cos_sim`` is the ADC approximation when ``rerank`` is None.

    The query set is collected to the driver (LUT construction) and
    guarded by ``max_queries`` — ANN serving batches are bounded; for an
    unbounded query table use ``ivf_topk``/``lsh_topk``.
    """
    import pandas as pd

    B = codebooks.astype(np.float64)
    m, n_codes, sub = B.shape
    qrows = queries.select(
        F.col(id_col).alias("_qid"), _as_double(vec_col).alias("_v")
    ).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"pq_topk: > max_queries={max_queries} query rows; PQ serving "
            "expects bounded query batches — use ivf_topk/lsh_topk for "
            "query tables"
        )
    qids = [r["_qid"] for r in qrows]
    Q = np.array([r["_v"] for r in qrows], dtype=np.float64)
    Q = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    # LUT[q, j, c] = q_sub_j . B[j, c]
    lut = np.einsum("qjs,jcs->qjc", Q.reshape(len(Q), m, sub), B)
    bc = codes_df.sparkSession.sparkContext.broadcast((qids, lut))
    kk = max(k, rerank_factor * k if rerank is not None else k)
    id_type = codes_df.schema[id_col].dataType.simpleString()

    def kernel(batches):
        qids_b, lut_b = bc.value
        nq = len(qids_b)
        for b in batches:
            if not len(b):
                continue
            codes = np.stack(b["codes"].to_numpy()).astype(np.int64)  # N x m
            ids = b[id_col].to_numpy()
            # scores: for each query, sum_j LUT[q, j, codes[:, j]] -> N
            out_q, out_id, out_s = [], [], []
            for qi in range(nq):
                s = lut_b[qi][np.arange(m)[None, :], codes].sum(axis=1)  # N
                mask = ids != qids_b[qi]
                sm, idm = s[mask], ids[mask]
                # (score desc, id asc) total order: batch cut independent
                # of physical row order (determinism invariant)
                top = np.lexsort((idm, -sm))[:kk]
                out_q.extend([qids_b[qi]] * len(top))
                out_id.extend(idm[top])
                out_s.extend(sm[top])
            yield pd.DataFrame({query_id_col: out_q, "neighbor_id": out_id, "_adc": out_s})

    cand = codes_df.mapInPandas(
        kernel, schema=f"{query_id_col} {id_type}, neighbor_id {id_type}, _adc double"
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("_adc").desc(), "neighbor_id")
    shortlist = cand.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") <= kk)
    if rerank is None:
        return shortlist.select(
            query_id_col, "neighbor_id", F.col("_rk").alias("rk"),
            F.round("_adc", 6).alias("cos_sim"),
        ).where(F.col("rk") <= k)
    d = dim or codebooks.shape[0] * codebooks.shape[2]
    Qraw = np.array([r["_v"] for r in qrows], dtype=np.float64)
    return _exact_rerank(
        shortlist, rerank, qids, Qraw, d, k, id_col, vec_col, query_id_col, id_type
    )


def train_ivf_pq(
    candidates: DataFrame,
    n_centroids: int = 16,
    m: int = 16,
    n_codes: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 10_000,
    iters: int = 8,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """Train the IVFADC index of Jégou et al.: a coarse quantizer
    (``n_centroids`` cells over L2-normalized vectors) plus PQ codebooks
    trained on the RESIDUALS v − centroid(v). Residual PQ is what makes
    IVF-PQ beat flat PQ: residual magnitudes are a fraction of vector
    magnitudes, so the same code budget quantizes far finer. Returns
    (centroids (n_centroids, dim), codebooks (m, n_codes, dim/m)) — both
    pure functions of (data sample, seed)."""
    sample = _bounded_sample(candidates, vec_col, id_col, sample_rows, seed)
    return _train_ivf_pq_core(sample, n_centroids, m, n_codes, iters, seed)


def _train_ivf_pq_core(
    sample: np.ndarray, n_centroids: int, m: int, n_codes: int, iters: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Shared IVFADC training body (Spark-sampled and file-pinned trainers
    feed it the same-shape float64 sample so the math cannot drift)."""
    dim = sample.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if len(sample) < max(n_centroids, n_codes):
        raise ValueError(
            f"training sample has {len(sample)} rows < "
            f"max(n_centroids, n_codes)={max(n_centroids, n_codes)}"
        )
    S = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    cent = _kmeans(S.copy(), n_centroids, iters, seed)
    # residuals w.r.t. the EUCLIDEAN-nearest cell (the assignment pq
    # encode/search will use; cosine vs L2 agree on unit vectors for the
    # argmin up to the centroid-norm term, so pin one: L2)
    d2 = (S * S).sum(1)[:, None] - 2.0 * (S @ cent.T) + (cent * cent).sum(1)[None, :]
    R = S - cent[np.argmin(d2, axis=1)]
    sub = dim // m
    rng = np.random.default_rng(seed + 1)
    books = np.empty((m, n_codes, sub), dtype=np.float64)
    for j in range(m):
        books[j] = _subspace_kmeans(R[:, j * sub:(j + 1) * sub], n_codes, iters, rng)
    return cent, books


def train_ivf_pq_from_file(
    path: str,
    n_centroids: int = 16,
    m: int = 16,
    n_codes: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 10_000,
    iters: int = 8,
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """Train the IVFADC index as a PURE FUNCTION of a parquet file (no
    Spark session): ``_file_sample`` selection → the same training body as
    ``train_ivf_pq``. Lets a SQL oracle inline the exact centroids and
    codebooks the engine query uses (the ``train_centroids_from_file``
    pattern extended to PQ)."""
    V = _file_sample(path, vec_col, id_col, sample_rows, seed)
    return _train_ivf_pq_core(V, n_centroids, m, n_codes, iters, seed)


def ivf_pq_encode(
    df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, codes): assign each (normalized) vector its L2-nearest
    cell and PQ-encode the residual — ONE zero-shuffle Arrow kernel (at
    100 TB this runs once per corpus; write the output partitioned or
    bucketed by ``cell`` so query probes prune at the storage layer)."""
    import pandas as pd

    C = centroids.astype(np.float64)
    B = codebooks.astype(np.float64)
    m, n_codes, sub = B.shape
    id_type = df.schema[id_col].dataType.simpleString()
    bc = df.sparkSession.sparkContext.broadcast((C, B))

    def kernel(batches):
        Cb, Bb = bc.value
        for b in batches:
            if not len(b):
                continue
            V = np.stack(b["_v"].to_numpy()).astype(np.float64)
            V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            d2 = (V * V).sum(1)[:, None] - 2.0 * (V @ Cb.T) + (Cb * Cb).sum(1)[None, :]
            cell = np.argmin(d2, axis=1)
            R = V - Cb[cell]
            codes = np.empty((len(V), m), dtype=np.int32)
            for j in range(m):
                Rj = R[:, j * sub:(j + 1) * sub]
                Cj = Bb[j]
                dd = (Rj * Rj).sum(1)[:, None] - 2.0 * (Rj @ Cj.T) + (Cj * Cj).sum(1)[None, :]
                codes[:, j] = np.argmin(dd, axis=1)
            yield pd.DataFrame(
                {id_col: b["_id"].to_numpy(), "cell": cell.astype("int32"), "codes": list(codes)}
            )

    staged = df.select(F.col(id_col).alias("_id"), _as_double(vec_col).alias("_v"))
    return staged.mapInPandas(kernel, schema=f"{id_col} {id_type}, cell int, codes array<int>")


def ivf_pq_topk(
    queries: DataFrame,
    index_df: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    rerank: DataFrame | None = None,
    rerank_factor: int = 4,
    max_queries: int = 10_000,
) -> DataFrame:
    """IVFADC search: each query probes its ``n_probe`` nearest cells and
    scores only candidates in those cells, by asymmetric distance over
    RESIDUAL codes — LUT[q, cell, j, c] = (q − centroid_cell)_j ·
    codebook[j][c], plus the constant q·centroid_cell term, approximates
    q·v. The per-(query, cell) LUT tensor is
    queries × n_probe × m × n_codes doubles (driver-tiny), broadcast
    once. Candidates outside probed cells cost ZERO work per query (and
    at rest, with the index written cell-partitioned, zero I/O). Optional
    exact re-rank identical to ``pq_topk``."""
    import pandas as pd

    C = centroids.astype(np.float64)
    B = codebooks.astype(np.float64)
    m, n_codes, sub = B.shape
    dim = C.shape[1]
    qrows = queries.select(
        F.col(id_col).alias("_qid"), _as_double(vec_col).alias("_v")
    ).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(f"ivf_pq_topk: > max_queries={max_queries} query rows")
    qids = [r["_qid"] for r in qrows]
    Qraw = np.array([r["_v"] for r in qrows], dtype=np.float64)
    Q = Qraw / np.maximum(np.linalg.norm(Qraw, axis=1, keepdims=True), 1e-12)
    d2 = (Q * Q).sum(1)[:, None] - 2.0 * (Q @ C.T) + (C * C).sum(1)[None, :]
    probes = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]          # Q x P
    # inner-product ADC over residual codes: q·v = q·(c + r) = q·c + q·r,
    # so the LUT uses the QUERY subvectors (one table per query, shared
    # across its probed cells) and the q·c term is the per-cell constant.
    # Building the LUT from (q − c) instead would score q·v − c·r — a
    # per-candidate bias that mis-ranks (the L2-ADC residual form needs
    # the ‖r‖² term too; for normalized vectors the IP form is exact).
    lut = np.einsum("qjs,jcs->qjc", Q.reshape(len(Q), m, sub), B)        # Q x m x codes
    const = np.einsum("qd,qpd->qp", Q, C[probes])                        # q . centroid
    # prune the index scan to the UNION of probed cells BEFORE the kernel:
    # over a cell-partitioned index (write_ivf_pq_index) this predicate
    # becomes storage-level partition pruning — unprobed cells cost zero
    # I/O, not just zero kernel work
    probed_cells = sorted({int(c) for c in probes.ravel()})
    index_df = index_df.where(F.col("cell").isin(probed_cells))
    bc = index_df.sparkSession.sparkContext.broadcast((qids, probes, lut, const))
    kk = max(k, rerank_factor * k if rerank is not None else k)
    id_type = index_df.schema[id_col].dataType.simpleString()

    def kernel(batches):
        qids_b, probes_b, lut_b, const_b = bc.value
        for b in batches:
            if not len(b):
                continue
            cells = b["cell"].to_numpy()
            codes = np.stack(b["codes"].to_numpy()).astype(np.int64)
            ids = b[id_col].to_numpy()
            out_q, out_id, out_s = [], [], []
            for qi in range(len(qids_b)):
                for pi in range(probes_b.shape[1]):
                    mask = (cells == probes_b[qi, pi]) & (ids != qids_b[qi])
                    if not mask.any():
                        continue
                    cm = codes[mask]
                    s = lut_b[qi][np.arange(m)[None, :], cm].sum(axis=1) + const_b[qi, pi]
                    idm = ids[mask]
                    # total order (score desc, id asc): the per-batch cut
                    # is then independent of physical row order — ties at
                    # the kk boundary resolve identically at any
                    # partitioning (repo invariant: features identical
                    # across parallelism levels)
                    top = np.lexsort((idm, -s))[:kk]
                    out_q.extend([qids_b[qi]] * len(top))
                    out_id.extend(idm[top])
                    out_s.extend(s[top])
            yield pd.DataFrame({query_id_col: out_q, "neighbor_id": out_id, "_adc": out_s})

    cand = index_df.mapInPandas(
        kernel, schema=f"{query_id_col} {id_type}, neighbor_id {id_type}, _adc double"
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("_adc").desc(), "neighbor_id")
    shortlist = cand.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") <= kk)
    if rerank is None:
        return shortlist.select(
            query_id_col, "neighbor_id", F.col("_rk").alias("rk"),
            F.round("_adc", 6).alias("cos_sim"),
        ).where(F.col("rk") <= k)
    return _exact_rerank(
        shortlist, rerank, qids, Qraw, dim, k, id_col, vec_col, query_id_col, id_type
    )


def write_ivf_pq_index(index_df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Materialize the IVFADC index cell-partitioned
    (``partitionBy("cell")`` parquet): each coarse cell is its own
    directory, so ``ivf_pq_topk``'s probed-cell predicate prunes at the
    STORAGE layer — a query batch probing p of n_centroids cells reads
    ~p/n_centroids of the index bytes (plan shows ``PartitionFilters``,
    tested). At a billion vectors the index is the only thing read per
    query batch; this is what makes it ~p/n× cheaper again."""
    index_df.write.partitionBy("cell").mode(mode).parquet(path)


def read_ivf_pq_index(spark, path: str) -> DataFrame:
    """Read a ``write_ivf_pq_index`` layout back. The ``cell`` partition
    column comes back as int; pass the result straight to
    ``ivf_pq_topk``."""
    df = spark.read.parquet(path)
    return df.withColumn("cell", F.col("cell").cast("int"))


def centroid_scores(
    emb: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    score_col: str = "cos_centroid",
) -> DataFrame:
    """Embedding-space outlier scoring: per-group mean vector (centroid),
    then every vector's cosine to its OWN group's centroid. Low score =
    the vector sits far from its cluster — mislabeled, off-topic, or
    junk; the embedding-side quality screen that complements the text-side
    surprisal filter (and the per-cluster geometry SemDeDup thresholds on).

    Plan shape: ``posexplode`` to (group, dim, value) narrow rows →
    ONE map-side-partial hash aggregation to (group, dim) means — the only
    shuffle, and it moves groups × dim rows, not the corpus — → assemble
    each centroid as an array (``array_sort`` on (pos, mean) structs keeps
    dim order without a window) → **broadcast** the centroid table (groups
    × dim × 8 bytes) back onto the vectors → JVM fold cosine per row
    (the measured-fast numeric-HOF path, see ``functions/vectors.py``).
    No per-vector window, no self-join; scales to any corpus whose GROUP
    COUNT × dim fits in a broadcast — millions of groups at dim 64.

    The tiny ``transform`` extracting means from the sorted structs runs
    interpreted over centroid rows only (groups, not vectors) — never on
    the hot path."""
    ex = emb.select(group_col, F.posexplode(F.col(vec_col)).alias("_pos", "_v"))
    cent = (
        ex.groupBy(group_col, "_pos")
        .agg(F.avg(F.col("_v").cast("double")).alias("_c"))
        .groupBy(group_col)
        .agg(F.array_sort(F.collect_list(F.struct("_pos", "_c"))).alias("_pc"))
        .select(group_col, F.transform("_pc", lambda s: s["_c"]).alias("_cent"))
    )
    scored = emb.join(F.broadcast(cent), group_col)
    denom = l2_norm(F.col(vec_col)) * l2_norm(F.col("_cent"))
    # ANSI mode throws on division by zero: an all-zero vector (or a group
    # whose mean is exactly the zero vector) gets a NULL score instead of
    # failing the whole job
    cos = F.when(denom != 0, dot(F.col(vec_col), F.col("_cent")) / denom)
    return scored.withColumn(score_col, cos).drop("_cent")
