"""Deterministic sampling operators for training-data pipelines.

The reference's sampling is an unseeded ``np.random.rand`` Monte-Carlo
(``/root/reference/pyPPI/cavities.py:53`` — its documented reproducibility
defect); every sampler here is a pure function of (seed, row key), so
samples are identical across runs, partitionings, and cluster sizes, and
reproducible by a SQL oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def _keyed_hash(id_col: str, seed: int, hash_mode: str):
    key = F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string"))
    if hash_mode == "portable":
        return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    if hash_mode == "fast":
        return F.xxhash64(key)
    raise ValueError(f"unknown hash_mode {hash_mode!r}")


def stratified_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    n_per_group: int,
    id_col: str,
    seed: int = 42,
    hash_mode: str = "portable",
) -> DataFrame:
    """Class-balanced deterministic downsampling: keep the ``n_per_group``
    rows of each group whose seeded id-hash is smallest (ties broken by
    id). The standard rebalancing step before training-set assembly —
    per-class caps without a shuffle-heavy sortBy: one window over the
    group key, map-side-prunable by nothing (every row must be ranked) but
    a single exchange total.

    At extreme per-group cardinality the exact window rank can be preceded
    by a cheap hash-threshold prefilter (same pattern as the IVF trainer's
    sample) — left to the caller, since it needs a group-size estimate.
    """
    h = _keyed_hash(id_col, seed, hash_mode)
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n_per_group)
        .drop("_rk")
    )
