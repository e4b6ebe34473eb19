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


def split_bounds(weights: dict[str, float]) -> list[int]:
    """Exact integer band bounds on [0, 2^32) for ``dataset_split`` — one
    bound per split except the last. Computed with exact rational
    arithmetic (``fractions.Fraction`` of each float weight), not a
    running float sum: partial float sums can round to a neighboring
    double and shift a bound by one hash bucket, silently moving ~2^-32
    of the corpus between splits (and breaking any oracle that derived
    bounds from the nominal fractions). Shared by the operator and its
    SQL-oracle generator so the two can never diverge. Validates every
    weight > 0 and the total ~ 1."""
    from fractions import Fraction

    if not weights:
        raise ValueError("weights must be non-empty")
    for name, w in weights.items():
        if not w > 0:
            raise ValueError(f"weight for {name!r} must be > 0, got {w}")
    total = sum(Fraction(w) for w in weights.values())
    if abs(float(total) - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {float(total)}")
    names = list(weights)
    bounds: list[int] = []
    cum = Fraction(0)
    for name in names[:-1]:
        cum += Fraction(weights[name])
        bounds.append(int(cum * (1 << 32)))
    return bounds


def dataset_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str,
    seed: int = 42,
    hash_mode: str = "portable",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split assignment: each row gets the
    first split whose cumulative weight bound exceeds its seeded id-hash
    bucket — a pure function of (seed, id), so membership is stable across
    runs, partitionings, cluster sizes, AND later re-runs over a grown
    corpus (rows keep their split when new rows arrive — the property
    ``randomSplit`` famously lacks). Zero shuffle: one projection.

    Thresholds are exact INTEGER bounds on the 32-bit portable hash
    (``split_bounds``: floor of the exact-rational cumulative weight times
    2^32) — no float comparison, so the oracle (identical md5-prefix
    arithmetic in SQL, bounds from the SAME helper) matches bitwise.
    Weights are validated (> 0, sum ~ 1); iteration order fixes the band
    layout, so pass an ordered dict (insertion order is the contract).
    """
    if hash_mode not in ("portable", "fast"):
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    bounds = split_bounds(weights)
    h = _keyed_hash(id_col, seed, hash_mode)
    if hash_mode == "fast":
        # map xxhash64's signed 64-bit output onto the same [0, 2^32) band
        # domain (portable mode uses the md5-prefix 32-bit value directly)
        h = F.pmod(h, F.lit(1 << 32))
    expr = None
    names = list(weights)
    for name, bound in zip(names[:-1], bounds):
        cond = h < F.lit(bound)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)
