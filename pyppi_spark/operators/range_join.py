"""Range (band) join on the time axis — the analog of the reference's radius
neighbor join (``cKDTree.query_ball_point`` wrapped at
``/root/reference/pyPPI/kdtree.py:28-36``; call sites e.g.
``/root/reference/pyPPI/ASA.py:119-122``, ``/root/reference/pyPPI/hbonds.py:170-173``).

For each left row, all right rows of the same entity with
``right.ts ∈ [left.ts - before, left.ts + after]``.

Physical strategy: a naive theta-join on the band predicate degenerates to a
per-entity nested loop. Instead the band is discretized into buckets of
width ``max(before, after)``; the right side is exploded to its bucket and
the two adjacent buckets, giving a pure EQUI join on
``(entity, bucket)`` — sort-merge/shuffled-hash joinable, AQE-skew
splittable, parallel *within* a single huge entity — followed by the exact
band filter. This is the same candidate-pruning idea as the reference's
kd-tree (bound the candidate set, then apply the exact predicate), executed
Spark-first. Output row multiplication is bounded by band width, keeping
shuffle volume linear (SURVEY.md §4 "candidate pruning by bounding radius").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from ..functions.time import epoch_seconds


def range_join(
    left: DataFrame,
    right: DataFrame,
    before: float,
    after: float,
    by: Sequence[str] = ("conv_id",),
    left_ts: str = "ts",
    right_ts: str = "ts",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Band join: all (left, right) pairs with
    ``left.ts - before <= right.ts <= left.ts + after`` within ``by`` keys.

    ``before``/``after`` are seconds (inclusive bounds on both ends).
    """
    if before < 0 or after < 0:
        raise ValueError("before/after must be >= 0")
    by = list(by)
    width = max(before, after, 1e-9)

    l_payload = [c for c in left.columns if c not in by]
    r_payload = [c for c in right.columns if c not in by]

    l = left.select(
        *by,
        F.floor(epoch_seconds(left_ts) / F.lit(width)).alias("_bkt"),
        epoch_seconds(left_ts).alias("_lt"),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in l_payload],
    )
    r = right.select(
        *by,
        F.explode(
            F.array(
                F.floor(epoch_seconds(right_ts) / F.lit(width)) - 1,
                F.floor(epoch_seconds(right_ts) / F.lit(width)),
                F.floor(epoch_seconds(right_ts) / F.lit(width)) + 1,
            )
        ).alias("_bkt"),
        epoch_seconds(right_ts).alias("_rt"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in r_payload],
    )

    joined = l.join(r, on=by + ["_bkt"], how="inner").where(
        (F.col("_rt") >= F.col("_lt") - F.lit(float(before)))
        & (F.col("_rt") <= F.col("_lt") + F.lit(float(after)))
    )
    # the 3-bucket explode can produce the same qualifying pair from at most
    # one bucket (each row's true bucket distance is unique), so no dedup is
    # needed: a right row lands in bucket b-1, b, b+1 exactly once each and a
    # left row probes only its own bucket b_l — each (l, r) pair meets at the
    # single exploded copy where r's target equals b_l.
    return joined.drop("_bkt", "_lt", "_rt")
