"""Vector column math over ``array<float>`` embeddings — JVM higher-order
functions (``zip_with`` + ``aggregate``), no Python in the hot path.

The reference's pairwise numeric kernels (squared distance
``/root/reference/pyPPI/atom.py:48-60``, Coulomb
``/root/reference/pyPPI/electrostat.py:41-43``) are the geometric ancestors;
here the vectors are embeddings and the kernel is cosine similarity.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
