"""Vector column math over ``array<float>`` embeddings.

The reference's pairwise numeric kernels (squared distance
``/root/reference/pyPPI/atom.py:48-60``, Coulomb
``/root/reference/pyPPI/electrostat.py:41-43``) are the geometric ancestors;
here the vectors are embeddings and the kernel is cosine similarity.

Two formulations:

- **unrolled** (pass ``dim``): a flat ``a[1]*b[1] + … + a[d]*b[d]``
  expression tree — every term is a codegen ``GetArrayItem``/multiply, so
  the whole kernel stays inside WholeStageCodegen. This is the hot path:
  Spark evaluates higher-order array functions (``aggregate``/``zip_with``)
  INTERPRETED, ~10× slower (same finding that drove the MinHash rewrite).
- **fold** (``dim=None``): the higher-order fallback for unknown dims.

Both sum left-associated in element order, so they are bitwise-identical
to each other and to DuckDB's ``list_dot_product`` sequential loop — the
oracle hash contract survives the formulation switch.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _dot_fold(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm2_fold(a: Column) -> Column:
    return F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )


def _sum_left_assoc(terms: list[Column]) -> Column:
    s = terms[0]
    for t in terms[1:]:
        s = s + t
    return s


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    if dim is None:
        return _dot_fold(a, b)
    return _sum_left_assoc(
        [
            F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
            for i in range(1, dim + 1)
        ]
    )


def l2_norm(a: Column, dim: int | None = None) -> Column:
    if dim is None:
        return F.sqrt(_norm2_fold(a))
    v = [F.element_at(a, i).cast("double") for i in range(1, dim + 1)]
    return F.sqrt(_sum_left_assoc([x * x for x in v]))


def cosine_similarity(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


def dot_literal(vec: Column, values) -> Column:
    """Dot product against a *constant* vector (LSH plane / IVF centroid):
    each coefficient is folded in as a literal, so the row-side work is one
    codegen multiply-add per element — no literal-array ``element_at``."""
    return _sum_left_assoc(
        [
            F.element_at(vec, i + 1).cast("double") * F.lit(float(v))
            for i, v in enumerate(values)
        ]
    )
