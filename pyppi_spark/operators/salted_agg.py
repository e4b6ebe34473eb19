"""Salted two-phase aggregation for skewed grouping keys.

The reference's scale axis is a per-entity loop where a few huge entities
dominate (``/root/reference/bin/setupPpiDb.py:163``); the Spark analog is a
``groupBy(conv_id)`` where Zipf-heavy conversations make one reducer a
straggler. Windows need whole-entity locality (solved by the balanced
bucket layout in ``pyppi_spark.io``), but plain aggregations don't: they
can be **salted** — phase 1 aggregates on ``(key, salt)`` spreading a hot
key over S reducers, phase 2 merges the S partials per key.

Only algebraic aggregates (re-aggregatable partials) are supported:
count/sum/min/max — and avg via (sum, count). This mirrors Spark's own
partial aggregation, but forces the *reduce side* to spread too, which
partial agg alone cannot do when one key's partials still land on one
reducer at enormous cardinality-per-key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    salt_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``aggs``: output_name → (function, column) with function in
    {count, sum, min, max, avg}.

    The salt is a pure function of row CONTENT (``xxhash64`` of
    ``salt_cols``, default: the grouping keys plus every column an
    aggregate reads — all hashable by construction, unlike arbitrary
    map-typed columns) — never ``rand()`` or
    ``monotonically_increasing_id()``: a nondeterministic salt feeding a
    shuffle key means a map task recomputed after a fetch failure re-salts
    its rows differently, and reducers combine stale and fresh partials
    (the SPARK-23207 failure class). Content salting is retry-stable and
    keeps the repo invariant that everything is seeded.

    Two documented limits of content salting (both raise or are stated here
    rather than failing silently):

    - **count(*)-only aggregations** (no value column read) raise
      ``ValueError`` — the default salt would be a pure function of the
      group keys, i.e. constant per hot key: an extra shuffle with zero
      spreading. BEHAVIOR CHANGE vs the round-1 rand()-salted form, which
      accepted them (unsafely, per SPARK-23207). Pass ``salt_cols`` with a
      row-distinguishing column (any unique id) to salt a pure count.
    - **exact-duplicate rows share a salt.** A key that is hot because one
      identical row repeats billions of times still lands on one reducer.
      That shape is better served upstream (dedup + a count column, or a
      pre-aggregation keyed on the full row); hot keys in practice are hot
      because of many *distinct* rows, which content salt spreads evenly.

    Example::

        salted_agg(df, ["conv_id"], {
            "n": ("count", "*"),
            "total": ("sum", "value"),
            "mean": ("avg", "value"),
        })
    """
    keys = list(keys)
    phase1_exprs: list[Column] = []
    phase2_exprs: list[Column] = []
    for name, (fn, col) in aggs.items():
        if fn == "count":
            phase1_exprs.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(f"_{name}"))
            phase2_exprs.append(F.sum(f"_{name}").alias(name))
        elif fn == "sum":
            phase1_exprs.append(F.sum(col).alias(f"_{name}"))
            phase2_exprs.append(F.sum(f"_{name}").alias(name))
        elif fn == "min":
            phase1_exprs.append(F.min(col).alias(f"_{name}"))
            phase2_exprs.append(F.min(f"_{name}").alias(name))
        elif fn == "max":
            phase1_exprs.append(F.max(col).alias(f"_{name}"))
            phase2_exprs.append(F.max(f"_{name}").alias(name))
        elif fn == "avg":
            phase1_exprs.append(F.sum(col).alias(f"_{name}_s"))
            phase1_exprs.append(F.count(col).alias(f"_{name}_c"))
            phase2_exprs.append(
                (F.sum(f"_{name}_s") / F.sum(f"_{name}_c")).alias(name)
            )
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")

    if salt_cols is not None:
        salt_src = list(salt_cols)
    else:
        referenced = [c for _, (_, c) in sorted(aggs.items()) if c != "*"]
        salt_src = list(dict.fromkeys(keys + referenced))
    if not [c for c in salt_src if c not in keys]:
        # a salt that is a pure function of the group keys is constant per
        # hot key — zero spreading plus an extra shuffle, silently
        raise ValueError(
            "salted_agg needs row-level salt entropy: every aggregate is "
            "count(*) so no value column varies within a key — pass "
            "salt_cols with a row-distinguishing column"
        )
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(salt_buckets))
    )
    phase1 = salted.groupBy(*keys, "_salt").agg(*phase1_exprs)
    return phase1.groupBy(*keys).agg(*phase2_exprs)
