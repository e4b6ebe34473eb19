"""As-of (point-in-time) join — the engine's core operator.

The reference's analog is the nearest-neighbor join along its ordering axis
(``/root/reference/pyPPI/kdtree.py:38-48`` ``findNearest`` with k=1, used at
``/root/reference/bin/setupPpiDb.py:134-143``) and its hand-rolled ordered
merge join (``mapUnbound``, ``/root/reference/pyPPI/resReduce.py:86-110``,
which co-iterates two sorted lists — exactly a sort-merge as-of join).

Semantics (pinned once, tested with tie fixtures — zero temporal leakage):
for each probe row, take the build row with the greatest ``(ts, tiebreak)``
such that ``build.ts <= probe_ts`` (inclusive, the default) or
``build.ts < probe_ts`` (strict). Probes with no qualifying build row get
nulls. Total order on the build side is ``(ts, tiebreak)``; ties between
build and probe timestamps are resolved by the inclusive/strict flag alone.

Two formulations, cross-checked in tests:

- ``asof_join_union`` (default): union the tagged sides, sort within the
  entity key, ``last(struct(payload), ignorenulls=True)`` over an unbounded
  preceding frame, keep probe rows. Pure DataFrame — stays in Tungsten
  whole-stage codegen, one shuffle, no Python. This is the "piggyback"
  formulation; the payload is wrapped in a single struct so a build row
  whose payload column is legitimately NULL is still the match (per-column
  ``last(ignorenulls)`` would leak an older row's value).

- ``asof_join_merge``: cogrouped ``applyInPandas`` running
  ``pandas.merge_asof`` per entity — Arrow-vectorized, no per-row Python.
  Independent code path used as the cross-check and as the extension point
  for nearest/forward directions.

Scale note: both shuffle each side exactly once on the entity key; skewed
entities are AQE-split for the union form (it is a window, handled by the
skewed-partition rebalance) while the merge form keeps whole-entity locality
(required by merge_asof) — pathological single entities are the documented
straggler risk (SURVEY.md §7.3).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F


def _default_payload(build: DataFrame, by: Sequence[str], build_ts: str, tiebreak: str | None) -> list[str]:
    drop = set(by) | {build_ts} | ({tiebreak} if tiebreak else set())
    return [c for c in build.columns if c not in drop]


def asof_join_union(
    probe: DataFrame,
    build: DataFrame,
    probe_ts: str = "probe_ts",
    build_ts: str = "ts",
    by: Sequence[str] = ("conv_id",),
    payload: Sequence[str] | None = None,
    inclusive: bool = True,
    tiebreak: str | None = "turn_idx",
    prefix: str = "matched_",
    direction: str = "backward",
) -> DataFrame:
    """``direction``: ``backward`` (last build row at-or-before, the PIT
    default) or ``forward`` (first build row at-or-after — the mirror,
    via ``first`` over the following frame)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    by = list(by)
    payload = list(payload) if payload is not None else _default_payload(build, by, build_ts, tiebreak)

    # Side ordering on timestamp ties: for backward-inclusive, build rows
    # sort BEFORE probe rows so a build row at exactly probe_ts is visible
    # (strict: after). Forward mirrors this.
    if direction == "backward":
        build_order, probe_order = (0, 1) if inclusive else (1, 0)
    else:
        build_order, probe_order = (1, 0) if inclusive else (0, 1)

    probe_cols = [c for c in probe.columns if c not in by and c != probe_ts]
    b = build.select(
        *by,
        F.col(build_ts).alias("_t"),
        F.lit(build_order).alias("_side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long").alias("_tie"),
        F.struct(*[F.col(c) for c in payload]).alias("_payload"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_cols],
    )
    p = probe.select(
        *by,
        F.col(probe_ts).alias("_t"),
        F.lit(probe_order).alias("_side"),
        F.lit(None).cast("long").alias("_tie"),
        F.lit(None).cast(b.schema["_payload"].dataType).alias("_payload"),
        *probe_cols,
    )

    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("_t"), F.col("_side"), F.col("_tie").asc_nulls_last())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("_payload", ignorenulls=True).over(w)
    else:
        # forward: first build row at-or-after; ties among build rows take
        # the SMALLEST (ts, tiebreak) ≥ probe
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("_t"), F.col("_side"), F.col("_tie").asc_nulls_first())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        matched = F.first("_payload", ignorenulls=True).over(w)
    out = (
        b.unionByName(p)
        .withColumn("_m", matched)
        .where(F.col("_side") == F.lit(probe_order))
    )
    return out.select(
        *by,
        F.col("_t").alias(probe_ts),
        *probe_cols,
        *[F.col(f"_m.{c}").alias(f"{prefix}{c}") for c in payload],
    )


def asof_join_merge(
    probe: DataFrame,
    build: DataFrame,
    probe_ts: str = "probe_ts",
    build_ts: str = "ts",
    by: Sequence[str] = ("conv_id",),
    payload: Sequence[str] | None = None,
    inclusive: bool = True,
    tiebreak: str | None = "turn_idx",
    prefix: str = "matched_",
    direction: str = "backward",
) -> DataFrame:
    by = list(by)
    payload = list(payload) if payload is not None else _default_payload(build, by, build_ts, tiebreak)
    probe_cols = [c for c in probe.columns if c not in by and c != probe_ts]

    out_fields = (
        [probe.schema[c] for c in by]
        + [probe.schema[probe_ts]]
        + [probe.schema[c] for c in probe_cols]
    )
    import pyspark.sql.types as T

    schema = T.StructType(
        out_fields + [T.StructField(f"{prefix}{c}", build.schema[c].dataType, True) for c in payload]
    )
    out_names = [f.name for f in schema.fields]

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty:
            return pd.DataFrame(columns=out_names)
        sort_keys = [build_ts] + ([tiebreak] if tiebreak else [])
        # tie-sorted ascending: backward merge_asof takes the last matching
        # row (max tiebreak), forward the first at-or-after (min tiebreak) —
        # matching the union formulation's tie rules
        right = right.sort_values(sort_keys, kind="mergesort")
        left = left.sort_values([probe_ts], kind="mergesort")
        # build the right side as: join key + prefixed payload copies.
        # A plain rename would strip the join key whenever build_ts is
        # itself in the payload (e.g. payload=["ts", ...]) — copy instead.
        out_payload = [f"{prefix}{c}" for c in payload]
        r = right[list(dict.fromkeys([build_ts] + payload))].copy()
        for c, oc in zip(payload, out_payload):
            if oc != c:
                r[oc] = r[c]
        r = r[list(dict.fromkeys([build_ts] + out_payload))]
        m = pd.merge_asof(
            left,
            r,
            left_on=probe_ts,
            right_on=build_ts,
            direction=direction,
            allow_exact_matches=inclusive,
        )
        if build_ts != probe_ts and build_ts in m.columns and build_ts not in out_names:
            m = m.drop(columns=[build_ts])
        return m[out_names]

    return (
        probe.groupBy(*by)
        .cogroup(build.groupBy(*by))
        .applyInPandas(merge, schema=schema)
    )


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    strategy: str = "union",
    **kwargs,
) -> DataFrame:
    """Dispatch: ``union`` (pure-DataFrame, default) or ``merge``
    (Arrow ``merge_asof`` cross-check)."""
    if strategy == "union":
        return asof_join_union(probe, build, **kwargs)
    if strategy == "merge":
        return asof_join_merge(probe, build, **kwargs)
    raise ValueError(f"unknown asof strategy: {strategy!r}")
