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

Scale / skew contract (SURVEY.md §7.3, asserted in
``tests/test_asof.py::test_union_skew_contract_and_chunked_escape``):
both formulations shuffle each side exactly once on the entity key, and
BOTH serialize a single entity into one task — the union form's window
partitions by the entity key, and AQE's skew-split applies to joins and
rebalance exchanges, NOT to window partitions (every row of a key must
reach one task to be ordered). What bounds the damage per formulation:

- union: the giant entity costs one external (spill-capable) sort plus a
  single linear running-``last`` pass — O(n log n) in the entity size,
  never quadratic, and other partitions proceed in parallel; over the
  balanced-bucket layout the window is Exchange-free, so normal-sized
  conversations never even shuffle.
- merge: whole-entity locality is REQUIRED by ``pd.merge_asof``; for
  conversations too large for one Arrow group, the supported escape is
  the chunked-with-overlap path (``chunk_rows`` in ``asof_join_merge``) —
  carry-in/carry-out build rows per probe chunk, provably equal to the
  unchunked result (property-tested to 10^6 turns).

A pathological single conversation therefore degrades to one straggler
task (union) or chunked parallel tasks (merge+chunk_rows); it cannot OOM
the union path (sort spills) and cannot silently change results.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F


def _default_payload(build: DataFrame, by: Sequence[str], build_ts: str, tiebreak: str | None) -> list[str]:
    drop = set(by) | {build_ts} | ({tiebreak} if tiebreak else set())
    return [c for c in build.columns if c not in drop]


def _ts_numeric(col: F.Column, dtype) -> F.Column:
    """Order-preserving numeric image of a timestamp-or-numeric column
    (Spark 4 forbids cast(timestamp_ntz as double) — route via
    unix_micros)."""
    import pyspark.sql.types as T

    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return F.unix_micros(col.cast("timestamp")).cast("double")
    return col.cast("double")


def _tolerance_numeric(tolerance: float, dtype) -> float:
    """Tolerance in the ordering column's numeric image: seconds → µs for
    temporal axes (matching ``_ts_numeric``), pass-through for numerics."""
    import pyspark.sql.types as T

    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return float(tolerance) * 1e6
    return float(tolerance)


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
    tolerance: float | None = None,
) -> DataFrame:
    """``direction``: ``backward`` (last build row at-or-before, the PIT
    default), ``forward`` (first build row at-or-after — the mirror, via
    ``first`` over the following frame), or ``nearest`` (closest in either
    direction — the true-nearest J2 semantics of the reference's kd-tree
    probe, ``/root/reference/pyPPI/kdtree.py:38-48``).

    Nearest tie rules (pinned, tested): equal |Δt| → the BACKWARD match
    wins; within a side, build-ts ties resolve as that side does (backward:
    max tiebreak, forward: min tiebreak). ``inclusive`` governs exact-ts
    matches in both directions at once. Physical shape: still ONE shuffle —
    both direction windows share the entity-key partitioning (two sorts
    over one exchange).

    ``tolerance``: maximum |probe_ts − build.ts| for a match — in SECONDS
    when the time axis is temporal, else in the column's own units (the
    band-limited nearest of ``pd.merge_asof(tolerance=...)`` and of the
    reference's distance-bounded probe, ``NEIGHBOR_DISTANCE`` at
    ``/root/reference/pyPPI/pdbReader.py:134-143``). Out-of-band probes get
    nulls. Applied AFTER direction selection, which is equivalent to
    pre-filtering: the selected match has the minimal |Δt| of its
    direction(s), so if it is out of band every alternative is too."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    by = list(by)
    payload = list(payload) if payload is not None else _default_payload(build, by, build_ts, tiebreak)

    # the union plan owns these names internally: a probe/payload column
    # called e.g. "_bt" would silently collide inside the match struct
    # (duplicate field → ambiguous _m._bt resolution in nearest mode)
    reserved = {"_t", "_is_probe", "_sb", "_sf", "_tie", "_payload", "_m", "_mb", "_mf", "_bt"}
    probe_cols_all = [c for c in probe.columns if c not in by and c != probe_ts]
    clash = reserved & (set(payload) | set(probe_cols_all) | set(by))
    if clash:
        raise ValueError(
            f"asof_join_union reserves column names {sorted(clash)} internally — "
            "rename these probe/build/payload columns before the join"
        )

    # Side ordering on timestamp ties: for backward-inclusive, build rows
    # sort BEFORE probe rows so a build row at exactly probe_ts is visible
    # (strict: after). Forward mirrors this. Nearest needs both orderings —
    # carried as two side columns feeding two windows.
    sb_build, sb_probe = (0, 1) if inclusive else (1, 0)   # backward window
    sf_build, sf_probe = (1, 0) if inclusive else (0, 1)   # forward window

    probe_cols = [c for c in probe.columns if c not in by and c != probe_ts]
    b = build.select(
        *by,
        F.col(build_ts).alias("_t"),
        F.lit(False).alias("_is_probe"),
        F.lit(sb_build).alias("_sb"),
        F.lit(sf_build).alias("_sf"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long").alias("_tie"),
        F.struct(
            _ts_numeric(F.col(build_ts), build.schema[build_ts].dataType).alias("_bt"),
            *[F.col(c) for c in payload],
        ).alias("_payload"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_cols],
    )
    p = probe.select(
        *by,
        F.col(probe_ts).alias("_t"),
        F.lit(True).alias("_is_probe"),
        F.lit(sb_probe).alias("_sb"),
        F.lit(sf_probe).alias("_sf"),
        F.lit(None).cast("long").alias("_tie"),
        F.lit(None).cast(b.schema["_payload"].dataType).alias("_payload"),
        *probe_cols,
    )
    u = b.unionByName(p)

    w_b = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t"), F.col("_sb"), F.col("_tie").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t"), F.col("_sf"), F.col("_tie").asc_nulls_first())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    if direction == "backward":
        u = u.withColumn("_m", F.last("_payload", ignorenulls=True).over(w_b))
    elif direction == "forward":
        # forward: first build row at-or-after; ties among build rows take
        # the SMALLEST (ts, tiebreak) ≥ probe
        u = u.withColumn("_m", F.first("_payload", ignorenulls=True).over(w_f))
    else:
        u = u.withColumn("_mb", F.last("_payload", ignorenulls=True).over(w_b))
        u = u.withColumn("_mf", F.first("_payload", ignorenulls=True).over(w_f))
        pt = _ts_numeric(F.col("_t"), probe.schema[probe_ts].dataType)
        take_fwd = F.col("_mb").isNull() | (
            F.col("_mf").isNotNull()
            & ((F.col("_mf._bt") - pt) < (pt - F.col("_mb._bt")))
        )
        u = u.withColumn("_m", F.when(take_fwd, F.col("_mf")).otherwise(F.col("_mb")))
    if tolerance is not None:
        tol = _tolerance_numeric(tolerance, probe.schema[probe_ts].dataType)
        pt_num = _ts_numeric(F.col("_t"), probe.schema[probe_ts].dataType)
        in_band = F.abs(F.col("_m._bt") - pt_num) <= F.lit(tol)
        u = u.withColumn("_m", F.when(F.col("_m").isNotNull() & in_band, F.col("_m")))
    out = u.where(F.col("_is_probe"))
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
    tolerance: float | None = None,
    chunk_rows: int | None = None,
) -> DataFrame:
    """``chunk_rows``: opt-in chunked-with-overlap processing for
    pathological single entities (SURVEY §7.3 — a 10⁶-turn conversation is
    one Arrow group under cogroup, the merge strategy's documented
    straggler/memory risk). Probe rows are split into per-entity chunks of
    ``chunk_rows`` by ``row_number`` over ``probe_ts``; each chunk's
    cogroup sees only the build rows it can match:

    - builds with ``lo ≤ ts ≤ hi`` (the chunk's probe-ts range), plus
    - **carry-in**: the max-``(ts, tiebreak)`` build with ``ts < lo``
      (backward/nearest — the only earlier build any probe in the chunk
      can match, in both inclusive and strict modes), plus
    - **carry-out**: the min-``(ts, tiebreak)`` build with ``ts > hi``
      (forward/nearest mirror).

    Per-chunk candidate sets therefore CONTAIN each probe's true global
    match per direction, so the chunk-local merge returns exactly the
    unchunked result (tested, all directions × tie modes × tolerance) while
    no Arrow group exceeds ~``chunk_rows`` probe rows + the in-range
    builds. Cost: one extra window pass + a bounds join on the entity key —
    the giant-group fallback path, leave ``None`` for the single-cogroup
    plan. Regime note: cogrouped-pandas execution pays ~1-2 ms of Python
    overhead PER GROUP, so both merge strategies (chunked or not) suit
    few-large-group shapes; for millions of small entities use the union
    strategy, whose window plan has no per-group Python cost."""
    by = list(by)
    payload = list(payload) if payload is not None else _default_payload(build, by, build_ts, tiebreak)
    probe_cols = [c for c in probe.columns if c not in by and c != probe_ts]
    if "_match_bt" in set(probe.columns) | {f"{prefix}{c}" for c in payload} | {build_ts}:
        raise ValueError(
            "asof_join_merge reserves the column name '_match_bt' internally — "
            "rename the colliding probe/build/payload column"
        )
    if chunk_rows is not None:
        chunk_reserved = {"_chunk", "_lo", "_hi", "_s"}
        clash = chunk_reserved & (set(probe.columns) | set(build.columns))
        if clash:
            raise ValueError(
                f"asof_join_merge(chunk_rows=...) reserves column names "
                f"{sorted(clash)} internally — rename these columns"
            )
    if probe_ts != build_ts and build_ts in probe_cols:
        # pd.merge_asof would suffix BOTH columns named build_ts (the
        # probe's passthrough and the build key), so the output projection
        # would KeyError — reject with a clear contract error instead,
        # mirroring the union form's reserved-name clash check
        raise ValueError(
            f"asof_join_merge: probe carries a non-key column named "
            f"{build_ts!r} (the build-side timestamp name) — pd.merge_asof "
            "suffixes both; rename the probe column before the join"
        )

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
        # the matched build timestamp travels under its own reserved name:
        # when probe_ts == build_ts, merge_asof keeps only the LEFT's
        # column for the shared key name, so reading m[build_ts] would
        # return the probe's own ts (Δt always 0 — breaking nearest
        # selection and tolerance banding)
        r["_match_bt"] = r[build_ts]
        r = r[list(dict.fromkeys([build_ts] + out_payload + ["_match_bt"]))]
        if direction == "nearest":
            # composed backward+forward with the union form's pinned tie
            # rule (equal |Δt| → backward) rather than pandas' own
            # direction="nearest", so the two strategies stay bit-equal
            kw = dict(left_on=probe_ts, right_on=build_ts, allow_exact_matches=inclusive)
            mb = pd.merge_asof(left, r, direction="backward", **kw)
            mf = pd.merge_asof(left, r, direction="forward", **kw)
            pt = left[probe_ts].reset_index(drop=True)
            bt_b = mb["_match_bt"].reset_index(drop=True)
            bt_f = mf["_match_bt"].reset_index(drop=True)
            take_fwd = bt_b.isna() | (bt_f.notna() & ((bt_f - pt) < (pt - bt_b)))
            m = mb.reset_index(drop=True)
            mf = mf.reset_index(drop=True)
            for c in list(dict.fromkeys(out_payload + ["_match_bt"])):
                m.loc[take_fwd, c] = mf.loc[take_fwd, c]
        else:
            m = pd.merge_asof(
                left,
                r,
                left_on=probe_ts,
                right_on=build_ts,
                direction=direction,
                allow_exact_matches=inclusive,
            )
        if tolerance is not None:
            # same post-selection banding as the union form (provably equal
            # to pre-filtering — the selected match minimizes |Δt|)
            bt = m["_match_bt"].reset_index(drop=True)
            pt = m[probe_ts].reset_index(drop=True)
            m = m.reset_index(drop=True)
            if str(pt.dtype).startswith("datetime"):
                out_of_band = bt.notna() & ((bt - pt).abs() > pd.Timedelta(seconds=tolerance))
            else:
                out_of_band = bt.notna() & ((bt - pt).abs() > tolerance)
            for c in list(dict.fromkeys(out_payload)):
                # .where → NaN/NaT, the same no-match representation
                # merge_asof itself produces for unmatched probes
                m[c] = m[c].where(~out_of_band)
        return m[out_names]

    if chunk_rows is None:
        return (
            probe.groupBy(*by)
            .cogroup(build.groupBy(*by))
            .applyInPandas(merge, schema=schema)
        )

    # chunked-with-overlap: split probes, replicate only the build rows a
    # chunk can match (range + direction-appropriate carry rows)
    w = Window.partitionBy(*by).orderBy(probe_ts)
    p2 = probe.withColumn(
        "_chunk", F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(chunk_rows))
    )
    # bounds columns get FRESH names (and thus attribute ids): probe/build
    # commonly derive from the same plan, and bounds derives from p2 —
    # shared ids would make the join keys and _chunk ambiguous
    bounds = p2.groupBy(*by, "_chunk").agg(
        F.min(probe_ts).alias("_lo"), F.max(probe_ts).alias("_hi")
    )
    bounds = bounds.select(
        *[F.col(c).alias(f"_b_{c}") for c in by],
        F.col("_chunk").alias("_b_chunk"),
        "_lo",
        "_hi",
    )
    bcols = build.columns
    # dataset-alias-qualified keys: probe and build commonly derive from
    # the same plan, and bounds derives from probe — the self-join
    # ambiguity check rejects unqualified (and even plan-id-hinted)
    # references, so qualify through explicit Dataset aliases
    l, r = build.alias("_asof_chl"), bounds.alias("_asof_chr")
    cond = None
    for c in by:
        eq = F.col(f"_asof_chl.{c}") == F.col(f"_asof_chr._b_{c}")
        cond = eq if cond is None else (cond & eq)
    joined = l.join(r, cond).select(
        *[F.col(f"_asof_chl.{c}") for c in bcols],
        F.col("_b_chunk").alias("_chunk"),
        "_lo",
        "_hi",
    )
    pieces = [
        joined.where(
            (F.col(build_ts) >= F.col("_lo")) & (F.col(build_ts) <= F.col("_hi"))
        ).select(*bcols, "_chunk")
    ]
    order_struct = F.struct(
        F.col(build_ts), (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_ord_tie")
    )
    row_struct = F.struct(*[F.col(c) for c in bcols])
    if direction in ("backward", "nearest"):
        pieces.append(
            joined.where(F.col(build_ts) < F.col("_lo"))
            .groupBy(*by, "_chunk")
            .agg(F.max_by(row_struct, order_struct).alias("_s"))
            .select(*[F.col(f"_s.{c}").alias(c) for c in bcols], "_chunk")
        )
    if direction in ("forward", "nearest"):
        pieces.append(
            joined.where(F.col(build_ts) > F.col("_hi"))
            .groupBy(*by, "_chunk")
            .agg(F.min_by(row_struct, order_struct).alias("_s"))
            .select(*[F.col(f"_s.{c}").alias(c) for c in bcols], "_chunk")
        )
    build_aug = pieces[0]
    for p in pieces[1:]:
        build_aug = build_aug.unionByName(p)
    # fresh attribute ids (rename round-trip → new ExprId per column, the
    # align.py trick): when probe and build derive from one plan, the
    # cogroup's two children would otherwise share ExprIds through the
    # bounds join and trip the ambiguous-self-join check
    aug_cols = build_aug.columns
    build_aug = build_aug.select(
        *[F.col(c).alias(f"_t_{i}") for i, c in enumerate(aug_cols)]
    ).select(*[F.col(f"_t_{i}").alias(c) for i, c in enumerate(aug_cols)])
    keys = list(by) + ["_chunk"]
    return (
        p2.groupBy(*keys)
        .cogroup(build_aug.groupBy(*keys))
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
