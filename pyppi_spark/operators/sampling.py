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


def mix_sample(
    df: DataFrame,
    domain_col: str,
    budgets: dict[str, int],
    weight_col: str,
    id_col: str,
    seed: int = 42,
    hash_mode: str = "portable",
    cum_col: str = "cum_weight",
    prefilter_margin: float | None = None,
) -> DataFrame:
    """Domain-mixture resampling under per-domain token budgets — the
    data-mixture step of LLM training-set assembly (weight web down,
    books/code up): within each domain, rank documents by seeded id-hash
    and keep the prefix whose running ``weight_col`` total stays within
    that domain's budget.  Domains absent from ``budgets`` are dropped
    (the output IS the specified mixture).  The kept set is a pure
    function of (seed, ids, weights): stable across runs, partitionings,
    and cluster sizes, and — because hash order ignores arrival order —
    approximately stable under corpus growth (a new doc displaces at most
    the budget-boundary docs of its own domain).

    Prefix rule: keep while inclusive cumulative weight ≤ budget.  The
    first over-budget doc and everything after it are dropped — no
    best-fit backfill, so the rule is one window expression and the SQL
    oracle mirrors it verbatim.  ``cum_col`` is emitted for audit.

    Scale: the exact path is ONE window per domain (hash-partitioned by
    ``domain_col``).  Window partitions are not AQE-skew-splittable, so a
    giant domain (web is ~90% of a raw crawl) makes one straggler sorting
    rows it will mostly discard.  ``prefilter_margin`` (e.g. 3.0) enables
    the two-pass escape: pass 1 aggregates per-domain total weight (tiny,
    map-side partial), then rows are prefiltered to the hash prefix whose
    EXPECTED weight is ``margin × budget`` before the exact window runs —
    the window input shrinks from O(domain) to O(budget).  The prefix
    property guarantees the prefiltered result equals the exact result
    WHEN the prefilter retains every doc up to the budget boundary; that
    invariant is verified per domain (did the surviving prefix either
    exhaust the domain or cross the budget?) and a shortfall raises
    rather than silently under-sampling — raise the margin.
    """
    for d, b in budgets.items():
        if not (isinstance(b, int) and b > 0):
            raise ValueError(f"budget for {d!r} must be a positive int, got {b!r}")
    if not budgets:
        raise ValueError("budgets must be non-empty")
    h = _keyed_hash(id_col, seed, hash_mode)
    if hash_mode == "fast":
        # map xxhash64's signed 64-bit output onto the same [0, 2^32) domain
        # the prefilter cutoff below assumes (portable mode's md5-prefix is
        # already 32-bit) — same normalization as dataset_split
        h = F.pmod(h, F.lit(1 << 32))
    budget_expr = None
    for d, b in budgets.items():
        cond = F.col(domain_col) == F.lit(d)
        budget_expr = (
            F.when(cond, F.lit(b)) if budget_expr is None else budget_expr.when(cond, F.lit(b))
        )
    base = df.where(F.col(domain_col).isin(list(budgets))).withColumn("_h", h)

    if prefilter_margin is not None:
        if prefilter_margin <= 1.0:
            raise ValueError("prefilter_margin must be > 1")
        totals = base.groupBy(domain_col).agg(
            F.sum(weight_col).cast("long").alias("_dom_total")
        )
        # hash cutoff: the fraction of the 2^32 hash space whose expected
        # weight is margin × budget (capped at the whole domain)
        frac = F.least(
            F.lit(1.0),
            F.lit(float(prefilter_margin)) * budget_expr.cast("double")
            / F.greatest(F.col("_dom_total"), F.lit(1)).cast("double"),
        )
        cutoffs = totals.withColumn("_cut", (frac * F.lit(float(1 << 32))).cast("long"))
        base = base.join(F.broadcast(cutoffs), domain_col).where(
            F.col("_h") <= F.col("_cut")
        )
    w = (
        Window.partitionBy(domain_col)
        .orderBy(F.col("_h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = base.withColumn(cum_col, F.sum(weight_col).over(w).cast("long")).withColumn(
        "_budget", budget_expr
    )
    if prefilter_margin is not None:
        # prefix-safety check: within the prefiltered set, each domain must
        # either cross its budget or have kept its entire (cutoff-bounded)
        # population that could ever be selected — otherwise the margin was
        # too tight and the exact prefix is not fully contained.
        # start from `cutoffs` (one row per budgeted domain with data) so a
        # domain whose ENTIRE population fell outside the hash cutoff still
        # gets audited — its absence from `ranked` is the worst shortfall.
        got = ranked.groupBy(domain_col).agg(F.max(cum_col).alias("_max_cum"))
        audit = (
            cutoffs.join(got, domain_col, "left")
            .withColumn("_mc", F.coalesce(F.col("_max_cum"), F.lit(0)))
            .where((F.col("_mc") < budget_expr) & (F.col("_mc") < F.col("_dom_total")))
            .select(domain_col)
            .collect()  # bounded: ≤ one row per budgeted domain
        )
        if audit:
            bad = sorted(r[0] for r in audit)
            raise ValueError(
                f"mix_sample prefilter_margin={prefilter_margin} too tight for "
                f"domains {bad}: surviving hash prefix neither crossed the "
                "budget nor exhausted the domain; raise the margin"
            )
    drop = ["_h", "_budget"] + (["_cut", "_dom_total"] if prefilter_margin is not None else [])
    return ranked.where(F.col(cum_col) <= F.col("_budget")).drop(*drop)


def shard_assign(
    df: DataFrame,
    n_shards: int,
    id_col: str,
    seed: int = 42,
    hash_mode: str = "portable",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global training shuffle: assign every row a shard in
    ``[0, n_shards)`` and a dense position within its shard, such that
    reading shards 0..n-1 each in position order replays one seeded
    pseudorandom permutation of the corpus — the shuffled-shard layout
    every epoch-based trainer consumes.  Shard membership is a pure
    function of (seed, id): stable under corpus growth (new rows append
    into shards without moving old rows' shards — only positions after an
    insertion point shift, and only inside one shard).

    Two independent hash draws (seed and seed+1 produce disjoint key
    strings under the ``seed|id`` scheme) decide shard and intra-shard
    order, so position within a shard is uncorrelated with the shard
    choice itself.  ``pmod(h, n)`` over the 32-bit hash leaves a ≤
    n/2^32 occupancy bias — negligible for any real shard count.

    Scale: one shuffle (window partitioned by shard).  Pick ``n_shards``
    ≥ cluster parallelism; each shard's window sorts corpus/n rows
    (spillable).  For extreme corpora the dense position can instead be
    composed with the hash-sharded parallel prefix-sum trick used by
    ``packing.pack_sequences`` — the ordering key here is already the
    hash, so positions are rank-of-hash within shard."""
    if not (isinstance(n_shards, int) and n_shards > 0):
        raise ValueError(f"n_shards must be a positive int, got {n_shards!r}")
    h_shard = _keyed_hash(id_col, seed, hash_mode)
    h_pos = _keyed_hash(id_col, seed + 1, hash_mode)
    w = Window.partitionBy(shard_col).orderBy(F.col("_hp").asc(), F.col(id_col).asc())
    return (
        df.withColumn(shard_col, F.pmod(h_shard, F.lit(n_shards)).cast("long"))
        .withColumn("_hp", h_pos)
        .withColumn(pos_col, F.row_number().over(w).cast("long"))
        .drop("_hp")
    )
