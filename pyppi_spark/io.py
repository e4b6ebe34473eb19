"""Table layout for scale: balanced-bucket storage.

Hash-bucketing a Zipf-skewed entity key leaves the largest bucket ~2.5× the
mean (measured on the synthetic corpus), and window stages cannot be
AQE-skew-split, so the largest bucket becomes the job's straggler. This
module instead **bin-packs conversations into equal-row buckets** (greedy
largest-first) and writes a bucketed, sort-ordered table on the bucket id:

- windows/groupBys that partition on ``(_bkt, conv_id)`` are satisfied by
  the storage ``HashPartitioning(_bkt)`` (subset rule) → **zero shuffle**,
- every bucket has nearly identical row counts → no stragglers,
- the bucket id is a pure function of ``conv_id`` → semantics unchanged.

This is the engine's layout answer to the reference's per-entity loop skew
(a few huge PDB complexes dominating ``/root/reference/bin/setupPpiDb.py:163``)
and the Spark-native stand-in for an Iceberg ``bucket(conv_id)`` partition
spec with a sort order.

At 10^12-turn scale the conv→size histogram does not fit the driver;
bin-pack the top-K heavy hitters exactly (K ≈ 10⁵ covers the Zipf tail) and
hash the long tail — ``assignment_mode="hybrid"`` does this.
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame, SparkSession, functions as F

BUCKET_COL = "_bkt"


DEFAULT_HEAVY_HITTERS = 100_000


def balanced_assignment(
    df: DataFrame,
    n_buckets: int,
    conv_col: str = "conv_id",
    heavy_hitters: int | None = DEFAULT_HEAVY_HITTERS,
) -> DataFrame:
    """conv_id → bucket mapping (small DataFrame, broadcast-joinable).

    Greedy bin-pack: sort conversations by size descending, always drop the
    next conversation into the currently-lightest bucket. ``heavy_hitters``
    limits the exact packing to the K largest conversations (the rest are
    hashed by conv_id) — the DEFAULT, because collecting the full conv-size
    histogram is an unbounded driver collect (OOM at 10^12 turns), while
    the top-100k covers the Zipf head that actually causes skew and the
    hashed long tail is balanced by the law of large numbers. The driver
    collect in the default path is bounded by construction
    (``limit(heavy_hitters)`` rows of (id, count) — ~MBs at the default).
    ``heavy_hitters=None`` (exact packing, unbounded ``sizes.collect()``)
    is a TEST-SCALE-ONLY mode: it is the one intentional exception to the
    repo's no-unbounded-collect invariant and must not be used at corpus
    scale.
    """
    sizes = df.groupBy(conv_col).count()
    if heavy_hitters is not None:
        top = sizes.orderBy(F.desc("count"), conv_col).limit(heavy_hitters).collect()
        top_ids = {r[conv_col] for r in top}
        rows = [(r[conv_col], int(r["count"])) for r in top]
    else:
        rows = [(r[conv_col], int(r["count"])) for r in sizes.collect()]
        top_ids = None

    # ties on size break by conv_id: collect() order is partition-layout-
    # dependent and the bin-pack must be identical across runs (invariant)
    rows.sort(key=lambda x: (-x[1], str(x[0])))
    heap = [(0, b) for b in range(n_buckets)]
    heapq.heapify(heap)
    assign = []
    for cid, n in rows:
        load, b = heapq.heappop(heap)
        assign.append((cid, b))
        heapq.heappush(heap, (load + n, b))

    spark = df.sparkSession
    mapping = spark.createDataFrame(assign, f"{conv_col} string, {BUCKET_COL} int")
    if top_ids is not None:
        # long tail: stable hash of conv_id (size-agnostic, deterministic)
        rest = sizes.select(conv_col).join(mapping.select(conv_col), conv_col, "left_anti")
        hashed = rest.select(
            conv_col, F.pmod(F.xxhash64(conv_col), F.lit(n_buckets)).cast("int").alias(BUCKET_COL)
        )
        mapping = mapping.unionByName(hashed)
    return mapping


def with_balanced_bucket(
    df: DataFrame,
    n_buckets: int,
    conv_col: str = "conv_id",
    heavy_hitters: int | None = DEFAULT_HEAVY_HITTERS,
) -> DataFrame:
    mapping = balanced_assignment(df, n_buckets, conv_col, heavy_hitters)
    return df.join(F.broadcast(mapping), conv_col, "inner")


def write_bucketed(
    df: DataFrame,
    table: str,
    location: str,
    n_buckets: int = 128,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    idx_col: str = "turn_idx",
    balanced: bool = True,
    heavy_hitters: int | None = DEFAULT_HEAVY_HITTERS,
) -> None:
    """Write a bucketed, sort-ordered transcript table (the engine's
    canonical at-rest layout). ``balanced=True`` adds the bin-packed
    ``_bkt`` column and buckets on it; ``False`` hash-buckets on conv_id."""
    if balanced:
        out = with_balanced_bucket(df, n_buckets, conv_col, heavy_hitters)
        bucket_key = BUCKET_COL
    else:
        out = df
        bucket_key = conv_col
    # one writer task per bucket → exactly one file per bucket: avoids
    # (writer_tasks × buckets) file fragmentation and lets the scan report
    # the per-bucket sort order (no re-sort at read time)
    out = out.repartition(n_buckets, bucket_key)
    (
        out.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_key)
        .sortBy(bucket_key, conv_col, ts_col, idx_col)
        .option("path", location)
        .format("parquet")
        .saveAsTable(table)
    )


def register_bucketed(
    spark: SparkSession,
    table: str,
    location: str,
    n_buckets: int = 128,
    schema_ddl: str = (
        "conv_id string, turn_idx int, role string, text string, tool string, "
        "ts timestamp, _bkt int"
    ),
    bucket_key: str = BUCKET_COL,
    conv_col: str = "conv_id",
    ts_col: str = "ts",
    idx_col: str = "turn_idx",
) -> DataFrame:
    """(Re-)register a bucketed table in the session catalog from its files
    (the default in-memory catalog does not persist across sessions; with a
    shared Hive/Iceberg catalog this is a no-op lookup)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"""
        CREATE TABLE {table} ({schema_ddl})
        USING parquet
        CLUSTERED BY ({bucket_key})
        SORTED BY ({bucket_key}, {conv_col}, {ts_col}, {idx_col})
        INTO {n_buckets} BUCKETS
        LOCATION '{location}'
        """
    )
    return spark.table(table)


def write_text(spark: SparkSession, path: str, content: str) -> None:
    """Write a small text file through the Hadoop FileSystem API — works
    on any URI scheme Spark itself can write to (local, hdfs://, s3a://),
    unlike driver-local ``open()``. For job metrics/ledger sidecars."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()
