"""Fixed-width text source — the S1 analog of the reference's positional
PDB parser (``/root/reference/pyPPI/pdbReader.py:36-91``: character-range
slicing of ATOM records, record-type routing, quality filters, stop
markers), recast as ``spark.read.text`` + ``substring`` projections so the
parse is columnar, parallel, and codegen'd (no per-row Python).

Line format (this engine's own fixed-width transcript log):

    cols  1-4   record type: ``TURN`` (data), ``META`` (skipped), ``END``
                (terminator — later lines of the same file are dropped,
                like the reference's END/MODEL-2 stop)
    cols  5-16  conv_id        (left-padded)
    cols 17-22  turn_idx       (int)
    cols 23-32  role           (trimmed)
    cols 33-52  tool           (trimmed; blank → null)
    cols 53-72  epoch micros   (int)
    cols 73+    text           (raw to end of line)

The END handling needs the reference's *ordered prefix* semantics. Line
order is made EXPLICIT: each file is read unsplit (``wholetext``) and lines
get positions from ``posexplode`` — never inferred from
``monotonically_increasing_id``, whose correspondence to file order is an
undocumented artifact of split packing and breaks if a file ever spans
splits. Trade-off: one task per file and the file must fit in a task
(fine for this debug-scale log format; a production format at 100 TB
should embed a sequence number in the record instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _slice(col, start: int, end: int):
    """1-based inclusive character range, like the reference's column maps."""
    return F.substring(col, start, end - start + 1)


def read_fixed_width_transcripts(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.option("wholetext", "true")
        .text(path)
        .withColumn("_file", F.input_file_name())
        .select("_file", F.posexplode(F.split("value", r"\r?\n")).alias("_pos", "_line"))
    )
    typed = raw.select(
        "_file",
        "_pos",
        F.trim(_slice(F.col("_line"), 1, 4)).alias("_rec"),
        F.trim(_slice(F.col("_line"), 5, 16)).alias("conv_id"),
        F.trim(_slice(F.col("_line"), 17, 22)).try_cast("int").alias("turn_idx"),
        F.trim(_slice(F.col("_line"), 23, 32)).alias("role"),
        F.trim(_slice(F.col("_line"), 33, 52)).alias("tool"),
        F.trim(_slice(F.col("_line"), 53, 72)).try_cast("long").alias("_ts_us"),
        F.substring(F.col("_line"), 73, 1 << 20).alias("text"),
    )
    # END terminator: drop every line at or after the first END per file
    w = Window.partitionBy("_file").orderBy("_pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ended = typed.withColumn(
        "_ended", F.max(F.when(F.col("_rec") == "END", 1).otherwise(0)).over(w)
    )
    return (
        ended.where((F.col("_ended") == 0) & (F.col("_rec") == "TURN"))
        .where(F.col("conv_id") != "")  # quality filter (P2 analog)
        .select(
            "conv_id",
            "turn_idx",
            "role",
            F.when(F.col("tool") == "", None).otherwise(F.col("tool")).alias("tool"),
            F.timestamp_micros(F.col("_ts_us")).alias("ts"),
            "text",
        )
    )


def format_fixed_width_line(
    conv_id: str, turn_idx: int, role: str, tool: str | None, ts_us: int, text: str
) -> str:
    return (
        f"{'TURN':<4}"
        f"{conv_id:<12.12}"
        f"{turn_idx:<6d}"
        f"{role:<10.10}"
        f"{(tool or ''):<20.20}"
        f"{ts_us:<20d}"
        f"{text}"
    )


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Entity-manifest scan (S2 analog of ``PDBs.txt`` —
    ``/root/reference/bin/setupPpiDb.py:394-396``): one conv_id per line,
    ``#`` comments and blanks skipped."""
    return (
        spark.read.text(path)
        .select(F.trim("value").alias("conv_id"))
        .where((F.col("conv_id") != "") & ~F.col("conv_id").startswith("#"))
    )


def write_debug_csv(df: DataFrame, path: str) -> None:
    """Debug CSV sink with header (S7 analog of the reference's per-stage
    CSVs, ``/root/reference/bin/setupPpiDb.py:156-160``)."""
    df.write.mode("overwrite").option("header", "true").csv(path)
