"""Benchmark decontamination: n-gram overlap of a corpus against an
evaluation set.

A 100 TB training corpus must be screened for evaluation-set leakage
before training — the standard scheme (the GPT-3/PaLM appendix method) is
word n-gram collision: a document is contaminated when it shares ≥1
sufficiently long n-gram with any benchmark document. Semantically this
is the reference's P1 membership screen (``a.chain in part`` at
``/root/reference/pyPPI/pdbReader.py:114-115``,
``/root/reference/bin/setupPpiDb.py:129-130``) with a DERIVED membership
set: the probe keys are built from the benchmark's content rather than
given as a literal list.

Physical shape (all codegen until the final join):

1. distinct word ``n``-grams per corpus doc — ``posexplode(split)`` + the
   ``lead``-window gram builder shared with the Jaccard verifier (one
   shuffle on doc_id, reused by the final count);
2. the benchmark's DISTINCT gram set — tiny relative to the corpus (an
   eval set is KBs–MBs), so it ships as a **broadcast** build side: the
   per-gram probe is a broadcast LEFT SEMI-shaped join, no corpus-wide
   gram shuffle;
3. per-doc counts: total distinct grams vs overlapping grams → overlap
   fraction + contamination flag.

``key="hash"`` (default) joins on ``xxhash64(gram)`` — fixed-width keys,
the 100 TB path. ``key="text"`` joins on the gram string itself — exact,
engine-portable (the driver oracle mode). A hash collision can only
FLAG a clean document (never unflag a contaminated one), and at 64 bits
the probability is negligible; decontamination errs conservative anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _normalize


def _grams(df: DataFrame, text_col: str, id_col: str, n: int, distinct: bool = True) -> DataFrame:
    """One row per (doc, word n-gram) occurrence (``distinct=False``) or
    per distinct gram. The ``lead`` window MUST partition by the doc id —
    an unpartitioned window would build grams spanning document boundaries
    (and posexplode positions restart per row, so ordering would interleave
    documents). Documents shorter than ``n`` words contribute their whole
    text as one gram, so short docs are still screened."""
    words = df.select(
        F.col(id_col),
        F.posexplode(F.split(_normalize(F.col(text_col)), " ")).alias("_pos", "_w0"),
    )
    w = Window.partitionBy(id_col).orderBy("_pos")
    lead_cols = [F.lead("_w0", j).over(w).alias(f"_w{j}") for j in range(1, n)]
    sh = (
        words.select(F.col(id_col), "_pos", "_w0", *lead_cols)
        .where(F.col(f"_w{n - 1}").isNotNull() | (F.col("_pos") == 0))
        .select(F.col(id_col), F.concat_ws(" ", *[f"_w{j}" for j in range(n)]).alias("_g"))
    )
    return sh.dropDuplicates([id_col, "_g"]) if distinct else sh


def _distinct_grams(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return _grams(df, text_col, id_col, n, distinct=True)


def repetition_report(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    key: str = "hash",
) -> DataFrame:
    """Per-document repetition statistics — the DataFrame-level form of
    ``functions.text.repetition_stats`` (same values, same edge semantics),
    as gram ROWS + one hash aggregation instead of per-row array HOFs:
    measured 5× faster at sf0.1 (higher-order array functions evaluate
    interpreted; explode+lead+hashagg stays in whole-stage codegen). One
    shuffle of fixed-width (id, gram-hash) rows.

    ``key="hash"`` counts distinct xxhash64(gram) — fixed-width shuffle,
    the scale path (a 64-bit collision undercounts distinct by 1 with
    probability ~n²/2⁶⁵ per doc — negligible, and conservative: it can
    only INCREASE the repetition signal). ``key="text"`` counts the gram
    strings exactly (oracle-portable)."""
    if key not in ("hash", "text"):
        raise ValueError(f"unknown key {key!r}")
    g = _grams(docs, text_col, id_col, n, distinct=False)
    gk = F.xxhash64("_g") if key == "hash" else F.col("_g")
    return (
        g.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams_total"),
            F.countDistinct(gk).alias("n_grams_distinct"),
        )
        .withColumn(
            "repetition_frac",
            (F.col("n_grams_total") - F.col("n_grams_distinct")).cast("double")
            / F.col("n_grams_total").cast("double"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 8,
    max_overlap_frac: float = 0.0,
    key: str = "hash",
) -> DataFrame:
    """Per-document contamination report against a benchmark set:
    (id, n_grams, n_overlap, overlap_frac, contaminated).

    ``contaminated`` is true when ``overlap_frac > max_overlap_frac`` — the
    default 0.0 flags ANY shared n-gram (the conservative standard). Filter
    ``~contaminated`` to decontaminate, or join the report back for audit.

    The benchmark gram set is broadcast (an eval suite is small by
    definition; if yours is not, drop the ``F.broadcast`` hint and let AQE
    pick the join). The corpus-side gram build shuffles once on the doc id
    and that exchange feeds both the total and the overlap counts.
    """
    if key not in ("hash", "text"):
        raise ValueError(f"unknown key {key!r}")
    gram_key = (lambda c: F.xxhash64(c)) if key == "hash" else (lambda c: c)

    doc_grams = _distinct_grams(docs, text_col, id_col, n).select(
        F.col(id_col), gram_key(F.col("_g")).alias("_k")
    )
    # the gram window needs a per-row id on the benchmark side too (grams
    # must not span benchmark documents); eval sets without one get a
    # deterministic content hash
    bench = benchmark.withColumn("_bid", F.xxhash64(F.col(bench_text_col)))
    bench_grams = (
        _distinct_grams(bench, bench_text_col, "_bid", n)
        .select(gram_key(F.col("_g")).alias("_k"))
        .distinct()
    )
    totals = doc_grams.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    overlaps = (
        doc_grams.join(F.broadcast(bench_grams), "_k", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        totals.join(overlaps, id_col, "left")
        .select(
            F.col(id_col),
            "n_grams",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
        )
        .withColumn(
            "overlap_frac",
            F.col("n_overlap").cast("double") / F.col("n_grams").cast("double"),
        )
        .withColumn("contaminated", F.col("overlap_frac") > F.lit(max_overlap_frac))
    )
