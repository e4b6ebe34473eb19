"""End-to-end training-set construction — the composition every piece of
this engine exists for. Mirrors the reference's staged pipeline
(``/root/reference/bin/setupPpiDb.py:375-413``: parse → per-atom features →
relational derivation → energy terms, stage outputs materialized between
steps) as a Spark DAG over transcripts + documents:

1. document hygiene: quality score + language filter (text analysis),
   PII screening, repetition filter, and optional benchmark
   decontamination,
2. duplicate removal: exact (normalized-content) dedup first, then
   MinHash-LSH candidates → exact n-gram Jaccard verify → representative
   selection over the unique texts,
3. transcript feature extraction: sessionization, lag/lead, backfill,
4. per-conversation feature vectors,
5. point-in-time snapshots at probe timestamps (zero leakage).

Each stage returns a DataFrame so callers can materialize (or checkpoint
via ``pyppi_spark.checkpoint``) between stages exactly like the
reference's CSV/DB stage boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import lang_id, pii_stats, quality_score
from ..operators.decontaminate import decontaminate, repetition_report
from ..operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    near_dedup_representatives,
    ngram_jaccard_pairs,
    winnow_candidate_pairs,
    winnow_fingerprints_kernel,
)
from .features import conv_features, turn_features
from .pit import pit_features


def clean_documents(
    documents: DataFrame,
    min_quality: float = 0.3,
    languages: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.8,
    drop_pii: bool = False,
    max_repetition: float | None = None,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    lsh_max_bucket_size: int | None = None,
    lsh_hot_bucket: str = "error",
) -> DataFrame:
    """Document-hygiene stage: quality/language filter, optional PII drop,
    optional repetition filter, optional benchmark decontamination, then
    near-dedup; returns surviving docs with quality/lang attached.

    Screen order is cheapest-first: row-local scalar filters prune before
    the gram-building screens, and everything prunes before the
    shuffle-heaviest near-dedup."""
    scored = documents.withColumn("quality", quality_score("text")).withColumn(
        "lang_pred", lang_id("text")
    )
    kept = scored.where(
        (F.col("quality") >= min_quality) & F.col("lang_pred").isin(*languages)
    )
    if drop_pii:
        kept = kept.where(~pii_stats(F.col("text"))["has_pii"])
    if max_repetition is not None:
        rep = repetition_report(kept, id_col=id_col).where(
            F.col("repetition_frac") <= max_repetition
        )
        kept = kept.join(rep.select(id_col), id_col, "left_semi")
    if benchmark is not None:
        contaminated = decontaminate(kept, benchmark, id_col=id_col).where(
            F.col("contaminated")
        )
        kept = kept.join(contaminated.select(id_col), id_col, "left_anti")
    # Exact-dedup FIRST, near-dedup over unique texts only. Byte-identical
    # documents — the dominant duplicate class in scraped corpora — share
    # every band hash, so feeding them to LSH makes the band self-join
    # output quadratic in the identical-cluster size (a 10⁶-copy
    # boilerplate page ≈ 1.6×10¹³ candidate rows). Collapsing them to one
    # representative first makes candidate count linear in copies; the
    # survivor set is unchanged: exact duplicates have Jaccard 1.0, so the
    # old composition dropped every non-min copy anyway, and the exact
    # representative is its cluster's min id — the near-dup component min
    # over representatives equals the global component min.
    # ``lsh_max_bucket_size``: optional defense-in-depth on top of the
    # exact-dedup stage — after it, a hot band bucket means near-identical
    # (not byte-identical) template clusters; 'error' fails fast, 'skip'
    # trades bounded recall for bounded cost (pairs that survive are still
    # Jaccard-verified). The census rides the band join's own exchange.
    uniq = exact_dedup(kept, text_col="text", id_col=id_col)
    sigs = minhash_signatures(uniq, id_col=id_col)
    cands = minhash_lsh_candidates(
        sigs, id_col=id_col, bands=32, rows_per_band=2,
        max_bucket_size=lsh_max_bucket_size, hot_bucket=lsh_hot_bucket,
    )
    dups = ngram_jaccard_pairs(uniq, cands, id_col=id_col, threshold=jaccard_threshold)
    return near_dedup_representatives(uniq, dups, id_col=id_col)


def moss_dedup_documents(
    documents: DataFrame,
    k: int = 7,
    window: int = 4,
    min_shared: int = 10,
    min_overlap_frac: float | None = 0.5,
    max_bucket_size: int | None = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "fast",
    repartition_to: int | None = None,
    observation=None,
) -> DataFrame:
    """The MOSS near-dedup composition end-to-end — the second near-dup
    family (overlap/plagiarism detection, Schleimer et al.'s winnowing)
    made usable as one call, mirroring ``clean_documents``' MinHash path
    and the reference's staged pipeline shape
    (``/root/reference/bin/setupPpiDb.py:375-413``):

    1. exact (normalized-content) dedup — byte-identical copies share
       every fingerprint, so feeding them to the pair join makes hot
       fingerprint buckets quadratic in the copy count (same argument as
       the LSH path); they are also the one duplicate class the pair
       stage can MISS (a doc with < ``min_shared`` fingerprints never
       pairs, even with its identical twin), so collapsing them first is
       both the fast and the more-correct order,
    2. winnowing fingerprints (``winnow_fingerprints_kernel`` — zero
       shuffle, doc-local numpy),
    3. candidate pairs sharing >= ``min_shared`` fingerprints AND >=
       ``min_overlap_frac`` of the smaller document's fingerprint set
       (the relative criterion is what separates true overlap from shared
       boilerplate); ubiquitous fingerprints capped at
       ``max_bucket_size`` (``observation`` accounts capped rows — see
       ``winnow_candidate_pairs``),
    4. transitive survivor selection (connected-component min id).

    Returns the surviving documents (all input columns). Semantics are
    the COMPOSITION (exact dedup, then MOSS over unique texts) — the
    whole thing sits under a DuckDB value oracle as the ``moss_dedup``
    driver query."""
    uniq = exact_dedup(documents, text_col=text_col, id_col=id_col)
    fp = winnow_fingerprints_kernel(
        uniq, text_col=text_col, id_col=id_col, k=k, window=window,
        hash_mode=hash_mode, repartition_to=repartition_to,
    )
    pairs = winnow_candidate_pairs(
        fp, id_col=id_col, min_shared=min_shared,
        min_overlap_frac=min_overlap_frac,
        max_bucket_size=max_bucket_size, observation=observation,
    )
    return near_dedup_representatives(uniq, pairs.select("a", "b"), id_col=id_col)


def moss_dedup_incremental(
    new_docs: DataFrame,
    old_docs: DataFrame | None = None,
    k: int = 7,
    window: int = 4,
    min_shared: int = 10,
    min_overlap_frac: float | None = 0.5,
    max_bucket_size: int | None = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "fast",
    repartition_to: int | None = None,
    observation=None,
    old_fps: DataFrame | None = None,
) -> DataFrame:
    """MOSS near-dedup of an increment against a frozen corpus. Like the
    SimHash family, the MOSS overlap criterion is evaluated on the
    fingerprints alone — so with ``old_fps`` (the persisted
    ``(id, fingerprint)`` table a previous run materialized,
    ``jobs/dedup_corpus.py``'s ``winnow_fps`` artifact) the frozen
    corpus TEXT is never read: the increment is fingerprinted
    (zero-shuffle kernel), joined new-vs-(old ∪ new) on the fingerprint
    value, and scored with the same ``min_shared`` + fractional-overlap
    rule as ``moss_dedup_documents``. old × old pairs are never
    generated. Pass ``old_docs`` instead to derive the fingerprints from
    text (O(corpus) per run — only for corpora without the artifact).

    Run ``exact_dedup_incremental`` FIRST (same composition contract as
    the full pipeline: byte-identical copies share every fingerprint —
    hot-bucket quadratics — and sub-``min_shared``-fingerprint docs can
    only be caught by the exact stage). Fingerprint parameters
    (k, window, hash_mode) must match the run that wrote ``old_fps`` —
    the job's ``band_params`` sidecar validates this. Returns surviving
    new documents (all columns); a new doc overlapping ANY old doc drops
    outright, new-only pairs keep the component-min representative."""
    from ..operators.dedup import winnow_candidate_pairs_incremental

    if (old_fps is None) == (old_docs is None):
        raise ValueError("pass exactly one of old_docs or old_fps")
    new_fp = winnow_fingerprints_kernel(
        new_docs, text_col=text_col, id_col=id_col, k=k, window=window,
        hash_mode=hash_mode, repartition_to=repartition_to,
    ).withColumn("_new", F.lit(True))
    if old_fps is not None:
        old_fp = old_fps.select(F.col(id_col), F.col("fingerprint"))
    else:
        old_fp = winnow_fingerprints_kernel(
            old_docs, text_col=text_col, id_col=id_col, k=k, window=window,
            hash_mode=hash_mode, repartition_to=repartition_to,
        )
    fps = new_fp.unionByName(old_fp.withColumn("_new", F.lit(False)))
    pairs = winnow_candidate_pairs_incremental(
        fps, id_col=id_col, min_shared=min_shared,
        min_overlap_frac=min_overlap_frac,
        max_bucket_size=max_bucket_size, observation=observation,
    ).localCheckpoint(eager=False)
    dup_of_old = pairs.where(~F.col("_new_b")).select(F.col("a").alias(id_col)).distinct()
    fresh = new_docs.join(dup_of_old, id_col, "left_anti")
    new_pairs = pairs.where(F.col("_new_b")).select("a", "b").distinct()
    return near_dedup_representatives(fresh, new_pairs, id_col=id_col)


def build_training_set(
    transcripts: DataFrame,
    probes: DataFrame | None = None,
    gap_s: float = 1800.0,
) -> dict[str, DataFrame]:
    """Returns the pipeline's three feature tables keyed by name."""
    out = {
        "turn_features": turn_features(transcripts, gap_s=gap_s),
        "conv_features": conv_features(transcripts, gap_s=gap_s),
    }
    if probes is not None:
        out["pit_features"] = pit_features(probes, transcripts, gap_s=gap_s)
    return out
