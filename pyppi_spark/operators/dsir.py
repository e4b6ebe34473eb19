"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023): select raw-corpus documents whose hashed-n-gram distribution looks
like a small high-quality TARGET corpus, by ranking on the log importance
ratio log p_target(doc) − log p_raw(doc) under two bag-of-hashed-n-grams
unigram models.  This is the classifier-free data-selection step of an
LLM pretraining pipeline (the published alternative to a fastText quality
classifier — the feature space, hashed unigrams+bigrams, is the same; the
"classifier" is the exact NB log-odds of the two corpora).

Reference analog: the corpus-derived frequency tables the reference
builds once and re-applies per row
(``/root/reference/pyPPI/surfaceComplementarity/interfaceDepth.py``)
— here there are TWO tables (target and raw) and the score is their
log-ratio.

Cross-engine portability: the log-ratio is quantized to WHOLE BITS via
the exact integer identity ``floor(log2(n)) == length(bin(n)) - 1`` (same
device as ``quality_lm``): one gram occurrence in bucket b scores
``bits_raw(b) − bits_target(b)`` where ``bits_X(b) = floor(log2(total_X))
− floor(log2(tf_X[b]))`` is the whole-bit surprisal under corpus X.  A
document that is LESS surprising to the target LM than to the raw LM
scores positive.  Pure int64 arithmetic — the SQL oracle matches bitwise.

Plan shape (one text scan, one real shuffle): scan → window-free bigram
build (``quality_lm.gram_pair_rows``: shifted-array zip + one explode —
no per-doc window, no token-row exchange+sort, no giant-document sort
straggler; the windowed formulation measurably FAILED the process-
isolated scaling gate before this rewrite passed it) → hash gram to one
of ``n_buckets`` buckets → partial+final count by (doc, bucket).  The two corpus bucket tables are
≤ ``n_buckets`` rows each (bounded by construction, unlike a vocabulary)
— ALWAYS broadcast, so scoring joins are map-side and the only exchange
moving O(corpus) rows is the (doc, bucket) aggregation.  At 100 TB the
target corpus is small by definition (a curated reference set) and its
bucket table is a pure function of it — persist it once and pass
``target_buckets`` so increments never re-read target text (the same
persisted-artifact pattern as ``dedup.content_keys``).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from pyppi_spark.operators.quality_lm import gram_pair_rows
from pyppi_spark.operators.sampling import _keyed_hash


def _gram_bucket(gram: F.Column, n_buckets: int, hash_mode: str, seed: int) -> F.Column:
    """Hash a gram string into [0, n_buckets) — the hashing trick.
    ``portable`` is the md5-prefix arithmetic the DuckDB oracles mirror;
    ``fast`` is xxhash64 for production runs."""
    key = F.concat(F.lit(f"{seed}|"), gram)
    if hash_mode == "portable":
        h = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    elif hash_mode == "fast":
        h = F.xxhash64(key)
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    return F.pmod(h, F.lit(n_buckets)).cast("long")


def hashed_gram_occurrences(
    docs: DataFrame,
    n_buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "portable",
    seed: int = 0,
) -> DataFrame:
    """One row per hashed-gram occurrence: ``(id_col, bucket)``.  Grams
    are unigrams plus word bigrams (DSIR's published feature space);
    token strings never contain spaces, bigrams always do, so the two
    gram families cannot collide as strings (they still share buckets —
    that IS the hashing trick).  Built on the zero-shuffle
    ``gram_pair_rows`` — no window, no exchange before aggregation."""
    grams = gram_pair_rows(docs, text_col=text_col, id_col=id_col)
    g = grams.select(
        F.col(id_col),
        F.explode(
            F.array(
                F.col("_w2"),
                F.when(F.col("_w1").isNotNull(), F.concat_ws(" ", "_w1", "_w2")),
            )
        ).alias("_gram"),
    ).where(F.col("_gram").isNotNull())
    return g.select(
        F.col(id_col), _gram_bucket(F.col("_gram"), n_buckets, hash_mode, seed).alias("bucket")
    )


def bucket_counts(occurrences: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Corpus bucket table ``(bucket, tf)`` from gram occurrences — ≤
    ``n_buckets`` rows, broadcastable by construction.  Exposed so a
    pipeline can persist the target table and merge raw-corpus increments
    by summation (``tf`` adds)."""
    return occurrences.groupBy("bucket").agg(F.count(F.lit(1)).alias("tf"))


def dsir_scores(
    raw: DataFrame,
    target: DataFrame | None = None,
    n_buckets: int = 8192,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "portable",
    seed: int = 0,
    target_buckets: DataFrame | None = None,
) -> DataFrame:
    """Per-document DSIR importance score over the raw corpus.

    Returns one row per raw document: ``n_grams`` (int64 gram
    occurrences), ``sum_bits`` (int64 quantized log importance ratio —
    positive = more target-like than raw-average), ``mean_bits``
    (``sum_bits / n_grams``, an exact int ratio so IEEE division is
    engine-portable).

    Exactly one of ``target`` / ``target_buckets`` must be given;
    ``target_buckets`` is a persisted ``bucket_counts`` table (the
    incremental path — frozen target text is never re-read).  Buckets the
    target corpus never hit get the tf=1 out-of-model floor (max
    surprisal), mirroring ``unigram_surprisal``'s OOV rule; raw-table
    buckets always exist for the docs being scored (the raw LM is fit on
    them).
    """
    if (target is None) == (target_buckets is None):
        raise ValueError("pass exactly one of target / target_buckets")
    occ = hashed_gram_occurrences(
        raw, n_buckets, text_col=text_col, id_col=id_col, hash_mode=hash_mode, seed=seed
    )
    # single text scan: per-(doc, bucket) counts feed both the raw LM
    # table (by summation) and the scoring join
    db = occ.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("_n"))
    q = db.groupBy("bucket").agg(F.sum("_n").cast("long").alias("_tfq"))
    if target_buckets is None:
        tocc = hashed_gram_occurrences(
            target, n_buckets, text_col=text_col, id_col=id_col,
            hash_mode=hash_mode, seed=seed,
        )
        p = bucket_counts(tocc, id_col=id_col)
    else:
        p = target_buckets
    p = p.select(F.col("bucket"), F.col("tf").cast("long").alias("_tfp"))
    # empty-target guard: with zero target grams _totp is NULL, which
    # would propagate NULL into every sum_bits and let a downstream
    # top-k silently "select" the k smallest ids — a misconfigured job
    # must FAIL, not ship an arbitrary corpus
    # the guard lives INSIDE the kept column as the coalesce fallback —
    # NULL is the only failure mode (per-bucket counts are ≥ 1, so a
    # non-NULL sum is positive), coalesce's lazy second arg fires exactly
    # then, and column pruning cannot drop it.  (An additive
    # `assert_true` guard does NOT work: codegen'd arithmetic
    # short-circuits on a NULL left operand and never evaluates it.)
    tot_p = p.agg(F.sum("_tfp").cast("long").alias("_totp")).select(
        F.coalesce(
            F.col("_totp"),
            F.raise_error(
                F.lit("dsir_scores: target corpus is empty (no grams)")
            ).cast("long"),
        ).alias("_totp")
    )
    tot_q = q.agg(F.sum("_tfq").cast("long").alias("_totq"))
    j = (
        db.join(F.broadcast(p), "bucket", "left")
        .join(F.broadcast(q), "bucket")
        .crossJoin(F.broadcast(tot_p))
        .crossJoin(F.broadcast(tot_q))
    )
    tfp = F.coalesce(F.col("_tfp"), F.lit(1)).cast("long")
    bits_p = F.length(F.bin(F.col("_totp"))) - F.length(F.bin(tfp))
    bits_q = F.length(F.bin(F.col("_totq"))) - F.length(F.bin(F.col("_tfq")))
    per_doc = j.groupBy(id_col).agg(
        F.sum("_n").cast("long").alias("n_grams"),
        F.sum(F.col("_n") * (bits_q - bits_p)).cast("long").alias("sum_bits"),
    )
    return per_doc.withColumn(
        "mean_bits",
        F.col("sum_bits").cast("double") / F.col("n_grams").cast("double"),
    )


def gumbel_topk(
    scored: DataFrame,
    k: int,
    score_col: str = "sum_bits",
    id_col: str = "doc_id",
    seed: int = 42,
    hash_mode: str = "portable",
    noise: str = "gumbel",
) -> DataFrame:
    """Select ``k`` rows by importance — DSIR's resampling step.

    ``noise='gumbel'`` (production, the paper's sampler): keep the top-k
    of ``score·ln2 + Gumbel(0,1)``, which draws k documents WITHOUT
    replacement with probability proportional to the importance weight
    ``2^score`` (Gumbel-max trick) — sampling, not arg-top-k, so the
    selection doesn't collapse onto near-duplicates of the target.  The
    Gumbel draw is a pure function of (seed, id): ``u = (h + 0.5)/2^32``
    from the seeded portable hash, ``g = −ln(−ln u)``.  Float, so it is
    pytest-verified against a numpy reference rather than SQL-oracled.

    ``noise='hash'`` (the paper's deterministic top-k heuristic, and the
    oracle mode): rank by ``(score desc, seeded-hash asc, id asc)`` —
    pure int64 total order, bitwise engine-portable.

    Scale: both modes are a global top-k (TakeOrderedAndProject — per-
    partition heaps then a driver merge of k·partitions rows), never a
    global sort."""
    if not (isinstance(k, int) and k > 0):
        raise ValueError(f"k must be a positive int, got {k!r}")
    h = _keyed_hash(id_col, seed, hash_mode)
    if hash_mode == "fast":
        h = F.pmod(h, F.lit(1 << 32))
    if noise == "hash":
        out = scored.withColumn("_h", h).orderBy(
            F.col(score_col).desc(), F.col("_h").asc(), F.col(id_col).asc()
        )
        return out.limit(k).drop("_h")
    if noise == "gumbel":
        u = (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 32))
        g = -F.log(-F.log(u))
        key = F.col(score_col).cast("double") * F.lit(math.log(2.0)) + g
        out = scored.withColumn("_key", key).orderBy(
            F.col("_key").desc(), F.col(id_col).asc()
        )
        return out.limit(k).drop("_key")
    raise ValueError(f"unknown noise {noise!r}")
