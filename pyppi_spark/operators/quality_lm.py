"""Corpus-level unigram language-model quality scoring — the CCNet-style
perplexity screen of an LLM training pipeline: estimate a unigram LM from
the corpus itself, then score every document by its mean per-token
surprisal.  High surprisal = gibberish / non-language / OCR noise; very
low surprisal = boilerplate loops.  Both tails get cut before training.

Reference analog: the corpus-derived per-residue propensity tables the
reference builds in one pass and then re-applies to every structure
(``/root/reference/pyPPI/surfaceComplementarity/interfaceDepth.py``
builds frequency tables, then scores rows against them) — here the
"table" is the corpus token-frequency distribution.

Cross-engine portability: surprisal uses ``log2`` QUANTIZED TO WHOLE BITS
via the exact integer identity ``floor(log2(n)) == length(bin(n)) - 1``
(`bin` renders the same minimal binary string in Spark and DuckDB), so a
token occurrence costs ``floor(log2(total)) - floor(log2(tf))`` bits —
pure int64 arithmetic, zero float, bitwise-identical in any engine.  The
quantization is within ±1 bit of the real ``log2(total/tf)``; for a
relative quality RANKING (the only thing the filter consumes) that is
ample, and it buys an exact SQL oracle.  A production variant can swap in
``F.log2`` unchanged.

Plan shape (the same explode + two hash-agg topology as TF-IDF):
scan → explode tokens → partial+final count by (doc, tok) → vocab agg by
tok → join back on tok → final agg by doc.  Every aggregation is
map-side-partial; the vocab table is millions of rows at 100 TB (Heaps'
law), far smaller than the corpus, and can be broadcast
(``broadcast_vocab=True``) to remove the tok-keyed shuffle entirely.
Stop-token skew ("the" appears everywhere) sits in an equi JOIN — which
AQE skew-split handles — not in a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _norm_tokens(text_col: str) -> F.Column:
    """Whitespace tokens of the lowercased, space-collapsed text — the
    repo-wide normalization (empty text yields the single '' token, the
    established empty-gram convention; it scores like any vocab entry).

    The whitespace class is EXPLICIT ``[ \\t\\n\\r\\f\\x0B]`` — exactly
    Java's ``\\s`` (so this is behavior-identical on the Spark side) but
    NOT RE2's ``\\s``, which excludes vertical tab: oracles interpolate
    the same class so a ``\\x0B`` in a document cannot make the engines
    tokenize differently (the BPE_TOKEN_PATTERN rule, CLAUDE.md)."""
    return F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"[ \t\n\r\f\x0B]+", " "),
        " ",
    )


def gram_pair_rows(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per token occurrence with its left context:
    ``(id_col, _w1, _w2)`` where ``_w1`` is NULL for the document-initial
    token — the input shape every n-gram LM here consumes (bigram
    surprisal, DSIR's hashed-gram features).

    ZERO SHUFFLE by construction: the previous-token column comes from
    zipping the token array with its own 1-right-shifted copy
    (``concat([NULL], slice(toks, 1, n-1))``) and exploding ONCE — no
    per-document window, so there is no token-row exchange+sort and no
    giant-document sort straggler.  ``concat``/``slice``/``arrays_zip``
    are plain (non-lambda) collection expressions that stay inside
    whole-stage codegen — this is NOT the interpreted higher-order-
    function trap that made the minhash string pipelines 10× slower
    (those chain per-element LambdaFunctions; this builds two arrays and
    explodes)."""
    toks = _norm_tokens(text_col)
    d = docs.select(F.col(id_col), toks.alias("_t"))
    prev = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))),
    )
    z = d.select(
        F.col(id_col), F.explode(F.arrays_zip(F.col("_t"), prev.alias("_p"))).alias("_s")
    )
    return z.select(
        F.col(id_col), F.col("_s._p").alias("_w1"), F.col("_s._t").alias("_w2")
    )


def unigram_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus unigram table: one row per token with its corpus occurrence
    count ``tf``.  Exposed separately so an incremental pipeline can
    persist it and merge increments by summation instead of re-reading
    frozen text (the same persisted-artifact pattern as
    ``dedup.content_keys`` / ``minhash_bands``)."""
    toks = docs.select(F.explode(_norm_tokens(text_col)).alias("tok"))
    return toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))


def unigram_surprisal(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab: DataFrame | None = None,
    broadcast_vocab: bool = False,
) -> DataFrame:
    """Score every document against the corpus unigram LM.

    Returns one row per document: ``n_tokens`` (int64 occurrences),
    ``sum_bits`` (int64 total quantized surprisal), ``mean_bits``
    (``sum_bits / n_tokens`` as a raw double — an exact int ratio, so
    IEEE division makes it bitwise engine-portable without rounding).

    ``vocab`` lets the caller supply a persisted/merged ``unigram_counts``
    table (incremental corpora, or a reference LM from a held-out clean
    corpus — the actual CCNet setup).  When scoring against a FOREIGN
    vocab, tokens absent from it get the out-of-vocabulary floor tf=1
    (max surprisal), so the score is total, not partial.

    ``broadcast_vocab=True`` broadcasts the token-frequency table into
    the per-doc join — removes the tok shuffle when the vocabulary fits
    in executor memory (it usually does: vocab grows ~O(corpus^0.5))."""
    doc_toks = (
        docs.select(F.col(id_col), F.explode(_norm_tokens(text_col)).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    own_vocab = vocab is None
    if own_vocab:
        # derive the LM from doc_toks itself (one extra small agg) so the
        # corpus text is exploded exactly once
        vocab = doc_toks.groupBy("tok").agg(F.sum("n").alias("tf"))
    total_df = vocab.agg(F.sum("tf").cast("long").alias("_total"))
    rhs = F.broadcast(vocab) if broadcast_vocab else vocab
    joined = doc_toks.join(rhs, "tok", "left" if not own_vocab else "inner")
    # floor(log2(n)) == length(bin(n)) - 1, exact in both engines; OOV → tf=1
    tf = F.coalesce(F.col("tf"), F.lit(1)).cast("long")
    bits = F.length(F.bin(F.col("_total"))) - F.length(F.bin(tf))
    per_doc = (
        joined.crossJoin(F.broadcast(total_df))
        .groupBy(id_col)
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.sum(F.col("n") * bits).cast("long").alias("sum_bits"),
        )
    )
    return per_doc.withColumn(
        "mean_bits",
        F.when(
            F.col("n_tokens") > 0,
            F.col("sum_bits").cast("double") / F.col("n_tokens").cast("double"),
        ),
    )


def surprisal_band_filter(
    scored: DataFrame,
    low_bits: float,
    high_bits: float,
) -> DataFrame:
    """Keep the mid-band: drop boilerplate (``mean_bits < low_bits``) and
    gibberish (``> high_bits``).  A pure filter over ``unigram_surprisal``
    output — split out so the thresholds can come from corpus quantiles
    computed once on the scored table (``percentile_approx``) rather than
    being hard-coded."""
    return scored.where(
        (F.col("mean_bits") >= F.lit(low_bits)) & (F.col("mean_bits") <= F.lit(high_bits))
    )


def rank_buckets(
    scored: DataFrame,
    group_col: str,
    score_col: str,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
    id_col: str = "doc_id",
    bucket_col: str = "bucket",
) -> DataFrame:
    """CCNet-style per-group quality buckets: within each group (language /
    source), rank documents by score ascending and cut into ``len(labels)``
    equal-count tiers — head = most fluent third, tail = the third that
    gets dropped or down-weighted before training.

    RANK tertiles (``ntile``), not VALUE quantiles, deliberately: an
    interpolated percentile cutoff is a derived float, and a document whose
    score sits within an ulp of the cutoff flips buckets between engines —
    rank order over ``(score, id)`` is total and integer-exact, so bucket
    membership is deterministic and the SQL oracle mirrors it verbatim.
    ``ntile`` spreads the remainder into the leading buckets in both Spark
    and DuckDB (standard SQL semantics).

    Scale: one window per group, partitioned by ``group_col``. Window
    partitions are not AQE-skew-splittable, so one giant group (web ≈ 90%
    of a raw crawl) becomes a single spillable sort straggler — for that
    regime compute approximate cutoffs per group first
    (``percentile_approx`` is map-side partial) and bucket by comparison
    instead; this exact form is for the per-language corpora CCNet
    actually buckets, where the largest group is a manageable share."""
    n = len(labels)
    if n < 2:
        raise ValueError("need at least 2 bucket labels")
    w = Window.partitionBy(group_col).orderBy(
        F.col(score_col).asc(), F.col(id_col).asc()
    )
    nt = F.ntile(n).over(w)
    expr = F.when(nt == 1, F.lit(labels[0]))
    for i, lab in enumerate(labels[1:], start=2):
        expr = expr.when(nt == i, F.lit(lab))
    return scored.withColumn(bucket_col, expr)


def bigram_surprisal(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    backoff_bits: int = 3,
    lm_docs: DataFrame | None = None,
) -> DataFrame:
    """Bigram LM with stupid backoff (Brants et al. 2007), scored in the
    same exact whole-bit quantization as ``unigram_surprisal`` — the
    stronger quality screen: token-salad documents look fine to a unigram
    LM (every word common) but light up under a bigram LM (no common word
    PAIRS).

    Cost model, all integer: a seen bigram (w1, w2) costs
    ``floor(log2(count(w1 ·))) − floor(log2(count(w1 w2)))`` bits; an
    unseen bigram backs off to the token's unigram cost plus a flat
    ``backoff_bits`` penalty (stupid backoff's fixed discount — 3 bits ≈
    the canonical 0.4 multiplier, log2(1/0.4) ≈ 1.3, rounded up to stay
    conservative about unseen continuations). Each document's FIRST token
    has no left context and is scored by its unigram cost alone. Again:
    ranking is what the filter consumes; whole-bit quantization keeps the
    whole score int64 and bitwise engine-portable.

    SELF-TRAINED (``lm_docs=None``) the LM has seen every bigram it
    scores, so the backoff branch never fires and relative ranking comes
    from count ratios alone; pass ``lm_docs`` (a held-out clean corpus or
    the frozen reference corpus — the actual CCNet setup) to score against
    a foreign LM, where unseen bigrams genuinely back off and
    out-of-vocabulary tokens take the tf=1 max-surprisal floor, exactly
    like ``unigram_surprisal(vocab=...)``.

    Plan shape: ``gram_pair_rows`` builds (w1, w2) token rows with ZERO
    shuffle (shifted-array zip + one explode — no per-doc window, no
    token-row exchange+sort, no giant-document sort straggler) → corpus
    bigram/context count tables (two map-side-partial hash aggs,
    vocab²-bounded but Heaps-law small in practice) → two equi joins back
    (the skewed stop-bigram keys sit in joins, which AQE skew-split
    handles) → per-doc agg.
    """
    grams = gram_pair_rows(docs, text_col=text_col, id_col=id_col)
    # LM tables: self-trained by default; ``lm_docs`` trains on a separate
    # (held-out / frozen reference) corpus — the setup where the backoff
    # path actually fires, since a self-trained LM has seen every bigram
    # it scores. Bigram and left-context counts share one scan.
    lm = grams if lm_docs is None else gram_pair_rows(lm_docs, text_col=text_col, id_col=id_col)
    big = lm.where(F.col("_w1").isNotNull())
    bf = big.groupBy("_w1", "_w2").agg(F.count(F.lit(1)).alias("_bf"))
    cf = big.groupBy("_w1").agg(F.count(F.lit(1)).alias("_cf"))
    uni = lm.groupBy("_w2").agg(F.count(F.lit(1)).alias("_tf"))
    total_df = uni.agg(F.sum("_tf").cast("long").alias("_total"))
    j = (
        grams.join(bf, ["_w1", "_w2"], "left")
        .join(cf, "_w1", "left")
        .join(uni, "_w2", "left")  # OOV token under a foreign LM → tf floor 1
        .crossJoin(F.broadcast(total_df))
    )
    tf = F.coalesce(F.col("_tf"), F.lit(1)).cast("long")
    uni_bits = F.length(F.bin(F.col("_total"))) - F.length(F.bin(tf))
    big_bits = F.length(F.bin(F.col("_cf"))) - F.length(F.bin(F.col("_bf")))
    bits = (
        F.when(F.col("_w1").isNull(), uni_bits)  # document-initial token
        .when(F.col("_bf").isNotNull(), big_bits)
        .otherwise(uni_bits + F.lit(backoff_bits))
    )
    per_doc = j.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(bits).cast("long").alias("sum_bits"),
    )
    return per_doc.withColumn(
        "mean_bits",
        F.col("sum_bits").cast("double") / F.col("n_tokens").cast("double"),
    )
