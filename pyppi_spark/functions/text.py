"""Text-analysis column functions for training-data pipelines: token
counting, quality scoring, language-ID heuristic, fingerprinting.

The reference's scalar-function library is numeric kernels over atom rows
(``SURVEY.md`` §2.8); the transcript domain's equivalents are text metrics.
All are pure ``pyspark.sql.functions`` expressions — whole-stage-codegen
eligible, no UDFs — so they survive a 100 TB scan at full JVM speed, and
each is mirrorable in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# tiny per-language stopword marker sets for the n-gram heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " is ", " of "],
    "es": [" el ", " la ", " los ", " que "],
    "fr": [" le ", " la ", " et ", " les "],
    "de": [" der ", " die ", " und ", " das "],
}


def token_count(col: str | Column = "text") -> Column:
    """Whitespace-ish token count (BPE-approximating word/number/punct split):
    count of maximal runs of word characters plus isolated punctuation."""
    c = F.col(col) if isinstance(col, str) else col
    # split on the boundaries of word-char runs; regexp_count is Spark 3.4+
    return F.when(F.length(F.trim(c)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(c), r"\s+"))
    ).cast("long")


# GPT-2-style pre-tokenizer shape, simplified to the RE2-compatible
# subset (no lookahead, no \p classes) so the IDENTICAL pattern runs in
# Java regex (Spark regexp_count) and DuckDB RE2 (len(regexp_extract_all)):
# a token is an optional leading space + a letter run, digit run, or
# other-symbol run; residual whitespace runs count as their own token.
# Alternation is leftmost-first in both engines and the branches are
# disjoint at any start position, so the tokenization is engine-portable.
# Whitespace is the EXPLICIT class [ \t\n\r\f\x0B], not \s: Java's \s
# includes vertical tab \x0B but RE2's does not, so \s would make the
# two engines diverge on documents containing \x0B.
BPE_TOKEN_PATTERN = (
    r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f\x0B]+|[ \t\n\r\f\x0B]+"
)


def bpe_token_count(col: str | Column = "text") -> Column:
    """BPE-ish pre-tokenizer token count (the budget unit of an LLM
    training pipeline — whitespace words under-count code/punctuation-
    dense text): non-overlapping matches of ``BPE_TOKEN_PATTERN``.
    Pure ``regexp_count`` codegen; NULL text counts 0."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.regexp_count(c, F.lit(BPE_TOKEN_PATTERN)), F.lit(0)
    ).cast("long")


def char_stats(col: str | Column = "text") -> dict[str, Column]:
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    # counts via regexp_count (value-identical to length-after-strip:
    # every match is one char) — avoids allocating a stripped copy of the
    # text per ratio, which dominated the corpus_report projection
    alpha = F.regexp_count(c, F.lit(r"[A-Za-z]")).cast("double")
    digit = F.regexp_count(c, F.lit(r"[0-9]")).cast("double")
    punct = F.regexp_count(c, F.lit(r"[.,;:!?]")).cast("double")
    space = F.regexp_count(c, F.lit(r" ")).cast("double")
    safe_n = F.when(n > 0, n).otherwise(F.lit(1.0))
    return {
        "n_chars": n.cast("long"),
        "alpha_ratio": alpha / safe_n,
        "digit_ratio": digit / safe_n,
        "punct_ratio": punct / safe_n,
        "space_ratio": space / safe_n,
    }


def quality_score(col: str | Column = "text") -> Column:
    """Deterministic [0,1] quality heuristic: length band + alpha ratio -
    digit/punct excess. Matches the oracle SQL expression in
    ``__spark_entry__.oracle_sql`` term for term."""
    s = char_stats(col)
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    len_score = F.least(n / F.lit(200.0), F.lit(1.0))
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.4) * s["alpha_ratio"]
        + F.lit(0.2) * (F.lit(1.0) - F.least(s["digit_ratio"] * 4.0, F.lit(1.0)))
    )
    return F.round(score, 6)


def lang_id(col: str | Column = "text") -> Column:
    """Marker-n-gram language ID: count marker hits per language over the
    lowercased text, argmax with 'und' fallback when no marker hits.

    Hit counting uses the length-difference idiom
    ``(len(s) - len(replace(s, m, ''))) / len(m)`` so the identical
    expression runs on DuckDB as the oracle.
    """
    c = F.col(col) if isinstance(col, str) else col
    padded = F.concat(F.lit(" "), F.lower(c), F.lit(" "))

    def hits(markers: list[str]) -> Column:
        total = F.lit(0).cast("long")
        for m in markers:
            cnt = (F.length(padded) - F.length(F.replace(padded, F.lit(m), F.lit("")))) / F.lit(len(m))
            total = total + cnt.cast("long")
        return total

    scores = {lang: hits(ms) for lang, ms in LANG_MARKERS.items()}
    # argmax via one greatest() + an equality CASE chain, first match wins
    # (same deterministic tie-break as iterating sorted langs with strict
    # >). The earlier when-chain FOLD nested every prior branch inside the
    # next, duplicating score subtrees exponentially — the combined
    # projection blew janino's 64 KB method limit inside fused
    # sort/project stages and fell back to interpreted execution.
    # NULL guard first: for NULL text every score is NULL, so m is NULL and
    # every `score == m` WHEN would be NULL-skipped — without the guard the
    # chain falls through to otherwise() and labels NULL-text docs with the
    # last language instead of 'und' (mirrored in the SQL oracle's CASE).
    m = F.greatest(*[scores[lang] for lang in sorted(LANG_MARKERS)])
    out = F.when(m.isNull() | (m == 0), F.lit("und"))
    langs = sorted(LANG_MARKERS)
    for lang in langs[:-1]:
        out = out.when(scores[lang] == m, F.lit(lang))
    return out.otherwise(F.lit(langs[-1]))


def doc_fingerprint(col: str | Column = "text") -> Column:
    """64-bit content fingerprint of the normalized text (rolling-hash
    analog): xxhash64 over lowercased, whitespace-collapsed content."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


# RE2-compatible (no backrefs/lookaround) so the identical patterns run in
# both Java regex (Spark) and DuckDB's RE2 — the oracle mirrors them verbatim
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9() \-]{7,}[0-9]",
    "ipv4": r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def pii_stats(col: str | Column = "text") -> dict[str, Column]:
    """Per-document PII pattern counts (email / phone / IPv4 shapes) and a
    ``has_pii`` flag — the scrub-or-drop screen every training pipeline
    runs before a corpus ships. Pure ``regexp_count`` expressions
    (codegen, no UDF); patterns are deliberately conservative shape
    matchers, not validators — downstream scrubbing re-matches them with
    the same patterns, so count-vs-scrub consistency is by construction.

    NULL text counts as 0 / ``has_pii=false`` (coalesced): without it the
    flag is NULL and three-valued logic makes ``~has_pii`` filters silently
    drop null-text documents."""
    c = F.col(col) if isinstance(col, str) else col
    counts = {
        f"n_{name}": F.coalesce(F.regexp_count(c, F.lit(pat)), F.lit(0)).cast("long")
        for name, pat in PII_PATTERNS.items()
    }
    flag = F.lit(False)
    for k in counts:
        flag = flag | (counts[k] > 0)
    return {**counts, "has_pii": flag}


PII_PLACEHOLDERS: dict[str, str] = {
    "email": "<EMAIL>",
    "phone": "<PHONE>",
    "ipv4": "<IP>",
}


def pii_redact(col: str | Column = "text") -> Column:
    """Scrub PII shapes from text: every match of the SAME patterns
    ``pii_stats`` counts is replaced by its typed placeholder — the scrub
    half of the count-vs-scrub consistency contract (redacted text
    re-screens to zero counts, asserted in tests).  Chained
    ``regexp_replace`` (codegen, no UDF); email runs FIRST because a long
    digit local-part ("123456789@x") or a dotted-quad host would
    otherwise be half-eaten by the phone/IPv4 passes, leaving a mangled
    address instead of a placeholder.  NULL text stays NULL (a redactor
    must be lossless on absent documents)."""
    c = F.col(col) if isinstance(col, str) else col
    for name in ("email", "phone", "ipv4"):
        c = F.regexp_replace(c, F.lit(PII_PATTERNS[name]), F.lit(PII_PLACEHOLDERS[name]))
    return c


def pii_redaction_count(col: str | Column = "text") -> Column:
    """Number of placeholders ``pii_redact`` actually inserts: each
    pattern is counted on the text state its replace pass sees (email on
    the original, phone on the email-redacted text, IPv4 on the
    email+phone-redacted text).  Summing the three raw ``pii_stats``
    counts instead would double-count substrings matched by more than
    one pattern — a 9-digit email local part also matches the phone
    shape but yields ONE ``<EMAIL>`` placeholder.  NULL text counts 0."""
    t0 = F.col(col) if isinstance(col, str) else col
    t1 = F.regexp_replace(t0, F.lit(PII_PATTERNS["email"]), F.lit(PII_PLACEHOLDERS["email"]))
    t2 = F.regexp_replace(t1, F.lit(PII_PATTERNS["phone"]), F.lit(PII_PLACEHOLDERS["phone"]))
    n = (
        F.regexp_count(t0, F.lit(PII_PATTERNS["email"]))
        + F.regexp_count(t1, F.lit(PII_PATTERNS["phone"]))
        + F.regexp_count(t2, F.lit(PII_PATTERNS["ipv4"]))
    )
    return F.coalesce(n, F.lit(0)).cast("long")


def repetition_stats(col: str | Column = "text", n: int = 5) -> dict[str, Column]:
    """Within-document repetition signal (the Gopher-style repetition
    filter): fraction of word ``n``-gram OCCURRENCES that are repeats of
    an earlier gram in the same document — 0.0 for non-repetitive text,
    →1.0 for looped/boilerplate text (a dominant failure mode of scraped
    training data).

    Pure array expressions over one row (no explode, no shuffle): the gram
    array is built by ``transform`` over an index sequence. Higher-order
    functions evaluate interpreted, but per ROW on bounded arrays this is
    the right trade — the alternative explode+window costs a per-token
    shuffle (measured 10× on the winnowing history); for the hot 100 TB
    path the same statistic is also computable from the
    ``decontaminate._distinct_grams`` rows when they are already being
    built."""
    c = F.col(col) if isinstance(col, str) else col
    words = F.split(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "), " ")
    k = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), k - F.lit(1))
    grams = F.when(F.size(words) < n, F.array(F.concat_ws(" ", words))).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    )
    total = F.size(grams).cast("long")
    distinct = F.size(F.array_distinct(grams)).cast("long")
    return {
        "n_grams_total": total,
        "n_grams_distinct": distinct,
        "repetition_frac": (
            (total - distinct).cast("double") / F.when(total > 0, total).otherwise(F.lit(1)).cast("double")
        ),
    }


def chunk_documents(
    df,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Split documents into fixed-token-window chunks with overlap — the
    standard pre-tokenization step of an LLM training pipeline: one output
    row per (doc, chunk) carrying the chunk text, its index, token count,
    and word offset.

    Pure array expressions + one ``posexplode`` — row-local, ZERO shuffle
    (chunking distributes trivially at 100 TB; the plan is scan → project
    → generate). Stride = ``chunk_tokens - overlap``; the final chunk is
    whatever remains (≥1 token, possibly shorter). A start position is
    emitted iff it is 1 or covers at least one token beyond the previous
    chunk, so no fully-contained duplicate tail chunks are produced.
    Empty/NULL text yields one empty chunk (doc presence is preserved,
    matching the repo-wide empty-gram convention).
    """
    from pyspark.sql import functions as F

    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    words = F.split(F.regexp_replace(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+", " "), " ")
    n = F.size(words)
    # last start: the largest s = 1 + k*stride with s <= max(n - overlap, 1)
    last = F.greatest(n - F.lit(overlap), F.lit(1))
    starts = F.sequence(F.lit(1), last, F.lit(stride))
    out = df.select(
        F.col(id_col),
        n.alias("n_tokens_doc"),
        F.posexplode(starts).alias("chunk_idx", "_start"),
        words.alias("_ws"),
    )
    piece = F.slice(F.col("_ws"), F.col("_start"), chunk_tokens)
    return out.select(
        F.col(id_col),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("_start").cast("long").alias("word_start"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.col("n_tokens_doc").cast("long").alias("n_tokens_doc"),
    )
