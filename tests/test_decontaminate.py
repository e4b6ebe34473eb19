"""Decontamination, PII screening, repetition stats — the corpus-hygiene
operator family (driver queries: decontaminate / pii_stats /
doc_repetition, all value-oracled vs DuckDB)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyppi_spark.operators.decontaminate import decontaminate


PHRASE = "the seven ancient lanterns burned quietly over the frozen harbor"  # 10 words


def _corpus(spark):
    rows = [
        (0, f"intro words then {PHRASE} and some trailing context here"),  # shares the phrase
        (1, "a completely unrelated document about spark physical plans and exchanges"),
        (2, PHRASE),                      # IS a benchmark doc verbatim
        (3, "short doc"),                 # < n words
        (4, "another clean document describing parquet row group statistics pruning behavior"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _benchmark(spark):
    return spark.createDataFrame(
        [(PHRASE,), ("totally different benchmark prompt about graph coloring heuristics",)],
        "text string",
    )


def test_decontaminate_flags_planted_overlap(spark):
    out = {
        r.doc_id: r
        for r in decontaminate(_corpus(spark), _benchmark(spark), n=8).collect()
    }
    assert out[0].contaminated and out[0].n_overlap >= 1   # shares the 10-word phrase
    assert out[2].contaminated and out[2].overlap_frac == 1.0  # verbatim benchmark doc
    assert not out[1].contaminated and out[1].n_overlap == 0
    assert not out[3].contaminated  # short doc screened, not flagged
    assert not out[4].contaminated
    assert len(out) == 5  # every doc gets a report row


def test_decontaminate_hash_equals_text_key(spark):
    a = decontaminate(_corpus(spark), _benchmark(spark), n=8, key="hash").toPandas()
    b = decontaminate(_corpus(spark), _benchmark(spark), n=8, key="text").toPandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_pii_stats_planted(spark):
    from pyppi_spark.functions.text import pii_stats

    docs = spark.createDataFrame(
        [
            (0, "contact us at alice@example.com or bob.smith+tag@mail.co.uk today"),
            (1, "call +1 (415) 555-0199 or 020 7946 0958 now"),
            (2, "server at 192.168.0.1 and 10.0.0.255 responded"),
            (3, "no personal data in this perfectly clean sentence"),
        ],
        "doc_id long, text string",
    )
    s = pii_stats(F.col("text"))
    out = {r.doc_id: r for r in docs.select("doc_id", *[v.alias(k) for k, v in s.items()]).collect()}
    assert out[0].n_email == 2 and out[0].has_pii
    assert out[1].n_phone >= 2 and out[1].has_pii
    assert out[2].n_ipv4 == 2 and out[2].has_pii
    assert not out[3].has_pii and out[3].n_email == out[3].n_phone == out[3].n_ipv4 == 0


def test_repetition_stats(spark):
    from pyppi_spark.functions.text import repetition_stats

    looped = " ".join(["alpha beta gamma delta epsilon"] * 8)  # 5-word loop → repeats
    unique = "every word in this sentence appears exactly once without any repeats whatsoever"
    docs = spark.createDataFrame(
        [(0, looped), (1, unique), (2, "tiny"), (3, "")],
        "doc_id long, text string",
    )
    s = repetition_stats(F.col("text"), n=5)
    out = {r.doc_id: r for r in docs.select("doc_id", *[v.alias(k) for k, v in s.items()]).collect()}
    assert out[0].repetition_frac > 0.8  # 36 grams, ~5 distinct
    assert out[1].repetition_frac == 0.0
    assert out[2].n_grams_total == 1 and out[2].repetition_frac == 0.0
    assert out[3].n_grams_total == 1  # empty text still yields one (empty) gram


def test_repetition_report_equals_hof_form(spark):
    """The rows (explode+hashagg) repetition formulation must equal the
    row-local HOF array form value-for-value, in both key modes."""
    from pyppi_spark.functions.text import repetition_stats
    from pyppi_spark.operators.decontaminate import repetition_report

    looped = " ".join(["alpha beta gamma delta epsilon"] * 8)
    docs = spark.createDataFrame(
        [(0, looped),
         (1, "every word here is distinct so nothing repeats in any gram at all"),
         (2, "tiny"), (3, ""), (4, "a b a b a b a b a b a b")],
        "doc_id long, text string",
    )
    s = repetition_stats(F.col("text"), n=5)
    hof = (
        docs.select("doc_id", *[v.alias(k) for k, v in s.items()])
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    for key in ("hash", "text"):
        rows = (
            repetition_report(docs, n=5, key=key)
            .toPandas().sort_values("doc_id").reset_index(drop=True)
        )
        assert rows[hof.columns.tolist()].equals(hof), key


def test_kernel_strategies_equal_relational(spark):
    """The zero-shuffle kernel strategies for decontaminate and
    repetition_report agree value-for-value with the relational forms on
    the sf0.001 documents corpus (real text: unicode, short docs), and
    their plans contain no Exchange."""
    from pyppi_spark.operators.decontaminate import decontaminate, repetition_report

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where(F.col("doc_id") % 20 == 0).select("text")

    rel = decontaminate(docs, bench, n=8, key="text").toPandas()
    ker_df = decontaminate(docs, bench, n=8, strategy="kernel")
    assert "Exchange" not in ker_df._jdf.queryExecution().executedPlan().toString()
    ker = ker_df.toPandas()
    key = lambda df: df.sort_values("doc_id").reset_index(drop=True)
    assert key(rel).equals(key(ker)[rel.columns.tolist()])

    rel_r = repetition_report(docs, n=5, key="text").toPandas()
    ker_r_df = repetition_report(docs, n=5, strategy="kernel")
    assert "Exchange" not in ker_r_df._jdf.queryExecution().executedPlan().toString()
    ker_r = ker_r_df.toPandas()
    assert key(rel_r).equals(key(ker_r)[rel_r.columns.tolist()])


def test_null_text_consistent_across_strategies(spark):
    """NULL text is screened as empty (one empty gram) by BOTH strategies —
    relational posexplode_outer+coalesce must not drop the doc, matching
    the kernel's (text or "")."""
    from pyppi_spark.operators.decontaminate import repetition_report

    docs = spark.createDataFrame(
        [(0, "a normal document with several distinct words inside"),
         (1, None), (2, "")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([("some benchmark prompt",)], "text string")
    key = lambda df: df.sort_values("doc_id").reset_index(drop=True)
    rel = decontaminate(docs, bench, n=8, key="text").toPandas()
    ker = decontaminate(docs, bench, n=8, strategy="kernel").toPandas()
    assert len(rel) == 3  # the null-text doc is present in the report
    assert key(rel).equals(key(ker)[rel.columns.tolist()])
    rel_r = repetition_report(docs, n=5, key="text").toPandas()
    ker_r = repetition_report(docs, n=5, strategy="kernel").toPandas()
    assert len(rel_r) == 3
    assert key(rel_r).equals(key(ker_r)[rel_r.columns.tolist()])


def test_kernel_bench_gram_guard(spark):
    """Kernel strategy refuses to collect an oversized benchmark gram set,
    pointing at strategy='relational' instead of OOMing the driver."""
    import pytest

    with pytest.raises(ValueError, match="relational"):
        decontaminate(
            _corpus(spark), _benchmark(spark), n=8, strategy="kernel",
            max_bench_grams=2,
        )
    # under the bound the kernel path still works
    out = decontaminate(
        _corpus(spark), _benchmark(spark), n=8, strategy="kernel",
        max_bench_grams=1000,
    )
    assert out.count() == 5


def test_pii_stats_null_text(spark):
    """NULL text → zero counts and has_pii=false (not NULL): a ~has_pii
    filter must keep null-text docs, by decision rather than 3VL."""
    from pyppi_spark.functions.text import pii_stats

    docs = spark.createDataFrame([(0, None), (1, "mail me a@b.io")], "doc_id long, text string")
    s = pii_stats(F.col("text"))
    out = {r.doc_id: r for r in docs.select("doc_id", *[v.alias(k) for k, v in s.items()]).collect()}
    assert out[0].n_email == 0 and out[0].has_pii is False
    assert out[1].has_pii is True
    kept = docs.where(~pii_stats(F.col("text"))["has_pii"]).count()
    assert kept == 1


def test_lang_id_null_text(spark):
    """NULL (and empty/marker-free) text → 'und', never a language label:
    without the NULL guard, greatest() of all-NULL scores is NULL, every
    `score == m` WHEN is NULL-skipped, and the CASE falls through to the
    last language in sorted order."""
    from pyppi_spark.functions.text import lang_id

    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, "zzz qqq xxx"), (3, "the cat and the dog with a hat")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.lang for r in docs.select("doc_id", lang_id("text").alias("lang")).collect()}
    assert out[0] == "und"
    assert out[1] == "und"
    assert out[2] == "und"
    assert out[3] == "en"


def test_chunk_documents_coverage_and_overlap(spark):
    """Every token of every doc appears in >=1 chunk; consecutive chunks
    overlap by exactly `overlap` tokens except possibly the last; short
    and empty docs yield one chunk."""
    from pyppi_spark.functions.text import chunk_documents

    docs = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(100))),
         (1, "just five little words here"),
         (2, ""), (3, None)],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=16, overlap=4).toPandas()
    g0 = out[out.doc_id == 0].sort_values("chunk_idx")
    starts = g0.word_start.tolist()
    assert starts[0] == 1 and all(b - a == 12 for a, b in zip(starts, starts[1:]))
    # coverage: last chunk reaches the last token
    assert starts[-1] + g0.n_tokens.iloc[-1] - 1 == 100
    # exact content: token at word position p equals w{p-1}
    for _, r in g0.iterrows():
        toks = r.chunk_text.split(" ")
        assert toks == [f"w{i}" for i in range(r.word_start - 1, r.word_start - 1 + len(toks))]
    assert len(out[out.doc_id == 1]) == 1
    assert out[out.doc_id == 2].n_tokens.tolist() == [1]
    assert out[out.doc_id == 3].chunk_text.tolist() == [""]
    # zero shuffle
    plan = chunk_documents(docs, 16, 4)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    import pytest
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_bpe_token_count_known_values(spark):
    """The RE2-portable BPE-ish pre-tokenizer counts: leading spaces
    attach to the following run, letter/digit/symbol runs split, residual
    whitespace runs are one token, NULL/empty count 0."""
    from pyppi_spark.functions.text import bpe_token_count

    rows = [
        (0, "hello world"),        # "hello", " world"
        (1, "a1b!"),               # "a", "1", "b", "!"
        (2, "  x"),                # "  ", "x" (double space can't attach)
        (3, "don't stop"),         # "don", "'", "t", " stop"
        (4, None),
        (5, ""),
        (6, "price: 42 dollars"),  # "price", ":", " 42", " dollars"
        (7, "a\x0bb"),             # "a", "\x0b" (whitespace run), "b"
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.n for r in docs.select("doc_id", bpe_token_count("text").alias("n")).collect()}
    assert got == {0: 2, 1: 4, 2: 2, 3: 4, 4: 0, 5: 0, 6: 4, 7: 3}

    # engine portability incl. the vertical-tab corner: Java \s matches
    # \x0B, RE2's does not — the shared pattern uses an explicit class,
    # so DuckDB must count every row identically
    import duckdb

    from pyppi_spark.functions.text import BPE_TOKEN_PATTERN

    con = duckdb.connect()
    for _, txt in rows:
        if txt is None:
            continue
        duck_n = con.execute(
            "SELECT coalesce(len(regexp_extract_all(?, ?)), 0)",
            [txt, BPE_TOKEN_PATTERN],
        ).fetchone()[0]
        spark_n = got[[r[0] for r in rows if r[1] == txt][0]]
        assert duck_n == spark_n, (txt, duck_n, spark_n)
