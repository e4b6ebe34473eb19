"""Sub-document dedup family: duplicated token spans (ExactSubstr) and
corpus-global line dedup."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyppi_spark.operators.span_dedup import (
    duplicate_gram_occurrences,
    duplicate_spans,
    exact_substring_dedup,
    line_dedup,
    token_positions,
)

SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, f"{SHARED} unique tail zero"),
            (1, f"prefix one {SHARED} suffix"),
            (2, "totally different words with no overlap at all here"),
            (3, SHARED),
            (4, "tiny"),  # shorter than k -> no grams
            (5, None),
            (6, ""),
        ],
        "doc_id long, text string",
    )


def test_duplicate_spans_maximal_and_positions(spark):
    spans = {
        (r.doc_id): (r.span_start, r.span_end, r.n_grams)
        for r in duplicate_spans(_docs(spark), k=4).collect()
    }
    # the 8-token shared passage has 5 dup 4-grams in each doc; spans are
    # maximal [start, start+8) in token coordinates
    assert spans[0] == (0, 8, 5)
    assert spans[1] == (2, 10, 5)
    assert spans[3] == (0, 8, 5)
    assert set(spans) == {0, 1, 3}


def test_gram_stream_not_truncated_at_doc_end(spark):
    """Regression: a filter between two window projections made leads
    re-evaluate over filtered rows, truncating end-of-doc grams."""
    occ = duplicate_gram_occurrences(_docs(spark), k=4)
    pos3 = sorted(r.pos for r in occ.where("doc_id = 3").collect())
    assert pos3 == [0, 1, 2, 3, 4]  # ALL five grams of the pure-dup doc


def test_exact_substring_dedup_keep_first(spark):
    out = {
        r.doc_id: (r.text_clean, r.n_tokens_removed)
        for r in exact_substring_dedup(_docs(spark), k=4).collect()
    }
    assert out[0][0].startswith(SHARED)  # first occurrence preserved
    assert out[0][1] == 0
    assert out[1] == ("prefix one suffix", 8)
    assert out[3] == ("", 8)
    assert out[2][1] == 0 and out[4][1] == 0
    assert out[5] == (None, 0) and out[6] == ("", 0)


def test_exact_substring_dedup_cut_all(spark):
    out = {
        r.doc_id: r.n_tokens_removed
        for r in exact_substring_dedup(_docs(spark), k=4, keep_first=False).collect()
    }
    assert out[0] == 8 and out[1] == 8 and out[3] == 8  # every occurrence cut


def test_adjacent_spans_merge(spark):
    # two distinct duplicated 4-gram passages back to back in doc 0:
    # hits [0,4) and [4,8) are adjacent -> one maximal span [0,8)
    docs = spark.createDataFrame(
        [
            (0, "a b c d p q r s"),
            (1, "x a b c d y"),
            (2, "z p q r s w"),
        ],
        "doc_id long, text string",
    )
    spans = {
        r.doc_id: (r.span_start, r.span_end)
        for r in duplicate_spans(docs, k=4).collect()
    }
    assert spans[0] == (0, 8)
    assert spans[1] == (1, 5) and spans[2] == (1, 5)


def test_hash_modes_agree(spark):
    fast = duplicate_spans(_docs(spark), k=4, hash_mode="fast")
    port = duplicate_spans(_docs(spark), k=4, hash_mode="portable")
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, port.collect()))


def test_token_positions_contiguous(spark):
    toks = token_positions(_docs(spark)).where("doc_id = 1").orderBy("pos")
    rows = toks.collect()
    assert [r.pos for r in rows] == list(range(11))
    assert rows[2].token == "alpha"


def _mldocs(spark):
    return spark.createDataFrame(
        [
            (0, "the first long line here\nshared duplicated line content\nunique tail line"),
            (1, "shared duplicated line content\nanother unique line of text"),
            (2, "short\nno dups at all in here"),
            (3, "shared duplicated line content"),
            (4, None),
            (5, ""),
        ],
        "doc_id long, text string",
    )


def test_line_dedup_first_occurrence_survives(spark):
    out = {
        r.doc_id: (r.text_clean, r.n_lines_dropped)
        for r in line_dedup(_mldocs(spark)).collect()
    }
    assert out[0][1] == 0 and "shared duplicated line content" in out[0][0]
    assert out[1] == ("another unique line of text", 1)
    assert out[3] == ("", 1)
    # untouched docs reassemble losslessly (newlines preserved)
    assert out[2] == ("short\nno dups at all in here", 0)
    assert out[5] == ("", 0)
    assert out[4][1] == 0


def test_line_dedup_short_lines_never_participate(spark):
    docs = spark.createDataFrame(
        [(0, "ab\ncd\nab"), (1, "ab\nxy")], "doc_id long, text string"
    )
    out = {r.doc_id: r.text_clean for r in line_dedup(docs, min_line_chars=8).collect()}
    assert out == {0: "ab\ncd\nab", 1: "ab\nxy"}  # all short lines kept


def test_line_dedup_within_single_doc(spark):
    docs = spark.createDataFrame(
        [(0, "repeated line body\nmiddle text\nrepeated line body")],
        "doc_id long, text string",
    )
    out = line_dedup(docs).collect()[0]
    assert out.text_clean == "repeated line body\nmiddle text"
    assert out.n_lines_dropped == 1
