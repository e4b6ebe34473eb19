"""DSIR importance resampling: exact-integer score vs a pure-python
reference, planted-separation sanity, persisted-target-table equality,
partitioning invariance, and the Gumbel sampler vs numpy."""

import hashlib
import math
import re

import pytest

from pyppi_spark.operators.dsir import (
    bucket_counts,
    dsir_scores,
    gumbel_topk,
    hashed_gram_occurrences,
)

N_BUCKETS = 64


def _tokens(text):
    return re.sub(r"\s+", " ", text.strip().lower()).split(" ")


def _grams(text):
    t = _tokens(text)
    return t + [f"{a} {b}" for a, b in zip(t, t[1:])]


def _bucket(gram, seed=0, n_buckets=N_BUCKETS):
    h = int(hashlib.md5(f"{seed}|{gram}".encode()).hexdigest()[:8], 16)
    return h % n_buckets


def _ref_scores(raw_rows, target_rows, n_buckets=N_BUCKETS):
    """Pure-python DSIR: whole-bit quantized log ratio, ints only."""
    tfp, tfq = {}, {}
    for _, text in target_rows:
        for g in _grams(text):
            b = _bucket(g, n_buckets=n_buckets)
            tfp[b] = tfp.get(b, 0) + 1
    per_doc_buckets = {}
    for doc_id, text in raw_rows:
        bs = [_bucket(g, n_buckets=n_buckets) for g in _grams(text)]
        per_doc_buckets[doc_id] = bs
        for b in bs:
            tfq[b] = tfq.get(b, 0) + 1
    totp, totq = sum(tfp.values()), sum(tfq.values())
    bits = lambda n: len(bin(n)) - 2  # floor(log2)+1
    out = {}
    for doc_id, bs in per_doc_buckets.items():
        s = sum(
            (bits(totq) - bits(tfq[b])) - (bits(totp) - bits(tfp.get(b, 1)))
            for b in bs
        )
        out[doc_id] = (len(bs), s)
    return out


TARGET = [
    (100, "the quick brown fox jumps over the lazy dog"),
    (101, "a quick brown fox ran over the lazy dog today"),
    (102, "the lazy dog watched the quick brown fox jump"),
]
RAW = [
    (1, "the quick brown fox jumps over a lazy dog again"),
    (2, "quick brown foxes and lazy dogs jump over things"),
    (3, "zzq xkcd qqfl wvnm zzq hrtp xkcd llgw qqfl zzq"),
    (4, "wvnm hrtp llgw zzq qqfl xkcd wvnm hrtp llgw qqfl"),
    (5, "the lazy dog jumps over the quick brown fox"),
    (6, "hrtp zzq wvnm llgw xkcd qqfl hrtp zzq wvnm xkcd"),
]


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    return raw, target


def test_scores_match_python_reference_exactly(frames):
    raw, target = frames
    got = {
        r.doc_id: (r.n_grams, r.sum_bits)
        for r in dsir_scores(raw, target, n_buckets=N_BUCKETS).collect()
    }
    assert got == _ref_scores(RAW, TARGET)


def test_target_like_docs_outscore_gibberish(frames):
    raw, target = frames
    got = {r.doc_id: r.sum_bits for r in dsir_scores(raw, target, n_buckets=N_BUCKETS).collect()}
    assert min(got[1], got[2], got[5]) > max(got[3], got[4], got[6])
    sel = gumbel_topk(
        dsir_scores(raw, target, n_buckets=N_BUCKETS), k=3, noise="hash"
    ).collect()
    assert sorted(r.doc_id for r in sel) == [1, 2, 5]


def test_persisted_target_buckets_path_equal(frames):
    raw, target = frames
    tb = bucket_counts(hashed_gram_occurrences(target, N_BUCKETS))
    a = sorted(
        dsir_scores(raw, target, n_buckets=N_BUCKETS).collect(),
        key=lambda r: r.doc_id,
    )
    b = sorted(
        dsir_scores(raw, target_buckets=tb, n_buckets=N_BUCKETS).collect(),
        key=lambda r: r.doc_id,
    )
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    with pytest.raises(ValueError):
        dsir_scores(raw, target, target_buckets=tb)
    with pytest.raises(ValueError):
        dsir_scores(raw)


def test_partitioning_invariance(frames):
    raw, target = frames
    a = sorted(
        tuple(r) for r in dsir_scores(raw.repartition(7), target, n_buckets=N_BUCKETS).collect()
    )
    b = sorted(
        tuple(r) for r in dsir_scores(raw.coalesce(1), target, n_buckets=N_BUCKETS).collect()
    )
    assert a == b


def test_gumbel_mode_matches_numpy_reference(frames):
    raw, target = frames
    scored = dsir_scores(raw, target, n_buckets=N_BUCKETS)
    rows = {r.doc_id: r.sum_bits for r in scored.collect()}
    keys = {}
    for doc_id, s in rows.items():
        h = int(hashlib.md5(f"7|{doc_id}".encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / float(1 << 32)
        keys[doc_id] = s * math.log(2.0) - math.log(-math.log(u))
    want = sorted(rows, key=lambda d: (-keys[d], d))[:4]
    got = [r.doc_id for r in gumbel_topk(scored, k=4, seed=7, noise="gumbel").collect()]
    assert sorted(got) == sorted(want)


def test_gumbel_is_sampling_not_argmax(spark):
    """With flat scores the Gumbel draw alone decides — different seeds
    must pick different sets (it is a sampler, not a deterministic top-k)."""
    rows = [(i, "same text for every doc") for i in range(50)]
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = spark.createDataFrame(rows[:5], "doc_id long, text string")
    scored = dsir_scores(raw, tgt, n_buckets=N_BUCKETS)
    s1 = {r.doc_id for r in gumbel_topk(scored, k=10, seed=1).collect()}
    s2 = {r.doc_id for r in gumbel_topk(scored, k=10, seed=2).collect()}
    assert s1 != s2
    # and each draw is reproducible
    s1b = {r.doc_id for r in gumbel_topk(scored, k=10, seed=1).collect()}
    assert s1 == s1b


def test_empty_target_raises_not_null_scores(spark, frames):
    raw, target = frames
    empty = target.where("doc_id < 0")
    with pytest.raises(Exception, match="target corpus is empty"):
        dsir_scores(raw, empty, n_buckets=N_BUCKETS).collect()
