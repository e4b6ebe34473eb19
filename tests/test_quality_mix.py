"""Unigram-LM quality scoring + domain-mixture resampling + shard
assignment (driver queries: unigram_surprisal, mix_sample, shard_assign)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pyppi_spark.operators.quality_lm import (
    surprisal_band_filter,
    unigram_counts,
    unigram_surprisal,
)
from pyppi_spark.operators.sampling import mix_sample, shard_assign


def _docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the the the the the the"),          # boilerplate: minimal bits
        (3, "zyx qwv plk mnb vcx zas"),          # gibberish: every token rare
        (4, "the cat ran to the mat"),
        (5, ""),                                  # empty-gram convention doc
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unigram_surprisal_ranks_gibberish_above_boilerplate(spark):
    out = {r.doc_id: r for r in unigram_surprisal(_docs(spark)).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    # all-stop-word doc scores below normal text, gibberish above it
    assert out[2].mean_bits < out[1].mean_bits < out[3].mean_bits
    assert out[3].mean_bits <= out[3].sum_bits  # sanity: mean ≤ sum for n ≥ 1
    assert out[1].n_tokens == 6
    # exact integer identity check on one token: 'the' appears 10 times of
    # 25 total tokens -> bits = floor(log2(25)) - floor(log2(10)) = 4 - 3 = 1
    assert out[2].sum_bits == 6 * 1
    assert out[2].mean_bits == 1.0


def test_unigram_surprisal_foreign_vocab_oov_floor(spark):
    docs = _docs(spark)
    vocab = unigram_counts(docs.where(F.col("doc_id") == 1))  # LM from doc 1 only
    scored = {r.doc_id: r for r in unigram_surprisal(docs, vocab=vocab).collect()}
    # doc 3 tokens are all OOV -> tf floor 1, max bits each; total=6 tokens
    # in vocab, floor(log2(6))=2; OOV bits = 2 - 0 = 2
    assert scored[3].sum_bits == 6 * 2
    # broadcast variant identical
    b = {r.doc_id: r for r in unigram_surprisal(docs, vocab=vocab, broadcast_vocab=True).collect()}
    assert {k: (v.n_tokens, v.sum_bits) for k, v in scored.items()} == {
        k: (v.n_tokens, v.sum_bits) for k, v in b.items()
    }


def test_surprisal_band_filter(spark):
    scored = unigram_surprisal(_docs(spark))
    kept = surprisal_band_filter(scored, 1.5, 3.0).select("doc_id").collect()
    ids = {r.doc_id for r in kept}
    assert 2 not in ids and 3 not in ids  # both tails cut


def _weighted(spark, n=400):
    # three domains with deterministic weights 1..8
    rows = [(i, f"d{i % 3}", 1 + (i * 7) % 8) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, dom string, w long")


def test_mix_sample_respects_budgets_and_prefix_rule(spark):
    df = _weighted(spark)
    budgets = {"d0": 120, "d1": 60}
    out = mix_sample(df, "dom", budgets, weight_col="w", id_col="doc_id", seed=3)
    rows = out.collect()
    assert {r.dom for r in rows} <= set(budgets)            # d2 dropped
    by_dom = {}
    for r in rows:
        by_dom.setdefault(r.dom, []).append(r)
    for d, rs in by_dom.items():
        assert max(r.cum_weight for r in rs) <= budgets[d]
        # cum_weight is consistent: sum of weights == max cum
        assert sum(r.w for r in rs) == max(r.cum_weight for r in rs)
    # deterministic
    again = mix_sample(df, "dom", budgets, weight_col="w", id_col="doc_id", seed=3)
    assert sorted(r.doc_id for r in again.collect()) == sorted(r.doc_id for r in rows)


def test_mix_sample_prefilter_matches_exact(spark):
    df = _weighted(spark, n=600)
    budgets = {"d0": 150, "d1": 90, "d2": 2000}  # d2 budget exceeds domain total
    exact = mix_sample(df, "dom", budgets, weight_col="w", id_col="doc_id", seed=9)
    fast = mix_sample(
        df, "dom", budgets, weight_col="w", id_col="doc_id", seed=9, prefilter_margin=4.0
    )
    key = lambda r: (r.dom, r.doc_id, r.cum_weight)
    assert sorted(map(key, exact.collect())) == sorted(map(key, fast.collect()))


def test_mix_sample_prefilter_too_tight_raises(spark):
    df = _weighted(spark, n=600)
    with pytest.raises(ValueError, match="too tight"):
        # margin barely above 1 on a skewed-weight domain: the expected-
        # weight prefix can miss budget-prefix docs -> must raise, not
        # silently under-sample
        mix_sample(
            df, "dom", {"d0": 150}, weight_col="w", id_col="doc_id",
            seed=1, prefilter_margin=1.0000001,
        )


def test_mix_sample_validation(spark):
    df = _weighted(spark, n=30)
    with pytest.raises(ValueError, match="positive int"):
        mix_sample(df, "dom", {"d0": 0}, weight_col="w", id_col="doc_id")
    with pytest.raises(ValueError, match="non-empty"):
        mix_sample(df, "dom", {}, weight_col="w", id_col="doc_id")


def test_shard_assign_partition_and_positions(spark):
    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    out = shard_assign(df, n_shards=8, id_col="doc_id", seed=5)
    rows = out.collect()
    assert len(rows) == 1000
    shards = {r.shard for r in rows}
    assert shards <= set(range(8)) and len(shards) == 8
    # positions dense 1..k within each shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for s, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    # shard membership stable under growth
    big = shard_assign(
        spark.range(3000).select(F.col("id").alias("doc_id")), 8, "doc_id", seed=5
    )
    old = {r.doc_id: r.shard for r in rows}
    new = {r.doc_id: r.shard for r in big.collect()}
    assert all(new[k] == v for k, v in old.items())
    with pytest.raises(ValueError, match="n_shards"):
        shard_assign(df, 0, "doc_id")


# --------------------------------------------------------- bigram LM

def _bigram_ref(texts: dict[int, str], backoff_bits: int = 3):
    """Independent python reference of quality_lm.bigram_surprisal."""
    import re
    from collections import Counter

    toks = {
        d: re.sub(r"\s+", " ", t.strip().lower()).split(" ") for d, t in texts.items()
    }
    uni, bf, cf = Counter(), Counter(), Counter()
    for ws in toks.values():
        uni.update(ws)
        for a, b in zip(ws, ws[1:]):
            bf[(a, b)] += 1
            cf[a] += 1
    total = sum(uni.values())
    bits_of = lambda n: n.bit_length() - 1  # floor(log2(n))
    out = {}
    for d, ws in toks.items():
        s = 0
        for i, w in enumerate(ws):
            if i == 0:
                s += bits_of(total) - bits_of(uni[w])
            elif (ws[i - 1], w) in bf:
                s += bits_of(cf[ws[i - 1]]) - bits_of(bf[(ws[i - 1], w)])
            else:
                s += bits_of(total) - bits_of(uni[w]) + backoff_bits
        out[d] = (len(ws), s)
    return out


def test_bigram_surprisal_matches_reference(spark):
    from pyppi_spark.operators.quality_lm import bigram_surprisal

    texts = {
        1: "the cat sat on the mat",
        2: "the cat sat on the mat",
        3: "mat the on sat cat the",   # token salad: same unigrams, novel bigrams
        4: "the cat ran to the mat",
        5: "",
        6: "one",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r.doc_id: r for r in bigram_surprisal(df).collect()}
    want = _bigram_ref(texts)
    assert set(got) == set(want)
    for d, (n, s) in want.items():
        assert (got[d].n_tokens, got[d].sum_bits) == (n, s), d
        assert got[d].mean_bits == s / n


def test_bigram_catches_token_salad_unigram_misses(spark):
    from pyppi_spark.operators.quality_lm import bigram_surprisal, unigram_surprisal

    texts = {
        1: "the cat sat on the mat",
        2: "the cat sat on the mat",
        3: "mat the on sat cat the",
        4: "the cat sat on the mat",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    u = {r.doc_id: r.mean_bits for r in unigram_surprisal(df).collect()}
    b = {r.doc_id: r.mean_bits for r in bigram_surprisal(df).collect()}
    # same bag of words -> unigram LM cannot separate doc 3 from doc 1
    assert u[3] == u[1]
    # bigram LM charges the novel word pairs
    assert b[3] > b[1]


def test_bigram_deterministic_across_parallelism(spark):
    from pyppi_spark.operators.quality_lm import bigram_surprisal

    rows = [(i, f"alpha beta gamma delta {i % 5} common tail phrase") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, bigram_surprisal(df).collect()))
    b = sorted(map(tuple, bigram_surprisal(df.repartition(11)).collect()))
    assert a == b


def test_quality_mix_budgets_respected(spark, tmp_path):
    import __spark_entry__ as e

    out = e.q_quality_mix(spark, "/root/testdata/sf0.001").collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    assert set(by_bucket) <= {"head", "middle"}  # tail always dropped
    for bucket, rows in by_bucket.items():
        budget = e.QUALITY_BUDGETS[bucket]
        assert max(r.cum_weight for r in rows) <= budget
        # prefix rule: cum_weight of the kept set is dense from the smallest
        total = sum(r.n_tokens for r in rows)
        assert max(r.cum_weight for r in rows) == total
