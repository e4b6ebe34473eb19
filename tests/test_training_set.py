from __future__ import annotations

from pyspark.sql import functions as F

from pyppi_spark.plans.training_set import build_training_set, clean_documents


def test_clean_documents_filters_and_dedups(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog and runs to the green hill by the river"),
        (1, "the quick brown fox jumps over the lazy dog and runs to the green hill by the river"),  # dup of 0
        (2, "la casa es muy grande y los perros corren en el jardin todos los dias del verano"),      # es
        (3, "x"),  # too short → low quality
        (4, "completely different english text about the spark engine and the query planner of it"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = clean_documents(docs, min_quality=0.3, languages=("en",))
    ids = sorted(r.doc_id for r in kept.select("doc_id").collect())
    assert ids == [0, 4]


def test_build_training_set_tables(spark, tiny_df, probes_df):
    tables = build_training_set(tiny_df, probes=probes_df)
    assert set(tables) == {"turn_features", "conv_features", "pit_features"}
    n_turns = tiny_df.count()
    assert tables["turn_features"].count() == n_turns
    assert tables["conv_features"].count() == tiny_df.select("conv_id").distinct().count()
    assert tables["pit_features"].count() == probes_df.count()


def test_clean_documents_full_hygiene(spark):
    """All hygiene screens composed: PII drop, repetition cap, benchmark
    decontamination, then near-dedup — each screen removes exactly its
    planted offender."""
    base = "a thoroughly ordinary english document about the weather and the sea and the sky"
    rows = [
        (0, base + " plus unique ending one"),
        (1, "email me at leak@example.com about " + base),        # PII
        (2, " ".join(["repeat the same five words"] * 12)),       # repetition
        (3, "the secret benchmark prompt asks about seven golden rings of power today"),  # contaminated
        (4, base + " plus unique ending one"),                    # exact dup of 0
        (5, "another perfectly clean english text describing the harbor and the morning light"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame(
        [("the secret benchmark prompt asks about seven golden rings of power today",)],
        "text string",
    )
    kept = sorted(
        r.doc_id
        for r in clean_documents(
            docs, min_quality=0.2, languages=("en",),
            drop_pii=True, max_repetition=0.5, benchmark=bench,
        ).collect()
    )
    assert 1 not in kept          # PII
    assert 2 not in kept          # repetition
    assert 3 not in kept          # contaminated
    assert not {0, 4} <= set(kept)  # near-dedup keeps one of the pair
    assert 0 in kept or 4 in kept
    assert 5 in kept


def test_clean_documents_exact_dedup_before_lsh(spark):
    """A 10k-copy identical document must NOT reach the LSH band self-join:
    candidate-pair count stays linear (here: constant) in the copy count,
    and the survivor set equals the 3-copy corpus's survivors."""
    from pyppi_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_candidates,
        minhash_signatures,
    )

    boiler = "the standard boilerplate footer about cookies and privacy on every single page"
    distinct_docs = [
        (10_000_000, "a unique english document describing the harbor and the morning light"),
        (10_000_001, "another unique english text about the spark engine and the query planner"),
        (10_000_002, "the standard boilerplate footer about cookies and privacy on each single page"),  # near-dup of boiler
    ]

    def corpus(copies):
        return spark.createDataFrame(
            [(i, boiler) for i in range(copies)] + distinct_docs,
            "doc_id long, text string",
        )

    big, small = corpus(10_000), corpus(3)
    # the composition's own stages: candidates over the exact-dedup'd corpus
    # are independent of the identical-cluster size
    n_cands = (
        minhash_lsh_candidates(
            minhash_signatures(exact_dedup(big)), bands=32, rows_per_band=2
        ).count()
    )
    n_unique = 4  # 1 boiler representative + 3 distinct
    assert n_cands <= n_unique * (n_unique - 1) // 2
    survivors_big = sorted(
        r.doc_id for r in clean_documents(big, min_quality=0.2, jaccard_threshold=0.5).select("doc_id").collect()
    )
    survivors_small = sorted(
        r.doc_id for r in clean_documents(small, min_quality=0.2, jaccard_threshold=0.5).select("doc_id").collect()
    )
    assert survivors_big == survivors_small == [0, 10_000_000, 10_000_001]


def test_moss_dedup_documents_end_to_end(spark):
    """The MOSS composition: exact dups collapse to min id, a long shared
    passage with >=50% fingerprint overlap collapses transitively, and
    unrelated docs survive; an Observation accounts the capped rows."""
    from pyspark.sql import Observation
    from pyppi_spark.plans.training_set import moss_dedup_documents

    passage = (
        "a very long shared passage that continues for quite a while and "
        "dominates the fingerprint set of every document containing it "
        "because the rest of each document is extremely short"
    )
    rows = [
        (0, passage + " tail zero"),
        (1, passage + " tail zero"),          # exact dup of 0
        (2, passage + " other small tail"),   # near dup of 0 (shared passage)
        (3, passage + " third tiny ending"),  # near dup (chain via 2)
        (4, "completely unrelated writing about bucketed parquet layouts and shuffles"),
        (5, "another independent document on watermarks and session windows"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    obs = Observation("moss")
    out = moss_dedup_documents(
        docs, k=7, window=4, min_shared=5, min_overlap_frac=0.5,
        max_bucket_size=100, hash_mode="portable", observation=obs,
    )
    survivors = sorted(r.doc_id for r in out.select("doc_id").collect())
    assert survivors == [0, 4, 5]
    got = obs.get
    assert got["rows_dropped"] == 0 and got["rows_total"] > 0


def test_moss_dedup_incremental_fps_vs_text(spark, tmp_path):
    """MOSS increment against a frozen corpus: a new doc sharing the old
    passage drops outright, a new-new overlapping pair keeps the min id,
    unrelated docs survive — and the persisted-fingerprint path
    (``old_fps``) returns exactly the text-derived result while never
    referencing the frozen corpus text (the overlap rule is evaluated on
    fingerprints alone, like the SimHash family)."""
    import pytest

    from pyppi_spark.operators.dedup import winnow_fingerprints_kernel
    from pyppi_spark.plans.training_set import moss_dedup_incremental

    passage = (
        "a very long shared passage that continues for quite a while and "
        "dominates the fingerprint set of every document containing it "
        "because the rest of each document is extremely short"
    )
    passage2 = (
        "another lengthy excerpt that reappears nearly verbatim in two new "
        "documents and therefore dominates both fingerprint sets entirely "
        "since each document adds only a tiny distinct suffix"
    )
    old = spark.createDataFrame(
        [
            (0, passage + " tail zero"),
            (1, "an established corpus document about parquet readers"),
        ],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (101, passage + " other small tail"),   # near dup of old 0 -> drop
            (102, passage + " third tiny ending"),  # shares passage too -> drop
            (103, passage2 + " first ending"),      # new-new pair: keep min
            (104, passage2 + " second ending"),     #   -> drop (rep = 103)
            (105, "entirely unrelated text on garbage collector tuning for heaps"),
        ],
        "doc_id long, text string",
    )
    kw = dict(k=7, window=4, min_shared=5, min_overlap_frac=0.5,
              max_bucket_size=100, hash_mode="portable")

    texty = moss_dedup_incremental(new, old_docs=old, **kw)
    ids_texty = sorted(r.doc_id for r in texty.select("doc_id").collect())
    assert ids_texty == [103, 105]

    # a previous run persists (id, fingerprint); the increment consumes it
    fps_path = str(tmp_path / "winnow_fps")
    winnow_fingerprints_kernel(
        old, k=7, window=4, hash_mode="portable"
    ).write.parquet(fps_path)
    old_fps = spark.read.parquet(fps_path)

    banded = moss_dedup_incremental(new, old_fps=old_fps, **kw)
    ids_banded = sorted(r.doc_id for r in banded.select("doc_id").collect())
    assert ids_banded == ids_texty

    # exactly one of old_docs / old_fps
    with pytest.raises(ValueError):
        moss_dedup_incremental(new, old_docs=old, old_fps=old_fps, **kw)
    with pytest.raises(ValueError):
        moss_dedup_incremental(new, **kw)
