"""Stage-isolated micro-benchmarks (guide §1.4): time individual pipeline
stages of the heavy queries with the noop sink, so optimization targets the
stage that actually costs, not the query total. NOT the driver bench —
bench.py is the frozen measurement contract; this file only informs it.

Usage: python bench_extra.py [stage ...]     (default: all)
Env:   SPARK_GRAFT_SF_DIR (default sf1.0), SPARK_GRAFT_CPUS (default 32)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F

import __spark_entry__ as entrymod
from pyppi_spark.session import build_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def force(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = build_spark("bench_extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    sc = spark.sparkContext
    docs = entrymod._documents(spark, SF_DIR)
    emb = entrymod._embeddings(spark, SF_DIR)
    for t in ["documents", "embeddings"]:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()

    from pyppi_spark.operators import minhash_lsh_candidates, minhash_signatures
    from pyppi_spark.operators.dedup import (
        near_dup_components,
        ngram_jaccard_pairs,
    )
    from pyppi_spark.operators.similarity import (
        semantic_dedup_pairs,
        threshold_pairs_exact,
        train_centroids_from_file,
    )

    stages: dict[str, callable] = {}

    def stage(name):
        def deco(fn):
            stages[name] = fn
            return fn
        return deco

    @stage("minhash_sigs")
    def _s1():
        force(minhash_signatures(docs))

    @stage("lsh_cands")
    def _s2():
        sigs = minhash_signatures(docs)
        force(minhash_lsh_candidates(sigs, bands=32, rows_per_band=2))

    @stage("jaccard_verify")
    def _s3():
        sigs = minhash_signatures(docs)
        cands = minhash_lsh_candidates(sigs, bands=32, rows_per_band=2).localCheckpoint()
        force(ngram_jaccard_pairs(docs, cands, threshold=0.8))

    @stage("components")
    def _s4():
        sigs = minhash_signatures(docs)
        cands = minhash_lsh_candidates(sigs, bands=32, rows_per_band=2).localCheckpoint()
        pairs = ngram_jaccard_pairs(docs, cands, threshold=0.8).localCheckpoint()
        t0 = time.perf_counter()
        force(near_dup_components(pairs))
        print(f"    components-only {time.perf_counter() - t0:.2f}s", flush=True)

    @stage("semdedup_pairs")
    def _s5():
        cents = train_centroids_from_file(
            f"{SF_DIR}/embeddings.parquet", n_centroids=8, seed=42
        )
        force(
            semantic_dedup_pairs(
                emb, cents, threshold=0.45, dim=entrymod.EMBED_DIM,
                assign_strategy="blas",
            )
        )

    @stage("embed_pairs")
    def _s6():
        force(threshold_pairs_exact(emb, threshold=0.45, dim=entrymod.EMBED_DIM))

    @stage("embed_components")
    def _s7():
        from pyppi_spark.operators.dedup import near_dedup_representatives

        pairs = threshold_pairs_exact(
            emb, threshold=0.45, dim=entrymod.EMBED_DIM
        ).select("a", "b").localCheckpoint()
        t0 = time.perf_counter()
        force(near_dedup_representatives(emb, pairs, id_col="vec_id").select("vec_id"))
        print(f"    components+anti-only {time.perf_counter() - t0:.2f}s", flush=True)

    @stage("minhash_sigs_portable")
    def _s8():
        force(minhash_signatures(docs, hash_mode="portable"))

    @stage("simhash_hashes_portable")
    def _s9():
        from pyppi_spark.operators.dedup import _simhash_halves

        force(_simhash_halves(docs, "text", "doc_id", "portable"))

    @stage("simhash_hashes_fast")
    def _s10():
        from pyppi_spark.operators.dedup import _simhash_halves

        force(_simhash_halves(docs, "text", "doc_id", "fast"))

    @stage("simhash_pairs_portable")
    def _s11():
        from pyppi_spark.operators.dedup import simhash_near_dup_pairs

        force(simhash_near_dup_pairs(docs, max_hamming=6, hash_mode="portable"))

    @stage("dsir_occ_portable")
    def _s12():
        from pyppi_spark.operators.dsir import hashed_gram_occurrences

        force(hashed_gram_occurrences(docs, 256))

    @stage("dsir_scores_portable")
    def _s13():
        from pyppi_spark.operators.dsir import dsir_scores

        force(dsir_scores(docs, docs.where(F.col("lang") == "en"), n_buckets=256))

    names = sys.argv[1:] or list(stages)
    out = {}
    for name in names:
        sc.setJobDescription(f"bench_extra:{name}")
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            stages[name]()
            walls.append(time.perf_counter() - t0)
        out[name] = round(min(walls), 3)
        print(f"{name}: {out[name]}s  (runs: {[round(w,2) for w in walls]})", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
