"""spark-submit entry: corpus deduplication — full or incremental.

    # full dedup of a corpus (exact + chosen near-dup family)
    spark-submit --py-files dist/pyppi_spark.zip jobs/dedup_corpus.py \
        --documents /path/docs.parquet --output /path/out --strategy minhash

    # daily increment vs a frozen corpus (never re-pairs history)
    spark-submit --py-files dist/pyppi_spark.zip jobs/dedup_corpus.py \
        --documents /path/new_shard.parquet --output /path/out \
        --mode incremental --history-keys /path/prev/content_keys \
        --old-documents /path/corpus_kept

Writes ``<output>/documents_kept`` (survivors), ``<output>/content_keys``
(the compact key table the NEXT incremental run anti-joins against —
history keys unioned in), and ``<output>/dedup_metrics.json`` (row
accounting incl. Observation-reported capped rows — no silent recall
loss). Reference analog: the staged, materialized pipeline steps of
``/root/reference/bin/setupPpiDb.py:375-413``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyppi_spark.session import build_spark


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--mode", choices=["full", "incremental"], default="full")
    ap.add_argument(
        "--strategy",
        choices=["minhash", "moss", "simhash", "exact-only"],
        default="minhash",
    )
    ap.add_argument("--max-hamming", type=int, default=3,
                    help="simhash strategy: Hamming-ball radius")
    ap.add_argument("--history-keys", help="content_keys parquet of everything kept so far")
    ap.add_argument("--old-documents", help="kept documents of the frozen corpus (near stage)")
    ap.add_argument("--jaccard-threshold", type=float, default=0.8)
    ap.add_argument("--max-bucket-size", type=int, default=10_000)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import Observation, functions as F

    from pyppi_spark.metrics import observation_metrics
    from pyppi_spark.operators.dedup import (
        content_keys,
        exact_dedup,
        exact_dedup_incremental,
        minhash_lsh_candidates,
        minhash_signatures,
        near_dedup_incremental,
        near_dedup_representatives,
        ngram_jaccard_pairs,
    )

    spark = build_spark("dedup_corpus", master=args.master)
    docs = spark.read.parquet(args.documents)
    n_in = docs.count()
    obs = Observation("dedup_caps")
    metrics: dict = {"mode": args.mode, "strategy": args.strategy, "docs_in": n_in}

    near_stage_ran = False
    if args.mode == "incremental":
        if not args.history_keys:
            ap.error("--history-keys required for incremental mode")
        if args.strategy in ("moss", "simhash"):
            ap.error("incremental mode supports --strategy minhash or exact-only")
        if args.strategy != "exact-only" and not args.old_documents:
            # failing loudly beats silently skipping the near stage while
            # the metrics still claim the requested strategy
            ap.error(
                "--old-documents required for the incremental near stage; "
                "pass --strategy exact-only to run the key anti-join alone"
            )
        seen = spark.read.parquet(args.history_keys)
        step1 = exact_dedup_incremental(docs, seen)
        if args.strategy == "exact-only":
            kept = step1
        else:
            # stage boundary: materialize the exact stage (the reference's
            # stage-output pattern) — the near stage references the
            # increment several times, and a storage checkpoint is the
            # fault-tolerant form of the operator's lineage truncation
            step1.write.mode("overwrite").parquet(f"{args.output}/exact_stage")
            step1 = spark.read.parquet(f"{args.output}/exact_stage")
            old_docs = spark.read.parquet(args.old_documents)
            kept = near_dedup_incremental(
                step1, old_docs, threshold=args.jaccard_threshold,
                max_bucket_size=args.max_bucket_size, hot_bucket="skip",
                observation=obs,
            )
            near_stage_ran = True
    else:
        uniq = exact_dedup(docs)
        if args.strategy == "exact-only":
            kept = uniq
        elif args.strategy == "moss":
            from pyppi_spark.plans.training_set import moss_dedup_documents

            # moss_dedup_documents runs its own exact stage
            kept = moss_dedup_documents(
                docs, max_bucket_size=args.max_bucket_size, observation=obs
            )
            near_stage_ran = True
        elif args.strategy == "simhash":
            from pyppi_spark.operators.dedup import simhash_near_dup_pairs

            pairs = simhash_near_dup_pairs(
                uniq, max_hamming=args.max_hamming, hash_mode="fast",
                max_bucket_size=args.max_bucket_size, observation=obs,
            ).select("a", "b")
            kept = near_dedup_representatives(uniq, pairs)
            near_stage_ran = True
        else:
            sigs = minhash_signatures(uniq)
            cands = minhash_lsh_candidates(
                sigs, bands=32, rows_per_band=2,
                max_bucket_size=args.max_bucket_size, hot_bucket="skip",
                observation=obs,
            )
            dups = ngram_jaccard_pairs(uniq, cands, threshold=args.jaccard_threshold)
            kept = near_dedup_representatives(uniq, dups)
            near_stage_ran = True

    kept.write.mode("overwrite").parquet(f"{args.output}/documents_kept")
    kept_mat = spark.read.parquet(f"{args.output}/documents_kept")
    n_kept = kept_mat.count()

    keys = content_keys(kept_mat)
    if args.mode == "incremental":
        keys = keys.unionByName(spark.read.parquet(args.history_keys)).distinct()
    keys.write.mode("overwrite").parquet(f"{args.output}/content_keys")

    cap_metrics = observation_metrics(obs) if near_stage_ran else None
    metrics.update(
        {
            "docs_kept": n_kept,
            "docs_dropped": n_in - n_kept,
            "near_stage_ran": near_stage_ran,
            # None = near stage skipped (exact-only) or metrics elided
            # (entirely-empty capped output under AQE)
            "cap_accounting": cap_metrics,
        }
    )
    os.makedirs(args.output, exist_ok=True)
    with open(f"{args.output}/dedup_metrics.json", "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics))
    spark.stop()
    return metrics


if __name__ == "__main__":
    main()
