"""spark-submit entry: corpus selection & assembly — the quality /
data-mixture half of training-set construction (the dedup half is
``jobs/dedup_corpus.py``):

    quality scoring (corpus-LM surprisal) → per-source rank tiers, tail
    dropped → optional DSIR importance selection toward a target slice →
    optional per-source token-budget mixture → seeded shard shuffle

    spark-submit --py-files dist/pyppi_spark.zip jobs/select_corpus.py \
        --documents /path/docs.parquet --output /path/out \
        --target-lang en --dsir-k 100000 \
        --budget web=2000000000 --budget books=500000000 --n-shards 1024

Every stage is a pure function of (seed, input): two runs over the same
parquet produce byte-identical selections at any parallelism. Stage
outputs are materialized under --output (the reference's stage-boundary
readback pattern, /root/reference/bin/setupPpiDb.py:375-413) and
``select_metrics.json`` records the row/token accounting per stage — a
selection job that cannot say what it dropped is not auditable.

Scale notes: the surprisal/DSIR scorers are explode + broadcast-LM joins
+ hash aggs (no per-doc window — see quality_lm.gram_pair_rows); the
tier window partitions by source (bounded count); mix_sample's
O(budget) prefilter escape is exposed via --prefilter-margin for giant
domains. Metrics are written through the Hadoop FileSystem API so
hdfs:///s3a:// outputs work end-to-end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyppi_spark.session import build_spark


def _parse_budgets(items: list[str]) -> dict[str, int]:
    out: dict[str, int] = {}
    for it in items:
        if "=" not in it:
            raise SystemExit(f"--budget must be name=tokens, got {it!r}")
        k, v = it.split("=", 1)
        out[k] = int(v)
    return out


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--source-col", default="source")
    ap.add_argument("--tiers", default="head,middle",
                    help="comma list of quality tiers to keep (of head,middle,tail)")
    ap.add_argument("--target-lang", default=None,
                    help="enable DSIR selection toward documents of this lang")
    ap.add_argument("--target-buckets", default=None,
                    help="persisted target bucket table from a previous run "
                    "(<out>/target_buckets) — enables DSIR without re-reading "
                    "target text (the content_keys artifact-handoff pattern)")
    ap.add_argument("--dsir-k", type=int, default=0,
                    help="DSIR Gumbel top-k size (required with "
                    "--target-lang/--target-buckets)")
    ap.add_argument("--dsir-buckets", type=int, default=8192)
    ap.add_argument("--budget", action="append", default=[],
                    help="per-source token budget name=tokens (repeatable)")
    ap.add_argument("--prefilter-margin", type=float, default=None)
    ap.add_argument("--n-shards", type=int, default=64)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--hash-mode", default="fast", choices=["fast", "portable"])
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    keep_tiers = [t.strip() for t in args.tiers.split(",") if t.strip()]
    bad = set(keep_tiers) - {"head", "middle", "tail"}
    if bad or not keep_tiers:
        raise SystemExit(f"--tiers must name head/middle/tail, got {args.tiers!r}")
    if args.target_lang is not None and args.target_buckets is not None:
        raise SystemExit("pass --target-lang OR --target-buckets, not both")
    dsir_on = args.target_lang is not None or args.target_buckets is not None
    if dsir_on != (args.dsir_k > 0):
        raise SystemExit(
            "--dsir-k must be passed together with --target-lang/--target-buckets"
        )
    budgets = _parse_budgets(args.budget)

    spark = build_spark("select_corpus", master=args.master)
    from pyspark.sql import functions as F

    from pyppi_spark.io import write_text
    from pyppi_spark.operators.dsir import dsir_scores, gumbel_topk
    from pyppi_spark.operators.quality_lm import rank_buckets, unigram_surprisal
    from pyppi_spark.operators.sampling import mix_sample, shard_assign

    idc, txt, src = args.id_col, args.text_col, args.source_col
    docs = spark.read.parquet(args.documents)
    n_in = docs.count()
    metrics: dict = {"docs_in": n_in, "seed": args.seed, "kept_tiers": keep_tiers}

    # ---- stage 1: quality tiers (scored table materialized for audit)
    scored = unigram_surprisal(docs, text_col=txt, id_col=idc).join(
        docs.select(idc, src), idc
    )
    tiers = rank_buckets(scored, src, "mean_bits", id_col=idc)
    tiers.write.mode("overwrite").parquet(f"{args.output}/quality_tiers")
    tiers = spark.read.parquet(f"{args.output}/quality_tiers")
    kept = tiers.where(F.col("bucket").isin(keep_tiers))
    metrics["docs_quality_kept"] = kept.count()

    # Stage seeds MUST be independent draws: under the seed|id key scheme
    # distinct seed ints give disjoint hash spaces, so the Gumbel noise,
    # the mixture's hash-prefix rank, and the shard draw are mutually
    # uncorrelated.  Reusing one seed makes the DSIR sampler and the
    # mixture sampler rank by the IDENTICAL per-doc hash — the budget
    # stage would then deterministically drop first exactly the docs the
    # Gumbel stage most favored (a contiguous hash band, not a sample).
    seed_dsir, seed_mix, seed_shard = args.seed + 1, args.seed + 2, args.seed + 3

    # ---- stage 2: DSIR selection toward the target slice (optional);
    # materialized (the stage-boundary readback pattern) so the corpus-
    # wide gram scoring plan executes exactly once. The target bucket
    # table is persisted every run, so later runs pass --target-buckets
    # and never re-read target text (content_keys artifact handoff).
    if dsir_on:
        from pyppi_spark.operators.dsir import bucket_counts, hashed_gram_occurrences

        tb_params = {"n_buckets": args.dsir_buckets, "hash_mode": args.hash_mode}
        pool = docs.join(kept.select(idc), idc, "semi")
        if args.target_buckets is not None:
            # the sidecar pins the hash parameters the table was binned
            # with — consuming it under a different n_buckets/hash_mode
            # would not error (unmatched buckets take the OOV floor), it
            # would silently rank documents by noise
            got = json.loads(
                spark.read.parquet(f"{args.target_buckets}_params")
                .collect()[0]["params_json"]
            )
            if got != tb_params:
                raise SystemExit(
                    f"--target-buckets was built with {got}, this run uses "
                    f"{tb_params}; pass matching --dsir-buckets/--hash-mode"
                )
            # localCheckpoint BEFORE the overwrite below: a lazy read
            # whose source path equals the destination (retry-in-place
            # with --target-buckets <out>/target_buckets) would otherwise
            # DELETE its own source files before reading them
            tb = spark.read.parquet(args.target_buckets).localCheckpoint()
        else:
            target = docs.where(F.col("lang") == args.target_lang)
            tb = bucket_counts(
                hashed_gram_occurrences(
                    target, args.dsir_buckets, text_col=txt, id_col=idc,
                    hash_mode=args.hash_mode,
                ),
                id_col=idc,
            )
        tb.write.mode("overwrite").parquet(f"{args.output}/target_buckets")
        spark.createDataFrame(
            [(json.dumps(tb_params, sort_keys=True),)], "params_json string"
        ).write.mode("overwrite").parquet(f"{args.output}/target_buckets_params")
        tb = spark.read.parquet(f"{args.output}/target_buckets")
        ds = dsir_scores(
            pool, target_buckets=tb, n_buckets=args.dsir_buckets,
            text_col=txt, id_col=idc, hash_mode=args.hash_mode,
        )
        sel = gumbel_topk(
            ds, k=args.dsir_k, id_col=idc, seed=seed_dsir, noise="gumbel",
            hash_mode=args.hash_mode,
        )
        sel.write.mode("overwrite").parquet(f"{args.output}/dsir_selected")
        sel = spark.read.parquet(f"{args.output}/dsir_selected")
        kept = kept.join(sel.select(idc), idc, "semi")
        metrics["docs_dsir_kept"] = kept.count()

    # ---- stage 3: per-source token-budget mixture (optional); same
    # stage-boundary materialization
    if budgets:
        kept = mix_sample(
            kept, src, budgets, weight_col="n_tokens", id_col=idc,
            seed=seed_mix, hash_mode=args.hash_mode,
            prefilter_margin=args.prefilter_margin,
        )
        kept.write.mode("overwrite").parquet(f"{args.output}/mixed")
        kept = spark.read.parquet(f"{args.output}/mixed")
        metrics["docs_mixed"] = kept.count()
        metrics["budgets"] = budgets

    # ---- stage 4: seeded shard shuffle and final write
    final = shard_assign(
        kept, args.n_shards, id_col=idc, seed=seed_shard, hash_mode=args.hash_mode
    ).join(docs.select(idc, txt), idc)
    final.write.mode("overwrite").partitionBy("shard").parquet(
        f"{args.output}/selected"
    )
    final_mat = spark.read.parquet(f"{args.output}/selected")
    metrics["docs_out"] = final_mat.count()
    metrics["tokens_out"] = (
        final_mat.agg(F.sum("n_tokens").cast("long")).collect()[0][0] or 0
    )
    per_src = {
        r[0]: {"docs": r[1], "tokens": r[2]}
        for r in final_mat.groupBy(src)
        .agg(F.count(F.lit(1)), F.sum("n_tokens").cast("long"))
        .collect()  # bounded: one row per source
    }
    metrics["per_source"] = per_src

    write_text(
        spark, f"{args.output}/select_metrics.json",
        json.dumps(metrics, sort_keys=True, default=str),
    )
    print(json.dumps(metrics, sort_keys=True, default=str))
    spark.stop()
    return metrics


if __name__ == "__main__":
    main()
