"""spark-submit entry: corpus deduplication — full or incremental.

    # full dedup of a corpus (exact + chosen near-dup family)
    spark-submit --py-files dist/pyppi_spark.zip jobs/dedup_corpus.py \
        --documents /path/docs.parquet --output /path/out --strategy minhash

    # daily increment vs a frozen corpus (never re-pairs OR re-hashes
    # history: the previous run's persisted key/band artifacts are read
    # instead of re-deriving them from corpus text)
    spark-submit --py-files dist/pyppi_spark.zip jobs/dedup_corpus.py \
        --documents /path/new_shard.parquet --output /path/out \
        --mode incremental --prev-artifacts /path/prev \
        --old-documents /path/prev/documents_kept

Outputs under ``<output>/``:

- ``documents_kept``      — survivors
- ``content_keys``        — 16-byte exact-dup keys of everything kept so
  far (history unioned in); the next increment's anti-join input
- ``minhash_bands``       — (id, band_idx, band_hash) LSH band rows of the
  kept corpus (strategy=minhash): the next increment bands ONLY its own
  docs and joins against this table — frozen text is touched only by the
  Jaccard verify (O(increment) per run instead of O(corpus))
- ``simhash_keys``        — (id, simhash_hi, simhash_lo), 8 bytes/doc
  (strategy=simhash): the next increment needs NO old text at all (the
  Hamming verify is pure bit arithmetic on the keys)
- ``winnow_fps``          — (id, fingerprint) winnowing fingerprints of
  the kept corpus (strategy=moss): like simhash, the MOSS overlap rule
  is evaluated on fingerprints alone, so increments never read old text
- ``band_params``         — sidecar recording the banding/hash parameters;
  validated on read so an increment cannot silently join bands built
  with different parameters
- ``dedup_metrics.json``  — row accounting incl. Observation-reported
  capped rows (no silent recall loss); written through the Hadoop
  FileSystem API so hdfs:///s3:// outputs work end-to-end
- ``_ledger``             — stage checkpoint ledger (``--run-id`` only)

``--run-id`` enables stage-level resume: each pipeline stage (exact →
near pairs → kept) is materialized then committed to the checkpoint
ledger; a killed run re-invoked with the same run id skips completed
stages (reading their parquet back) and recomputes only the rest —
including the cap-accounting metrics, which are stored in the ledger at
stage-commit time (they are only observable while the stage executes).
Reference analog: the staged, materialized pipeline steps with
skip-if-exists resume of ``/root/reference/bin/setupPpiDb.py:375-413``
(whole-stage markers; the ledger generalizes them — see
pyppi_spark/checkpoint.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyppi_spark.session import build_spark

CODE_VERSION = "dedup_corpus-v2"

# banding/hash parameters pinned by this job; the sidecar guards an
# increment against consuming artifacts built with different values
MINHASH_PARAMS = {
    "family": "minhash", "num_hashes": 64, "shingle_n": 3,
    "bands": 32, "rows_per_band": 2, "seed": 42, "hash_mode": "fast",
}
SIMHASH_PARAMS = {"family": "simhash", "hash_mode": "fast"}
MOSS_PARAMS = {"family": "moss", "k": 7, "window": 4, "hash_mode": "fast"}


def _write_text(spark, path: str, content: str) -> None:
    from pyppi_spark.io import write_text

    write_text(spark, path, content)


def _write_band_params(spark, output: str, params: dict) -> None:
    spark.createDataFrame(
        [(params["family"], json.dumps(params, sort_keys=True))],
        "family string, params_json string",
    ).write.mode("overwrite").parquet(f"{output}/band_params")


def _validate_band_params(spark, prev_dir: str, expected: dict) -> None:
    rows = (
        spark.read.parquet(f"{prev_dir}/band_params")
        .where(f"family = '{expected['family']}'")
        .collect()
    )
    if not rows:
        raise ValueError(
            f"{prev_dir}/band_params has no row for family "
            f"{expected['family']!r} — artifacts were written by a "
            "different strategy"
        )
    got = json.loads(rows[0]["params_json"])
    if got != expected:
        raise ValueError(
            f"persisted band_params {got} != this job's {expected}; "
            "an increment must use the same banding/hash parameters as "
            "the run that wrote the artifacts (re-run full mode to "
            "rebuild them)"
        )


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
    ap.add_argument("--history-keys",
                    help="content_keys parquet of everything kept so far "
                         "(defaults to <prev-artifacts>/content_keys)")
    ap.add_argument("--old-documents",
                    help="kept documents of the frozen corpus; needed by the "
                         "minhash near stage (Jaccard verify) and, without "
                         "--prev-artifacts, by the simhash near stage")
    ap.add_argument("--prev-artifacts",
                    help="previous run's --output dir: supplies "
                         "minhash_bands/simhash_keys/winnow_fps (+ "
                         "band_params, validated) so the frozen corpus is "
                         "never re-hashed")
    ap.add_argument("--jaccard-threshold", type=float, default=0.8)
    ap.add_argument("--max-bucket-size", type=int, default=10_000)
    ap.add_argument("--run-id",
                    help="enable stage-checkpointed execution: completed "
                         "stages recorded in <output>/_ledger are skipped "
                         "when the same run id is re-invoked")
    ap.add_argument("--fail-after-stage", type=int, default=None,
                    help="test hook: raise after committing this stage index")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import Observation

    from pyppi_spark.checkpoint import CheckpointLedger, lineage_id
    from pyppi_spark.metrics import observation_metrics
    from pyppi_spark.operators.dedup import (
        content_keys,
        exact_dedup,
        exact_dedup_incremental,
        minhash_bands,
        minhash_lsh_candidates,
        minhash_signatures,
        near_dedup_incremental,
        near_dedup_representatives,
        ngram_jaccard_pairs,
        simhash_keys,
        simhash_near_dup_incremental,
        simhash_near_dup_pairs,
    )

    spark = build_spark("dedup_corpus", master=args.master)
    docs = spark.read.parquet(args.documents)
    n_in = docs.count()
    obs = Observation("dedup_caps")
    metrics: dict = {"mode": args.mode, "strategy": args.strategy, "docs_in": n_in}
    out_dir = args.output

    history_keys = args.history_keys or (
        f"{args.prev_artifacts}/content_keys" if args.prev_artifacts else None
    )

    # ---- stage runner: materialize -> commit to ledger -> (resume: read back)
    ledger = CheckpointLedger(spark, f"{out_dir}/_ledger") if args.run_id else None
    lineage = lineage_id(
        args.documents,
        CODE_VERSION,
        {
            k: v for k, v in vars(args).items()
            if k not in ("master", "run_id", "fail_after_stage")
        },
    )
    done = ledger.done_buckets(args.run_id, lineage) if ledger else set()

    def stage(idx: int, path: str, builder, metrics_fn=None):
        """Build + write a pipeline stage, or read it back if this run id
        already committed it. Returns (materialized df, stage metrics)."""
        if ledger and idx in done:
            return spark.read.parquet(path), ledger.metrics_of(args.run_id, lineage, idx)
        builder().write.mode("overwrite").parquet(path)
        df = spark.read.parquet(path)
        mets = metrics_fn() if metrics_fn else None
        if ledger:
            ledger.mark(args.run_id, idx, "done", lineage,
                        rows_out=df.count(), metrics=mets)
            if args.fail_after_stage is not None and idx >= args.fail_after_stage:
                raise RuntimeError(f"simulated failure after stage {idx}")
        return df, mets

    cap_metrics = None
    near_stage_ran = False
    prev_bands = None     # minhash band rows of the frozen corpus (if any)
    prev_keys = None      # simhash keys of the frozen corpus (if any)
    prev_fps = None       # winnow fingerprints of the frozen corpus (if any)

    if args.mode == "incremental":
        if not history_keys:
            ap.error("--history-keys or --prev-artifacts required for incremental mode")
        if args.strategy == "moss" and not (args.prev_artifacts or args.old_documents):
            ap.error(
                "incremental moss needs --prev-artifacts (persisted "
                "winnow_fps; no old text read at all) or --old-documents"
            )
        if args.strategy == "minhash" and not args.old_documents:
            # the Jaccard verify reads candidate texts; failing loudly
            # beats silently skipping the near stage while the metrics
            # still claim the requested strategy
            ap.error(
                "--old-documents required for the incremental minhash near "
                "stage (Jaccard verify); pass --strategy exact-only to run "
                "the key anti-join alone"
            )
        if args.strategy == "simhash" and not (args.prev_artifacts or args.old_documents):
            ap.error(
                "incremental simhash needs --prev-artifacts (persisted "
                "simhash_keys; no old text read at all) or --old-documents"
            )
        seen = spark.read.parquet(history_keys)
        step1, _ = stage(
            0, f"{out_dir}/exact_stage", lambda: exact_dedup_incremental(docs, seen)
        )
        if args.strategy == "exact-only":
            kept, _ = stage(2, f"{out_dir}/documents_kept", lambda: step1)
        elif args.strategy == "moss":
            from pyppi_spark.plans.training_set import moss_dedup_incremental

            if args.prev_artifacts:
                _validate_band_params(spark, args.prev_artifacts, MOSS_PARAMS)
                prev_fps = spark.read.parquet(f"{args.prev_artifacts}/winnow_fps")

            def build_kept():
                kw = (
                    {"old_fps": prev_fps}
                    if prev_fps is not None
                    else {"old_docs": spark.read.parquet(args.old_documents)}
                )
                return moss_dedup_incremental(
                    step1,
                    k=MOSS_PARAMS["k"], window=MOSS_PARAMS["window"],
                    hash_mode=MOSS_PARAMS["hash_mode"],
                    max_bucket_size=args.max_bucket_size, observation=obs,
                    repartition_to=spark.sparkContext.defaultParallelism,
                    **kw,
                )

            kept, cap_metrics = stage(
                2, f"{out_dir}/documents_kept", build_kept,
                lambda: observation_metrics(obs),
            )
            near_stage_ran = True
        elif args.strategy == "simhash":
            if args.prev_artifacts:
                _validate_band_params(spark, args.prev_artifacts, SIMHASH_PARAMS)
                prev_keys = spark.read.parquet(f"{args.prev_artifacts}/simhash_keys")

            def build_kept():
                kw = (
                    {"old_keys": prev_keys}
                    if prev_keys is not None
                    else {"old_docs": spark.read.parquet(args.old_documents)}
                )
                return simhash_near_dup_incremental(
                    step1, max_hamming=args.max_hamming,
                    hash_mode=SIMHASH_PARAMS["hash_mode"],
                    max_bucket_size=args.max_bucket_size, observation=obs, **kw,
                )

            kept, cap_metrics = stage(
                2, f"{out_dir}/documents_kept", build_kept,
                lambda: observation_metrics(obs),
            )
            near_stage_ran = True
        else:  # minhash
            old_docs = spark.read.parquet(args.old_documents)
            if args.prev_artifacts:
                _validate_band_params(spark, args.prev_artifacts, MINHASH_PARAMS)
                prev_bands = spark.read.parquet(f"{args.prev_artifacts}/minhash_bands")

            def build_kept():
                return near_dedup_incremental(
                    step1, old_docs, threshold=args.jaccard_threshold,
                    max_bucket_size=args.max_bucket_size, hot_bucket="skip",
                    observation=obs, old_bands=prev_bands,
                    **{k: MINHASH_PARAMS[k] for k in
                       ("num_hashes", "shingle_n", "bands", "rows_per_band",
                        "seed", "hash_mode")},
                )

            kept, cap_metrics = stage(
                2, f"{out_dir}/documents_kept", build_kept,
                lambda: observation_metrics(obs),
            )
            near_stage_ran = True
    else:
        if args.strategy == "exact-only":
            kept, _ = stage(2, f"{out_dir}/documents_kept", lambda: exact_dedup(docs))
        elif args.strategy == "moss":
            from pyppi_spark.plans.training_set import moss_dedup_documents

            # moss_dedup_documents runs its own exact stage
            kept, cap_metrics = stage(
                2, f"{out_dir}/documents_kept",
                lambda: moss_dedup_documents(
                    docs, max_bucket_size=args.max_bucket_size, observation=obs
                ),
                lambda: observation_metrics(obs),
            )
            near_stage_ran = True
        else:
            uniq, _ = stage(0, f"{out_dir}/exact_stage", lambda: exact_dedup(docs))
            if args.strategy == "simhash":
                def build_pairs():
                    return simhash_near_dup_pairs(
                        uniq, max_hamming=args.max_hamming,
                        hash_mode=SIMHASH_PARAMS["hash_mode"],
                        max_bucket_size=args.max_bucket_size, observation=obs,
                    ).select("a", "b")
            else:  # minhash
                def build_pairs():
                    sigs = minhash_signatures(
                        uniq,
                        num_hashes=MINHASH_PARAMS["num_hashes"],
                        shingle_n=MINHASH_PARAMS["shingle_n"],
                        seed=MINHASH_PARAMS["seed"],
                        hash_mode=MINHASH_PARAMS["hash_mode"],
                    )
                    cands = minhash_lsh_candidates(
                        sigs,
                        bands=MINHASH_PARAMS["bands"],
                        rows_per_band=MINHASH_PARAMS["rows_per_band"],
                        max_bucket_size=args.max_bucket_size,
                        hot_bucket="skip", observation=obs,
                    )
                    return ngram_jaccard_pairs(
                        uniq, cands, threshold=args.jaccard_threshold,
                        shingle_n=MINHASH_PARAMS["shingle_n"],
                    ).select("a", "b")

            pairs, cap_metrics = stage(
                1, f"{out_dir}/near_pairs", build_pairs,
                lambda: observation_metrics(obs),
            )
            kept, _ = stage(
                2, f"{out_dir}/documents_kept",
                lambda: near_dedup_representatives(uniq, pairs),
            )
            near_stage_ran = True

    kept_mat = kept
    n_kept = kept_mat.count()

    keys = content_keys(kept_mat)
    if args.mode == "incremental":
        keys = keys.unionByName(spark.read.parquet(history_keys)).distinct()
    keys.write.mode("overwrite").parquet(f"{out_dir}/content_keys")

    # ---- persist the near-stage key/band artifacts the NEXT increment
    # consumes (this is what keeps increments O(increment): the frozen
    # corpus is hashed once — here — and never again)
    if args.strategy == "minhash":
        new_bands = minhash_bands(
            kept_mat,
            **{k: MINHASH_PARAMS[k] for k in
               ("num_hashes", "shingle_n", "bands", "rows_per_band",
                "seed", "hash_mode")},
        )
        if args.mode == "incremental":
            old_b = (
                prev_bands
                if prev_bands is not None
                else minhash_bands(
                    spark.read.parquet(args.old_documents),
                    **{k: MINHASH_PARAMS[k] for k in
                       ("num_hashes", "shingle_n", "bands", "rows_per_band",
                        "seed", "hash_mode")},
                )
            )
            new_bands = old_b.unionByName(new_bands)
        new_bands.write.mode("overwrite").parquet(f"{out_dir}/minhash_bands")
        _write_band_params(spark, out_dir, MINHASH_PARAMS)
    elif args.strategy == "moss":
        from pyppi_spark.operators.dedup import winnow_fingerprints_kernel

        new_fps = winnow_fingerprints_kernel(
            kept_mat, k=MOSS_PARAMS["k"], window=MOSS_PARAMS["window"],
            hash_mode=MOSS_PARAMS["hash_mode"],
            repartition_to=spark.sparkContext.defaultParallelism,
        )
        if args.mode == "incremental":
            old_f = (
                prev_fps
                if prev_fps is not None
                else winnow_fingerprints_kernel(
                    spark.read.parquet(args.old_documents),
                    k=MOSS_PARAMS["k"], window=MOSS_PARAMS["window"],
                    hash_mode=MOSS_PARAMS["hash_mode"],
                    repartition_to=spark.sparkContext.defaultParallelism,
                )
            )
            new_fps = old_f.unionByName(new_fps)
        new_fps.write.mode("overwrite").parquet(f"{out_dir}/winnow_fps")
        _write_band_params(spark, out_dir, MOSS_PARAMS)
    elif args.strategy == "simhash":
        new_keys = simhash_keys(kept_mat, hash_mode=SIMHASH_PARAMS["hash_mode"])
        if args.mode == "incremental":
            old_k = (
                prev_keys
                if prev_keys is not None
                else simhash_keys(
                    spark.read.parquet(args.old_documents),
                    hash_mode=SIMHASH_PARAMS["hash_mode"],
                )
            )
            new_keys = old_k.unionByName(new_keys)
        new_keys.write.mode("overwrite").parquet(f"{out_dir}/simhash_keys")
        _write_band_params(spark, out_dir, SIMHASH_PARAMS)

    metrics.update(
        {
            "docs_kept": n_kept,
            "docs_dropped": n_in - n_kept,
            "near_stage_ran": near_stage_ran,
            # None = near stage skipped (exact-only) or metrics elided
            # (entirely-empty capped output under AQE)
            "cap_accounting": cap_metrics if cap_metrics else None,
        }
    )
    _write_text(spark, f"{out_dir}/dedup_metrics.json", json.dumps(metrics, indent=2))
    print(json.dumps(metrics))
    spark.stop()
    return metrics


if __name__ == "__main__":
    main()
