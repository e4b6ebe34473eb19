"""spark-submit entry point: full feature extraction with checkpoint/resume.

Run (cluster):
    spark-submit --py-files dist/pyppi_spark.zip jobs/extract_features.py \
        --input /path/to/transcripts_parquet \
        --output /path/to/features_out \
        --ledger /path/to/ledger \
        --run-id myrun --gap-s 1800 --n-buckets 64

Run (sandbox, synthetic input):
    python jobs/extract_features.py --synthetic-convs 5000 --output /tmp/out \
        --ledger /tmp/ledger --run-id demo

The job computes per-conversation feature vectors (``conv_features``)
bucket-by-bucket through the checkpoint ledger: a killed run re-submitted
with the same --run-id resumes where it stopped (north-rule resumability).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyppi_spark import __version__
from pyppi_spark.checkpoint import lineage_id, run_with_checkpoints
from pyppi_spark.session import build_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts parquet path (conv_id, turn_idx, role, text, tool, ts)")
    ap.add_argument("--synthetic-convs", type=int, default=0, help="generate N synthetic conversations instead of --input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--ledger", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--gap-s", type=float, default=1800.0)
    ap.add_argument("--n-buckets", type=int, default=16)
    ap.add_argument("--master", default=None)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    spark = build_spark("extract_features", master=args.master)
    from pyppi_spark.plans import conv_features

    if args.synthetic_convs:
        from pyppi_spark.datagen import gen_transcripts_df

        transcripts = gen_transcripts_df(spark, args.synthetic_convs, seed=args.seed)
        fingerprint = f"synthetic:{args.synthetic_convs}:{args.seed}"
    else:
        if not args.input:
            ap.error("--input or --synthetic-convs required")
        transcripts = spark.read.parquet(args.input)
        fingerprint = args.input

    lineage = lineage_id(fingerprint, __version__, {"gap_s": args.gap_s})
    t0 = time.perf_counter()
    n = run_with_checkpoints(
        spark,
        transcripts,
        transform=lambda df: conv_features(df, gap_s=args.gap_s),
        output_path=args.output,
        ledger_path=args.ledger,
        run_id=args.run_id,
        lineage=lineage,
        n_buckets=args.n_buckets,
    )
    print(
        f"run_id={args.run_id} buckets_computed={n} "
        f"wall_s={time.perf_counter() - t0:.1f} lineage={lineage}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
