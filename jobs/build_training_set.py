"""spark-submit entry: full training-set construction over synthetic or
provided inputs, with stage materialization.

    spark-submit --py-files dist/pyppi_spark.zip jobs/build_training_set.py \
        --documents /path/docs.parquet --transcripts /path/transcripts \
        --output /path/out

    python jobs/build_training_set.py --synthetic-convs 500 --output /tmp/ts_out
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyppi_spark.session import build_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts")
    ap.add_argument("--documents")
    ap.add_argument("--synthetic-convs", type=int, default=0)
    ap.add_argument("--output", required=True)
    ap.add_argument("--gap-s", type=float, default=1800.0)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    spark = build_spark("build_training_set", master=args.master)
    from pyppi_spark.plans.training_set import build_training_set, clean_documents

    if args.synthetic_convs:
        from pyppi_spark.datagen import gen_transcripts_df

        transcripts = gen_transcripts_df(spark, args.synthetic_convs, seed=42)
    else:
        if not args.transcripts:
            ap.error("--transcripts or --synthetic-convs required")
        transcripts = spark.read.parquet(args.transcripts)

    if args.documents:
        docs = spark.read.parquet(args.documents)
        clean = clean_documents(docs)
        clean.write.mode("overwrite").parquet(f"{args.output}/documents_clean")
        print(f"documents kept: {spark.read.parquet(args.output + '/documents_clean').count()}")

    tables = build_training_set(transcripts, gap_s=args.gap_s)
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(f"{args.output}/{name}")
        print(name, spark.read.parquet(f"{args.output}/{name}").count())
    spark.stop()


if __name__ == "__main__":
    main()
