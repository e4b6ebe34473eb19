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
    from pyppi_spark.plans.training_set import clean_documents

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

    # staged materialization (the reference's stage-boundary pattern,
    # /root/reference/bin/setupPpiDb.py:375-413): write the per-turn table,
    # then derive conv vectors from the materialized copy — windows are
    # computed exactly once
    from pyppi_spark.plans import turn_features, conv_features_from_turns
    from pyppi_spark.plans.pit import pit_features  # noqa: F401 (available for probe inputs)

    tf = turn_features(transcripts, gap_s=args.gap_s)
    tf.write.mode("overwrite").parquet(f"{args.output}/turn_features")
    tf_mat = spark.read.parquet(f"{args.output}/turn_features")
    print("turn_features", tf_mat.count())
    conv_features_from_turns(tf_mat).write.mode("overwrite").parquet(f"{args.output}/conv_features")
    print("conv_features", spark.read.parquet(f"{args.output}/conv_features").count())
    spark.stop()


if __name__ == "__main__":
    main()
