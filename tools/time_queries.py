"""Time named declared queries at $SPARK_GRAFT_SF_DIR with the noop sink,
best-of-N (default 2). Internal before/after probe — NOT the driver bench.

Usage: python tools/time_queries.py q1 q2 ...   [REPS=n env]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyppi_spark.session import build_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("REPS", "2"))


def main() -> None:
    spark = build_spark("time_queries", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    qs = entrymod.queries()
    for t in ["events", "documents", "embeddings"]:
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    # warm-up: JIT + codegen
    qs["sessionize"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    out = {}
    for name in sys.argv[1:]:
        spark.sparkContext.setJobDescription(name)
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        out[name] = min(walls)
        print(f"{name}: best {min(walls)}  runs {walls}", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
