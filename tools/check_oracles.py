"""Local stand-in for the driver's correctness gate: run every
``__spark_entry__.queries()`` entry and its DuckDB oracle at sf0.01,
compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from pyppi_spark.session import build_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            df[c] = df[c].where(df[c].notna(), None).astype(str)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(want):
        problems.append(f"rowcount {len(got)} != {len(want)}")
        return problems
    if sorted(got.columns) != sorted(want.columns):
        problems.append(f"columns {sorted(got.columns)} != {sorted(want.columns)}")
        return problems
    g, w = normalize(got), normalize(want)
    for c in g.columns:
        if g[c].dtype.kind == "f":
            # EXACT bitwise equality — the driver gate hashes values, so any
            # ULP difference is a failure there; tolerate nothing here either
            a, b = g[c].to_numpy(), w[c].astype("float64").to_numpy()
            eq = (a == b) | (np.isnan(a) & np.isnan(b))
            if not eq.all():
                bad = np.where(~eq)[0][:3]
                problems.append(f"col {c}: {(~eq).sum()} diffs, e.g. {a[bad]} vs {b[bad]}")
        else:
            if not g[c].equals(w[c].astype(g[c].dtype)):
                mism = (g[c] != w[c]).to_numpy().nonzero()[0][:3]
                problems.append(f"col {c}: diffs at {mism}: {g[c].iloc[mism].tolist()} vs {w[c].iloc[mism].tolist()}")
    return problems


def main() -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    spark = build_spark("check_oracles", master="local[8]", shuffle_partitions=8)

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    only = sys.argv[1:] or list(qs)
    for name in only:
        fn = qs[name]
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in osql:
            print(f"rows  {name}: {len(got)} rows (no oracle — rows-only)")
            continue
        try:
            want = con.sql(osql[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, got, want)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            print(f"OK    {name}: {len(got)} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
