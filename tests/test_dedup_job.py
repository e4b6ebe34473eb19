"""End-to-end run of the dedup_corpus job entrypoint (subprocess, like a
real spark-submit): full mode over a shard, then incremental mode of a
second shard against the first run's outputs."""

from __future__ import annotations

import json
import subprocess
import sys


def _run(args):
    out = subprocess.run(
        [sys.executable, "/root/repo/jobs/dedup_corpus.py", *args],
        capture_output=True, text=True, cwd="/root/repo", timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def test_dedup_corpus_job_full_then_incremental(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    old_shard = str(tmp_path / "shard0")
    new_shard = str(tmp_path / "shard1")
    docs.where("doc_id < 30").write.parquet(old_shard)
    # the new shard overlaps the old one (ids 20-29 duplicated content)
    # plus brings fresh docs
    docs.where("doc_id >= 20 and doc_id < 60").write.parquet(new_shard)

    out0 = str(tmp_path / "run0")
    m0 = _run(["--documents", old_shard, "--output", out0, "--master", "local[4]"])
    assert m0["docs_in"] == 30 and 0 < m0["docs_kept"] <= 30
    assert m0["cap_accounting"] is not None
    assert m0["cap_accounting"]["rows_dropped"] == 0

    out1 = str(tmp_path / "run1")
    m1 = _run([
        "--documents", new_shard, "--output", out1, "--mode", "incremental",
        "--history-keys", f"{out0}/content_keys",
        "--old-documents", f"{out0}/documents_kept",
        "--master", "local[4]",
    ])
    # the 10 overlapping docs (20-29) are exact dups of history -> dropped
    assert m1["docs_in"] == 40
    assert m1["docs_kept"] <= 30
    kept = spark.read.parquet(f"{out1}/documents_kept")
    assert kept.where("doc_id < 30").count() == 0  # no history doc resurfaces
    # the key table grew: history keys + new survivors
    k0 = spark.read.parquet(f"{out0}/content_keys").count()
    k1 = spark.read.parquet(f"{out1}/content_keys").count()
    assert k1 >= k0 + m1["docs_kept"] - 1


def test_dedup_corpus_job_simhash_strategy(spark, tmp_path):
    """The SimHash family through the production entrypoint: exact dups
    collapse, the Hamming-ball pairs feed representatives, metrics report
    the near stage ran with cap accounting present."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    shard = str(tmp_path / "shard")
    docs.where("doc_id < 40").write.parquet(shard)
    out = str(tmp_path / "out")
    m = _run([
        "--documents", shard, "--output", out,
        "--strategy", "simhash", "--max-hamming", "6",
        "--master", "local[4]",
    ])
    assert m["strategy"] == "simhash" and m["near_stage_ran"] is True
    assert 0 < m["docs_kept"] <= m["docs_in"] == 40
    assert m["cap_accounting"] is not None
    assert spark.read.parquet(f"{out}/documents_kept").count() == m["docs_kept"]
