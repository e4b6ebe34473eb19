from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from pyppi_spark.operators.multimodal import frame_sample, gen_media, image_features


def test_image_features_schema_and_determinism(spark):
    media = gen_media(spark, n=30, seed=42)
    out1 = image_features(media).orderBy("media_id").toPandas()
    out2 = image_features(media).orderBy("media_id").toPandas()
    assert len(out1) == media.where(F.col("kind") == "image").count()
    assert list(out1.columns) == ["media_id", "n_bytes", "sha256", "payload_digest", "mean_luma", "embedding"]
    assert out1["sha256"].tolist() == out2["sha256"].tolist()
    assert out1["mean_luma"].tolist() == out2["mean_luma"].tolist()
    assert all(len(e) == 16 for e in out1["embedding"])


def test_image_features_hash_matches_payload(spark):
    media = gen_media(spark, n=9, seed=1)
    payloads = {
        r["media_id"]: bytes(r["payload"])
        for r in media.where(F.col("kind") == "image").collect()
    }
    out = image_features(media).collect()
    for r in out:
        assert r["sha256"] == hashlib.sha256(payloads[r["media_id"]]).hexdigest()


def test_frame_sample_rowcounts(spark):
    media = gen_media(spark, n=30, seed=42)
    frames = frame_sample(media, every_s=2.0)
    pdf = frames.toPandas()
    durations = {
        r["media_id"]: r["duration_s"]
        for r in media.where(F.col("kind") == "video").collect()
    }
    counts = pdf.groupby("media_id").size().to_dict()
    for mid, dur in durations.items():
        expect = max(int(dur // 2.0), 0)
        assert counts.get(mid, 0) == expect
    # frame payloads are deterministic digests
    assert pdf["frame"].map(lambda b: len(bytes(b))).eq(32).all()


def test_binary_column_pruned_from_plan(spark):
    """The heavy payload column must not survive past the mapInPandas —
    downstream plans see only feature columns."""
    media = gen_media(spark, n=9, seed=2)
    feats = image_features(media).select("media_id", "mean_luma")
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in feats.columns
    assert "mean_luma" in plan


def test_image_resize_block_pooling(spark):
    import numpy as np
    from pyppi_spark.operators.multimodal import gen_media, image_resize, fake_image_decode

    media = gen_media(spark, n=9, seed=7)
    out = image_resize(media, out_h=4, out_w=4).toPandas()
    assert len(out) == media.where("kind = 'image'").count()
    assert all(len(p) == 16 for p in out.pixels)
    # pooling preserves the global mean of the decoded 8x8 plane (equal
    # 2x2 blocks), and is deterministic per payload
    payloads = {r["media_id"]: r["payload"] for r in media.collect() if r["kind"] == "image"}
    for _, r in out.iterrows():
        plane = fake_image_decode(payloads[r["media_id"]])
        assert abs(np.mean(r.pixels) - plane.mean()) < 1e-4


def test_pipe_transform_external_process(spark):
    """S4 external-process transform: rows piped through a real subprocess
    (sed) per partition, one line per record, writer-thread protocol."""
    import pytest
    from pyspark.sql import functions as F
    from pyppi_spark.operators.external import pipe_transform

    docs = spark.createDataFrame(
        [(0, "alpha and banana"), (1, "no vowels? ha"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    out = pipe_transform(docs, ["sed", "s/a/A/g"], out_col="up")
    got = {r.doc_id: r.up for r in out.collect()}
    assert got[0] == "AlphA And bAnAnA"
    assert got[1] == "no vowels? hA"
    assert got[2] == "" and got[3] == ""  # NULL crosses as empty line
    # newline rejection and strip modes
    bad = spark.createDataFrame([(0, "two\nlines")], "doc_id long, text string")
    with pytest.raises(Exception, match="newline"):
        pipe_transform(bad, ["cat"]).collect()
    stripped = pipe_transform(bad, ["cat"], on_newline="strip").collect()
    assert stripped[0].piped == "two lines"
    # child violating one-line-per-record contract is caught (awk drops
    # the first line but exits 0; single partition so the shortfall is
    # guaranteed)
    with pytest.raises(Exception, match="one-line-per-record"):
        pipe_transform(docs.coalesce(1), ["awk", "NR>1"]).collect()
    # failing child surfaces its exit code
    with pytest.raises(Exception, match="exited"):
        pipe_transform(docs, ["false"]).collect()


def test_stream_pipe_bounded_feed_ahead():
    """The pipe protocol is streaming, not materialize-then-feed: with a
    bounded hand-off queue the first OUTPUT batch is yielded long before
    the source iterator is exhausted — peak memory is O(queue_batches),
    not O(partition). Pure-Python test of the generator (no Spark)."""
    import pandas as pd
    from pyppi_spark.operators.external import _stream_pipe

    consumed = []

    def source(n_batches=64, rows=50):
        for i in range(n_batches):
            consumed.append(i)
            yield pd.DataFrame({"text": [f"b{i}r{j} aaaa" for j in range(rows)]})

    gen = _stream_pipe(
        source(), ["sed", "-u", "s/a/A/g"], "text", "piped",
        on_newline="error", batch_check=True, queue_batches=2,
    )
    first = next(gen)
    # writer runs at most queue_batches+2 ahead of the first yield
    assert len(consumed) <= 6, f"source over-consumed: {len(consumed)} batches"
    assert first["piped"].iloc[0] == "b0r0 AAAA"
    rest = list(gen)
    assert len(rest) == 63 and len(consumed) == 64
    assert rest[-1]["piped"].iloc[-1].startswith("b63r49")
    # block-buffered child (plain sed, no -u): same results, the
    # feed-ahead window covers its output buffering
    consumed.clear()
    out = list(_stream_pipe(
        source(), ["sed", "s/a/A/g"], "text", "piped",
        on_newline="error", batch_check=True, queue_batches=16,
    ))
    assert len(out) == 64 and out[5]["piped"].iloc[1] == "b5r1 AAAA"
    # empty partition: no subprocess, no output
    assert list(_stream_pipe(
        iter([]), ["false"], "text", "piped",
        on_newline="error", batch_check=True, queue_batches=2,
    )) == []


def test_stream_pipe_abandoned_consumer_releases_writer():
    """If the consumer abandons the generator mid-partition (task killed,
    downstream error), the writer thread must notice and exit rather than
    block forever on the full hand-off queue — reused Python workers
    would otherwise leak one blocked thread (plus its batch references)
    per failed task."""
    import threading
    import time

    import pandas as pd
    from pyppi_spark.operators.external import _stream_pipe

    def source(n=200):
        for i in range(n):
            yield pd.DataFrame({"text": [f"row {i} {j} aaaa" for j in range(50)]})

    before = threading.active_count()
    gen = _stream_pipe(
        source(), ["sed", "-u", "s/a/A/g"], "text", "p",
        on_newline="error", batch_check=True, queue_batches=2,
    )
    next(gen)
    gen.close()  # GeneratorExit -> finally -> reader_gone.set()
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= before, "writer thread leaked"


def test_stream_pipe_stall_detection():
    """A block-buffered child whose output buffer exceeds the feed-ahead
    window deadlocks the three-way wait; the stall detector converts the
    hang into a diagnostic error naming the remedies."""
    import pandas as pd
    import pytest
    from pyppi_spark.operators.external import _stream_pipe

    def tiny_batches(n=5000):
        for i in range(n):
            yield pd.DataFrame({"text": [f"r{i}"]})  # ~3 bytes per batch

    gen = _stream_pipe(
        tiny_batches(), ["sed", "s/r/R/"], "text", "p",  # plain sed: 4KB+ buffer
        on_newline="error", batch_check=True, queue_batches=1,
        stall_timeout_s=4.0,
    )
    with pytest.raises(RuntimeError, match="queue_batches"):
        list(gen)
