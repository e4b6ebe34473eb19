"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

The Spark-side plumbing (schemas, batch iteration, partition sizing,
column pruning of the heavy binary column) is real and tested; the actual
codec step is STUBBED — image/audio libraries are not in this container —
behind ``decoder=`` injection points. The default decoder is a
deterministic fake (content-hash-seeded) so tests are reproducible; pass a
real decoder (PIL/librosa/av) in production.

Scale notes baked into the design:
- the binary column never enters a shuffle: features are extracted
  map-side (``mapInPandas``) and only the small feature columns continue,
- Arrow batch size bounds worker memory (binary payloads can be MBs/row —
  set ``spark.sql.execution.arrow.maxRecordsPerBatch`` accordingly),
- metadata is a flat struct, filterable/prunable without touching bytes.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
import pyspark.sql.types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        # sha256 over the UPPERCASE hex encoding of the payload — an
        # injective fingerprint a SQL oracle can reproduce (DuckDB digests
        # accept VARCHAR only: sha256(hex(payload)))
        T.StructField("payload_digest", T.StringType(), False),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ts_s", T.DoubleType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def fake_image_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image decoder: a content-seeded
    8×8 luma plane. Replace with PIL/cv2 in production.

    A real decoder would::

        raise NotImplementedError("install pillow and pass decoder=pil_decode")
    """
    seed = int.from_bytes(hashlib.sha256(payload or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8)).astype(np.float64)


def image_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = fake_image_decode,
    embed_dim: int = 16,
) -> DataFrame:
    """Per-image features: byte stats + decoded-plane stats + a
    deterministic pseudo-embedding. Binary column consumed map-side only."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # byte-level columns vectorize over the batch; only the decode
            # step (inherently per-object) loops
            payloads = [(p or b"") for p in pdf["payload"]]
            digests = [hashlib.sha256(p).hexdigest() for p in payloads]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": np.fromiter((len(p) for p in payloads), dtype="int64", count=len(payloads)),
                    "sha256": digests,
                    "payload_digest": [
                        hashlib.sha256(p.hex().upper().encode()).hexdigest() for p in payloads
                    ],
                    "mean_luma": [float(decoder(p).mean()) for p in payloads],
                    "embedding": [
                        np.random.default_rng(int(d[:8], 16))
                        .standard_normal(embed_dim)
                        .astype(np.float32)
                        .tolist()
                        for d in digests
                    ],
                }
            )
            yield out[[f.name for f in IMAGE_FEATURES_SCHEMA.fields]]

    pruned = media.where(media.kind == "image").select(
        "media_id", "payload"
    )
    return pruned.mapInPandas(kernel, schema=IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("pixels", T.ArrayType(T.FloatType()), False),  # row-major
    ]
)


def image_resize(
    media: DataFrame,
    out_h: int = 4,
    out_w: int = 4,
    decoder: Callable[[bytes], np.ndarray] = fake_image_decode,
) -> DataFrame:
    """Resize decoded images to (out_h, out_w) by block mean-pooling — the
    standard pre-embedding normalization step. Decode is the injectable
    stub; the pooling is real vectorized numpy; output is a flat row-major
    pixel array (small, shuffle-safe) — the binary payload never leaves
    the map side."""

    def pool(plane: np.ndarray) -> np.ndarray:
        h, w = plane.shape
        ys = np.linspace(0, h, out_h + 1).astype(int)
        xs = np.linspace(0, w, out_w + 1).astype(int)
        return np.array(
            [
                [plane[ys[i]:max(ys[i + 1], ys[i] + 1), xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
                 for j in range(out_w)]
                for i in range(out_h)
            ],
            dtype=np.float32,
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "out_h": out_h,
                    "out_w": out_w,
                    "pixels": [
                        pool(decoder(p or b"")).reshape(-1).tolist()
                        for p in pdf["payload"]
                    ],
                },
                columns=[f.name for f in RESIZE_SCHEMA.fields],
            )

    pruned = media.where(media.kind == "image").select("media_id", "payload")
    return pruned.mapInPandas(kernel, schema=RESIZE_SCHEMA)


def frame_sample(
    media: DataFrame,
    every_s: float = 1.0,
    extractor: Callable[[bytes, float], bytes] | None = None,
) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp — a
    flatMap-shaped mapInPandas (rows out > rows in). The frame extractor is
    stubbed (slices of the payload hash); a real one uses pyav."""

    def fake_extract(payload: bytes, ts: float) -> bytes:
        return hashlib.sha256((payload or b"") + str(ts).encode()).digest()

    ex = extractor or fake_extract

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, duration in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_s"]
            ):
                n = max(int((duration or 0.0) // every_s), 0)
                for i in range(n):
                    ts = i * every_s
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_ts_s": ts,
                            "frame": ex(payload, ts),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA.fields])

    pruned = media.where(media.kind == "video").select("media_id", "payload", "duration_s")
    return pruned.mapInPandas(kernel, schema=FRAME_SAMPLE_SCHEMA)


def _gen_media_rows(n: int = 50, seed: int = 42) -> list[tuple]:
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=int(rng.integers(64, 4096))).astype(np.uint8))
        rows.append(
            (
                f"m{i:05d}",
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(16, 4096)) if kind == "image" else None,
                int(rng.integers(16, 4096)) if kind == "image" else None,
                float(rng.uniform(0.5, 30.0)) if kind in ("audio", "video") else None,
                16000 if kind == "audio" else None,
            )
        )
    return rows


def gen_media(spark, n: int = 50, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payloads are seeded
    noise — no external data)."""
    return spark.createDataFrame(_gen_media_rows(n, seed), schema=MEDIA_SCHEMA)


def write_media_fixture(path: str, n: int = 60, seed: int = 42) -> None:
    """Write the deterministic media table as ONE parquet file (pyarrow,
    atomic replace) so a SQL oracle can read the identical bytes."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = list(zip(*_gen_media_rows(n, seed)))
    names = [f.name for f in MEDIA_SCHEMA.fields]
    table = pa.table(
        {
            "media_id": pa.array(cols[0], pa.string()),
            "kind": pa.array(cols[1], pa.string()),
            "payload": pa.array(cols[2], pa.binary()),
            "mime": pa.array(cols[3], pa.string()),
            "width": pa.array(cols[4], pa.int32()),
            "height": pa.array(cols[5], pa.int32()),
            "duration_s": pa.array(cols[6], pa.float64()),
            "sample_rate": pa.array(cols[7], pa.int32()),
        }
    )
    assert table.column_names == names
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
