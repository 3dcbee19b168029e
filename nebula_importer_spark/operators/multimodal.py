"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; decode/
feature-extraction run as Arrow-batched ``mapInPandas`` kernels. The actual
codec step is STUBBED (no image/audio libraries in this container — clearly
marked below); everything Spark-side is real and tested: schema, batch shape,
partitioning, UDF signatures, and the deterministic fake feature path used by
the tests.

At scale: payloads dominate bytes → keep them OUT of shuffles. Kernels are
applied before any wide transformation, and feature outputs (small, fixed
width) are what flows downstream; `spark.sql.files.maxPartitionBytes` governs
scan granularity, not row counts.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

FEATURE_DIM = 16


def synth_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table (payload = seeded bytes)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        size = 64 + int(rng.randint(0, 192))
        rows.append(
            (
                i,
                kinds[i % 3],
                bytes(rng.randint(0, 256, size, dtype=np.uint8).tobytes()),
                "application/octet-stream",
                32 + i % 8,
                32 + i % 8,
                1000 + i,
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB — image decoding requires a codec library not present in this
    environment. The Spark plumbing calls `_fake_feature` instead; swap this
    in when PIL/libjpeg are available."""
    raise NotImplementedError(
        "image decode requires an image codec library (not in this container)"
    )


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a decoded-content feature vector: sha256 of
    the payload expanded to FEATURE_DIM floats in [0,1)."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw % 10_000).astype(np.float32) / 10_000.0


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Real plumbing: batches arrive as pandas DataFrames with ``bytes`` cells;
    output is a fixed-width float vector per asset. The decode step is the
    stub above; the rest is production-shaped.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = [_fake_feature(p).tolist() for p in payloads]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b or b"")).astype("int64"),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": feats,
                }
            )

    slim = assets.select("asset_id", "kind", "payload")
    return slim.mapInPandas(kernel, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("new_width", T.IntegerType()),
        T.StructField("new_height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _fake_resized(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for decode→resample→encode: a sha256 keystream
    of the source payload, one byte per target pixel. Swapped for the real
    codec path (`decode_image` + a resampler) when a codec library exists."""
    n = max(w * h, 1)
    seed = hashlib.sha256(payload or b"").digest()
    return bytes((seed * (n // len(seed) + 1))[:n])


def resize_images(assets: DataFrame, max_w: int = 16, max_h: int = 16) -> DataFrame:
    """Resize plumbing for image assets: aspect-preserving fit into
    (max_w, max_h), never upscaling.

    The geometry (scale factor, floor-clamped target dims) is pure JVM
    arithmetic on the metadata columns — no payload bytes touched until the
    kernel. The pixel resample itself is the STUBBED codec step: the Arrow
    kernel emits a deterministic fake payload sized to the target area, so
    schema, batch shape, and metadata propagation are real and testable
    while the one genuinely-unavailable library call stays isolated."""
    scale = F.least(
        F.lit(float(max_w)) / F.col("width"),
        F.lit(float(max_h)) / F.col("height"),
        F.lit(1.0),
    )
    sized = assets.filter(F.col("kind") == "image").select(
        "asset_id",
        "payload",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1))
        .cast("int")
        .alias("new_width"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1))
        .cast("int")
        .alias("new_height"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "new_width": pdf["new_width"],
                    "new_height": pdf["new_height"],
                    "payload": [
                        _fake_resized(p, int(w), int(h))
                        for p, w, h in zip(
                            pdf["payload"], pdf["new_width"], pdf["new_height"]
                        )
                    ],
                }
            )

    return sized.mapInPandas(kernel, RESIZED_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 500) -> DataFrame:
    """Frame-sampling plumbing for video assets: emits (asset_id, frame_ts_ms)
    rows from duration metadata — pure JVM (sequence/explode); the per-frame
    decode would plug into extract_features."""
    vids = assets.filter(F.col("kind") == "video")
    return vids.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
