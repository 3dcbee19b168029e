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
