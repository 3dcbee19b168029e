"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; decode/
feature-extraction run as Arrow-batched ``mapInPandas`` kernels.

Codec strategy (real, not stubbed, for PNG): ``decode_image`` uses PIL when
importable (any format) and otherwise falls back to a built-in pure-numpy PNG
codec (8-bit gray/GA/RGB/RGBA, non-interlaced — decode, encode, and
nearest-neighbor resample below, stdlib ``zlib`` only). Payloads that decode
get REAL content features and real resampled-PNG resize output; payloads in
formats with no available codec (e.g. JPEG without PIL) degrade per-row to
the documented deterministic stand-ins so the pipeline shape never breaks.

At scale: payloads dominate bytes → keep them OUT of shuffles. Kernels are
applied before any wide transformation, and feature outputs (small, fixed
width) are what flows downstream; `spark.sql.files.maxPartitionBytes` governs
scan granularity, not row counts.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples per pixel


def _png_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        length = int.from_bytes(data[pos : pos + 4], "big")
        ctype = data[pos + 4 : pos + 8]
        yield ctype, data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # 4 len + 4 type + data + 4 crc
        if ctype == b"IEND":
            break


def decode_png(data: bytes) -> np.ndarray:
    """Pure-numpy PNG decoder (stdlib zlib): 8-bit depth, color types
    0/2/4/6, non-interlaced. Returns (H, W, C) uint8. Filters per the PNG
    spec; uint8 numpy arithmetic wraps mod 256 exactly as required."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    width = height = channels = None
    interlace = depth = 0
    idat: list[bytes] = []
    for typ, chunk in _png_chunks(data):
        if typ == b"IHDR":
            width = int.from_bytes(chunk[0:4], "big")
            height = int.from_bytes(chunk[4:8], "big")
            depth, color, _comp, _filt, interlace = chunk[8:13]
            channels = _PNG_CHANNELS.get(color)
        elif typ == b"IDAT":
            idat.append(chunk)
    if width is None or not idat:
        raise ValueError("malformed PNG (missing IHDR/IDAT)")
    if depth != 8 or channels is None or interlace:
        raise NotImplementedError(
            "built-in PNG decoder supports 8-bit gray/GA/RGB/RGBA, "
            "non-interlaced (install PIL for other variants)"
        )
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        flt = raw[pos]
        cur = np.frombuffer(raw, np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if flt == 1:  # Sub: Recon(x) = Raw(x) + Recon(x-bpp) — a per-channel
            # prefix sum mod 256, fully vectorized (no per-byte Python)
            px = np.cumsum(cur.reshape(width, channels).astype(np.int64), axis=0)
            cur = (px & 0xFF).astype(np.uint8).reshape(stride)
        elif flt == 2:  # Up
            cur += prev
        elif flt == 3:  # Average — sequential in x by spec (left depends on
            # the previous RECON pixel); channels vectorized per step
            px = cur.reshape(width, channels).astype(np.int64)
            pv = prev.reshape(width, channels).astype(np.int64)
            left = np.zeros(channels, dtype=np.int64)
            for x in range(width):
                left = (px[x] + ((left + pv[x]) >> 1)) & 0xFF
                px[x] = left
            cur = px.astype(np.uint8).reshape(stride)
        elif flt == 4:  # Paeth — sequential in x; channels vectorized
            px = cur.reshape(width, channels).astype(np.int64)
            pv = prev.reshape(width, channels).astype(np.int64)
            a = np.zeros(channels, dtype=np.int64)
            c = np.zeros(channels, dtype=np.int64)
            for x in range(width):
                b = pv[x]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
                a = (px[x] + pred) & 0xFF
                px[x] = a
                c = b
            cur = px.astype(np.uint8).reshape(stride)
        elif flt != 0:
            raise ValueError(f"unknown PNG filter {flt}")
        out[y] = cur
        prev = cur
    return out.reshape(height, width, channels)


def encode_png(arr: np.ndarray) -> bytes:
    """Pure-zlib PNG encoder (filter 0 rows, 8-bit): (H, W[, C]) uint8 →
    PNG bytes; C ∈ {1, 2, 3, 4} maps to gray/GA/RGB/RGBA."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body))
        )

    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_nearest(arr: np.ndarray, w: int, h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample via index maps (PIL NEAREST
    convention: source index = floor((i + 0.5) * src/dst))."""
    src_h, src_w = arr.shape[:2]
    ys = np.minimum(((np.arange(h) + 0.5) * src_h / h).astype(np.int64), src_h - 1)
    xs = np.minimum(((np.arange(w) + 0.5) * src_w / w).astype(np.int64), src_w - 1)
    return arr[ys][:, xs]


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an (H, W, C) uint8 array.

    PIL when importable (any format it knows); otherwise the built-in
    pure-numpy codecs — PNG (all five row filters) and baseline JPEG
    (SOF0/SOF1 + Huffman, operators/jpeg.py). Anything else (WebP,
    progressive JPEG, ...) raises NotImplementedError and the calling
    kernels degrade to the deterministic stand-in path."""
    try:
        from io import BytesIO

        from PIL import Image  # type: ignore[import-not-found]

        img = Image.open(BytesIO(payload))
        if img.mode not in ("L", "LA", "RGB", "RGBA"):
            # Normalize exotic modes to 8-bit so downstream kernels (which
            # assume uint8 0-255) never silently mis-scale: 16/32-bit gray
            # maps high byte → 8-bit; palette/CMYK/etc. convert via PIL
            # (palette transparency promotes to RGBA).
            if img.mode in ("I", "I;16", "I;16B", "I;16L", "F"):
                wide = np.asarray(img)
                if wide.dtype == np.uint16:
                    arr = (wide >> 8).astype(np.uint8)
                else:
                    arr = np.clip(wide, 0, 255).astype(np.uint8)
                return arr[:, :, None]
            has_alpha = "A" in img.mode or (
                img.mode == "P" and "transparency" in img.info
            )
            img = img.convert("RGBA" if has_alpha else "RGB")
        arr = np.asarray(img)
        return arr[:, :, None] if arr.ndim == 2 else arr
    except ImportError:
        pass
    if payload[:8] == PNG_MAGIC:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from nebula_importer_spark.operators.jpeg import decode_jpeg

        arr = decode_jpeg(payload)  # NotImplementedError on progressive
        return arr[:, :, None] if arr.ndim == 2 else arr
    raise NotImplementedError(
        "no codec for this payload format in this environment "
        "(built-in codecs handle PNG and baseline JPEG; install PIL for "
        "WebP / progressive JPEG etc.)"
    )


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a decoded-content feature vector (payloads
    with no available codec): sha256 of the payload expanded to FEATURE_DIM
    floats in [0,1)."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (raw % 10_000).astype(np.float32) / 10_000.0


def _pixel_feature(arr: np.ndarray) -> np.ndarray:
    """Real decoded-content feature: 4 grayscale moments (mean/std/min/max,
    /255) + a 12-bin grayscale density histogram — FEATURE_DIM floats,
    deterministic given pixels."""
    gray = arr[:, :, :3].mean(axis=2) if arr.shape[2] >= 3 else arr[:, :, 0].astype(np.float64)
    stats = np.array(
        [gray.mean(), gray.std(), gray.min(), gray.max()], dtype=np.float64
    ) / 255.0
    hist, _ = np.histogram(gray, bins=FEATURE_DIM - 4, range=(0.0, 255.0))
    dens = hist.astype(np.float64) / max(gray.size, 1)
    return np.concatenate([stats, dens]).astype(np.float32)


def _feature(payload: bytes) -> np.ndarray:
    try:
        return _pixel_feature(decode_image(payload or b""))
    except Exception:  # no codec for this format → deterministic stand-in
        return _fake_feature(payload)


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Batches arrive as pandas DataFrames with ``bytes`` cells; output is a
    fixed-width float vector per asset — real pixel statistics when the
    payload decodes (PNG always; any PIL format when PIL is present), the
    deterministic sha-expansion stand-in otherwise.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            feats = [_feature(p).tolist() for p in payloads]
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
    """Deterministic stand-in for decode→resample→encode when the payload
    has no available codec: a sha256 keystream of the source payload, one
    byte per target pixel."""
    n = max(w * h, 1)
    seed = hashlib.sha256(payload or b"").digest()
    return bytes((seed * (n // len(seed) + 1))[:n])


def _resized(payload: bytes, w: int, h: int) -> bytes:
    try:
        arr = decode_image(payload or b"")
    except Exception:  # no codec for this format → deterministic stand-in
        return _fake_resized(payload, w, h)
    return encode_png(resize_nearest(arr, w, h))


def resize_images(assets: DataFrame, max_w: int = 16, max_h: int = 16) -> DataFrame:
    """Resize plumbing for image assets: aspect-preserving fit into
    (max_w, max_h), never upscaling.

    The geometry (scale factor, floor-clamped target dims) is pure JVM
    arithmetic on the metadata columns — no payload bytes touched until the
    kernel. The Arrow kernel then runs decode → nearest-neighbor resample →
    PNG encode for payloads with an available codec (PNG built-in; any PIL
    format when PIL is importable) and degrades per-row to the deterministic
    one-byte-per-target-pixel stand-in for codec-less formats, so schema,
    batch shape, and metadata propagation hold on every row."""
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
                        _resized(p, int(w), int(h))
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


PHASH_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("decoded", T.BooleanType()),
        T.StructField("ahash", T.LongType()),
        T.StructField("dhash", T.LongType()),
    ]
)


def _gray_8x9(arr: "np.ndarray") -> "np.ndarray":
    """Luma (integer Rec.601-ish weights /256) + nearest resample to
    the 9×8 grid both perceptual hashes read — all integer ops, so the
    hash is deterministic on any platform (no float rounding)."""
    h, w, c = arr.shape
    if c >= 3:
        gray = (
            299 * arr[:, :, 0].astype(np.int64)
            + 587 * arr[:, :, 1].astype(np.int64)
            + 114 * arr[:, :, 2].astype(np.int64)
        ) // 1000
    else:
        gray = arr[:, :, 0].astype(np.int64)
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(9) * w) // 9
    return gray[np.ix_(ys, xs)]


def _phash_pair(payload: bytes) -> tuple[bool, int, int]:
    """(decoded, ahash64, dhash64) — aHash: 8×8 mean-threshold bits;
    dHash: 8×8 left>right gradient bits over the 9×8 grid. Integer
    mean via floor div (stated: the exactness contract)."""
    try:
        arr = decode_image(payload)
    except Exception:
        # no codec for this format OR a corrupt payload of a known
        # format (e.g. a truncated JPEG raising JpegError) → the
        # deterministic stand-in, flagged undecoded — same broad-degrade
        # contract as _feature/_resized
        d = hashlib.sha256(payload or b"").digest()
        a = int.from_bytes(d[:8], "big") & (2**63 - 1)
        b = int.from_bytes(d[8:16], "big") & (2**63 - 1)
        return False, a, b
    g = _gray_8x9(arr)
    block = g[:, :8]
    mean = int(block.sum()) // 64
    abits = 0
    dbits = 0
    for r in range(8):
        for cc in range(8):
            abits = (abits << 1) | (1 if block[r, cc] > mean else 0)
            dbits = (dbits << 1) | (1 if g[r, cc] > g[r, cc + 1] else 0)
    # keep in signed int64 range: drop to 63 bits (top-left bit of each
    # hash is sacrificed — identical on both sides of any comparison)
    return True, abits & (2**63 - 1), dbits & (2**63 - 1)


def perceptual_hashes(assets: DataFrame) -> DataFrame:
    """Perceptual image hashes for near-duplicate detection — the
    image-side analog of simhash_pairs: aHash (mean-threshold) and
    dHash (gradient) 64-bit signatures whose Hamming distance survives
    re-encoding, minor crops, and brightness shifts that break the
    exact sha256 dedup (multimodal hash audit). Arrow-batched
    mapInPandas, map-only — payloads never shuffle; downstream
    candidate generation is the SimHash pigeonhole block join
    (operators/dedup.py:simhash_pairs machinery) on the fixed-width
    hash, not an all-pairs pass.

    All-integer kernel (integer luma, floor-div mean, nearest
    resample): the hashes are bit-identical on any platform — the same
    exactness contract as every signature in this repo. Payloads with
    no available codec get a flagged (``decoded = false``)
    deterministic sha-derived stand-in so the plumbing stays testable
    in codec-less environments (the decode_image degrade path,
    documented there).
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [_phash_pair(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "decoded": [r[0] for r in rows],
                    "ahash": [r[1] for r in rows],
                    "dhash": [r[2] for r in rows],
                }
            )

    return assets.select("asset_id", "kind", "payload").mapInPandas(
        kernel, PHASH_SCHEMA
    )
