"""Pure-numpy baseline JPEG (ITU-T T.81, SOF0 + Huffman) codec.

Closes the multimodal family's non-PNG boundary for the dominant real
format: the container ships no PIL, so ``decode_image`` previously
degraded every JPEG payload to the deterministic stand-in. This module
implements the BOUNDED scope the format's baseline profile defines —
sequential DCT (SOF0), 8-bit samples, Huffman entropy coding, grayscale
or YCbCr with 4:4:4 / 4:2:2 / 4:2:0 sampling, restart markers — and
fails loudly (``NotImplementedError``) on progressive (SOF2),
arithmetic-coded, or 12-bit streams, which keeps the honest-degrade
contract of operators/multimodal.py intact for the exotic tail.

All table data (Annex K quantization matrices, the "typical" Huffman
tables, the zigzag order) is normative public spec content. The DCT is
the exact orthonormal 8×8 matrix product (``M.T @ C @ M``), vectorized
over every block in the image at once; only the entropy coding is a
sequential bit loop (it is sequential by construction — each Huffman
code's length depends on the previous decode). Payloads at the
multimodal operators' scale are thumbnails riding in an Arrow batch, so
the Python-loop entropy stage is bounded by payload size, not corpus
size — corpus-scale parallelism comes from mapInPandas partitioning in
operators/multimodal.py, same as the PNG path.

The encoder exists to round-trip-test the decoder without any external
codec (no PIL anywhere in the container): encode a known raster with
the spec's example tables, decode it back, and bound the error by the
quantization step — plus decode-only goldens over real-world baseline
files checked into tests/data/.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Normative spec tables (ITU-T T.81 Annex K) — public standard content.
# ---------------------------------------------------------------------------

#: zigzag index of each (row-major) coefficient position
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K "typical" Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list).
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix M: spatial = M.T @ coeff @ M."""
    k = np.arange(8)
    M = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) / 2.0
    M[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return M


_DCT_M = _dct_matrix()


class JpegError(ValueError):
    pass


# ---------------------------------------------------------------------------
# Huffman machinery
# ---------------------------------------------------------------------------


def _build_decode_table(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(code_length, code) -> symbol, per T.81 C.2 canonical assignment."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, code_length)."""
    return {
        sym: (code, length)
        for (length, code), sym in _build_decode_table(bits, huffval).items()
    }


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 de-stuffing;
    stops at any non-RST marker (leaving it for the segment parser)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.marker is not None:
                self.cur = (self.cur << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            if self.pos >= len(d):
                raise JpegError("truncated JPEG entropy stream")
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.cur = ((self.cur << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.cur >> self.nbits) & ((1 << n) - 1)

    def read_code(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code in JPEG stream")

    def restart(self) -> None:
        """Consume an RSTn marker and byte-align (T.81 E.2.4)."""
        self.cur = 0
        self.nbits = 0
        if self.marker is None:
            # marker not yet reached in byte stream — scan to it
            self._fill_to_marker()
        if not (self.marker is not None and 0xD0 <= self.marker <= 0xD7):
            raise JpegError(f"expected RST marker, found {self.marker!r}")
        self.pos += 2
        self.marker = None

    def _fill_to_marker(self) -> None:
        d = self.data
        while self.pos < len(d):
            if d[self.pos] == 0xFF and self.pos + 1 < len(d) and d[self.pos + 1] != 0x00:
                self.marker = d[self.pos + 1]
                return
            self.pos += 1
        raise JpegError("truncated JPEG stream while seeking marker")


def _extend(value: int, nbits: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the received magnitude bits to a signed
    coefficient."""
    if nbits == 0:
        return 0
    if value < (1 << (nbits - 1)):
        return value - (1 << nbits) + 1
    return value


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 array, ``(H, W)`` for grayscale or
    ``(H, W, 3)`` RGB. Raises :class:`JpegError` on malformed streams and
    ``NotImplementedError`` on non-baseline profiles (progressive SOF2,
    arithmetic coding, 12-bit precision, >2× sampling factors)."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise JpegError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (H, W, [(cid, h, v, tq), ...])

    while pos < len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at offset {pos}")
        # legal fill bytes: any run of 0xFF before the marker code
        # (T.81 B.1.1.2) — skip to the last 0xFF of the run
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                qtables[tq] = np.frombuffer(
                    body[i + 1:i + 65], dtype=np.uint8
                ).astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                huffval = list(body[i + 17:i + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, huffval)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0 / SOF1 (both sequential DCT)
            prec, H, W, nf = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            comps = []
            for c in range(nf):
                cid = body[6 + 3 * c]
                hv = body[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, body[8 + 3 * c]))
            frame = (H, W, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker FF{marker:02X}: progressive/"
                "arithmetic/hierarchical) — baseline SOF0/SOF1 only"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs = body[1 + 2 * c]
                tdta = body[2 + 2 * c]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            return _decode_scan(
                data, pos + seglen, frame, scan, qtables, htables,
                restart_interval,
            )
        pos += seglen
    raise JpegError("no SOS segment in JPEG stream")


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    H, W, comps = frame
    if len(scan) != len(comps):
        raise NotImplementedError("multi-scan (non-interleaved) baseline JPEG")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors beyond 2x2")
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    by_id = {cid: (h, v, tq) for cid, h, v, tq in comps}

    reader = _BitReader(data, pos)
    # per-component coefficient planes in block units
    planes = {}
    for cid, h, v, tq in comps:
        planes[cid] = np.zeros((mcuy * v, mcux * h, 64), dtype=np.int64)
    pred = {cid: 0 for cid, _, _, _ in comps}

    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.restart()
                pred = {cid: 0 for cid in pred}
            for cs, td, ta in scan:
                h, v, tq = by_id[cs]
                dc_tab = htables.get((0, td))
                ac_tab = htables.get((1, ta))
                if dc_tab is None or ac_tab is None:
                    raise JpegError("missing Huffman table for scan")
                for bv in range(v):
                    for bh in range(h):
                        coeffs = planes[cs][my * v + bv, mx * h + bh]
                        t = reader.read_code(dc_tab)
                        diff = _extend(reader.read(t), t)
                        pred[cs] += diff
                        coeffs[0] = pred[cs]
                        k = 1
                        while k < 64:
                            rs = reader.read_code(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise JpegError("AC run past block end")
                            coeffs[k] = _extend(reader.read(s), s)
                            k += 1
            mcu_count += 1

    # dequantize + inverse zigzag + IDCT, vectorized over all blocks
    out_planes = {}
    for cid, h, v, tq in comps:
        q = qtables.get(tq)
        if q is None:
            raise JpegError(f"missing quantization table {tq}")
        zz = planes[cid] * q[None, None, :]
        blocks = np.zeros_like(zz)
        blocks[:, :, ZIGZAG] = zz  # inverse zigzag
        nby, nbx, _ = blocks.shape
        b = blocks.reshape(nby, nbx, 8, 8).astype(np.float64)
        spatial = np.einsum("ij,yxjk,kl->yxil", _DCT_M.T, b, _DCT_M)
        # assemble plane: (nby*8, nbx*8)
        plane = spatial.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        plane = np.clip(np.round(plane) + 128, 0, 255)
        # upsample to full MCU-grid resolution then crop
        plane = np.repeat(np.repeat(plane, vmax // v, axis=0), hmax // h, axis=1)
        out_planes[cid] = plane[:H, :W]

    if len(comps) == 1:
        return out_planes[comps[0][0]].astype(np.uint8)
    y, cb, cr = (out_planes[c[0]] for c in comps)
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Encoder (4:4:4 or grayscale, Annex K tables) — exists to round-trip-test
# the decoder with zero external codecs.
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.cur = (self.cur << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.cur >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (category nbits, magnitude bits per T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    bits = v if v > 0 else v + (1 << n) - 1
    return n, bits


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of a base table (public
    formula: scale = 5000/q below 50, 200-2q above)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


def encode_jpeg(
    arr: np.ndarray, quality: int = 85, restart_interval: int = 0
) -> bytes:
    """uint8 ``(H, W)`` grayscale or ``(H, W, 3)`` RGB → baseline JPEG
    bytes (SOF0, 4:4:4, Annex K Huffman tables; ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that-many MCUs — used to
    exercise the decoder's restart path)."""
    arr = np.asarray(arr)
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise JpegError("encode_jpeg needs a uint8 (H,W) or (H,W,3) array")
    gray = arr.ndim == 2
    H, W = arr.shape[:2]
    if H == 0 or W == 0:
        raise JpegError("empty image")

    if gray:
        planes = [arr.astype(np.float64)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        planes = [y, cb, cr]

    ql = _scale_quant(_QUANT_LUMA, quality)
    qc = _scale_quant(_QUANT_CHROMA, quality)
    qts = [ql] if gray else [ql, qc]

    dc_enc = [_build_encode_table(*_DC_LUMA), _build_encode_table(*_DC_CHROMA)]
    ac_enc = [_build_encode_table(*_AC_LUMA), _build_encode_table(*_AC_CHROMA)]

    # --- headers --------------------------------------------------------
    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    # DQT stores the table in zigzag order: entry k is the quantizer for
    # zigzag position k, i.e. base-table index ZIGZAG[k]
    for i, qt in enumerate(qts):
        zz = bytes(int(qt[ZIGZAG[k]]) for k in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([i]) + zz
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, H, W, ncomp)
    for c in range(ncomp):
        out += bytes([c + 1, 0x11, 0 if c == 0 else 1])
    for tc, tabs in ((0, (_DC_LUMA, _DC_CHROMA)), (1, (_AC_LUMA, _AC_CHROMA))):
        for th in range(1 if gray else 2):
            bits, huffval = tabs[th]
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(huffval)) + bytes(
                [(tc << 4) | th]
            ) + bytes(bits) + bytes(huffval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for c in range(ncomp):
        out += bytes([c + 1, 0x00 if c == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0

    # --- entropy-coded data --------------------------------------------
    nby, nbx = -(-H // 8), -(-W // 8)
    # pad planes to block multiples by edge replication
    padded = []
    for p in planes:
        pp = np.pad(p, ((0, nby * 8 - H), (0, nbx * 8 - W)), mode="edge")
        padded.append(pp)
    # forward DCT + quantize, vectorized per plane
    quantized = []
    for ci, p in enumerate(padded):
        blocks = p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3) - 128.0
        coeff = np.einsum("ij,yxjk,kl->yxil", _DCT_M, blocks, _DCT_M.T)
        qt = qts[min(ci, len(qts) - 1)]
        zz = coeff.reshape(nby, nbx, 64)[:, :, ZIGZAG]
        # zz[k] is the coefficient at natural position ZIGZAG[k], so its
        # quantizer is qt[ZIGZAG[k]] — exactly what the emitted DQT
        # declares for zigzag slot k (dividing by qt[k] would scale ACs
        # by the wrong step; caught by the noise round-trip test)
        quantized.append(
            np.round(zz / qt[ZIGZAG][None, None, :]).astype(np.int64)
        )

    w = _BitWriter()
    pred = [0] * ncomp
    mcu = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                w.flush()
                out_rst = 0xD0 + ((mcu // restart_interval - 1) % 8)
                w.out += bytes([0xFF, out_rst])
                pred = [0] * ncomp
            mcu += 1
            for ci in range(ncomp):
                tsel = min(ci, 1)
                coeffs = quantized[ci][by, bx]
                diff = int(coeffs[0]) - pred[ci]
                pred[ci] = int(coeffs[0])
                n, bits = _magnitude(diff)
                code, length = dc_enc[tsel][n]
                w.write(code, length)
                if n:
                    w.write(bits, n)
                run = 0
                for k in range(1, 64):
                    v = int(coeffs[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_enc[tsel][0xF0]
                        w.write(code, length)
                        run -= 16
                    n, bits = _magnitude(v)
                    code, length = ac_enc[tsel][(run << 4) | n]
                    w.write(code, length)
                    w.write(bits, n)
                    run = 0
                if run:
                    code, length = ac_enc[tsel][0x00]
                    w.write(code, length)
    w.flush()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
