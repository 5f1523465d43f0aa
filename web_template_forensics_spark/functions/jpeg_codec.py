"""Dependency-free JPEG codec (pure numpy + stdlib).

Like functions/png_codec.py (round 5), this closes an honestly-stubbed
codec seam without new dependencies: DCT JPEG (ITU-T T.81 / JFIF)
encode AND decode in numpy. The reference repo has no image path at
all — this backs the multimodal graft surface
(operators/multimodal.py decode_image), whose 100 TB plumbing was
already real; now JPEG payloads decode for real too.

Scope (asserted, not implied):
  * encode: 8-bit greyscale or RGB, 4:4:4 (no subsampling), standard
    Annex-K quantization tables scaled by the IJG quality formula,
    standard Annex-K Huffman tables, optional restart intervals;
    interleaved, one-scan-per-component, or PROGRESSIVE (SOF2,
    libjpeg-style DC/AC spectral-selection + successive-approximation
    scan script) layouts.
  * decode: baseline SOF0/SOF1 and progressive SOF2 (all four scan
    kinds: DC/AC first/refinement with EOBn end-of-band runs), 8-bit,
    1- or 3-component, arbitrary sampling factors up to 2x2
    (replication upsample), interleaved and non-interleaved multi-scan
    layouts, multi-table DQT/DHT segments, 16-bit quant precision,
    DRI/RSTn restart markers, 0xFF00 byte unstuffing.

The tables are written into DQT/DHT segments, so encoder and decoder
are self-consistent by construction; _validate_tables() additionally
pins at import time that the Huffman tables are canonical-valid and
cover every symbol the encoder can emit (12 DC categories; all 162
baseline AC symbols).
"""

from __future__ import annotations

import struct
from collections import OrderedDict

import numpy as np

JPEG_SOI = b"\xff\xd8"


class JpegFormatError(ValueError):
    pass


# ---------------------------------------------------------------- tables

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

# ITU-T T.81 Annex K.1 example quantization tables (the de-facto
# standard ones every encoder ships), natural (row-major) order.
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K.3 Huffman specifications: (bits[1..16], huffval). These travel
# in the DHT segment, so round-trip correctness never depends on them
# matching the standard byte-for-byte — but they must be VALID canonical
# tables covering every symbol we emit, which _validate_tables() pins.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_LUMA_VALS = [
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
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
AC_CHROMA_VALS = [
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
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """-> {symbol: (code, length)} via T.81 C.2 canonical assignment."""
    if len(bits) != 16 or sum(bits) != len(vals):
        raise JpegFormatError("huffman spec: counts do not match values")
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        if bits[length - 1] > (1 << length) - code:
            raise JpegFormatError("huffman spec: over-full code space")
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _validate_tables() -> None:
    for bits, vals, need in (
        (DC_LUMA_BITS, DC_LUMA_VALS, set(range(12))),
        (DC_CHROMA_BITS, DC_CHROMA_VALS, set(range(12))),
        (
            AC_LUMA_BITS,
            AC_LUMA_VALS,
            {0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)},
        ),
        (
            AC_CHROMA_BITS,
            AC_CHROMA_VALS,
            {0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)},
        ),
    ):
        codes = _canonical_codes(bits, vals)
        missing = need - set(codes)
        if missing:
            raise JpegFormatError(f"huffman table missing symbols: {sorted(missing)[:5]}")
        if len(vals) != len(set(vals)):
            raise JpegFormatError("huffman table has duplicate symbols")


_validate_tables()

# orthonormal 8x8 DCT-II basis: F = C @ block @ C.T ; block = C.T @ F @ C
_n = np.arange(8)
_C = np.cos((2 * _n[None, :] + 1) * _n[:, None] * np.pi / 16) / 2.0
_C[0, :] *= 1.0 / np.sqrt(2.0)


def quant_tables_for_quality(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling (public libjpeg formula)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# ---------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _mag_bits(v: int, size: int) -> int:
    # negative values encode as value - 1 in `size` low bits (T.81 F.1.4)
    return v if v >= 0 else v + (1 << size) - 1


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) float, H,W % 8 == 0 -> (n_blocks, 8, 8) in raster order."""
    H, W = plane.shape
    return (
        plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _encode_plane_blocks(plane: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """-> (n_blocks, 64) int32 zigzagged quantized coefficients."""
    blocks = _blocks_of(plane.astype(np.float64) - 128.0)
    coef = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
    q = np.round(coef / qt[None, :, :]).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    restart_interval: int = 0,
    interleave: bool = True,
    progressive: bool = False,
) -> bytes:
    """(h, w) or (h, w, 3) uint8 -> baseline JFIF bytes (4:4:4).

    ``interleave=False`` emits one scan per component (legal baseline
    multi-scan layout) instead of the usual single interleaved scan.
    ``progressive=True`` emits SOF2 with a libjpeg-style scan script
    (DC first at Al=1, spectral-selection AC first scans, successive-
    approximation AC+DC refinement passes) — end-of-band runs are
    emitted as EOB0 only, so the standard Huffman tables suffice. The
    quantized coefficients are identical to the sequential encoding,
    so decode output is bit-identical across all three layouts."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise JpegFormatError("encode_jpeg expects (h,w)[,3] uint8")
    if img.ndim == 3 and img.shape[2] != 3:
        raise JpegFormatError("encode_jpeg expects 3 channels for color")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise JpegFormatError("empty image")
    grey = img.ndim == 2
    qt_l, qt_c = quant_tables_for_quality(quality)

    # pad to block multiples by edge replication (standard practice:
    # keeps the padded coefficients cheap and the crop exact on decode)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w)) + ((0, 0),) * (img.ndim - 2), mode="edge")

    if grey:
        planes = [padded.astype(np.float64)]
        qts = [qt_l]
    else:
        ycc = _rgb_to_ycbcr(padded)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        qts = [qt_l, qt_c, qt_c]

    coef = [_encode_plane_blocks(p, q) for p, q in zip(planes, qts)]
    n_blocks = coef[0].shape[0]

    dc_codes = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_codes = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)]
    if not grey:
        dc_codes.append(_canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS))
        ac_codes.append(_canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS))

    def _emit_entropy(comp_indices: list[int]) -> bytes:
        """Entropy-coded bytes for one scan: MCUs walk the block grid,
        each MCU holding one data unit per component in comp_indices
        (4:4:4 sampling makes the interleaved and per-component grids
        identical, so this serves both scan layouts)."""
        bw = _BitWriter()
        pred = {ci: 0 for ci in comp_indices}
        entropy = bytearray()
        rst = 0
        for b in range(n_blocks):
            if restart_interval and b and b % restart_interval == 0:
                bw.flush()
                entropy += bw.out
                entropy += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                bw = _BitWriter()
                pred = {ci: 0 for ci in comp_indices}
            for ci in comp_indices:
                tid = 0 if ci == 0 else 1
                zz = coef[ci][b]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                size = _category(diff)
                code, length = dc_codes[tid][size]
                bw.write(code, length)
                if size:
                    bw.write(_mag_bits(diff, size), size)
                run = 0
                last_nz = 0
                nz = np.nonzero(zz[1:])[0]
                last_nz = int(nz[-1]) + 1 if len(nz) else 0
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_codes[tid][0xF0]  # ZRL
                        bw.write(code, length)
                        run -= 16
                    size = _category(v)
                    code, length = ac_codes[tid][(run << 4) | size]
                    bw.write(code, length)
                    bw.write(_mag_bits(v, size), size)
                    run = 0
                if last_nz < 63:
                    code, length = ac_codes[tid][0x00]  # EOB
                    bw.write(code, length)
        bw.flush()
        entropy += bw.out
        return bytes(entropy)

    out = bytearray(JPEG_SOI)
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(qt_l.reshape(-1)[ZIGZAG].astype(np.uint8)))
    if not grey:
        out += _seg(0xDB, bytes([0x01]) + bytes(qt_c.reshape(-1)[ZIGZAG].astype(np.uint8)))
    ncomp = 1 if grey else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])  # 1x1 sampling
    out += _seg(0xC0, sof)
    for cls, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
    ) + (
        ()
        if grey
        else (
            (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
        )
    ):
        out += _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    if progressive:
        if restart_interval:
            raise JpegFormatError(
                "progressive encoder does not support restart markers"
            )
        # rewrite the SOF marker emitted above from SOF0 to SOF2
        sof_at = bytes(out).rindex(b"\xff\xc0")
        out[sof_at + 1] = 0xC2

        def _emit_dc_first(comp_indices, al):
            bw = _BitWriter()
            pred = {ci: 0 for ci in comp_indices}
            for b in range(n_blocks):
                for ci in comp_indices:
                    t = 0 if ci == 0 else 1
                    v = int(coef[ci][b][0]) >> al  # arithmetic shift (T.81 DC)
                    diff = v - pred[ci]
                    pred[ci] = v
                    size = _category(diff)
                    code, length = dc_codes[t][size]
                    bw.write(code, length)
                    if size:
                        bw.write(_mag_bits(diff, size), size)
            bw.flush()
            return bytes(bw.out)

        def _emit_dc_refine(comp_indices, al):
            bw = _BitWriter()
            for b in range(n_blocks):
                for ci in comp_indices:
                    bw.write((int(coef[ci][b][0]) >> al) & 1, 1)
            bw.flush()
            return bytes(bw.out)

        def _emit_ac_first(ci, ss, se, al):
            t = 0 if ci == 0 else 1
            bw = _BitWriter()
            for b in range(n_blocks):
                row = coef[ci][b]
                r = 0
                for k in range(ss, se + 1):
                    v = int(row[k])
                    # AC point transform shifts the MAGNITUDE (libjpeg)
                    v = -((-v) >> al) if v < 0 else v >> al
                    if v == 0:
                        r += 1
                        continue
                    while r > 15:
                        code, length = ac_codes[t][0xF0]
                        bw.write(code, length)
                        r -= 16
                    size = _category(v)
                    code, length = ac_codes[t][(r << 4) | size]
                    bw.write(code, length)
                    bw.write(_mag_bits(v, size), size)
                    r = 0
                if r:  # EOB0 per block — no EOBn symbols needed
                    code, length = ac_codes[t][0x00]
                    bw.write(code, length)
            bw.flush()
            return bytes(bw.out)

        def _emit_ac_refine(ci, ss, se, al):
            t = 0 if ci == 0 else 1
            bw = _BitWriter()
            for b in range(n_blocks):
                row = coef[ci][b]
                ab = [
                    ((-int(row[k])) >> al if row[k] < 0 else int(row[k]) >> al)
                    for k in range(ss, se + 1)
                ]
                eob = ss - 1
                for k in range(ss, se + 1):
                    if ab[k - ss] == 1:
                        eob = k
                r = 0
                br = []
                for k in range(ss, se + 1):
                    temp = ab[k - ss]
                    if temp == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob:
                        code, length = ac_codes[t][0xF0]
                        bw.write(code, length)
                        r -= 16
                        for bit in br:
                            bw.write(bit, 1)
                        br = []
                    if temp > 1:
                        # correction bit for an already-nonzero coefficient
                        br.append(temp & 1)
                        continue
                    # newly nonzero at this approximation level
                    code, length = ac_codes[t][(r << 4) | 1]
                    bw.write(code, length)
                    r = 0
                    bw.write(1 if int(row[k]) >= 0 else 0, 1)
                    for bit in br:
                        bw.write(bit, 1)
                    br = []
                if r > 0 or br:
                    code, length = ac_codes[t][0x00]  # EOB0
                    bw.write(code, length)
                    for bit in br:
                        bw.write(bit, 1)
            bw.flush()
            return bytes(bw.out)

        def _sos(comp_specs, ss, se, ah, al):
            hdr = bytes([len(comp_specs)])
            for ci in comp_specs:
                t = 0 if ci == 0 else 1
                hdr += bytes([ci + 1, (t << 4) | t])
            hdr += bytes([ss, se, (ah << 4) | al])
            return _seg(0xDA, hdr)

        every = list(range(ncomp))
        out += _sos(every, 0, 0, 0, 1) + _emit_dc_first(every, 1)
        if grey:
            out += _sos([0], 1, 63, 0, 1) + _emit_ac_first(0, 1, 63, 1)
            out += _sos(every, 0, 0, 1, 0) + _emit_dc_refine(every, 0)
            out += _sos([0], 1, 63, 1, 0) + _emit_ac_refine(0, 1, 63, 0)
        else:
            out += _sos([0], 1, 5, 0, 2) + _emit_ac_first(0, 1, 5, 2)
            out += _sos([1], 1, 63, 0, 1) + _emit_ac_first(1, 1, 63, 1)
            out += _sos([2], 1, 63, 0, 1) + _emit_ac_first(2, 1, 63, 1)
            out += _sos([0], 6, 63, 0, 2) + _emit_ac_first(0, 6, 63, 2)
            out += _sos([0], 1, 63, 2, 1) + _emit_ac_refine(0, 1, 63, 1)
            out += _sos(every, 0, 0, 1, 0) + _emit_dc_refine(every, 0)
            out += _sos([1], 1, 63, 1, 0) + _emit_ac_refine(1, 1, 63, 0)
            out += _sos([2], 1, 63, 1, 0) + _emit_ac_refine(2, 1, 63, 0)
            out += _sos([0], 1, 63, 1, 0) + _emit_ac_refine(0, 1, 63, 0)
    elif interleave or grey:
        sos = bytes([ncomp])
        for ci in range(ncomp):
            tid = 0 if ci == 0 else 1
            sos += bytes([ci + 1, (tid << 4) | tid])
        sos += bytes([0, 63, 0])
        out += _seg(0xDA, sos)
        out += _emit_entropy(list(range(ncomp)))
    else:
        # non-interleaved: one scan per component (legal baseline T.81
        # layout some encoders emit) — the decoder's multi-scan oracle
        for ci in range(ncomp):
            tid = 0 if ci == 0 else 1
            sos = bytes([1, ci + 1, (tid << 4) | tid, 0, 63, 0])
            out += _seg(0xDA, sos)
            out += _emit_entropy([ci])
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------- decoder


def iter_jpeg_frame_spans(payload: bytes):
    """Yield (start, end) byte offsets of each complete JFIF frame of an
    MJPEG stream — the zero-copy face of the structural walk, so callers
    can sample frames without materializing byte copies of every frame
    (the walk itself never slices the payload).

    Motion JPEG in its simplest public form is exactly a concatenation
    of baseline JFIF images (the payload format of multipart/x-mixed-
    replace camera streams and AVI 'MJPG' chunks). Framing is STRUCTURAL
    — each frame is walked segment-by-segment and its entropy-coded scan
    is skipped with 0xFF00-unstuffing awareness — because raw
    ``split(SOI)`` is wrong: segment bodies (DQT/DHT values) may contain
    the 0xFF 0xD8 byte pair even though stuffed entropy data cannot.
    """
    pos = 0
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 2] != JPEG_SOI:
            raise JpegFormatError(f"expected SOI at offset {pos}")
        start = pos
        pos += 2
        while True:
            if pos + 1 >= n:
                raise JpegFormatError("truncated MJPEG frame (no EOI)")
            if payload[pos] != 0xFF:
                raise JpegFormatError(f"expected marker at {pos}")
            marker = payload[pos + 1]
            pos += 2
            if marker == 0xD9:  # EOI — frame complete
                yield start, pos
                break
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                continue
            if pos + 2 > n:
                raise JpegFormatError("truncated segment header")
            (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
            pos += seglen
            if marker == 0xDA:  # scan: skip entropy to the next true marker
                while pos + 1 < n and not (
                    payload[pos] == 0xFF
                    and payload[pos + 1] != 0x00
                    and not (0xD0 <= payload[pos + 1] <= 0xD7)
                ):
                    pos += 1


def iter_jpeg_frames(payload: bytes):
    """Yield each complete JFIF frame (bytes) of an MJPEG stream (see
    iter_jpeg_frame_spans for the walk semantics and the zero-copy
    variant)."""
    for start, end in iter_jpeg_frame_spans(payload):
        yield payload[start:end]


def encode_mjpeg(frames: list[np.ndarray], quality: int = 85) -> bytes:
    """Concatenated-JFIF Motion JPEG from a list of (h, w)[,3] uint8."""
    if not frames:
        raise JpegFormatError("empty MJPEG frame list")
    return b"".join(encode_jpeg(f, quality=quality) for f in frames)


_LUT_CACHE: OrderedDict[bytes, list[int]] = OrderedDict()
# bounded LRU: real-world corpora use per-image optimized tables, so an
# unbounded cache grows monotonically on long-lived executors (~0.5 MB
# per entry); 64 covers the Annex-K defaults plus any MJPEG stream's
# per-frame repeats with room to spare
_LUT_CACHE_MAX = 64


def _fast_lut(bits: list[int], vals: list[int]) -> list[int]:
    """-> 65536-entry list: lut[next16bits] = (symbol << 5) | code_len,
    or -1 for an invalid prefix. Cached by table content (MJPEG streams
    repeat identical DHT segments every frame)."""
    key = bytes(bits) + bytes(vals)
    cached = _LUT_CACHE.get(key)
    if cached is not None:
        _LUT_CACHE.move_to_end(key)
        return cached
    lut = np.full(65536, -1, dtype=np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        if bits[length - 1] > (1 << length) - code:
            raise JpegFormatError("huffman spec: over-full code space")
        for _ in range(bits[length - 1]):
            base = code << (16 - length)
            lut[base : base + (1 << (16 - length))] = (vals[k] << 5) | length
            code += 1
            k += 1
        code <<= 1
    out = lut.tolist()  # plain-list indexing beats numpy scalar indexing
    _LUT_CACHE[key] = out
    if len(_LUT_CACHE) > _LUT_CACHE_MAX:
        _LUT_CACHE.popitem(last=False)
    return out


def _fast_lut_seq(bits: list[int], vals: list[int], is_ac: bool) -> list[int]:
    """Combined symbol+magnitude LUT for BASELINE scans (the
    libjpeg-turbo fast path): when huffman code length + magnitude size
    fit the 16-bit peek (the overwhelmingly common case), one lookup
    yields the fully decoded coefficient value — no second window read.

    Entry packing (or -1 for an invalid prefix):
      bits 0..4   consumed bits (code, or code+magnitude when full)
      bits 5..6   kind: 0=EOB, 1=ZRL, 2=full (value inline), 3=partial
      full:       bits 7..10 run (AC; 0 for DC), bits 11.. value+2048
      partial:    bits 7..14 the raw run/size symbol; magnitude is read
                  from the window by the caller (size>11 DC or code+size
                  spilling past 16 bits)

    Progressive scans keep the plain symbol LUT (_fast_lut): EOBn
    ext-bit semantics and refinement bits don't fit this packing.
    Cached by table content like _fast_lut (MJPEG repeats DHT segments
    every frame)."""
    key = (b"A" if is_ac else b"D") + bytes(bits) + bytes(vals)
    cached = _LUT_CACHE.get(key)
    if cached is not None:
        _LUT_CACHE.move_to_end(key)
        return cached
    lut = np.full(65536, -1, dtype=np.int64)
    code = 0
    k = 0
    for length in range(1, 17):
        if bits[length - 1] > (1 << length) - code:
            raise JpegFormatError("huffman spec: over-full code space")
        for _ in range(bits[length - 1]):
            sym = vals[k]
            base = code << (16 - length)
            span = 1 << (16 - length)
            run, size = (sym >> 4, sym & 0x0F) if is_ac else (0, sym)
            if is_ac and size == 0:
                if sym == 0x00:
                    lut[base : base + span] = (0 << 5) | length  # EOB
                elif sym == 0xF0:
                    lut[base : base + span] = (1 << 5) | length  # ZRL
                # else: EOBn symbol — undefined in baseline; tables
                # containing one are rejected before LUT build, so the
                # slice keeps -1 (decodes as invalid-code, defensively)
            elif size == 0:
                # DC size 0: diff is 0, fully decoded by the code alone
                lut[base : base + span] = (2048 << 11) | (2 << 5) | length
            elif length + size <= 16 and size <= 11:
                # full decode: the magnitude bits are inside the peek
                suf = np.arange(span, dtype=np.int64)
                mag = (suf >> (16 - length - size)) & ((1 << size) - 1)
                val = np.where(
                    mag >= (1 << (size - 1)), mag, mag - (1 << size) + 1
                )
                lut[base : base + span] = (
                    ((val + 2048) << 11)
                    | (run << 7)
                    | (2 << 5)
                    | (length + size)
                )
            else:
                lut[base : base + span] = (sym << 7) | (3 << 5) | length
            code += 1
            k += 1
        code <<= 1
    out = lut.tolist()
    _LUT_CACHE[key] = out
    if len(_LUT_CACHE) > _LUT_CACHE_MAX:
        _LUT_CACHE.popitem(last=False)
    return out


def _win32(buf: bytes) -> list[int]:
    """Precomputed 32-bit MSB-first sliding window per byte offset, so a
    16-bit Huffman peek or an up-to-25-bit magnitude read is ONE index +
    shift instead of a per-symbol refill loop — the same windowed-LUT
    discipline as webp_codec._BitReader (which took VP8L from 35 to 7.5
    ms/image). Padded with 512 zero bytes: between truncation checks the
    decoder consumes at most one data unit (~64 symbols x <=31 bits
    ~ 250 bytes) of phantom zeros, so hostile truncation can never index
    past the window before the per-block check fires."""
    b = np.frombuffer(bytes(buf) + b"\x00" * 512, dtype=np.uint8).astype(
        np.uint32
    )
    return (
        b[:-3] << np.uint32(24)
        | b[1:-2] << np.uint32(16)
        | b[2:-1] << np.uint32(8)
        | b[3:]
    ).tolist()  # python ints: faster scalar indexing than np.uint32


def _unstuff(data: bytes) -> bytes:
    """Remove 0x00 stuffing bytes after 0xFF, vectorized."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if len(arr) < 2:
        return data
    stuffed = np.where((arr[:-1] == 0xFF) & (arr[1:] == 0x00))[0]
    if len(stuffed) == 0:
        return data
    return np.delete(arr, stuffed + 1).tobytes()


def _scan_spans(data: bytes, start: int) -> tuple[list[bytes], int, int]:
    """Split a scan's entropy region into per-restart-interval chunks.

    In stuffed entropy data every 0xFF is followed by 0x00, so any
    0xFF + non-0x00 pair is a true marker: RSTn pairs delimit chunks,
    the first non-RST marker terminates the scan. Returns (unstuffed
    chunks, terminator offset, terminator marker)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    marks = np.where((arr[:-1] == 0xFF) & (arr[1:] != 0x00))[0]
    marks = marks[marks >= start]
    spans: list[bytes] = []
    span_start = start
    for p in marks:
        p = int(p)
        m = int(arr[p + 1])
        if 0xD0 <= m <= 0xD7:
            spans.append(_unstuff(data[span_start:p]))
            span_start = p + 2
            continue
        spans.append(_unstuff(data[span_start:p]))
        return spans, p, m
    raise JpegFormatError("truncated entropy data (no terminating marker)")


def _decode_prog_scan(
    spans: list[bytes],
    scan: list,
    coefs: list[list],
    grid_w: list[int],
    n_mcus: int,
    sub_w: int | None,
    mcux: int,
    restart_interval: int,
    ss: int,
    se: int,
    ah: int,
    al: int,
    luts: list,
) -> None:
    """Entropy-decode ONE progressive scan (T.81 G.1.2) in place.

    Four scan kinds, selected by (ss, ah): DC first (ss==0, ah==0 —
    diff-coded, point-transformed by ``<< al``), DC refinement (ss==0,
    ah>0 — one raw bit per data unit), AC first (ss>0, ah==0 — run/size
    coding with EOBn end-of-band runs), AC refinement (ss>0, ah>0 —
    newly-nonzero ±1 symbols interleaved with correction bits for
    coefficients already nonzero at a coarser level; the libjpeg
    jdphuff semantics). ``coefs[si]`` is the si-th scan component's
    block-row list, shared with other scans of the same component —
    values accumulate across the whole scan script.
    """
    ns = len(scan)
    pred = [0] * ns
    eobrun = 0
    span_idx = 0
    w32 = _win32(spans[0])
    bits_n = len(spans[0]) * 8
    p = 0
    _MASK = [(1 << i) - 1 for i in range(40)]
    p1 = 1 << al
    m1 = -p1
    dc_first = ss == 0 and ah == 0
    dc_refine = ss == 0 and ah != 0
    ac_first = ss != 0 and ah == 0
    for mcu in range(n_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            if p > bits_n:
                raise JpegFormatError("truncated entropy data")
            span_idx += 1
            if span_idx >= len(spans):
                raise JpegFormatError("expected RSTn marker")
            w32 = _win32(spans[span_idx])
            bits_n = len(spans[span_idx]) * 8
            p = 0
            pred = [0] * ns
            eobrun = 0
        if sub_w is None:
            my, mx = divmod(mcu, mcux)
            slots = []
            for si in range(ns):
                comp = scan[si][0]
                gw = grid_w[si]
                for by in range(comp["v"]):
                    base = (my * comp["v"] + by) * gw + mx * comp["h"]
                    for bx in range(comp["h"]):
                        slots.append((si, base + bx))
        else:
            sy, sx = divmod(mcu, sub_w)
            slots = ((0, sy * grid_w[0] + sx),)
        for si, bi in slots:
            row = coefs[si][bi]
            if dc_first:
                dct = luts[si]
                v = dct[(w32[p >> 3] >> (16 - (p & 7))) & 0xFFFF]
                if v < 0:
                    raise JpegFormatError("invalid huffman code in entropy data")
                p += v & 31
                size = v >> 5
                if size:
                    mag = (w32[p >> 3] >> (32 - size - (p & 7))) & _MASK[size]
                    p += size
                    pred[si] += (
                        mag if mag >= (1 << (size - 1)) else mag - (1 << size) + 1
                    )
                row[0] = pred[si] << al
            elif dc_refine:
                if (w32[p >> 3] >> (31 - (p & 7))) & 1:
                    row[0] |= p1
                p += 1
            elif ac_first:
                if eobrun:
                    eobrun -= 1
                    continue
                act = luts[si]
                k = ss
                while k <= se:
                    v = act[(w32[p >> 3] >> (16 - (p & 7))) & 0xFFFF]
                    if v < 0:
                        raise JpegFormatError("invalid huffman code in entropy data")
                    p += v & 31
                    rs = v >> 5
                    r = rs >> 4
                    sz = rs & 0x0F
                    if sz == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        if r:  # EOBn: run of 2^r + ext-bits blocks (incl. this)
                            ext = (w32[p >> 3] >> (32 - r - (p & 7))) & _MASK[r]
                            p += r
                            eobrun = (1 << r) - 1 + ext
                        break
                    k += r
                    if k > se:
                        raise JpegFormatError("AC index overflow")
                    mag = (w32[p >> 3] >> (32 - sz - (p & 7))) & _MASK[sz]
                    p += sz
                    val = mag if mag >= (1 << (sz - 1)) else mag - (1 << sz) + 1
                    row[k] = val << al
                    k += 1
            else:  # AC refinement
                act = luts[si]
                k = ss
                if eobrun == 0:
                    while k <= se:
                        v = act[(w32[p >> 3] >> (16 - (p & 7))) & 0xFFFF]
                        if v < 0:
                            raise JpegFormatError(
                                "invalid huffman code in entropy data"
                            )
                        p += v & 31
                        rs = v >> 5
                        r = rs >> 4
                        sz = rs & 0x0F
                        if sz == 0:
                            if r < 15:  # EOBn (no decrement yet)
                                if r:
                                    ext = (
                                        w32[p >> 3] >> (32 - r - (p & 7))
                                    ) & _MASK[r]
                                    p += r
                                    eobrun = (1 << r) + ext
                                else:
                                    eobrun = 1
                                break
                            val = 0  # ZRL: 16 zero-history positions
                        else:
                            if sz != 1:
                                raise JpegFormatError(
                                    "invalid refinement run/size symbol"
                                )
                            val = p1 if (w32[p >> 3] >> (31 - (p & 7))) & 1 else m1
                            p += 1
                        # advance over r zero-HISTORY positions, reading a
                        # correction bit for every nonzero coefficient passed
                        while k <= se:
                            cur = row[k]
                            if cur != 0:
                                bit = (w32[p >> 3] >> (31 - (p & 7))) & 1
                                p += 1
                                if bit and not (cur & p1):
                                    row[k] = cur + (p1 if cur >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            row[k] = val
                        k += 1
                if eobrun:
                    # rest of the band: correction bits only, then count down
                    while k <= se:
                        cur = row[k]
                        if cur != 0:
                            bit = (w32[p >> 3] >> (31 - (p & 7))) & 1
                            p += 1
                            if bit and not (cur & p1):
                                row[k] = cur + (p1 if cur >= 0 else m1)
                        k += 1
                    eobrun -= 1
            if p > bits_n:
                raise JpegFormatError("truncated entropy data")


def decode_jpeg(data: bytes) -> np.ndarray:
    """baseline JFIF bytes -> (h, w) or (h, w, 3) uint8.

    All malformed-input failures surface as ``JpegFormatError`` (a
    ``ValueError``): specific checks cover the common truncations, and a
    blanket guard converts any residual parse-time ``struct.error`` /
    ``IndexError`` / ``KeyError`` from hostile bytes so the per-row
    fallback in operators/multimodal.py always catches them.
    """
    try:
        return _decode_jpeg_impl(data)
    except (JpegFormatError, NotImplementedError):
        raise
    except (struct.error, IndexError, KeyError, ValueError) as exc:
        raise JpegFormatError(
            f"malformed JPEG ({type(exc).__name__}: {exc})"
        ) from exc


def _decode_jpeg_impl(data: bytes) -> np.ndarray:
    if data[:2] != JPEG_SOI:
        raise JpegFormatError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    hspecs: dict[tuple[int, int], tuple[list[int], list[int]]] = {}
    frame = None
    restart_interval = 0
    comps: list[dict] = []
    # multi-scan state: coefficients accumulate per FRAME component
    # across scans (T.81 allows baseline images split into several
    # scans, e.g. one per component); assembly happens at EOI
    geo = None  # (hmax, vmax, mcux, mcuy), fixed at first scan
    coefs_by_comp: list[list] | None = None
    qts_by_comp: list | None = None
    scanned: set[int] = set()
    progressive = False
    dc_done: set[int] = set()
    while pos + 1 < len(data):
        if data[pos] != 0xFF:
            raise JpegFormatError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(data):
            raise JpegFormatError("truncated segment header")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                i += 1
                n = 64 * (2 if prec else 1)
                raw = body[i : i + n]
                if len(raw) < n:
                    raise JpegFormatError("truncated DQT segment")
                i += n
                arr = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if prec
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                qtabs[tid] = arr[UNZIGZAG].reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                if len(bits) < 16:
                    raise JpegFormatError("truncated DHT segment")
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                if len(vals) < n:
                    raise JpegFormatError("truncated DHT segment")
                if cls == 0 and any(v > 15 for v in vals):
                    # DC vals are magnitude-category bit counts; baseline
                    # allows 0..11 — a hostile byte here would otherwise
                    # index past _MASK in the entropy loop
                    raise JpegFormatError("DC huffman value out of range")
                # AC run/size symbols with size==0 beyond EOB (0x00) and
                # ZRL (0xF0) are EOBn end-of-band runs — meaningful ONLY in
                # progressive scans; a baseline scan using such a table is
                # rejected at table-resolution time (it would reach
                # `1 << (size - 1)` with size=0 in the sequential loop)
                eobn = cls == 1 and any(
                    (v & 0x0F) == 0 and v not in (0x00, 0xF0) for v in vals
                )
                hspecs[(cls, tid)] = (bits, vals, eobn)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            if len(body) < 2:
                raise JpegFormatError("truncated DRI segment")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            progressive = marker == 0xC2
            if len(body) < 6:
                raise JpegFormatError("truncated SOF segment")
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if len(body) < 6 + 3 * ncomp:
                raise JpegFormatError("truncated SOF segment")
            if prec != 8:
                raise JpegFormatError(f"unsupported sample precision {prec}")
            if h < 1 or w < 1:
                # h == 0 (DNL-deferred height) is legal JPEG but not
                # baseline-decodable here; reject with a typed error
                raise JpegFormatError("zero image dimension in SOF")
            comps = []
            for ci in range(ncomp):
                cid, samp, qid = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "q": qid}
                )
            frame = (h, w, ncomp)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegFormatError(
                f"unsupported JPEG process (marker 0xFF{marker:02X}); "
                "baseline/progressive only"
            )
        elif marker == 0xDA:  # SOS -> entropy decode (one of possibly many)
            if frame is None:
                raise JpegFormatError("SOS before SOF")
            if len(body) < 1:
                raise JpegFormatError("truncated SOS segment")
            ns = body[0]
            if ns < 1 or len(body) < 1 + 2 * ns + 3:
                raise JpegFormatError("truncated SOS segment")
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
            if progressive:
                # validate the spectral-selection / approximation header
                if ss == 0:
                    if se != 0:
                        raise JpegFormatError("DC progressive scan must have se=0")
                else:
                    if ns != 1:
                        raise JpegFormatError(
                            "progressive AC scan must cover one component"
                        )
                    if not (ss <= se <= 63):
                        raise JpegFormatError("bad spectral selection range")
                if al > 13:
                    raise JpegFormatError("bad successive approximation Al")
            scan = []
            for si in range(ns):
                cid, tids = body[1 + 2 * si], body[2 + 2 * si]
                comp = next((c for c in comps if c["id"] == cid), None)
                if comp is None:
                    raise JpegFormatError(f"SOS references unknown component {cid}")
                ci = comps.index(comp)
                if not progressive:
                    if ci in scanned:
                        raise JpegFormatError(f"component {cid} scanned twice")
                    scanned.add(ci)
                elif ss == 0 and ah == 0:
                    dc_done.add(ci)
                scan.append((comp, ci, tids >> 4, tids & 0x0F))
            h, w, ncomp = frame
            if geo is None:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                if hmax > 2 or vmax > 2 or any(
                    c["h"] < 1 or c["v"] < 1 for c in comps
                ):
                    raise JpegFormatError("sampling factors beyond 2x2 unsupported")
                geo = (hmax, vmax, -(-w // (8 * hmax)), -(-h // (8 * vmax)))
                if progressive:
                    # rows allocated eagerly: progressive scans REFINE
                    # coefficients in place across the whole scan script
                    coefs_by_comp = [
                        [
                            [0] * 64
                            for _ in range(geo[2] * c["h"] * geo[3] * c["v"])
                        ]
                        for c in comps
                    ]
                else:
                    coefs_by_comp = [
                        [None] * (geo[2] * c["h"] * geo[3] * c["v"])
                        for c in comps
                    ]
                qts_by_comp = [None] * ncomp
            hmax, vmax, mcux, mcuy = geo

            # resolve tables + build the 16-bit-peek LUTs once per scan.
            # Baseline needs DC+AC per component; progressive DC-first
            # needs only DC, DC-refine none, AC scans only AC.
            need_dc = (not progressive) or (ss == 0 and ah == 0)
            need_ac = (not progressive) or ss != 0
            luts = []
            for comp, ci, dc_id, ac_id in scan:
                qt = qtabs.get(comp["q"])
                if qt is None:
                    raise JpegFormatError("missing huffman/quant table")
                dc_lut = ac_lut = None
                if need_dc:
                    dc_spec = hspecs.get((0, dc_id))
                    if dc_spec is None:
                        raise JpegFormatError("missing huffman/quant table")
                    dc_lut = (
                        _fast_lut(dc_spec[0], dc_spec[1])
                        if progressive
                        else _fast_lut_seq(dc_spec[0], dc_spec[1], False)
                    )
                if need_ac:
                    ac_spec = hspecs.get((1, ac_id))
                    if ac_spec is None:
                        raise JpegFormatError("missing huffman/quant table")
                    if ac_spec[2] and not progressive:
                        raise JpegFormatError(
                            "AC huffman run/size symbol undefined in baseline"
                        )
                    ac_lut = (
                        _fast_lut(ac_spec[0], ac_spec[1])
                        if progressive
                        else _fast_lut_seq(ac_spec[0], ac_spec[1], True)
                    )
                luts.append((dc_lut, ac_lut))
                qts_by_comp[ci] = qt

            spans, term_pos, _term_marker = _scan_spans(data, pos + seglen)

            # per-scan geometry (T.81 A.2): an interleaved scan (ns > 1)
            # walks the frame MCU grid; a single-component scan walks the
            # component's own ceil(cw/8) x ceil(ch/8) data-unit grid —
            # units land in the same frame-level block grid, the MCU
            # padding blocks just stay zero (cropped away at assembly)
            grid_w = [mcux * comp["h"] for comp, _ci, _d, _a in scan]
            if ns > 1:
                n_mcus = mcux * mcuy
                sub_w = None
            else:
                comp0 = scan[0][0]
                cw = -(-w * comp0["h"] // hmax)
                chh = -(-h * comp0["v"] // vmax)
                sub_w = -(-cw // 8)
                n_mcus = sub_w * -(-chh // 8)

            if progressive:
                _decode_prog_scan(
                    spans,
                    scan,
                    [coefs_by_comp[ci] for _c, ci, _d, _a in scan],
                    grid_w,
                    n_mcus,
                    sub_w,
                    mcux,
                    restart_interval,
                    ss,
                    se,
                    ah,
                    al,
                    [dc if ss == 0 else ac for dc, ac in luts],
                )
                pos = term_pos
                continue

            # pass 1: entropy-decode every block's zigzag coefficients.
            # The bit reader is INLINED as local-int arithmetic over a
            # precomputed 32-bit window (_win32): at ~50-100 Huffman
            # symbols per block, both method-call overhead AND the
            # per-symbol refill loop dominated the decode (profiled);
            # plain-list coefficient rows beat numpy scalar stores for
            # the same reason. p is the consumed-bit position.
            pred = [0] * ns
            span_idx = 0
            w32 = _win32(spans[0])
            bits_n = len(spans[0]) * 8
            p = 0
            _MASK = [(1 << i) - 1 for i in range(40)]
            for mcu in range(n_mcus):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    if p > bits_n:
                        raise JpegFormatError("truncated entropy data")
                    span_idx += 1
                    if span_idx >= len(spans):
                        raise JpegFormatError("expected RSTn marker")
                    w32 = _win32(spans[span_idx])
                    bits_n = len(spans[span_idx]) * 8
                    p = 0
                    pred = [0] * ns
                # data-unit slots of this MCU: (scan index, block index)
                if sub_w is None:
                    my, mx = divmod(mcu, mcux)
                    slots = []
                    for si in range(ns):
                        comp = scan[si][0]
                        gw = grid_w[si]
                        for by in range(comp["v"]):
                            base = (my * comp["v"] + by) * gw + mx * comp["h"]
                            for bx in range(comp["h"]):
                                slots.append((si, base + bx))
                else:
                    sy, sx = divmod(mcu, sub_w)
                    slots = ((0, sy * grid_w[0] + sx),)
                for si, bi in slots:
                    dct, act = luts[si]
                    dc = pred[si]
                    row = [0] * 64
                    v = dct[(w32[p >> 3] >> (16 - (p & 7))) & 0xFFFF]
                    if v < 0:
                        raise JpegFormatError(
                            "invalid huffman code in entropy data"
                        )
                    p += v & 31
                    if (v >> 5) & 3 == 2:  # full: diff decoded inline
                        dc += (v >> 11) - 2048
                    else:  # partial: magnitude spilled past the peek
                        size = (v >> 7) & 15
                        mag = (w32[p >> 3] >> (32 - size - (p & 7))) & _MASK[
                            size
                        ]
                        p += size
                        dc += (
                            mag
                            if mag >= (1 << (size - 1))
                            else mag - (1 << size) + 1
                        )
                    row[0] = dc
                    k = 1
                    while k < 64:
                        v = act[(w32[p >> 3] >> (16 - (p & 7))) & 0xFFFF]
                        if v < 0:
                            raise JpegFormatError(
                                "invalid huffman code in entropy data"
                            )
                        p += v & 31
                        kind = (v >> 5) & 3
                        if kind == 2:  # full: run + value decoded inline
                            k += (v >> 7) & 15
                            if k > 63:
                                raise JpegFormatError("AC index overflow")
                            row[k] = (v >> 11) - 2048
                            k += 1
                            continue
                        if kind == 0:  # EOB
                            break
                        if kind == 1:  # ZRL
                            k += 16
                            continue
                        rs = (v >> 7) & 255  # partial
                        k += rs >> 4
                        size = rs & 0x0F
                        if k > 63:
                            raise JpegFormatError("AC index overflow")
                        mag = (w32[p >> 3] >> (32 - size - (p & 7))) & _MASK[
                            size
                        ]
                        p += size
                        row[k] = (
                            mag
                            if mag >= (1 << (size - 1))
                            else mag - (1 << size) + 1
                        )
                        k += 1
                    coefs_by_comp[scan[si][1]][bi] = row
                    pred[si] = dc
                    # consumed-bit accounting: peeks may LOAD phantom zero
                    # bytes past the span (the window is zero-padded), but
                    # CONSUMING any bit beyond the real data means the
                    # stream is truncated; the per-block check bounds
                    # phantom consumption well inside the 512-byte pad
                    if p > bits_n:
                        raise JpegFormatError("truncated entropy data")

            pos = term_pos  # continue at the marker that ended the scan
            continue
        pos += seglen

    # assembly (pass 2): all scans decoded — vectorized dequant + IDCT
    # over every block of every component, stitch planes, upsample, crop
    if coefs_by_comp is None:
        raise JpegFormatError("no SOS scan found")
    covered = dc_done if progressive else scanned
    if len(covered) != len(comps):
        raise JpegFormatError(
            f"missing scans: {len(covered)} of {len(comps)} components coded"
        )
    h, w, ncomp = frame
    hmax, vmax, mcux, mcuy = geo
    zero_row = [0] * 64
    full = []
    for ci, c in enumerate(comps):
        rows = [
            r if r is not None else zero_row for r in coefs_by_comp[ci]
        ]
        deq = (
            np.array(rows, dtype=np.int64)[:, UNZIGZAG]
            .reshape(-1, 8, 8)
            .astype(np.float64)
            * qts_by_comp[ci][None, :, :]
        )
        # batched 2-D IDCT as broadcast matmul (C.T @ deq @ C): BLAS-backed,
        # ~11x faster than the einsum contraction it replaces (profiled;
        # identical contraction, <=1e-13 numerical difference)
        pix = _C.T @ deq @ _C + 128.0
        bh, bw_ = mcuy * c["v"], mcux * c["h"]
        plane = (
            pix.reshape(bh, bw_, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw_ * 8)
        )
        # upsample to full resolution by replication, crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if ncomp == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    if ncomp == 3:
        return _ycbcr_to_rgb(np.stack(full, axis=-1))
    raise JpegFormatError(f"unsupported component count {ncomp}")
