"""Dependency-free GIF codec — stdlib + numpy only.

Decoder covers the public GIF87a/GIF89a feature set a web corpus
actually contains: global + local color tables, variable-width LZW
(3-12 bit codes, clear/EOI, 4096-entry cap), 4-pass interlacing,
multi-frame animations with Graphic Control Extension transparency and
disposal methods 0/1 (leave), 2 (restore background) and 3 (restore
previous), comment/application/plain-text extensions skipped
structurally. Matching encoder (real LZW compression with dict reset
at the 4096 cap, optional interlace, multi-frame with per-frame GCE)
so round-trips are testable with zero third-party bytes.

Hostile-input posture mirrors png_codec: typed ``GifFormatError``
(a ValueError) on structural damage, LZW output bounded by the
declared frame rectangle (a stream cannot materialize more pixels
than the descriptor claims), and a total-pixel bomb guard across
frames. Spec: GIF89a (CompuServe, public), W3C note on GIF LZW.

Determinism contract: decode is exact (GIF is lossless on palettized
input), so executor and driver faces are bit-identical by
construction — the property the cross-format video fingerprint pin
(MJPEG vs animated GIF of the same frames) rests on.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")
_MAX_TOTAL_PIXELS = 1 << 26  # 64M pixels across all frames: bomb guard


class GifFormatError(ValueError):
    """Structurally invalid / truncated / hostile GIF payload."""


def is_gif(payload: bytes) -> bool:
    return payload[:6] in GIF_MAGICS


# ---------------------------------------------------------------- LZW


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> np.ndarray:
    """Concatenated sub-block bytes -> uint8 index array (bounded)."""
    if not 2 <= min_code_size <= 8:
        raise GifFormatError(f"LZW min code size {min_code_size} out of range")
    clear = 1 << min_code_size
    eoi = clear + 1
    # full-expansion table: table[code] = the decoded byte string. Total
    # table bytes are O(decoded output), which the max_pixels guard
    # already bounds — and O(1) lookups beat rebuilding each entry by
    # walking a prefix chain (the chain walk was ~85% of GIF decode wall)
    roots = [bytes([i]) for i in range(clear)]
    table = roots + [b"", b""]  # clear/eoi placeholders keep indices aligned
    out = bytearray()
    width = min_code_size + 1
    next_code = eoi + 1
    prev_entry = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)

    while True:
        while nbits < width:
            if pos >= n:
                raise GifFormatError("LZW stream truncated (no EOI code)")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            del table[eoi + 1 :]
            width = min_code_size + 1
            next_code = eoi + 1
            prev_entry = None
            continue
        if code == eoi:
            break
        if prev_entry is None:
            if code >= clear:
                raise GifFormatError(f"LZW first code {code} not a root")
            entry = table[code]
            out.extend(entry)
            prev_entry = entry
            continue
        if code < next_code:
            entry = table[code]
        elif code == next_code:
            # the KwKwK case: entry = prev's expansion + its first byte
            entry = prev_entry + prev_entry[:1]
        else:
            raise GifFormatError(f"LZW code {code} beyond dictionary")
        out.extend(entry)
        if len(out) > max_pixels:
            raise GifFormatError("LZW output exceeds declared frame rectangle")
        if next_code < 4096:
            table.append(prev_entry + entry[:1])
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev_entry = entry
    return np.frombuffer(bytes(out), dtype=np.uint8)


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """uint8 index array -> LZW bytes (no sub-block framing)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    prev = -1
    for v in indices.tolist():
        if prev < 0:
            prev = v
            continue
        key = (prev, v)
        nxt = table.get(key)
        if nxt is not None:
            prev = nxt
            continue
        emit(prev)
        # width sync: the decoder adds one entry per code read EXCEPT
        # the first after a clear, so mid-stream its counter runs one
        # BEHIND this one — hence the (1<<width)+1 threshold here vs the
        # decoder's 1<<width. At the 4096 cap, clear (never deferred).
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        prev = v
    if prev >= 0:
        emit(prev)
        # at the flush the counters ALIGN (the decoder adds an entry for
        # this final code; the encoder has nothing left to add), so the
        # EOI width check mirrors the decoder's own threshold
        if next_code == (1 << width) and width < 12:
            width += 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------- decoder

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray, h: int) -> np.ndarray:
    order = np.concatenate(
        [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _interlace_order(h: int) -> np.ndarray:
    return np.concatenate([np.arange(start, h, step) for start, step in _INTERLACE_PASSES])


def _read_color_table(data: bytes, pos: int, size_field: int) -> tuple[np.ndarray, int]:
    n = 2 << size_field
    end = pos + 3 * n
    if end > len(data):
        raise GifFormatError("color table truncated")
    return np.frombuffer(data[pos:end], dtype=np.uint8).reshape(n, 3), end


def _subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    pieces = []
    n = len(data)
    while True:
        if pos >= n:
            raise GifFormatError("sub-block stream truncated")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return b"".join(pieces), pos
        if pos + ln > n:
            raise GifFormatError("sub-block data truncated")
        pieces.append(data[pos : pos + ln])
        pos += ln


def _count_image_blocks(data: bytes, pos: int) -> int:
    """Structural count of image descriptors (no LZW decode): walks the
    same block sequence the decoder does, skipping sub-block bodies."""
    n = len(data)
    count = 0
    while pos < n:
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            pos += 1
            _, pos = _subblocks(data, pos)
            continue
        if block != 0x2C:
            raise GifFormatError(f"unknown block 0x{block:02x}")
        if pos + 9 > n:
            raise GifFormatError("image descriptor truncated")
        iflags = data[pos + 8]
        pos += 9
        if iflags & 0x80:
            pos += 3 * (2 << (iflags & 0x07))
        pos += 1  # LZW min code size
        _, pos = _subblocks(data, pos)
        count += 1
    if count < 1:
        raise GifFormatError("GIF contains no image frames")
    return count


def count_gif_frames(payload: bytes) -> int:
    """Structural frame count — header + GCT skip + block walk, no LZW
    decode, no pixel allocation. Lets samplers map positions to frame
    indices BEFORE deciding which composited canvases to keep."""
    data = bytes(payload)
    if not is_gif(data):
        raise GifFormatError("bad GIF signature")
    if len(data) < 13:
        raise GifFormatError("header truncated")
    flags = data[10]
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 0x07))
    return _count_image_blocks(data, pos)


def decode_gif_frames(
    payload: bytes,
    sample_k: int | None = None,
    keep_indices: set[int] | None = None,
) -> list[np.ndarray]:
    """GIF bytes -> list of composited (h, w, 3) uint8 frames on the
    logical screen, honoring GCE transparency and disposal 0-3.

    ``sample_k``: composite every frame (disposal state is sequential)
    but materialize canvas copies only at the k evenly-sampled frame
    indices (the even_sample grid) — samplers never hold all composited
    frames of a long animation.

    ``keep_indices``: explicit frame-number keep-set (overrides
    sample_k's even grid); frames return in frame order, so the caller
    zips sorted(keep_indices) with the result. Position-driven samplers
    (sample_video_frames) use this so a long animation materializes at
    most len(positions) canvases."""
    data = bytes(payload)
    if not is_gif(data):
        raise GifFormatError("bad GIF signature")
    if len(data) < 13:
        raise GifFormatError("header truncated")
    sw, sh, flags, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    if sw < 1 or sh < 1:
        raise GifFormatError("zero logical screen dimension")
    if sw * sh > _MAX_TOTAL_PIXELS:
        # before the canvas allocation — a 16-bit x 16-bit descriptor can
        # claim a 12.8 GB screen in a 40-byte payload
        raise GifFormatError("logical screen exceeds bomb guard")
    pos = 13
    gct = None
    if flags & 0x80:
        gct, pos = _read_color_table(data, pos, flags & 0x07)
    if gct is not None and bg < len(gct):
        bg_rgb = gct[bg].astype(np.uint8)
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_rgb, (sh, sw, 3)).copy()
    keep = None
    if keep_indices is not None:
        keep = {int(i) for i in keep_indices}
    elif sample_k is not None:
        n_imgs = _count_image_blocks(data, pos)
        if n_imgs > sample_k:
            keep = {int(i) * n_imgs // sample_k for i in range(sample_k)}
    frames: list[np.ndarray] = []
    frame_no = -1
    transparent: int | None = None
    disposal = 0
    total_px = 0
    n = len(data)
    while True:
        if pos >= n:
            raise GifFormatError("stream ended without trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= n:
                raise GifFormatError("extension truncated")
            label = data[pos]
            pos += 1
            body, pos = _subblocks(data, pos)
            if label == 0xF9:  # graphic control
                if len(body) < 4:
                    raise GifFormatError("graphic control extension too short")
                gflags = body[0]
                disposal = (gflags >> 2) & 0x07
                transparent = body[3] if gflags & 0x01 else None
            continue
        if block != 0x2C:
            raise GifFormatError(f"unknown block 0x{block:02x}")
        if pos + 9 > n:
            raise GifFormatError("image descriptor truncated")
        left, top, w, h, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if w < 1 or h < 1 or left + w > sw or top + h > sh:
            raise GifFormatError("frame rectangle outside logical screen")
        total_px += w * h
        if total_px > _MAX_TOTAL_PIXELS:
            raise GifFormatError("total pixel count exceeds bomb guard")
        lct = None
        if iflags & 0x80:
            lct, pos = _read_color_table(data, pos, iflags & 0x07)
        table = lct if lct is not None else gct
        if table is None:
            raise GifFormatError("frame has no color table")
        if pos >= n:
            raise GifFormatError("missing LZW min code size")
        mcs = data[pos]
        pos += 1
        lzw, pos = _subblocks(data, pos)
        idx = _lzw_decode(lzw, mcs, w * h)
        if len(idx) < w * h:
            raise GifFormatError(
                f"LZW yielded {len(idx)} pixels for a {w}x{h} frame"
            )
        idx = idx[: w * h].reshape(h, w)
        if iflags & 0x40:
            idx = _deinterlace(idx, h)
        if idx.max(initial=0) >= len(table):
            raise GifFormatError("pixel index beyond color table")
        frame_no += 1
        prev_rect = canvas[top : top + h, left : left + w].copy()
        rgb = table[idx]
        if transparent is not None:
            opaque_mask = idx == transparent
            rgb = np.where(opaque_mask[:, :, None], prev_rect, rgb)
        canvas[top : top + h, left : left + w] = rgb
        if keep is None or frame_no in keep:
            # cumulative KEPT-canvas bound (mirrors decode_webp_frames):
            # the per-frame-rect total_px guard above cannot catch many
            # tiny frames on a huge logical screen — each kept frame is a
            # full sw*sh canvas copy regardless of the frame rectangle
            if (len(frames) + 1) * sw * sh > _MAX_TOTAL_PIXELS:
                raise GifFormatError(
                    "cumulative kept canvases exceed bomb guard"
                )
            frames.append(canvas.copy())
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_rgb
        elif disposal == 3:
            canvas[top : top + h, left : left + w] = prev_rect
        transparent = None
        disposal = 0
    if not frames:
        raise GifFormatError("GIF contains no image frames")
    return frames


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> first composited frame as (h, w, 3) uint8.

    sample_k=1 keeps only frame 0 inside the decoder (the even grid
    {i*n//1} = {0}); an image-kind GIF with thousands of animation
    frames composites sequentially but never materializes more than
    one canvas copy."""
    return decode_gif_frames(payload, sample_k=1)[0]


# ---------------------------------------------------------------- encoder


def _palettize(img: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h, w, 3) uint8 -> (indices uint8, palette (n, 3) uint8).
    Raises when the image has > 256 distinct colors — this encoder is
    exact (no quantizer): palettize upstream for continuous-tone data."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    h, w, _ = a.shape
    flat = a.reshape(-1, 3)
    packed = (
        flat[:, 0].astype(np.int64) << 16
    ) | (flat[:, 1].astype(np.int64) << 8) | flat[:, 2].astype(np.int64)
    colors, inv = np.unique(packed, return_inverse=True)
    if len(colors) > 256:
        raise GifFormatError(
            f"{len(colors)} distinct colors > 256: quantize before encode_gif"
        )
    pal = np.stack(
        [(colors >> 16) & 0xFF, (colors >> 8) & 0xFF, colors & 0xFF], axis=1
    ).astype(np.uint8)
    return inv.reshape(h, w).astype(np.uint8), pal


def _color_table_bytes(pal: np.ndarray) -> tuple[bytes, int]:
    size_field = max(int(np.ceil(np.log2(max(len(pal), 2)))) - 1, 0)
    n = 2 << size_field
    padded = np.zeros((n, 3), dtype=np.uint8)
    padded[: len(pal)] = pal
    return padded.tobytes(), size_field


def _frame_block(
    idx: np.ndarray,
    pal_len: int,
    left: int,
    top: int,
    interlace: bool,
    lct: bytes | None,
    lct_field: int,
) -> bytes:
    h, w = idx.shape
    iflags = (0x40 if interlace else 0) | (0x80 | lct_field if lct is not None else 0)
    out = [struct.pack("<BHHHHB", 0x2C, left, top, w, h, iflags)]
    if lct is not None:
        out.append(lct)
    if interlace:
        idx = idx[_interlace_order(h)]
    mcs = max(2, int(np.ceil(np.log2(max(pal_len, 2)))))
    out.append(bytes([mcs]))
    lzw = _lzw_encode(idx.reshape(-1), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(bytes([len(chunk)]) + chunk)
    out.append(b"\x00")
    return b"".join(out)


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w)[, 3] uint8 with <= 256 distinct colors -> GIF89a bytes."""
    idx, pal = _palettize(img)
    gct, field = _color_table_bytes(pal)
    h, w = idx.shape
    head = GIF_MAGICS[1] + struct.pack("<HHBBB", w, h, 0x80 | field, 0, 0)
    return head + gct + _frame_block(idx, len(pal), 0, 0, interlace, None, 0) + b"\x3b"


def encode_gif_animation(
    frames: list[np.ndarray],
    transparent_key: tuple[int, int, int] | None = None,
    disposal: int | list[int] = 1,
    interlace: bool = False,
) -> bytes:
    """Full-screen animation frames (same shape, each <= 256 colors) ->
    GIF89a bytes with a per-frame local color table + GCE. Pixels equal
    to ``transparent_key`` are written as the frame's transparent index
    (composite-through, the web-sprite idiom)."""
    if not frames:
        raise GifFormatError("empty animation")
    disposals = (
        list(disposal) if isinstance(disposal, (list, tuple)) else [disposal] * len(frames)
    )
    if len(disposals) != len(frames):
        raise GifFormatError("per-frame disposal list length mismatch")
    h, w = np.asarray(frames[0]).shape[:2]
    head = GIF_MAGICS[1] + struct.pack("<HHBBB", w, h, 0, 0, 0)
    out = [head]
    for f, disp in zip(frames, disposals):
        a = np.asarray(f, dtype=np.uint8)
        if a.shape[:2] != (h, w):
            raise GifFormatError("animation frames must share the screen size")
        idx, pal = _palettize(a)
        t_index = None
        if transparent_key is not None:
            key = np.array(transparent_key, dtype=np.uint8)
            hit = np.where((pal == key).all(axis=1))[0]
            if len(hit):
                t_index = int(hit[0])
        gflags = (disp & 0x07) << 2 | (1 if t_index is not None else 0)
        out.append(
            struct.pack(
                "<BBBBHBB", 0x21, 0xF9, 4, gflags, 4, t_index or 0, 0
            )
        )
        lct, field = _color_table_bytes(pal)
        out.append(_frame_block(idx, len(pal), 0, 0, interlace, lct, field))
    out.append(b"\x3b")
    return b"".join(out)
