"""Minimal-but-real ISO-BMFF (MP4/MOV) mux + demux — stdlib + numpy.

Round 6 extends the multiplexed-container surface beyond RIFF/AVI
(avi_codec.py, r5 verdict ask #5) to the container that dominates a
real crawled media bucket: the ISO base media file format. Same
posture — real box-tree parsing with zero new dependencies, decode
routed to this package's own codecs where the sample format is one we
implement, and the honest ``NotImplementedError`` seam where it needs
a licensed/psychoacoustic decoder.

Format scope (per the public ISO/IEC 14496-12 box structure):

    ftyp
    mdat                          (media bytes; located via stco/co64)
    moov
      mvhd
      trak (one per stream)
        tkhd
        mdia
          mdhd                    (track timescale)
          hdlr                    ('vide' | 'soun')
          minf
            stbl
              stsd                (sample entry: fourcc + codec fields)
              stts / stsc / stsz / stco|co64

Supported sample entries:
  * video 'jpeg' / 'mjpa'  — each sample is a JFIF JPEG, decoded by
    this package's jpeg_codec (the MJPEG-in-MP4 layout QuickTime
    writes).
  * audio 'sowt' (16-bit LE PCM), 'twos' (16-bit BE PCM), 'raw '
    (8-bit unsigned PCM) — decoded straight to int16 frames.
  * 'avc1'/'hev1'/'hvc1'/'vp08'/'vp09'/'av01'/'mp4v' video and
    'mp4a'/'ac-3'/'ec-3'/'opus'/'alac'/'samr' audio raise
    ``NotImplementedError`` — the same honest seam as lossy VP8 in
    webp_codec (a from-scratch H.264/AAC is out of proportion for a
    dependency-free build; the demux, routing, and schema are real).

The muxer writes one 'jpeg' video track (this package's JPEG encoder
per frame) and one 'sowt' PCM audio track, each with a complete
stts/stsc/stsz/stco sample table — every box parseable by a real
ISO-BMFF reader. Sample-to-chunk expansion in the demuxer implements
the actual stsc run-length rule, so files from other muxers (many
chunks, varying samples-per-chunk, co64 offsets) demux correctly.

Hostile-input posture mirrors the sibling codecs: typed
``Mp4FormatError`` (a ValueError), declared-size/count bomb guards
before allocation (sample bytes are validated against the payload
bounds — a 64-bit stsz entry cannot allocate past the file), and
truncation always detected.

Reference parity: the reference repo has no media handling at all
(SURVEY.md §0) — graft surface for the multimodal × dedup families.
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_SAMPLES = 1 << 26  # shared bomb-guard scale with wav/flac/avi
_MAX_FRAMES = 1 << 16

_VIDEO_UNSUPPORTED = {b"avc1", b"hev1", b"hvc1", b"vp08", b"vp09", b"av01", b"mp4v"}
_AUDIO_UNSUPPORTED = {b"mp4a", b"ac-3", b"ec-3", b"opus", b"alac", b"samr"}


class Mp4FormatError(ValueError):
    """Structurally invalid / truncated / hostile ISO-BMFF payload."""


def is_mp4(payload: bytes) -> bool:
    return len(payload) >= 12 and payload[4:8] == b"ftyp"


# ---------------------------------------------------------------------------
# mux
# ---------------------------------------------------------------------------


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + body)


def _matrix_identity() -> bytes:
    return struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def _tkhd(track_id: int, duration: int, w: int, h: int) -> bytes:
    return _full(
        b"tkhd",
        0,
        7,  # enabled | in-movie | in-preview
        struct.pack(">IIII", 0, 0, track_id, 0)
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + _matrix_identity()
        + struct.pack(">II", w << 16, h << 16),
    )


def _mdhd(timescale: int, duration: int) -> bytes:
    # language 'und' = 0x55C4
    return _full(
        b"mdhd", 0, 0, struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0)
    )


def _hdlr(handler: bytes, name: bytes) -> bytes:
    return _full(b"hdlr", 0, 0, b"\x00" * 4 + handler + b"\x00" * 12 + name + b"\x00")


def _dinf() -> bytes:
    return _box(
        b"dinf",
        _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b"")),
    )


def _stbl(stsd_entry: bytes, n_samples: int, sizes, chunk_offset: int) -> bytes:
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + stsd_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n_samples, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n_samples, 1))
    if isinstance(sizes, int):  # constant sample size
        stsz = _full(b"stsz", 0, 0, struct.pack(">II", sizes, n_samples))
    else:
        stsz = _full(
            b"stsz",
            0,
            0,
            struct.pack(">II", 0, n_samples) + struct.pack(f">{len(sizes)}I", *sizes),
        )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def encode_mp4(
    frames: list[np.ndarray],
    samples: np.ndarray,
    sample_rate: int,
    fps: int = 8,
    quality: int = 85,
) -> bytes:
    """'jpeg' video frames + int16 PCM ('sowt') audio -> MP4 bytes.

    ``frames``: list of (h, w, 3) uint8 (all same shape); ``samples``:
    int16 (n,) or (n, ch). Each track is one chunk in mdat (video
    frames concatenated, then the PCM block)."""
    from .jpeg_codec import encode_jpeg

    if not frames:
        raise Mp4FormatError("encode_mp4 needs at least one frame")
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16 or samples.ndim != 2 or samples.shape[0] < 1:
        raise Mp4FormatError("encode_mp4 expects int16 (n,) or (n, ch) audio")
    h, w = frames[0].shape[:2]
    n_frames = len(frames)
    n_samp, ch = samples.shape

    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    pcm = samples.astype("<i2").tobytes()

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom" + b"iso2")
    video_off = len(ftyp) + 8  # first byte inside mdat
    audio_off = video_off + sum(len(j) for j in jpegs)
    mdat = _box(b"mdat", b"".join(jpegs) + pcm)

    dur_ms = n_frames * 1000 // fps
    mvhd = _full(
        b"mvhd",
        0,
        0,
        struct.pack(">IIII", 0, 0, 1000, dur_ms)
        + struct.pack(">IH", 0x00010000, 0x0100)
        + b"\x00" * 10
        + _matrix_identity()
        + b"\x00" * 24
        + struct.pack(">I", 3),  # next track id
    )

    # VisualSampleEntry 'jpeg': 6 reserved + dref idx, then the fixed
    # 70-byte visual fields (ISO 14496-12 §12.1.3)
    vse = _box(
        b"jpeg",
        b"\x00" * 6
        + struct.pack(">H", 1)
        + struct.pack(">HHIII", 0, 0, 0, 0, 0)
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">IH", 0, 1)  # reserved, frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1),  # depth, pre_defined
    )
    trak_v = _box(
        b"trak",
        _tkhd(1, dur_ms, w, h)
        + _box(
            b"mdia",
            _mdhd(fps, n_frames)
            + _hdlr(b"vide", b"VideoHandler")
            + _box(
                b"minf",
                _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
                + _dinf()
                + _stbl(vse, n_frames, [len(j) for j in jpegs], video_off),
            ),
        ),
    )

    # AudioSampleEntry 'sowt': 6 reserved + dref idx, version/revision/
    # vendor, channelcount, samplesize, pre_defined, reserved,
    # samplerate as 16.16
    ase = _box(
        b"sowt",
        b"\x00" * 6
        + struct.pack(">H", 1)
        + struct.pack(">HHI", 0, 0, 0)
        + struct.pack(">HHHH", ch, 16, 0, 0)
        # 16.16 fixed; rates > 65535 Hz don't fit — write 0 and rely on
        # the mdhd timescale (which demux_mp4 already falls back to),
        # instead of silently truncating to a wrong nonzero rate
        + struct.pack(
            ">I", (sample_rate << 16) if sample_rate <= 0xFFFF else 0
        ),
    )
    trak_a = _box(
        b"trak",
        _tkhd(2, n_samp * 1000 // sample_rate, 0, 0)
        + _box(
            b"mdia",
            _mdhd(sample_rate, n_samp)
            + _hdlr(b"soun", b"SoundHandler")
            + _box(
                b"minf",
                _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
                + _dinf()
                + _stbl(ase, n_samp, 2 * ch, audio_off),
            ),
        ),
    )

    moov = _box(b"moov", mvhd + trak_v + trak_a)
    return ftyp + mdat + moov


# ---------------------------------------------------------------------------
# demux
# ---------------------------------------------------------------------------


def _iter_boxes(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [pos, end)."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise Mp4FormatError("truncated largesize box header")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise Mp4FormatError(f"box {fourcc!r} size {size} escapes container")
        yield fourcc, body, pos + size
        pos += size


def _find(data: bytes, pos: int, end: int, fourcc: bytes) -> tuple[int, int] | None:
    for fc, b, e in _iter_boxes(data, pos, end):
        if fc == fourcc:
            return b, e
    return None


def _parse_stsc(body: bytes) -> list[tuple[int, int]]:
    if len(body) < 8:
        raise Mp4FormatError("truncated stsc header")
    (n,) = struct.unpack(">I", body[4:8])
    if len(body) < 8 + 12 * n:
        raise Mp4FormatError("truncated stsc")
    out = []
    for i in range(n):
        first, per, _sdi = struct.unpack(">III", body[8 + 12 * i : 20 + 12 * i])
        if first < 1:
            # chunk numbering is 1-based; first_chunk=0 would make
            # offsets[c - 1] silently read offsets[-1] downstream
            raise Mp4FormatError("stsc first_chunk < 1")
        out.append((first, per))
    return out


def _parse_stsz(body: bytes) -> tuple[int, int, list[int]]:
    """stsz full-box body -> (n_samples, const_size, per-sample sizes)."""
    if len(body) < 12:
        raise Mp4FormatError("truncated stsz header")
    const, n = struct.unpack(">II", body[4:12])
    if n > _MAX_SAMPLES:
        raise Mp4FormatError(f"stsz declares {n} samples (> {_MAX_SAMPLES})")
    if const:
        return n, const, []
    if len(body) < 12 + 4 * n:
        raise Mp4FormatError("truncated stsz")
    return n, 0, list(struct.unpack(f">{n}I", body[12 : 12 + 4 * n]))


def _parse_offsets(stbl: bytes, b: int, e: int) -> list[int]:
    found = _find(stbl, b, e, b"stco")
    if found:
        cb, ce = found
        (n,) = struct.unpack(">I", stbl[cb + 4 : cb + 8])
        if ce - cb - 8 < 4 * n:
            raise Mp4FormatError("truncated stco")
        return list(struct.unpack(f">{n}I", stbl[cb + 8 : cb + 8 + 4 * n]))
    found = _find(stbl, b, e, b"co64")
    if found:
        cb, ce = found
        (n,) = struct.unpack(">I", stbl[cb + 4 : cb + 8])
        if ce - cb - 8 < 8 * n:
            raise Mp4FormatError("truncated co64")
        return list(struct.unpack(f">{n}Q", stbl[cb + 8 : cb + 8 + 8 * n]))
    raise Mp4FormatError("stbl missing stco/co64")


def _sample_ranges(payload: bytes, stbl_b: int, stbl_e: int) -> list[tuple[int, int]]:
    """Expand stsc/stsz/stco into absolute (offset, size) per sample,
    validated against the payload bounds (the bomb guard: declared
    sizes cannot address past the file)."""
    data = payload
    f = _find(data, stbl_b, stbl_e, b"stsz")
    if f is None:
        raise Mp4FormatError("stbl missing stsz")
    n_samples, const, sizes = _parse_stsz(data[f[0] : f[1]])
    f2 = _find(data, stbl_b, stbl_e, b"stsc")
    if f2 is None:
        raise Mp4FormatError("stbl missing stsc")
    stsc = _parse_stsc(data[f2[0] : f2[1]])
    offsets = _parse_offsets(data, stbl_b, stbl_e)

    ranges: list[tuple[int, int]] = []
    si = 0
    n_chunks = len(offsets)
    for ei, (first, per) in enumerate(stsc):
        last = stsc[ei + 1][0] - 1 if ei + 1 < len(stsc) else n_chunks
        for c in range(first, last + 1):
            if c - 1 >= n_chunks:
                break
            off = offsets[c - 1]
            for _ in range(per):
                if si >= n_samples:
                    break
                size = const if const else sizes[si]
                if off + size > len(payload):
                    raise Mp4FormatError(
                        f"sample {si} [{off}, {off + size}) escapes payload"
                    )
                ranges.append((off, size))
                off += size
                si += 1
    if si < n_samples:
        raise Mp4FormatError(
            f"sample tables cover {si} of {n_samples} declared samples"
        )
    return ranges


def demux_mp4(
    payload: bytes, skip_unsupported: bool = False
) -> tuple[list[bytes], np.ndarray, int]:
    """MP4 bytes -> (jpeg video samples, int16 PCM (n, ch), rate).

    Same return shape as ``avi_codec.demux_avi`` so the A/V operators
    route either container through one code path. Tracks with a sample
    entry we can't decode raise ``NotImplementedError`` (the honest
    seam); ``skip_unsupported=True`` skips them instead and returns
    whatever IS decodable — the near-dup posture, where an H.264 file
    with a PCM soundtrack should still fingerprint its audio. A
    structurally broken file raises ``Mp4FormatError`` either way —
    including hostile/truncated tables whose short slices would
    otherwise surface as ``struct.error`` (ADVICE r6 medium: that
    escaped the documented contract and the operators' handlers)."""
    try:
        return _demux_mp4_impl(payload, skip_unsupported)
    except struct.error as exc:
        raise Mp4FormatError(f"truncated/malformed MP4 structure: {exc}") from exc


def _demux_mp4_impl(
    payload: bytes, skip_unsupported: bool = False
) -> tuple[list[bytes], np.ndarray, int]:
    if not is_mp4(payload):
        raise Mp4FormatError("not an ISO-BMFF payload")
    moov = _find(payload, 0, len(payload), b"moov")
    if moov is None:
        raise Mp4FormatError("missing moov box")

    video_frames: list[bytes] = []
    samples = np.zeros((0, 1), dtype=np.int16)
    rate = 0

    for fc, tb, te in _iter_boxes(payload, moov[0], moov[1]):
        if fc != b"trak":
            continue
        mdia = _find(payload, tb, te, b"mdia")
        if mdia is None:
            raise Mp4FormatError("trak missing mdia")
        hdlr = _find(payload, mdia[0], mdia[1], b"hdlr")
        if hdlr is None:
            raise Mp4FormatError("mdia missing hdlr")
        handler = payload[hdlr[0] + 8 : hdlr[0] + 12]
        minf = _find(payload, mdia[0], mdia[1], b"minf")
        if minf is None:
            raise Mp4FormatError("mdia missing minf")
        stbl = _find(payload, minf[0], minf[1], b"stbl")
        if stbl is None:
            raise Mp4FormatError("minf missing stbl")
        stsd = _find(payload, stbl[0], stbl[1], b"stsd")
        if stsd is None:
            raise Mp4FormatError("stbl missing stsd")
        entry_fourcc = payload[stsd[0] + 12 : stsd[0] + 16]
        entry_body = stsd[0] + 16

        if handler == b"vide":
            if entry_fourcc in _VIDEO_UNSUPPORTED:
                if skip_unsupported:
                    continue
                raise NotImplementedError(
                    f"MP4 video codec {entry_fourcc.decode('latin1')!r} needs a "
                    "full bitstream decoder — out of scope for the "
                    "dependency-free build (same seam as lossy VP8)"
                )
            if entry_fourcc not in (b"jpeg", b"mjpa"):
                raise Mp4FormatError(f"unknown video sample entry {entry_fourcc!r}")
            ranges = _sample_ranges(payload, stbl[0], stbl[1])
            if len(ranges) > _MAX_FRAMES:
                raise Mp4FormatError(f"{len(ranges)} video samples (> {_MAX_FRAMES})")
            video_frames = [payload[o : o + s] for o, s in ranges]
        elif handler == b"soun":
            if entry_fourcc in _AUDIO_UNSUPPORTED:
                if skip_unsupported:
                    continue
                raise NotImplementedError(
                    f"MP4 audio codec {entry_fourcc.decode('latin1')!r} needs a "
                    "perceptual-model decoder — out of scope for the "
                    "dependency-free build (same seam as mp3-in-wav)"
                )
            if entry_fourcc not in (b"sowt", b"twos", b"raw "):
                raise Mp4FormatError(f"unknown audio sample entry {entry_fourcc!r}")
            ch, bits = struct.unpack(">HH", payload[entry_body + 16 : entry_body + 20])
            (rate_fx,) = struct.unpack(
                ">I", payload[entry_body + 24 : entry_body + 28]
            )
            rate = rate_fx >> 16
            if rate == 0:
                mdhd = _find(payload, mdia[0], mdia[1], b"mdhd")
                if mdhd:
                    (rate,) = struct.unpack(
                        ">I", payload[mdhd[0] + 12 : mdhd[0] + 16]
                    )
            if ch < 1:
                raise Mp4FormatError("audio track with zero channels")
            ranges = _sample_ranges(payload, stbl[0], stbl[1])
            data = b"".join(payload[o : o + s] for o, s in ranges)
            if entry_fourcc == b"raw " or bits == 8:
                n = len(data) // ch
                arr = np.frombuffer(data[: n * ch], dtype=np.uint8).reshape(n, ch)
                samples = ((arr.astype(np.int16) - 128) << 8).astype(np.int16)
            else:
                if bits != 16:
                    raise Mp4FormatError(f"PCM sample entry with {bits}-bit samples")
                dt = "<i2" if entry_fourcc == b"sowt" else ">i2"
                n = len(data) // (2 * ch)
                samples = (
                    np.frombuffer(data[: n * 2 * ch], dtype=dt)
                    .reshape(n, ch)
                    .astype(np.int16)
                )

    return video_frames, samples, int(rate)
