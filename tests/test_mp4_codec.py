"""ISO-BMFF (MP4) mux/demux coverage (round 6): the second multiplexed
container after RIFF/AVI — box-tree walking, stsc/stsz/stco sample
expansion, supported 'jpeg'/'sowt'/'twos'/'raw ' sample entries, the
honest NotImplementedError seam for avc1/mp4a, skip_unsupported
partial demux, and the hostile-input guards. Pure codec tests (no
Spark); the operator face is covered by test_avi_codec's cluster test
over the extended av_corpus.

Reference parity: the reference repo has no media handling at all
(SURVEY.md §0 / §2 multimodal graft)."""

import struct

import numpy as np
import pytest

from web_template_forensics_spark.functions.jpeg_codec import decode_jpeg, encode_jpeg
from web_template_forensics_spark.functions.mp4_codec import (
    Mp4FormatError,
    demux_mp4,
    encode_mp4,
    is_mp4,
)


def _frames(n=5, seed=11, h=16, w=16):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w, 3)).astype(np.uint8) for _ in range(n)]


def _clip(n=3000):
    return (np.sin(np.arange(n) / 15.0) * 9000).astype(np.int16)


def test_mp4_roundtrip_mono():
    frames, x = _frames(), _clip()
    p = encode_mp4(frames, x, 16000)
    assert is_mp4(p) and not is_mp4(b"RIFF\x00\x00\x00\x00AVI ")
    vf, samples, rate = demux_mp4(p)
    assert rate == 16000
    # 'sowt' PCM is lossless; 'jpeg' samples are byte-identical to the
    # per-frame encoder output (and decode for real)
    assert (samples[:, 0] == x).all() and samples.shape == (len(x), 1)
    assert vf == [encode_jpeg(f, quality=85) for f in frames]
    assert decode_jpeg(vf[0]).shape == (16, 16, 3)


def test_mp4_roundtrip_stereo():
    frames, x = _frames(3), _clip(1000)
    xs = np.stack([x, (-x // 2).astype(np.int16)], axis=1)
    vf, samples, rate = demux_mp4(encode_mp4(frames, xs, 8000))
    assert rate == 8000 and (samples == xs).all() and len(vf) == 3


def _retag(payload: bytes, old: bytes, new: bytes, after: bytes) -> bytes:
    """Replace the first `old` fourcc occurring after `after` (both in
    moov, which the muxer writes after mdat, so payload bytes in mdat
    can't be hit)."""
    buf = bytearray(payload)
    at = buf.index(old, buf.index(after))
    buf[at : at + len(old)] = new
    return bytes(buf)


def test_mp4_unsupported_video_codec_raises_or_skips():
    p = _retag(encode_mp4(_frames(), _clip(), 16000), b"jpeg", b"avc1", b"stsd")
    with pytest.raises(NotImplementedError, match="avc1"):
        demux_mp4(p)
    # partial demux: the PCM soundtrack still decodes
    vf, samples, rate = demux_mp4(p, skip_unsupported=True)
    assert vf == [] and samples.shape[0] == 3000 and rate == 16000


def test_mp4_unsupported_audio_codec_raises_or_skips():
    p = encode_mp4(_frames(), _clip(), 16000)
    at = p.index(b"sowt", p.index(b"stsd", p.index(b"soun")))
    p2 = p[:at] + b"mp4a" + p[at + 4 :]
    with pytest.raises(NotImplementedError, match="mp4a"):
        demux_mp4(p2)
    vf, samples, _ = demux_mp4(p2, skip_unsupported=True)
    assert len(vf) == 5 and samples.shape[0] == 0


def test_mp4_twos_is_byteswapped_sowt():
    x = _clip(500)
    p = encode_mp4(_frames(1), x, 16000)
    # retag 'sowt' -> 'twos' (big-endian): demux must byteswap, so the
    # samples come back as the BE reinterpretation of the LE payload
    at = p.index(b"sowt", p.index(b"soun"))
    p2 = p[:at] + b"twos" + p[at + 4 :]
    _, samples, _ = demux_mp4(p2)
    assert (samples[:, 0] == x.astype("<i2").view(">i2").astype(np.int16)).all()


def test_mp4_truncated_and_hostile():
    p = encode_mp4(_frames(2), _clip(100), 16000)
    with pytest.raises(Mp4FormatError, match="escapes container"):
        demux_mp4(p[:200])  # mdat size now points past EOF
    with pytest.raises(Mp4FormatError, match="not an ISO-BMFF"):
        demux_mp4(b"\x00" * 40)
    # no moov at all
    ftyp_only = p[: struct.unpack(">I", p[:4])[0]]
    with pytest.raises(Mp4FormatError, match="missing moov"):
        demux_mp4(ftyp_only)


def test_mp4_stsz_bomb_guard():
    """A forged stsz sample size cannot allocate past the payload: the
    expansion validates every (offset, size) against the file bounds."""
    p = bytearray(encode_mp4(_frames(2), _clip(100), 16000))
    stsz_at = p.index(b"stsz")  # video track's stsz (first)
    # first per-sample size entry sits at stsz+4(ver/flags)+4(const)+4(n)
    struct.pack_into(">I", p, stsz_at + 4 + 12, 1 << 30)
    with pytest.raises(Mp4FormatError, match="escapes payload"):
        demux_mp4(bytes(p))


def test_mp4_declared_sample_count_guard():
    p = bytearray(encode_mp4(_frames(2), _clip(100), 16000))
    stsz_at = p.index(b"stsz")
    struct.pack_into(">I", p, stsz_at + 4 + 8, 1 << 27)  # sample_count
    with pytest.raises(Mp4FormatError, match="declares"):
        demux_mp4(bytes(p))


# ---------------------------------------------------------------------------
# round 7: ADVICE r6 hardening pins
# ---------------------------------------------------------------------------


def test_truncated_tables_raise_mp4formaterror_not_struct_error():
    import struct as _struct

    import pytest

    from web_template_forensics_spark.functions.mp4_codec import (
        Mp4FormatError,
        _parse_stsc,
        _parse_stsz,
        demux_mp4,
        encode_mp4,
    )

    with pytest.raises(Mp4FormatError):
        _parse_stsz(b"\x00\x00\x00\x00\x00")  # shorter than the 12-byte header
    with pytest.raises(Mp4FormatError):
        _parse_stsc(b"\x00\x00\x00\x00\x00\x00")  # shorter than 8
    # first_chunk=0 must be rejected, not silently read offsets[-1]
    bad_stsc = b"\x00\x00\x00\x00" + _struct.pack(">I", 1) + _struct.pack(">III", 0, 1, 1)
    with pytest.raises(Mp4FormatError):
        _parse_stsc(bad_stsc)
    # a syntactically-plausible prefix of a real file must never leak
    # struct.error through demux_mp4
    full = encode_mp4(_frames(1), np.zeros((64, 1), dtype=np.int16), 8000)
    for cut in (10, 40, 80, 120, len(full) - 5):
        try:
            demux_mp4(full[:cut])
        except Mp4FormatError:
            pass  # the documented contract
        except NotImplementedError:
            pass  # unsupported-entry seam is also in-contract


def test_encode_mp4_hi_res_rate_roundtrip():
    from web_template_forensics_spark.functions.mp4_codec import demux_mp4, encode_mp4

    pcm = np.zeros((96, 1), dtype=np.int16)
    payload = encode_mp4(_frames(1), pcm, 96000)
    _vf, samples, rate = demux_mp4(payload)
    assert rate == 96000  # was (96000 & 0xFFFF) = 30464 before the fix
    assert samples.shape[0] == 96
