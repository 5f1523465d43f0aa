"""RIFF/AVI mux/demux (functions/avi_codec.py) + the cross-modal
av_fingerprint_pairs operator (operators/dedup.py).

The mux/demux contract: PCM audio round-trips losslessly, '##dc' chunks
come back as decodable JPEG frame bytes in order, stream-number mapping
follows strl order, hostile inputs raise the typed AviFormatError, and
the non-MJPG / non-PCM seams raise NotImplementedError (honest codec
seam, same posture as lossy VP8 in webp_codec)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from web_template_forensics_spark.functions.avi_codec import (
    AviFormatError,
    demux_avi,
    encode_avi,
    is_avi,
)
from web_template_forensics_spark.functions.jpeg_codec import decode_jpeg


def _clip(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return np.round(rng.uniform(-1, 1, n) * 12000).astype(np.int16)


def _frames(k: int, h: int = 24, w: int = 32, seed: int = 1) -> list[np.ndarray]:
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(k)]


def test_roundtrip_mono_and_stereo():
    frames = _frames(4)
    for ch in (1, 2):
        x = np.stack([_clip(4000, s) for s in range(ch)], axis=1)
        avi = encode_avi(frames, x, 16000)
        assert is_avi(avi)
        vf, samples, rate = demux_avi(avi)
        assert len(vf) == 4 and rate == 16000
        np.testing.assert_array_equal(samples, x)
        for fb, orig in zip(vf, frames):
            img = decode_jpeg(fb)
            assert img.shape == orig.shape


def test_frame_order_and_mjpeg_concat_hashable():
    # '00dc' chunks concatenate into a valid MJPEG stream whose sampled
    # frames are the muxed frames in order
    from web_template_forensics_spark.functions.jpeg_codec import (
        iter_jpeg_frame_spans,
    )

    frames = _frames(6, seed=3)
    avi = encode_avi(frames, _clip(3000), 8000)
    vf, _s, _r = demux_avi(avi)
    stream = b"".join(vf)
    spans = list(iter_jpeg_frame_spans(stream))
    assert len(spans) == 6
    for (s, e), fb in zip(spans, vf):
        assert stream[s:e] == fb


def _raw_chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")


def _raw_list(ltype: bytes, body: bytes) -> bytes:
    return _raw_chunk(b"LIST", ltype + body)


def test_audio_only_avi_24bit_widening():
    # hand-built audio-only AVI with a 24-bit PCM strf: demux follows
    # the same sample-widening rules as wav_codec (top two bytes), and
    # a missing video stream is a legal container
    x = _clip(600, 7)
    pcm24 = b"".join((int(v) << 8).to_bytes(3, "little", signed=True) for v in x.tolist())
    strh = (
        b"auds" + b"\x00" * 4
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 16000, 0, len(x), 0, 0xFFFFFFFF, 3)
        + struct.pack("<4h", 0, 0, 0, 0)
    )
    strf = struct.pack("<HHIIHH", 1, 1, 16000, 16000 * 3, 3, 24)
    hdrl = _raw_list(
        b"hdrl",
        _raw_chunk(b"avih", bytes(56))
        + _raw_list(b"strl", _raw_chunk(b"strh", strh) + _raw_chunk(b"strf", strf)),
    )
    movi = _raw_list(b"movi", _raw_chunk(b"00wb", pcm24))
    body = b"AVI " + hdrl + movi
    vf, samples, rate = demux_avi(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert vf == [] and rate == 16000
    np.testing.assert_array_equal(samples[:, 0], x)


def test_hostile_inputs_typed_errors():
    frames = _frames(2)
    good = encode_avi(frames, _clip(500), 16000)
    with pytest.raises(AviFormatError):
        demux_avi(b"RIFF\x08\x00\x00\x00AVI junk")  # no hdrl
    with pytest.raises(AviFormatError):
        demux_avi(good[:64])  # truncated inside hdrl
    with pytest.raises(AviFormatError):
        demux_avi(b"not an avi")
    # movi chunk for an undeclared stream
    bad = good.replace(b"00dc", b"07dc", 1)
    with pytest.raises(AviFormatError):
        demux_avi(bad)


def test_non_mjpg_video_is_honest_seam():
    good = encode_avi(_frames(2), _clip(500), 16000)
    with pytest.raises(NotImplementedError):
        demux_avi(good.replace(b"MJPG", b"H264"))


def test_non_pcm_audio_is_honest_seam():
    good = encode_avi(_frames(2), _clip(500), 16000)
    # audio strf starts with tag 1 (PCM); flip to 0x0055 (MP3)
    i = good.rindex(b"strf")
    bad = good[: i + 8] + struct.pack("<H", 0x55) + good[i + 10 :]
    with pytest.raises(NotImplementedError):
        demux_avi(bad)


def test_av_fingerprint_pairs_on_cluster(spark):
    """The cross-modal operator over the gate corpus: exactly the
    twin-predicted family-tagged pairs, including the AVI<->WAV/FLAC
    audio cross pairs and the AVI<->MJPEG/GIF video cross pairs; the
    corrupt row contributes nothing."""
    from web_template_forensics_spark.operators.dedup import av_fingerprint_pairs
    from web_template_forensics_spark.plans.multimodal_fixture import (
        av_corpus,
        av_corpus_hashes,
    )

    media = spark.createDataFrame(
        [(r["media_id"], bytearray(r["payload"])) for r in av_corpus()],
        "media_id long, payload binary",
    )
    got = {
        (r["family"], r["id_a"], r["id_b"]): r["hamming"]
        for r in av_fingerprint_pairs(media).collect()
    }
    hm = {(m, f): h for m, f, h in av_corpus_hashes()}

    def ham(f, a, b):
        return bin(hm[(a, f)] ^ hm[(b, f)]).count("1")

    want = {}
    radius = {"audio": 8, "video": 6}
    fams = {}
    for (m, f), _h in hm.items():
        fams.setdefault(f, []).append(m)
    for f, ids in fams.items():
        for i, a in enumerate(sorted(ids)):
            for b in sorted(ids)[i + 1 :]:
                d = ham(f, a, b)
                if d <= radius[f]:
                    want[(f, a, b)] = d
    assert got == want
    # the cross pairs the single-container operators cannot produce
    assert ("audio", 0, 1) in got and ("audio", 0, 2) in got
    assert ("video", 0, 3) in got and ("video", 4, 5) in got
    assert all(k[1] != 8 and k[2] != 8 for k in got)  # corrupt row dropped
