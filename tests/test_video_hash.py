"""Video fingerprint (functions/video_hash.py) + video_phash_pairs
operator tests — completes the perceptual-dedup triad alongside
test_image_hash.py and test_audio_hash.py. The margins pinned here
(same-clip re-encodes/trims/reversals <= 4, distinct clips >= 18 at the
measured 2/26 extremes) carry the operator's default radius 6."""

from __future__ import annotations

import numpy as np
import pytest

from web_template_forensics_spark.functions.jpeg_codec import encode_jpeg, encode_mjpeg
from web_template_forensics_spark.functions.video_hash import (
    mjpeg_video_hash64,
    video_hash64,
)
from web_template_forensics_spark.plans.multimodal_fixture import (
    _base_frames,
    video_fp_corpus,
    video_fp_corpus_hashes,
)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_majority_vote_semantics():
    # strict majority per bit, ties -> 0, order-invariant
    a, b, c = 0b1100, 0b1010, 0b1001
    assert video_hash64([a, b, c]) == 0b1000  # bit3: 3/3; bits 2,1,0: 1/3
    assert video_hash64([a, b]) == 0b1000  # 1/2 is a tie -> 0; 2/2 -> 1
    assert video_hash64([c, a, b]) == video_hash64([a, b, c])
    assert video_hash64([a]) == a
    with pytest.raises(ValueError):
        video_hash64([])
    # full-width bits survive the shift path
    top = 1 << 63
    assert video_hash64([top, top, 0]) == top


def test_operating_point_margins():
    rng = np.random.RandomState(17)
    hashes = []
    for i in range(6):
        frames = _base_frames(rng, 40 + (i % 3) * 8, 56 - (i % 2) * 8)
        h0 = mjpeg_video_hash64(encode_mjpeg(frames, quality=85))
        variants = [
            encode_mjpeg(frames, quality=78),
            b"".join(encode_jpeg(f, quality=85, progressive=True) for f in frames),
            encode_mjpeg(frames[1:][::-1], quality=85),
        ]
        for v in variants:
            assert _ham(h0, mjpeg_video_hash64(v)) <= 4, i
        hashes.append(h0)
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            assert _ham(hashes[i], hashes[j]) >= 18, (i, j)


def test_corrupt_and_partial_decode_paths():
    with pytest.raises(ValueError):
        mjpeg_video_hash64(b"not a video at all")
    # a stream whose tail frame is truncated still hashes on the frames
    # that decode (per-frame skip, not whole-row failure)
    rng = np.random.RandomState(19)
    frames = _base_frames(rng, 40, 48)
    good = encode_mjpeg(frames, quality=85)
    spans = encode_jpeg(frames[-1], quality=85)
    broken = good[: len(good) - len(spans) // 2]
    assert 0 <= mjpeg_video_hash64(broken) < (1 << 64)


def test_corpus_twin_shape():
    corpus = video_fp_corpus()
    hashes = dict(video_fp_corpus_hashes())
    assert len(corpus) - len(hashes) == 1  # the corrupt row
    assert set(hashes) == {r["media_id"] for r in corpus if r["base"] >= 0}


def test_video_phash_pairs_on_cluster(spark):
    """Operator == twin on the distributed path, corrupt row dropped,
    decode stage reused across the self-join (same pin as image/audio)."""
    from web_template_forensics_spark.operators.dedup import video_phash_pairs

    corpus = video_fp_corpus()
    media = spark.createDataFrame(
        [(r["media_id"], bytearray(r["payload"])) for r in corpus],
        "media_id long, payload binary",
    )
    df = video_phash_pairs(media, max_hamming=6)
    rows = df.collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    hashes = dict(video_fp_corpus_hashes())
    ids = sorted(hashes)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = _ham(hashes[a], hashes[b])
            if d <= 6:
                want[(a, b)] = d
    assert got == want
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedQueryStage" in plan or "ReusedExchange" in plan


def test_cross_format_mjpeg_vs_gif():
    """The same clip re-containered as an animated GIF pairs with its
    MJPEG encodings — the cross-format pin the dispatcher exists for."""
    from web_template_forensics_spark.functions.gif_codec import encode_gif_animation
    from web_template_forensics_spark.functions.video_hash import video_payload_hash64

    rng = np.random.RandomState(23)
    frames = _base_frames(rng, 40, 48, grey=True)
    h_mj = video_payload_hash64(encode_mjpeg(frames, quality=85))
    h_gif = video_payload_hash64(encode_gif_animation(frames))
    h_gif_rev = video_payload_hash64(
        encode_gif_animation(frames[1:][::-1], interlace=True)
    )
    assert _ham(h_mj, h_gif) <= 4
    assert _ham(h_mj, h_gif_rev) <= 4
    other = _base_frames(rng, 40, 48, grey=True)
    assert _ham(h_gif, video_payload_hash64(encode_gif_animation(other))) >= 18
    with pytest.raises(ValueError):
        video_payload_hash64(b"GIF89a" + b"\x00" * 8)  # corrupt GIF -> drop


def test_cross_format_mjpeg_vs_animated_webp():
    """Third container: the same clip as MJPEG and as animated WebP
    (lossless VP8L frames) pairs up, incl. a trimmed reversed cut."""
    from web_template_forensics_spark.functions.video_hash import video_payload_hash64
    from web_template_forensics_spark.functions.webp_codec import (
        encode_webp_animation,
    )

    rng = np.random.RandomState(29)
    frames = _base_frames(rng, 40, 48, grey=True)
    h_mj = video_payload_hash64(encode_mjpeg(frames, quality=85))
    h_wp = video_payload_hash64(encode_webp_animation(frames))
    h_wp_rev = video_payload_hash64(
        encode_webp_animation(frames[1:][::-1], cache_bits=5)
    )
    assert _ham(h_mj, h_wp) <= 4
    assert _ham(h_mj, h_wp_rev) <= 4
    with pytest.raises(ValueError):
        video_payload_hash64(b"RIFF\x10\x00\x00\x00WEBPVP8L" + bytes(8))
