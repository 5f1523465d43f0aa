"""Audio fingerprint (functions/audio_hash.py) + audio_fingerprint_pairs
operator tests — the audio siblings of test_image_hash.py. The margins
pinned here (same-clip re-encodes <= 8, distinct clips >= 12 at the
measured 6/17 extremes) carry the operator's default radius 8."""

from __future__ import annotations

import numpy as np
import pytest

from web_template_forensics_spark.functions.audio_hash import audio_hash64
from web_template_forensics_spark.plans.multimodal_fixture import (
    _base_clip,
    audio_fp_corpus,
    audio_fp_corpus_hashes,
)


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def test_deterministic_and_exactly_gain_invariant():
    rng = np.random.RandomState(5)
    x = _base_clip(rng, 4096, band_limited=False)
    h = audio_hash64(x)
    assert h == audio_hash64(x.copy()) and 0 <= h < (1 << 64)
    # log-domain differences cancel a global gain EXACTLY (float input,
    # no re-quantization): the property the whole design rests on
    for g in (0.25, 0.5, 2.0, 7.5):
        assert audio_hash64(x * g) == h, g


def test_stereo_mono_mix_and_short_clip_paths():
    rng = np.random.RandomState(6)
    x = _base_clip(rng, 2048, band_limited=True)
    stereo = np.stack([x, x], axis=1)
    assert audio_hash64(stereo) == audio_hash64(x)
    # clips below the padding floor still hash (zero-padded), and
    # differently-from-everything reasonable
    tiny = np.round(x[:100]).astype(np.int16)
    assert 0 <= audio_hash64(tiny) < (1 << 64)


def test_operating_point_margins():
    rng = np.random.RandomState(11)
    hashes = []
    for i in range(8):
        n = 4096 + (i % 3) * 512
        x = _base_clip(rng, n, band_limited=i % 2 == 0)
        h0 = audio_hash64(np.round(x).astype(np.int16))
        variants = [
            np.round(x * 0.6).astype(np.int16),
            np.round(x * 1.2).astype(np.int16),
            np.round(x + rng.uniform(-60.0, 60.0, n)).astype(np.int16),
        ]
        for v in variants:
            assert _ham(h0, audio_hash64(v)) <= 8, i
        hashes.append(h0)
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            assert _ham(hashes[i], hashes[j]) >= 12, (i, j)


def test_corpus_twin_shape():
    corpus = audio_fp_corpus()
    hashes = dict(audio_fp_corpus_hashes())
    assert len(corpus) - len(hashes) == 1  # the corrupt RIFF row
    assert set(hashes) == {r["media_id"] for r in corpus if r["base"] >= 0}


def test_audio_fingerprint_pairs_on_cluster(spark):
    """Operator == twin on the distributed path, corrupt row dropped,
    and the decode stage reused across the self-join (same pin as the
    image side)."""
    from web_template_forensics_spark.operators.dedup import audio_fingerprint_pairs

    corpus = audio_fp_corpus()
    media = spark.createDataFrame(
        [(r["media_id"], bytearray(r["payload"])) for r in corpus],
        "media_id long, payload binary",
    )
    df = audio_fingerprint_pairs(media, max_hamming=8)
    rows = df.collect()
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in rows}
    hashes = dict(audio_fp_corpus_hashes())
    ids = sorted(hashes)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = _ham(hashes[a], hashes[b])
            if d <= 8:
                want[(a, b)] = d
    assert got == want
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedQueryStage" in plan or "ReusedExchange" in plan
