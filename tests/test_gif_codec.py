"""GIF codec (functions/gif_codec.py) tests — round-trips across the
decoder's whole feature matrix (palette sizes, interlace, multi-frame
disposal/transparency, LZW dict-cap reset), plus hostile-input posture,
mirroring test_png_codec.py."""

from __future__ import annotations

import numpy as np
import pytest

from web_template_forensics_spark.functions.gif_codec import (
    GifFormatError,
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_animation,
    is_gif,
)


def _pal_img(rng: np.random.RandomState, h: int, w: int, ncolors: int) -> np.ndarray:
    pal = rng.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    # re-draw degenerate palettes: _palettize dedups identical colors,
    # which would make the round-trip comparison exact but the ncolors
    # sweep meaningless
    while len(np.unique(pal.reshape(-1, 3), axis=0)) < ncolors:
        pal = rng.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    idx = rng.randint(0, ncolors, (h, w))
    return pal[idx]


@pytest.mark.parametrize("ncolors", [2, 3, 16, 17, 200, 256])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_palette_sizes_and_interlace(ncolors, interlace):
    rng = np.random.RandomState(ncolors + int(interlace))
    img = _pal_img(rng, 33, 47, ncolors)
    payload = encode_gif(img, interlace=interlace)
    assert is_gif(payload)
    out = decode_gif(payload)
    np.testing.assert_array_equal(out, img)


def test_roundtrip_greyscale_and_single_color():
    g = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 4 + 2)
    np.testing.assert_array_equal(
        decode_gif(encode_gif(g)), np.repeat(g[:, :, None], 3, axis=2)
    )
    flat = np.full((5, 9, 3), 123, dtype=np.uint8)
    np.testing.assert_array_equal(decode_gif(encode_gif(flat)), flat)


def test_lzw_dict_cap_reset_roundtrip():
    # a large non-repetitive image pushes the LZW dict past 4096 entries
    # -> the encoder's mid-stream clear + the decoder's reset both run
    rng = np.random.RandomState(0)
    img = _pal_img(rng, 150, 200, 256)
    np.testing.assert_array_equal(decode_gif(encode_gif(img)), img)


def test_animation_roundtrip_and_disposal_leave():
    rng = np.random.RandomState(3)
    frames = [_pal_img(rng, 21, 30, 40) for _ in range(5)]
    payload = encode_gif_animation(frames, disposal=1)
    out = decode_gif_frames(payload)
    assert len(out) == 5
    for got, want in zip(out, frames):
        np.testing.assert_array_equal(got, want)


def test_transparency_composites_through():
    # frame 2's key-colored pixels must show frame 1 underneath
    base = np.full((10, 10, 3), 200, dtype=np.uint8)
    overlay = np.zeros((10, 10, 3), dtype=np.uint8)
    overlay[:5] = (255, 0, 0)  # top half opaque red, bottom half key-black
    payload = encode_gif_animation([base, overlay], transparent_key=(0, 0, 0))
    f1, f2 = decode_gif_frames(payload)
    np.testing.assert_array_equal(f1, base)
    assert (f2[:5] == (255, 0, 0)).all()
    assert (f2[5:] == 200).all()  # composited through


def test_over_256_colors_refused():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
    assert len(np.unique(img.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(GifFormatError, match="quantize"):
        encode_gif(img)


def test_hostile_inputs_typed_errors():
    rng = np.random.RandomState(4)
    good = encode_gif(_pal_img(rng, 16, 16, 8))
    for bad in (
        b"",
        b"GIF8",
        b"NOTGIF" + good[6:],
        good[:10],  # truncated header
        good[:-1],  # trailer gone
        good[: len(good) // 2],  # mid-LZW cut
    ):
        with pytest.raises(GifFormatError):
            decode_gif(bad)
    # corrupt LZW interior: flip bytes inside the first data sub-block
    body = bytearray(good)
    body[-10] ^= 0xFF
    body[-9] ^= 0xFF
    try:
        decode_gif(bytes(body))
    except GifFormatError:
        pass  # either a typed error or a (wrong-pixel) decode — never a crash


def test_bomb_guard_rejects_pixel_flood():
    # a descriptor claiming a huge logical screen + frame must be
    # rejected before materializing pixels
    import struct

    head = b"GIF89a" + struct.pack("<HHBBB", 0xFFFF, 0xFFFF, 0x80, 0, 0)
    gct = bytes(6)
    desc = struct.pack("<BHHHHB", 0x2C, 0, 0, 0xFFFF, 0xFFFF, 0)
    payload = head + gct + desc + bytes([2]) + b"\x00" + b"\x3b"
    with pytest.raises(GifFormatError):
        decode_gif(payload)


def _tiny_frame_flood_gif(n_frames: int, sw: int = 2000, sh: int = 2000) -> bytes:
    """Hostile GIF: huge logical screen, many ONE-pixel frames. The
    per-frame-rect total_px guard sees only n_frames pixels, but every
    kept frame is a full sw*sh canvas copy (the r5 ADVICE attack: 920
    bytes -> 720 MB materialized)."""
    import struct

    head = b"GIF89a" + struct.pack("<HHBBB", sw, sh, 0x80, 0, 0)
    gct = bytes(6)  # 2-entry color table, all black
    # 1x1 frame: descriptor + LZW min code size 2 + {clear, 0, EOI} = 2 bytes
    frame = (
        struct.pack("<BHHHHB", 0x2C, 0, 0, 1, 1, 0)
        + bytes([2])
        + bytes([2, 0x44, 0x01])
        + b"\x00"
    )
    return head + gct + frame * n_frames + b"\x3b"


def test_kept_canvas_bomb_guard_many_tiny_frames():
    # 60 one-pixel frames on a 2000x2000 screen: keeping every canvas
    # would materialize 60 * 4M px (~720 MB) — the cumulative KEPT-canvas
    # guard must fire (mirrors decode_webp_frames), while a bounded
    # sampler and the single-frame image path stay cheap and succeed.
    payload = _tiny_frame_flood_gif(60)
    with pytest.raises(GifFormatError, match="kept canvases"):
        decode_gif_frames(payload)  # keep-all: 17th kept canvas > 2^26 px
    # sample_k bounds the kept set below the guard
    frames = decode_gif_frames(payload, sample_k=4)
    assert len(frames) == 4
    # decode_gif keeps exactly one canvas (sample_k=1) — the ADVICE attack
    # payload decodes instead of flooding memory
    img = decode_gif(payload)
    assert img.shape == (2000, 2000, 3)


def test_decode_image_gif_branch():
    from web_template_forensics_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(5)
    img = _pal_img(rng, 12, 18, 6)
    out = decode_image(encode_gif(img))
    np.testing.assert_array_equal(out, img)


def test_fuzz_sweep_roundtrips_cross_width_boundaries():
    # deterministic sweep over sizes/palette-counts so LZW width bumps,
    # the 4096 clear, and the flush-emit boundary all get crossed
    rng = np.random.RandomState(99)
    for _ in range(60):
        h = int(rng.randint(1, 40))
        w = int(rng.randint(1, 40))
        nc = int(rng.randint(2, 257))
        pal = rng.randint(0, 256, (nc, 3), dtype=np.uint8)
        img = pal[rng.randint(0, nc, (h, w))]
        for il in (False, True):
            assert (decode_gif(encode_gif(img, interlace=il)) == img).all()
    # long-run repetitive content exercises the KwKwK path heavily
    for _ in range(20):
        h = int(rng.randint(1, 30))
        w = int(rng.randint(1, 200))
        img = np.full((h, w, 3), rng.randint(0, 256, 3, dtype=np.uint8), dtype=np.uint8)
        img[:, ::7] = (1, 2, 3)
        assert (decode_gif(encode_gif(img)) == img).all()


# ---------------------------------------------------------------------------
# hypothesis properties
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=50, deadline=None)
@given(
    h=st.integers(1, 14),
    w=st.integers(1, 14),
    nc=st.integers(2, 256),
    inter=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(h, w, nc, inter, seed):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (nc, 3), dtype=np.uint8)
    img = pal[rng.randint(0, nc, (h, w))]
    out = decode_gif(encode_gif(img, interlace=inter))
    assert out.shape == img.shape and (out == img).all()


@settings(max_examples=50, deadline=None)
@given(junk=st.binary(min_size=0, max_size=200))
def test_gif_decode_never_returns_garbage(junk):
    """Arbitrary bytes after the signature either decode or raise the
    typed error; no hangs, no unbounded allocation."""
    try:
        decode_gif(b"GIF89a" + junk)
    except GifFormatError:
        pass


def test_disposal_restore_background_vs_previous():
    """Per-frame disposal: after the overlay frame, disposal 3 restores
    what was UNDER it (frame 1's pixels) while disposal 2 restores the
    background (black — encode_gif_animation writes no GCT). A fully
    key-transparent third frame makes the restored canvas observable."""
    base = np.full((6, 6, 3), 20, dtype=np.uint8)  # frame 1: leave (d=1)
    ov = np.full((6, 6, 3), 20, dtype=np.uint8)
    ov[2:4, 2:4] = (250, 1, 1)  # frame 2: the distinguishing disposal
    key = (1, 2, 3)
    probe = np.full((6, 6, 3), key, dtype=np.uint8)  # frame 3: all key
    # frames are full-screen, so frame 2's disposal rect is the whole
    # canvas: disposal 3 restores frame 1's pixels EVERYWHERE, disposal
    # 2 restores the background everywhere
    for disp2, want in ((3, 20), (2, 0)):
        payload = encode_gif_animation(
            [base, ov, probe], transparent_key=key, disposal=[1, disp2, 1]
        )
        f1, f2, f3 = decode_gif_frames(payload)
        assert (f1 == 20).all()
        assert (f2[2:4, 2:4] == (250, 1, 1)).all()
        assert (f2[0, 0] == 20).all()
        assert (f3 == want).all(), disp2
