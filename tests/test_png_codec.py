"""Round-trip + robustness tests for the dependency-free PNG codec
(functions/png_codec.py) and its integration into decode_image /
the mapInPandas media operators — the round-5 close of the last honest
multimodal stub."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from web_template_forensics_spark.functions.png_codec import (
    PNG_SIGNATURE,
    PngFormatError,
    _chunk,
    decode_png,
    encode_png,
)
from web_template_forensics_spark.operators.multimodal import decode_image


def _rand_img(h, w, c, seed):
    rng = np.random.RandomState(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return rng.randint(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_exact_all_filters_all_channels(filter_type, channels):
    img = _rand_img(23, 17, channels, seed=filter_type * 10 + channels)
    out = decode_png(encode_png(img, filter_type=filter_type))
    want = img if channels > 1 else img  # grey decodes back to (h, w)
    assert out.dtype == np.uint8
    assert out.shape == want.shape
    assert (out == want).all()


def test_roundtrip_gradient_and_flat():
    # gradients exercise Sub/Average/Paeth predictions meaningfully
    # (random data makes every filter behave like None + noise)
    y, x = np.mgrid[0:64, 0:48]
    img = np.stack([(y * 3) % 256, (x * 5) % 256, (y + x) % 256], axis=2).astype(np.uint8)
    for ft in range(5):
        assert (decode_png(encode_png(img, filter_type=ft)) == img).all()
    flat = np.full((8, 8, 3), 200, dtype=np.uint8)
    assert (decode_png(encode_png(flat, filter_type=4)) == flat).all()


def test_single_pixel_and_single_row():
    one = np.array([[[1, 2, 3]]], dtype=np.uint8)
    assert (decode_png(encode_png(one, filter_type=4)) == one).all()
    row = _rand_img(1, 40, 3, seed=9)
    col = _rand_img(40, 1, 3, seed=10)
    for ft in range(5):
        assert (decode_png(encode_png(row, filter_type=ft)) == row).all()
        assert (decode_png(encode_png(col, filter_type=ft)) == col).all()


def test_palette_image_decodes_to_rgb():
    """Hand-built colour-type-3 PNG: 4x2 indices into a 3-colour PLTE."""
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2, 1], [2, 2, 0, 0]], dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + r.tobytes() for r in idx)
    png = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", palette.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out.shape == (2, 4, 3)
    assert (out == palette[idx]).all()


def test_multi_idat_chunks():
    img = _rand_img(16, 16, 3, seed=3)
    png = encode_png(img, filter_type=2)
    # split the single IDAT into two chunks
    sig_ihdr = png[: 8 + 25]  # signature + IHDR chunk (12 + 13 bytes)
    idat_len = struct.unpack(">I", png[33:37])[0]
    idat_body = png[41 : 41 + idat_len]
    half = len(idat_body) // 2
    rebuilt = (
        sig_ihdr
        + _chunk(b"IDAT", idat_body[:half])
        + _chunk(b"IDAT", idat_body[half:])
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(rebuilt) == img).all()


def test_corruption_fails_loudly():
    img = _rand_img(8, 8, 3, seed=1)
    png = bytearray(encode_png(img))
    with pytest.raises(PngFormatError, match="signature"):
        decode_png(b"NOTAPNG" + bytes(png))
    flipped = bytearray(png)
    flipped[50] ^= 0xFF  # inside IDAT body -> CRC mismatch
    with pytest.raises(PngFormatError, match="CRC|truncated"):
        decode_png(bytes(flipped))
    with pytest.raises(PngFormatError, match="truncated|IEND"):
        decode_png(bytes(png[:-20]))


def test_interlaced_and_16bit_raise_notimplemented():
    def make(bitdepth, interlace):
        ihdr = struct.pack(">IIBBBBB", 2, 2, bitdepth, 2, 0, 0, interlace)
        return (
            PNG_SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" * 14))
            + _chunk(b"IEND", b"")
        )

    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_png(make(8, 1))
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(make(16, 0))


def test_decode_image_real_png_path():
    """decode_image now really decodes PNG payloads — fake=True is a
    fallback permission for codec-less formats, not an override."""
    rgb = _rand_img(12, 9, 3, seed=5)
    assert (decode_image(encode_png(rgb)) == rgb).all()
    assert (decode_image(encode_png(rgb), fake=True) == rgb).all()
    grey = _rand_img(6, 7, 1, seed=6)
    out = decode_image(encode_png(grey))
    assert out.shape == (6, 7, 3)
    assert (out[:, :, 0] == grey).all() and (out[:, :, 1] == grey).all()
    rgba = _rand_img(5, 5, 4, seed=7)
    out = decode_image(encode_png(rgba))
    assert (out == rgba[:, :, :3]).all()
    # JPEG payloads now route to the real jpeg_codec (corrupt body ->
    # format error, not NotImplementedError); codec-less formats (WebP)
    # still raise the honest stub error
    from web_template_forensics_spark.functions.jpeg_codec import JpegFormatError

    with pytest.raises(JpegFormatError):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg bytes")
    with pytest.raises(NotImplementedError, match="beyond PNG/baseline-JPEG"):
        decode_image(b"RIFF\x00\x00\x00\x00WEBP")


def test_media_features_real_png_on_cluster(spark):
    """End-to-end through the byte-bounded mapInPandas operator with
    REAL PNG payloads and fake_decode=False: the histogram features must
    equal the driver-side numpy computation on the same pixels."""
    from web_template_forensics_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
        image_thumbnails,
        resize_image,
    )

    imgs = [_rand_img(16 + i, 12 + i, 3, seed=100 + i) for i in range(6)]
    rows = [
        (
            i,
            "image",
            encode_png(img, filter_type=i % 5),
            {"width": img.shape[1], "height": img.shape[0], "sample_rate": None,
             "duration_ms": None, "codec": "png"},
        )
        for i, img in enumerate(imgs)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = (
        extract_media_features(media, fake_decode=False)
        .toPandas()
        .set_index("media_id")
        .sort_index()
    )
    assert len(feats) == len(imgs)
    for i, img in enumerate(imgs):
        want = np.histogram(img, bins=8, range=(0, 255))[0].astype(np.float64)
        want = want / max(1.0, want.sum())
        np.testing.assert_allclose(
            np.array(feats.loc[i, "feat"]), want.astype(np.float32), rtol=1e-6
        )

    thumbs = (
        image_thumbnails(media, out_h=4, out_w=4, fake_decode=False)
        .toPandas()
        .set_index("media_id")
        .sort_index()
    )
    for i, img in enumerate(imgs):
        want = resize_image(img, 4, 4)
        got = np.frombuffer(thumbs.loc[i, "thumb"], dtype=np.uint8).reshape(4, 4, 3)
        assert (got == want).all()


# ---------------------------------------------------------------------------
# hypothesis properties
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    h=st.integers(1, 13),
    w=st.integers(1, 13),
    c=st.sampled_from([1, 2, 3, 4]),
    ft=st.integers(0, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, c, ft, seed):
    img = _rand_img(h, w, c, seed)
    out = decode_png(encode_png(img, filter_type=ft))
    assert out.shape == img.shape and (out == img).all()


@settings(max_examples=60, deadline=None)
@given(junk=st.binary(min_size=0, max_size=200))
def test_png_decode_never_returns_garbage(junk):
    """Arbitrary bytes after the signature either decode (CRC + size +
    inflate all happen to check out — effectively impossible) or raise a
    typed error; no hangs, no silent wrong-shaped output."""
    try:
        decode_png(PNG_SIGNATURE + junk)
    except (PngFormatError, NotImplementedError):
        pass
