"""FLAC codec (functions/flac_codec.py) tests — exact round-trips
across channel assignments / block boundaries, hand-crafted streams for
the decoder-only paths (LPC, RICE2, escape + multi-partition residuals),
and hostile-input posture."""

from __future__ import annotations

import numpy as np
import pytest

from web_template_forensics_spark.functions.flac_codec import (
    FlacFormatError,
    decode_flac,
    encode_flac,
    is_flac,
)


def _rt(x, rate=16000, **kw):
    payload = encode_flac(x, rate, **kw)
    assert is_flac(payload)
    out, got_rate = decode_flac(payload)
    assert got_rate == rate
    want = x if x.ndim == 2 else x[:, None]
    assert out.shape == want.shape and (out == want).all()
    return payload


@pytest.mark.parametrize("n", [1, 100, 4095, 4096, 4097, 9000])
def test_roundtrip_block_boundaries(n):
    rng = np.random.RandomState(n)
    _rt(rng.randint(-32768, 32768, size=(n, 1)).astype(np.int16))


@pytest.mark.parametrize(
    "mode", ["independent", "mid_side", "left_side", "right_side"]
)
def test_roundtrip_every_channel_assignment(mode):
    rng = np.random.RandomState(7)
    x = rng.randint(-32768, 32768, size=(5000, 2)).astype(np.int16)
    _rt(x, stereo_mode=mode)
    # extremes stress the side channel's 17th bit
    ext = np.stack(
        [np.full(300, 32767, np.int16), np.full(300, -32768, np.int16)], axis=1
    )
    _rt(ext, stereo_mode=mode)


def test_constant_and_smooth_compress():
    flat = np.zeros((5000, 1), np.int16) + 12
    p = _rt(flat)
    assert len(p) < 200  # CONSTANT subframes
    t = np.arange(8000)
    smooth = (9000 * np.sin(t / 40)).astype(np.int16)[:, None]
    p = _rt(smooth, rate=44100)
    assert len(p) < smooth.nbytes * 0.7  # FIXED predictors earn their keep


def _hand_frame(subframe_bits, block_size, nchan=1):
    """Minimal single-frame stream: STREAMINFO + one frame whose
    subframe payload bits come from the caller."""
    from web_template_forensics_spark.functions.flac_codec import (
        _BitWriter,
        _crc8,
        _crc16,
        FLAC_MAGIC,
    )

    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(nchan - 1, 3)
    si.write(15, 5)
    si.write(block_size, 36)
    si.align()
    si_body = si.bytes() + bytes(16)
    head = FLAC_MAGIC + bytes([0x80]) + len(si_body).to_bytes(3, "big") + si_body
    bw = _BitWriter()
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)  # 16-bit blocksize at end
    bw.write(0, 4)
    bw.write(nchan - 1, 4)
    bw.write(4, 3)  # 16-bit
    bw.write(0, 1)
    bw.write(0, 8)  # frame number 0 (utf8 single byte)
    bw.write(block_size - 1, 16)
    bw.align()
    hdr = bw.bytes()
    b2 = _BitWriter()
    for b in hdr:
        b2.write(b, 8)
    b2.write(_crc8(hdr), 8)
    for val, nbits in subframe_bits:
        b2.write(val, nbits)
    b2.align()
    body = b2.bytes()
    return head + body + _crc16(body).to_bytes(2, "big")


def test_lpc_subframe_decodes():
    """Hand-crafted LPC order-2 subframe: coefficients (3, -1), shift 1,
    warm-up [10, 20], all residuals zero -> the recursion
    x[t] = (3*x[t-1] - x[t-2]) >> 1 + 0, verified against an
    independent in-test computation."""
    order, shift, coefs = 2, 1, [3, -1]
    n = 16
    bits = [
        (0, 1),  # padding
        (32 + order - 1, 6),  # LPC, order 2
        (0, 1),  # no wasted bits
        (10, 16),  # warm-up 1
        (20, 16),  # warm-up 2
        (3, 4),  # precision - 1 = 3 -> 4-bit coefficients
        (shift, 5),
        (3 & 0xF, 4),  # coef 1
        (-1 & 0xF, 4),  # coef 2
        (0, 2),  # residual method RICE
        (0, 4),  # partition order 0
        (0, 4),  # rice param 0
    ]
    # residuals: n - order zeros, each zigzag(0)=0 -> unary '1' bit
    bits += [(1, 1)] * (n - order)
    payload = _hand_frame(bits, n)
    out, _ = decode_flac(payload)
    want = [10, 20]
    for _ in range(n - order):
        want.append((3 * want[-1] - want[-2]) >> shift)
    assert out[:, 0].tolist() == want


def test_rice2_escape_and_multipartition_residuals():
    """Decoder-only residual paths: RICE2 (5-bit params), an ESCAPE
    partition (raw 5-bit verbatim residuals), and partition order 1."""
    n = 8
    res = [3, -2, 1, 0, -4, 5, -1, 2]
    bits = [
        (0, 1),
        (8, 6),  # FIXED order 0
        (0, 1),
        (1, 2),  # residual method RICE2
        (1, 4),  # partition order 1 -> two partitions of 4
        (31, 5),  # partition 1: escape (5-bit param alphabet)
        (5, 5),  # raw bit width 5
    ]
    for r in res[:4]:
        bits.append((r & 0x1F, 5))
    bits.append((0, 5))  # partition 2: rice param 0
    for r in res[4:]:
        z = (abs(r) << 1) - (r < 0)
        bits += [(1, z + 1)]  # unary zigzag (param 0: no low bits)
    payload = _hand_frame(bits, n)
    out, _ = decode_flac(payload)
    assert out[:, 0].tolist() == res


def test_hostile_inputs_typed_errors():
    rng = np.random.RandomState(3)
    good = encode_flac(rng.randint(-100, 100, size=(500, 1)).astype(np.int16), 8000)
    for bad in (
        b"",
        b"fLa",
        b"NOPE" + good[4:],
        good[:20],  # STREAMINFO truncated
        good[:-1],  # frame truncated
    ):
        with pytest.raises(FlacFormatError):
            decode_flac(bad)
    # corrupt one frame byte: CRC-16 must catch it
    body = bytearray(good)
    body[-10] ^= 0xFF
    with pytest.raises(FlacFormatError):
        decode_flac(bytes(body))


def test_bomb_guard():
    from web_template_forensics_spark.functions.flac_codec import _BitWriter, FLAC_MAGIC

    si = _BitWriter()
    si.write(4096, 16)
    si.write(4096, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write((1 << 36) - 1, 36)  # absurd declared total
    si.align()
    body = si.bytes() + bytes(16)
    payload = FLAC_MAGIC + bytes([0x80]) + len(body).to_bytes(3, "big") + body
    with pytest.raises(FlacFormatError, match="bomb"):
        decode_flac(payload)


# ---------------------------------------------------------------------------
# hypothesis properties
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 300),
    ch=st.integers(1, 2),
    mode=st.sampled_from(["independent", "mid_side", "left_side", "right_side"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_flac_roundtrip_property(n, ch, mode, seed):
    if ch == 1:
        mode = "independent"
    x = np.random.RandomState(seed).randint(-32768, 32768, (n, ch)).astype(np.int16)
    out, _ = decode_flac(encode_flac(x, 16000, stereo_mode=mode))
    assert (out == x).all()


@settings(max_examples=50, deadline=None)
@given(junk=st.binary(min_size=0, max_size=200))
def test_flac_decode_never_returns_garbage(junk):
    try:
        decode_flac(b"fLaC" + junk)
    except FlacFormatError:
        pass


# ---------------------------------------- vectorized rice decode parity


def _write_rice(bw, values, k):
    for v in values:
        u = (-v - 1) * 2 + 1 if v < 0 else v * 2  # zigzag
        q, r = u >> k, u & ((1 << k) - 1)
        bw.write_unary(q)
        if k:
            bw.write(r, k)


def test_rice_partition_vec_matches_scalar_reader():
    """_rice_partition_vec must be bitwise-identical to decoding the
    same stream with the scalar _BitReader primitives (read_unary +
    read), across params 0..14, mid-byte start offsets, hot/cold q
    distributions, and n around the 48-sample dispatch threshold."""
    import numpy as np

    from web_template_forensics_spark.functions.flac_codec import (
        _BitReader,
        _BitWriter,
        _rice_partition_vec,
    )

    rng = np.random.RandomState(99)
    for trial in range(40):
        k = int(rng.randint(0, 15))
        n = int(rng.choice([48, 49, 50, 63, 200, 1000, 4096]))
        spread = int(rng.choice([1, 3, 8]))
        vals = [
            int(v)
            for v in (rng.geometric(1.0 / spread, size=n) - 1)
            * rng.choice([-1, 1], size=n)
        ]
        lead_bits = int(rng.randint(0, 8))
        bw = _BitWriter()
        if lead_bits:
            bw.write(int(rng.randint(0, 1 << lead_bits)), lead_bits)
        _write_rice(bw, vals, k)
        bw.align()
        data = bw.bytes()

        br = _BitReader(data)
        br.pos = lead_bits
        got = _rice_partition_vec(br, n, k)
        assert got == vals, f"trial {trial} k={k} n={n}"

        # scalar reference off the independently-tested reader primitives
        br2 = _BitReader(data)
        br2.pos = lead_bits
        ref = []
        for _ in range(n):
            q = br2.read_unary()
            u = (q << k) | (br2.read(k) if k else 0)
            ref.append((u >> 1) ^ -(u & 1))
        assert got == ref
        assert br.pos == br2.pos  # consumed-bit parity


def test_rice_partition_vec_truncation_errors():
    """Truncated unary run and truncated trailing remainder raise the
    same FlacFormatError family the scalar loop raises."""
    import pytest as _pytest

    from web_template_forensics_spark.functions.flac_codec import (
        _BitReader,
        _BitWriter,
        FlacFormatError,
        _rice_partition_vec,
    )

    # 60 codes promised, stream holds only 10: unary run truncated
    bw = _BitWriter()
    _write_rice(bw, list(range(10)), 3)
    bw.align()
    br = _BitReader(bw.bytes())
    with _pytest.raises(FlacFormatError):
        _rice_partition_vec(br, 60, 3)

    # last code's remainder cut off: bitstream truncated
    bw = _BitWriter()
    _write_rice(bw, [1] * 60, 7)
    bw.align()
    data = bw.bytes()[:-1]
    br = _BitReader(data)
    with _pytest.raises(FlacFormatError):
        _rice_partition_vec(br, 60, 7)


def test_read_residual_dispatch_parity_via_roundtrip():
    """Whole-file parity: blocks sized to land partitions BOTH below and
    above the vectorized-dispatch threshold decode to the exact PCM."""
    import numpy as np

    from web_template_forensics_spark.functions.flac_codec import (
        decode_flac,
        encode_flac,
    )

    rng = np.random.RandomState(5)
    for n_samp, ch in [(100, 1), (4096, 2), (7000, 2), (47, 1), (48, 1)]:
        samples = rng.randint(-32768, 32768, size=(n_samp, ch)).astype(np.int16)
        payload = encode_flac(
            samples, 16000, stereo_mode="mid_side" if ch == 2 else "independent"
        )
        out, rate = decode_flac(payload)
        assert rate == 16000
        assert np.array_equal(out, samples.astype(out.dtype))
