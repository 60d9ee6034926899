"""PNG codec validation — non-circular where it matters.

The decoder's unfiltering is checked against an independent TEST-SIDE
implementation of the spec's *forward* filter equations (an inverse
pair, like the number→words speller that validates the Whisper FST):
the test filters known pixels per the W3C PNG spec formulas, assembles
a real PNG byte stream by hand, and the decoder must recover the
pixels exactly. Encoder round-trips and hypothesis properties cover
the rest.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dataflow_mm_lrt_spark.functions.png import (
    PNG_SIG,
    decode_png,
    decode_png_native,
    encode_png,
)

rng = np.random.default_rng(7)


# -- independent forward filterer (spec equations, NOT the codec code) --

def _fwd_paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _forward_filter(rows: np.ndarray, bpp: int, ftypes: list[int]) -> bytes:
    """Apply PNG forward filters per spec: Filt(x) = Orig(x) - Pred(x)."""
    out = bytearray()
    prev = np.zeros(rows.shape[1], dtype=int)
    for y, ftype in zip(range(rows.shape[0]), ftypes):
        orig = rows[y].astype(int)
        filt = np.zeros_like(orig)
        for i in range(len(orig)):
            left = orig[i - bpp] if i >= bpp else 0
            up = prev[i]
            upleft = prev[i - bpp] if i >= bpp else 0
            pred = {
                0: 0,
                1: left,
                2: up,
                3: (left + up) // 2,
                4: _fwd_paeth(left, up, upleft),
            }[ftype]
            filt[i] = (orig[i] - pred) % 256
        out.append(ftype)
        out += bytes(filt.astype(np.uint8))
        prev = orig
    return bytes(out)


def _chunk(name: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + name
        + data
        + struct.pack(">I", zlib.crc32(name + data) & 0xFFFFFFFF)
    )


def _assemble(w, h, depth, ctype, raw, extra=b"") -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + extra
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_each_filter_inverted_exactly(ftype):
    img = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    raw = _forward_filter(img.reshape(5, 12), bpp=3, ftypes=[ftype] * 5)
    out = decode_png(_assemble(4, 5, 8, 2, raw))
    np.testing.assert_array_equal(out, img)


def test_mixed_filters_inverted_exactly():
    img = rng.integers(0, 256, (7, 6, 3), dtype=np.uint8)
    raw = _forward_filter(img.reshape(7, 18), bpp=3,
                          ftypes=[0, 1, 2, 3, 4, 2, 1])
    out = decode_png(_assemble(6, 7, 8, 2, raw))
    np.testing.assert_array_equal(out, img)


def test_hand_vector_2x2_gray():
    # 2x2 gray, Sub filter on both rows, computed by hand:
    # row0 pixels 10, 20 → filt = 10, (20-10)=10; row1 30, 40 → 30, 10
    raw = bytes([1, 10, 10, 1, 30, 10])
    out = decode_png(_assemble(2, 2, 8, 0, raw))
    expect = np.repeat(
        np.array([[10, 20], [30, 40]], dtype=np.uint8)[:, :, None], 3, axis=2
    )
    np.testing.assert_array_equal(out, expect)


def test_rgba_alpha_dropped_like_pil():
    img = rng.integers(0, 256, (3, 3, 4), dtype=np.uint8)
    out = decode_png(encode_png(img))
    np.testing.assert_array_equal(out, img[..., :3])


def test_gray_alpha_native():
    img = rng.integers(0, 256, (4, 2, 2), dtype=np.uint8)
    raw = _forward_filter(img.reshape(4, 4), bpp=2, ftypes=[4, 3, 2, 1])
    arr, info = decode_png_native(_assemble(2, 4, 8, 4, raw))
    np.testing.assert_array_equal(arr, img)
    assert info["color_type"] == 4


def test_16bit_high_byte():
    img16 = rng.integers(0, 65536, (3, 2, 3), dtype=np.uint16)
    body = img16.astype(">u2").tobytes()
    rows = np.frombuffer(body, dtype=np.uint8).reshape(3, 12)
    raw = _forward_filter(rows, bpp=6, ftypes=[0, 2, 4])
    arr, info = decode_png_native(_assemble(2, 3, 16, 2, bytes(raw)))
    np.testing.assert_array_equal(arr, img16)
    out = decode_png(_assemble(2, 3, 16, 2, bytes(raw)))
    np.testing.assert_array_equal(out, (img16 >> 8).astype(np.uint8))


def test_palette_lookup():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
    raw = bytes([0, 0, 1, 0, 2, 0])  # filter 0 rows
    png = _assemble(2, 2, 8, 3, raw, extra=_chunk(b"PLTE", pal.tobytes()))
    np.testing.assert_array_equal(decode_png(png), pal[idx])


@pytest.mark.parametrize("depth,vals,expect", [
    (1, [0b10010000], [255, 0, 0, 255]),        # 4px wide, 1-bit
    (2, [0b00011011], [0, 85, 170, 255]),        # 4px wide, 2-bit
    (4, [0x0F, 0xA0], [0, 255, 170, 0]),         # 4px wide, 4-bit
])
def test_subbyte_gray_scaled(depth, vals, expect):
    raw = bytes([0] + vals)  # one scanline, filter 0
    out = decode_png(_assemble(4, 1, depth, 0, raw))
    np.testing.assert_array_equal(out[0, :, 0], np.array(expect, np.uint8))
    assert (out[..., 0] == out[..., 1]).all()


def test_adam7_interlaced():
    # independent test-side interlacer: emit the 7 passes per spec order
    img = rng.integers(0, 256, (9, 10, 3), dtype=np.uint8)
    passes = ((0, 8, 0, 8), (0, 8, 4, 8), (4, 8, 0, 4), (0, 4, 2, 4),
              (2, 4, 0, 2), (0, 2, 1, 2), (1, 2, 0, 1))
    raw = bytearray()
    for r0, rs, c0, cs in passes:
        sub = img[r0::rs, c0::cs]
        if sub.size == 0:
            continue
        ph, pw = sub.shape[:2]
        raw += _forward_filter(sub.reshape(ph, pw * 3), bpp=3,
                               ftypes=[(y % 5) for y in range(ph)])
    ihdr = struct.pack(">IIBBBBB", 10, 9, 8, 2, 0, 0, 1)
    png = (PNG_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(bytes(raw)))
           + _chunk(b"IEND", b""))
    np.testing.assert_array_equal(decode_png(png), img)


def test_crc_rejected():
    png = bytearray(encode_png(np.zeros((2, 2, 3), np.uint8)))
    png[20] ^= 0xFF  # corrupt IHDR payload without fixing its CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))


def test_multiple_idat_chunks():
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    raw = _forward_filter(img.reshape(4, 12), bpp=3, ftypes=[2, 2, 2, 2])
    z = zlib.compress(raw)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    png = (PNG_SIG + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", z[: len(z) // 2])
           + _chunk(b"IDAT", z[len(z) // 2 :])
           + _chunk(b"IEND", b""))
    np.testing.assert_array_equal(decode_png(png), img)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 8),
    w=st.integers(1, 8),
    c=st.sampled_from([1, 3, 4]),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_property(h, w, c, seed):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, c), np.uint8)
    arr, info = decode_png_native(encode_png(img))
    np.testing.assert_array_equal(arr, img)


def test_dispatch_via_decode_image():
    from dataflow_mm_lrt_spark.functions.codecs import decode_image, sniff

    img = rng.integers(0, 256, (3, 5, 3), dtype=np.uint8)
    buf = encode_png(img)
    assert sniff(buf) == "png"
    np.testing.assert_array_equal(decode_image(buf), img)
