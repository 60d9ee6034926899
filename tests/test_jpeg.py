"""JPEG codec validation — non-circular where it matters.

Components are checked against independent test-side reimplementation
of the published formulas: the DCT matrix against a naive double-sum
of the spec's cosine definition, the zigzag table against an
algorithmic diagonal walk, canonical Huffman assignment against a
hand-built BITS/HUFFVAL vector, EXTEND against spec examples. The
encoder→decoder round-trips then carry analytic error bounds: at
quality 100 every quantizer is 1, so the only loss is coefficient
rounding (max pixel error ≤ a few counts).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dataflow_mm_lrt_spark.functions import codecs
from dataflow_mm_lrt_spark.functions.jpeg import (
    ZIGZAG,
    _extend,
    build_codes,
    dct_matrix,
    decode_jpeg,
    encode_jpeg,
    optimal_table,
)

rng = np.random.default_rng(21)


# -- independent component checks --------------------------------------------

def test_dct_matrix_vs_naive_double_sum():
    # T.81 A.3.3: F(u,v) = 1/4 C(u)C(v) ΣΣ f(x,y) cos((2x+1)uπ/16)cos((2y+1)vπ/16)
    f = rng.normal(0, 50, (8, 8))
    C = dct_matrix()
    fast = C @ f @ C.T
    naive = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        f[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            naive[u, v] = 0.25 * cu * cv * s
    np.testing.assert_allclose(fast, naive, atol=1e-9)
    # and the inverse really inverts
    np.testing.assert_allclose(C.T @ fast @ C, f, atol=1e-9)


def test_zigzag_vs_diagonal_walk():
    # walk anti-diagonals, alternating direction, as the spec figure does
    order = []
    for d in range(15):
        rc = [(r, d - r) for r in range(8) if 0 <= d - r < 8]
        if d % 2 == 0:
            rc.reverse()  # even diagonals run bottom-left → top-right
        order += [r * 8 + c for r, c in rc]
    assert order == ZIGZAG.tolist()


def test_canonical_codes_hand_vector():
    # BITS = one 2-bit code, two 3-bit codes → canonical codes 00, 010, 011
    bits = [0, 1, 2] + [0] * 13
    codes = build_codes(bits, [7, 3, 9])
    assert codes == {7: (0b00, 2), 3: (0b010, 3), 9: (0b011, 3)}


def test_extend_spec_examples():
    # T.81 Table F.1: category 2 holds -3,-2,2,3; received bits are the
    # low-order bits of the magnitude (negatives offset)
    assert _extend(0, 0) == 0
    assert _extend(0, 1) == -1 and _extend(1, 1) == 1
    assert [_extend(v, 2) for v in range(4)] == [-3, -2, 2, 3]
    assert _extend(0, 5) == -31 and _extend(31, 5) == 31


@settings(max_examples=50, deadline=None)
@given(st.dictionaries(st.integers(0, 255), st.integers(1, 10_000),
                       min_size=1, max_size=200))
def test_optimal_table_always_valid(freqs):
    bits, huffval = optimal_table(freqs)
    assert sum(bits) == len(huffval) == len(freqs)
    codes = build_codes(bits, huffval)
    # prefix-free, ≤16 bits, all-ones-of-any-length never assigned
    seen = set()
    for sym, (code, length) in codes.items():
        assert 1 <= length <= 16
        assert code < (1 << length)
        assert code != (1 << length) - 1, "all-ones code must stay reserved"
        for other, (oc, ol) in codes.items():
            if other != sym and ol >= length:
                assert (oc >> (ol - length)) != code or other == sym
        seen.add((code, length))
    assert len(seen) == len(codes)


# -- round-trips with analytic bounds ----------------------------------------

def test_quality100_444_near_lossless():
    x = np.linspace(0, 255, 48)
    img = np.stack(
        np.broadcast_arrays(x[None, :], x[:, None], np.full((48, 48), 90.0)),
        axis=2,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100, subsample="444"))
    assert out.shape == img.shape
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 3


def test_grayscale_roundtrip():
    g = rng.integers(0, 256, (17, 23)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=100))
    assert out.shape == (17, 23, 3)
    assert int(np.abs(out[..., 0].astype(int) - g.astype(int)).max()) <= 3
    # channels replicated
    np.testing.assert_array_equal(out[..., 0], out[..., 1])


def test_odd_dimensions_and_blocks_padded():
    img = rng.integers(0, 256, (13, 29, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=92))
    assert out.shape == (13, 29, 3)


def test_420_subsampling_smooth_bound():
    x = np.linspace(30, 220, 64)
    img = np.stack(
        np.broadcast_arrays(x[None, :], x[:, None], 0.5 * (x[None, :] + x[:, None])),
        axis=2,
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95, subsample="420"))
    d = np.abs(out.astype(int) - img.astype(int))
    assert float(d.mean()) < 2.0 and int(d.max()) <= 12


def test_restart_markers_roundtrip():
    img = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=85))
    rst = decode_jpeg(encode_jpeg(img, quality=85, restart_interval=3))
    # restart markers change framing, not content
    np.testing.assert_array_equal(plain, rst)


def test_compresses_for_real():
    base = np.cumsum(np.cumsum(rng.normal(0, 4, (96, 96, 3)), 0), 1)
    base = ((base - base.min()) / (base.max() - base.min()) * 255).astype(np.uint8)
    buf = encode_jpeg(base, quality=75, subsample="420")
    assert len(buf) < base.nbytes / 8, "should beat 8x on smooth content"


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(60, 100),
       st.integers(0, 2**32 - 1))
def test_roundtrip_shape_property(h, w, q, seed):
    r = np.random.default_rng(seed)
    img = r.integers(0, 256, (h, w, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=q))
    assert out.shape == img.shape and out.dtype == np.uint8


# -- dispatch + gates --------------------------------------------------------

def test_decode_image_dispatch():
    img = np.full((9, 9, 3), 123, dtype=np.uint8)
    buf = encode_jpeg(img, quality=100)
    assert codecs.sniff(buf) == "jpeg"
    out = codecs.decode_image(buf)
    assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 3


def test_corrupt_jpeg_codec_unavailable():
    with pytest.raises(codecs.CodecUnavailable):
        codecs.decode_image(b"\xff\xd8\xff\xe0 then garbage")


def test_progressive_rejected_clearly():
    # minimal stream with a SOF2 marker: must raise CodecUnavailable
    # with a message pointing at the upgrade path, not a parse error
    buf = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    with pytest.raises(codecs.CodecUnavailable, match="progressive|PIL"):
        decode_jpeg(buf)
