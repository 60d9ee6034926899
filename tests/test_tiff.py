"""TIFF codec validation (functions/tiff.py).

Non-circular anchors: PackBits against the worked example published in
the TIFF 6.0 specification (§9 — spec bytes, not this repo's encoder),
LZW against a hand-decoded minimal vector, plus encoder→decoder
round-trips that deliberately cross the 9→10→11-bit LZW width
boundaries and exercise both byte orders, strips, the horizontal-
differencing predictor, grayscale photometrics and the RGBA alpha
drop. The EarlyChange width pairing cannot be cross-checked against
libtiff in this container (PIL absent) — the boundary-crossing
round-trips pin the matched pair, and the import-try parity test
below activates automatically if PIL ever appears.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dataflow_mm_lrt_spark.functions import codecs
from dataflow_mm_lrt_spark.functions.tiff import (
    decode_tiff,
    encode_tiff,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
)

rng = np.random.default_rng(6)


def _img(h=23, w=31):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        ((xx * 7 + yy * 3) % 256),
        ((xx // 4) * 16 % 256),
        np.full((h, w), 99),
    ], axis=-1).astype(np.uint8)


# ------------------------------------------------------------- packbits


def test_packbits_spec_worked_example():
    """The exact example from TIFF 6.0 §9 ('say we have data...'):
    published compressed bytes → published expanded bytes."""
    compressed = bytes.fromhex("FEAA0280002AFDAA0380002A22F7AA")
    expanded = bytes.fromhex("AAAAAA80002A" + "AA" * 4 + "80002A22" + "AA" * 10)
    assert packbits_decode(compressed, len(expanded)) == expanded
    # and the repo encoder reproduces the spec's own compression
    assert packbits_encode(expanded) == compressed


def test_packbits_noop_128_skipped():
    # 0x80 is a no-op by spec; decoder must skip it
    assert packbits_decode(b"\x80\x00A", 1) == b"A"


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_packbits_roundtrip(data):
    assert packbits_decode(packbits_encode(data), len(data)) == data


# ------------------------------------------------------------------ lzw


def test_lzw_hand_vector():
    """Hand-packed minimal stream: Clear(256), 'A'(65), 'B'(66),
    EOI(257), 9-bit MSB-first. 256=100000000, 65=000100000 1,
    66=001000010, 257=100000001 → packed bits:
    100000000 001000001 001000010 100000001 (+pad)."""
    bits = "100000000" + "001000001" + "001000010" + "100000001"
    bits += "0" * (-len(bits) % 8)
    data = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    assert lzw_decode(data, 2) == b"AB"


@settings(max_examples=40, deadline=None)
@given(st.binary(min_size=0, max_size=800))
def test_lzw_roundtrip(data):
    assert lzw_decode(lzw_encode(data), len(data)) == data


def test_lzw_roundtrip_crosses_width_boundaries():
    """>511 distinct table adds forces 9→10→11-bit codes: the width
    pairing between encoder and decoder is pinned exactly at the
    EarlyChange boundaries (an off-by-one garbles everything after)."""
    r = np.random.default_rng(99)
    data = bytes(r.integers(0, 256, size=30_000, dtype=np.uint8))
    assert lzw_decode(lzw_encode(data), len(data)) == data
    # and highly repetitive data (deep table strings)
    rep = (b"abcabd" * 3000) + bytes(r.integers(0, 4, 2000, dtype=np.uint8))
    assert lzw_decode(lzw_encode(rep), len(rep)) == rep


# ----------------------------------------------------------- container


@pytest.mark.parametrize("byte_order", ["<", ">"])
@pytest.mark.parametrize("compression", [1, 5, 32773])
def test_tiff_roundtrip_orders_and_compressions(byte_order, compression):
    img = _img()
    blob = encode_tiff(img, compression=compression, byte_order=byte_order)
    out = decode_tiff(blob)
    assert np.array_equal(out, img)


def test_tiff_same_pixels_all_encodings_agree():
    img = _img(17, 40)
    ref = decode_tiff(encode_tiff(img))
    for kw in [
        {"compression": 5},
        {"compression": 32773, "byte_order": ">"},
        {"compression": 5, "predictor": 2},
        {"rows_per_strip": 4},
        {"compression": 32773, "rows_per_strip": 3},
    ]:
        assert np.array_equal(decode_tiff(encode_tiff(img, **kw)), ref), kw


def test_tiff_predictor_horizontal_differencing():
    # wide row so a naive non-wrapping cumsum would clip
    img = np.tile(np.arange(300, dtype=np.uint8)[None, :, None], (3, 1, 3))
    blob = encode_tiff(img, compression=5, predictor=2)
    assert np.array_equal(decode_tiff(blob), img)


def test_tiff_grayscale_and_white_is_zero():
    g = rng.integers(0, 256, (9, 13)).astype(np.uint8)
    out = decode_tiff(encode_tiff(g))
    assert out.shape == (9, 13, 3)
    assert np.array_equal(out[..., 0], g)
    # WhiteIsZero: hand-patch photometric 262 to 0 → inverted
    blob = bytearray(encode_tiff(g))
    i = blob.find((262).to_bytes(2, "little"))
    assert i > 0
    blob[i + 8] = 0
    inv = decode_tiff(bytes(blob))
    assert np.array_equal(inv[..., 0], 255 - g)


def test_tiff_strips_and_dispatch():
    img = _img(25, 12)
    blob = encode_tiff(img, rows_per_strip=7, compression=32773)
    assert codecs.sniff(blob) == "tiff"
    assert np.array_equal(codecs.decode_image(blob), img)


def test_tiff_gates_are_codec_unavailable():
    img = _img(8, 8)
    blob = bytearray(encode_tiff(img))
    # compression 7 (JPEG-in-TIFF): patch tag 259's value
    i = blob.find((259).to_bytes(2, "little"))
    blob[i + 8] = 7
    with pytest.raises(codecs.CodecUnavailable, match="compression"):
        decode_tiff(bytes(blob))
    # corrupt bytes behind the magic surface as CodecUnavailable via
    # the decode_image wrapper (per-row error path contract)
    with pytest.raises(codecs.CodecUnavailable):
        codecs.decode_image(b"II*\x00garbage-after-magic")


def test_tiff_pil_parity_if_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = _img()
    for comp in (1, 5, 32773):
        blob = encode_tiff(img, compression=comp)
        ref = np.asarray(PIL.open(io.BytesIO(blob)).convert("RGB"))
        assert np.array_equal(ref, img), comp


def test_packbits_encode_matches_byte_scan_reference():
    """The vectorized run-array packbits encoder (r7) must emit the
    exact bytes of the original greedy byte-at-a-time scan."""
    import numpy as np

    from dataflow_mm_lrt_spark.functions.tiff import (
        packbits_decode,
        packbits_encode,
    )

    def ref(data: bytes) -> bytes:
        out = bytearray()
        i, n = 0, len(data)
        while i < n:
            run = 1
            while i + run < n and run < 128 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                out += bytes([257 - run, data[i]])
                i += run
                continue
            lit_start = i
            while i < n and i - lit_start < 128:
                run = 1
                while i + run < n and run < 3 and data[i + run] == data[i]:
                    run += 1
                if run >= 3:
                    break
                i += 1
            out += bytes([i - lit_start - 1]) + data[lit_start:i]
        return bytes(out)

    rng = np.random.default_rng(13)
    for t in range(60):
        n = int(rng.integers(0, 2000))
        kind = t % 4
        if kind == 0:
            data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        elif kind == 1:
            data = rng.integers(0, 3, n, dtype=np.uint8).tobytes()
        elif kind == 2:
            data = np.repeat(
                rng.integers(0, 256, max(n // 150 + 1, 1), dtype=np.uint8),
                150,
            )[:n].tobytes()
        else:
            data = (np.arange(n) % 251).astype(np.uint8).tobytes()
        enc = packbits_encode(data)
        assert enc == ref(data), (t, n)
        assert packbits_decode(enc, n) == data
