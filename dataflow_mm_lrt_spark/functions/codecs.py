"""Pure-numpy media codecs for uncompressed formats.

The container has no image/audio libraries, but this package ships
pure-numpy codecs for the dominant wire formats, so the multimodal
operators (operators/multimodal.py) have a REAL code path end-to-end.
Uncompressed formats live here; the compressed ones have sibling
modules (functions/png.py, gif.py, jpeg.py — baseline AND progressive
— tiff.py with PackBits/LZW, and webp.py with the full VP8L lossless
bitstream). What remains (lossy VP8 WebP, MP4/H.264, FLAC,
arithmetic-coded JPEG) stays behind a PIL/soundfile import-try upgrade
and raises ``CodecUnavailable``.

Formats in this module:
* PPM ``P6`` (binary RGB, maxval ≤ 255), with comment support
* BMP ``BITMAPINFOHEADER``, 24/32-bit uncompressed (BI_RGB)
* WAV RIFF PCM 16-bit (chunk walk: fmt + data)
* "raw video" = concatenated P6 frames (an honest uncompressed
  container; ``iter_ppm_frames`` walks it sequentially)

Reference parity note: the reference decodes eagerly per row with PIL /
decord pools (utils/utils.py:27 _load_image); here decoding happens
inside Arrow batches in ``mapInPandas`` stages.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np


class CodecUnavailable(NotImplementedError):
    """Raised when bytes are not one of the dependency-free formats and
    no optional library is installed to handle them."""


# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------

def _ppm_header(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Parse the three header ints after the magic, skipping whitespace
    and ``#`` comments; returns (fields, payload_offset)."""
    fields: list[int] = []
    n = len(buf)
    while len(fields) < 3:
        while pos < n and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < n and buf[pos : pos + 1] == b"#":
            while pos < n and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not buf[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(buf[start:pos]))
    return fields, pos + 1  # single whitespace after maxval


def decode_ppm(buf: bytes, pos: int = 0) -> tuple[np.ndarray, int]:
    """Decode one P6 frame starting at ``pos``; returns ((H, W, 3)
    uint8, offset past the frame) so concatenated streams can be
    walked."""
    if buf[pos : pos + 2] != b"P6":
        raise ValueError("not a P6 PPM")
    (w, h, maxval), payload = _ppm_header(buf, pos + 2)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    end = payload + w * h * 3
    if end > len(buf):
        raise ValueError("truncated PPM payload")
    img = np.frombuffer(buf[payload:end], dtype=np.uint8).reshape(h, w, 3)
    return img, end


def encode_ppm(img: np.ndarray) -> bytes:
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img.astype(np.uint8)
    ).tobytes()


def iter_ppm_frames(buf: bytes) -> Iterator[np.ndarray]:
    """Walk a concatenated-P6 'raw video' stream frame by frame.
    Non-P6 bytes (a compressed container) raise ``CodecUnavailable`` —
    the upgrade path there is a PyAV/decord install, absent here."""
    if buf and buf[:2] != b"P6":
        raise CodecUnavailable(
            "video bytes are not a concatenated-P6 stream and no video "
            "library is installed"
        )
    pos = 0
    while pos < len(buf):
        img, pos = decode_ppm(buf, pos)
        yield img


def iter_video_frames(buf: bytes) -> Iterator[np.ndarray]:
    """Format-sniffing multi-frame decode: animated GIF (a real public
    container, functions/gif.py) or a concatenated-P6 raw stream.
    Anything else raises ``CodecUnavailable`` (PyAV/decord upgrade
    path, absent here)."""
    if buf[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import iter_gif_frames

        try:
            for frame, _delay in iter_gif_frames(buf):
                yield frame
            return
        except CodecUnavailable:
            raise
        except Exception as exc:
            raise CodecUnavailable(f"corrupt GIF video: {exc}") from exc
    yield from iter_ppm_frames(buf)


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, uncompressed 24/32bpp)
# ---------------------------------------------------------------------------

def decode_bmp(buf: bytes) -> np.ndarray:
    if buf[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise CodecUnavailable("BITMAPCOREHEADER BMP not supported")
    w = struct.unpack_from("<i", buf, 18)[0]
    h = struct.unpack_from("<i", buf, 22)[0]
    bpp = struct.unpack_from("<H", buf, 28)[0]
    compression = struct.unpack_from("<I", buf, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise CodecUnavailable(f"compressed/{bpp}bpp BMP not supported")
    bottom_up = h > 0
    h = abs(h)
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) & ~3
    rows = np.frombuffer(
        buf[pixel_off : pixel_off + stride * h], dtype=np.uint8
    ).reshape(h, stride)[:, : w * bytes_pp].reshape(h, w, bytes_pp)
    if bottom_up:
        rows = rows[::-1]
    # BGR(A) → RGB
    return np.ascontiguousarray(rows[:, :, 2::-1])


# ---------------------------------------------------------------------------
# WAV (RIFF PCM16)
# ---------------------------------------------------------------------------

def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Returns ((n_samples, channels) int16, sample_rate)."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, n = 12, len(buf)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise CodecUnavailable(f"WAV format={audio_format}/{bits}bit not supported")
    samples = np.frombuffer(data[: len(data) // (2 * channels) * 2 * channels],
                            dtype="<i2").reshape(-1, channels)
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    channels = samples.shape[1]
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


# ---------------------------------------------------------------------------
# dispatch + transforms
# ---------------------------------------------------------------------------

def sniff(buf: bytes) -> str:
    if buf[:2] == b"P6":
        return "ppm"
    if buf[:2] == b"BM":
        return "bmp"
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return "wav"
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if buf[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if buf[:2] == b"\xff\xd8":
        return "jpeg"
    if buf[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if buf[:4] == b"RIFF" and buf[8:12] == b"WEBP":
        return "webp"
    return "unknown"


def decode_audio(buf: bytes) -> tuple[np.ndarray, int]:
    """((n, ch) int16, rate) from PCM WAV; soundfile upgrade for the
    rest (absent in this container → CodecUnavailable)."""
    if sniff(buf) == "wav":
        return decode_wav(buf)
    try:  # optional-library upgrade
        import io

        import soundfile  # type: ignore

        data, rate = soundfile.read(io.BytesIO(buf), dtype="int16",
                                    always_2d=True)
        return data, rate
    except ImportError:
        raise CodecUnavailable(
            "bytes are not PCM WAV and soundfile is not installed"
        ) from None


def decode_image(buf: bytes) -> np.ndarray:
    """(H, W, 3) uint8 from PPM/BMP/PNG/GIF/TIFF/JPEG (baseline AND
    progressive)/WebP-lossless; PIL upgrade path for the rest (lossy
    VP8 WebP, arithmetic-coded JPEG...)."""
    kind = sniff(buf)
    if kind == "ppm":
        try:
            return decode_ppm(buf)[0]
        except CodecUnavailable:
            raise
        except Exception as exc:
            # Truncated/corrupt bytes behind a valid magic must surface
            # as the one catchable type the per-row error paths gate on
            # (decode_failed = true), never a raw ValueError/struct.error
            # that would fail the whole Spark task.
            raise CodecUnavailable(f"corrupt PPM: {exc}") from exc
    if kind == "bmp":
        try:
            return decode_bmp(buf)
        except CodecUnavailable:
            raise
        except Exception as exc:
            raise CodecUnavailable(f"corrupt BMP: {exc}") from exc
    if kind == "png":
        from .png import decode_png

        try:
            return decode_png(buf)
        except CodecUnavailable:
            raise
        except Exception as exc:
            # Corrupt bytes behind a valid magic: surface the single
            # catchable type the pipeline gates on, not decoder internals.
            raise CodecUnavailable(f"corrupt PNG: {exc}") from exc
    if kind == "gif":
        from .gif import decode_gif_first_frame

        try:
            return decode_gif_first_frame(buf)
        except CodecUnavailable:
            raise
        except Exception as exc:
            raise CodecUnavailable(f"corrupt GIF: {exc}") from exc
    if kind == "jpeg":
        from .jpeg import decode_jpeg

        try:
            return decode_jpeg(buf)
        except CodecUnavailable:
            raise
        except Exception as exc:
            raise CodecUnavailable(f"corrupt JPEG: {exc}") from exc
    if kind == "tiff":
        from .tiff import decode_tiff

        try:
            return decode_tiff(buf)
        except CodecUnavailable:
            raise
        except Exception as exc:
            raise CodecUnavailable(f"corrupt TIFF: {exc}") from exc
    if kind == "webp":
        from .webp import decode_webp

        try:
            return decode_webp(buf)
        except CodecUnavailable:
            raise
        except Exception as exc:
            raise CodecUnavailable(f"corrupt WebP: {exc}") from exc
    try:  # optional-library upgrade (absent in this container)
        import io

        from PIL import Image  # type: ignore

        return np.asarray(Image.open(io.BytesIO(buf)).convert("RGB"))
    except ImportError:
        raise CodecUnavailable(
            "bytes are not PPM/BMP and PIL is not installed"
        ) from None


def resize_bilinear(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Vectorized bilinear resample (align_corners=False convention)."""
    h, w = img.shape[:2]
    ys = (np.arange(height) + 0.5) * h / height - 0.5
    xs = (np.arange(width) + 0.5) * w / width - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    img = img.astype(np.float64)
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return np.clip(np.round(top * (1 - wy) + bot * wy), 0, 255).astype(np.uint8)
