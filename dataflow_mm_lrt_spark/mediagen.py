"""Deterministic synthetic media content for the driver contract and
the golden generators (tools/gen_media_goldens.py).

Everything here is seeded ONLY by the integer row id, so the emitted
bytes are identical at every scale factor — the contract oracles join
goldens on the id and restrict to the ids present in the ``documents``
view, which makes the corpus-level dedup math scale-aware while the
per-row content stays fixed.

Image design: ``N_IMAGE_BASES`` structured base patterns (smooth
gradients + hard blocks, so the 32×32 pHash downscale keeps real
low-frequency content) with a small per-id pixel perturbation — ids
sharing a base are perceptual near-duplicates (Hamming ≲ 5), distinct
bases sit ~32 bits apart (tests/test_phash.py pins both properties).

Audio design: mono int16 sine at an id-dependent frequency/amplitude
with an id-dependent silence tail; every 10th id is driven past the
rail and clipped. Samples are clipped to ±32767 (symmetric rail) so the
clipping ratio is exact under int16 ``abs``.
"""

from __future__ import annotations

import numpy as np

from .functions.codecs import encode_wav
from .functions.png import encode_png

N_IMAGE_BASES = 40
AUDIO_RATE = 8000


def synth_image(seed: int, h: int = 64, w: int = 64) -> np.ndarray:
    base = int(seed) % N_IMAGE_BASES
    rng = np.random.default_rng(1_000 + base)
    yy, xx = np.mgrid[0:h, 0:w]
    a, b, c = rng.uniform(0.02, 0.2, 3)
    p0, p1 = rng.uniform(0, 6, 2)
    img = (
        128.0
        + 100.0 * np.sin(a * xx + p0) * np.cos(b * yy + p1)
        + 60.0 * np.sign(np.sin(c * (xx + yy)))
    )
    prng = np.random.default_rng(500_000 + int(seed))
    img = np.clip(img + prng.integers(-4, 5, size=(h, w)), 0, 255).astype(np.uint8)
    return np.stack([img, img, img], axis=-1)


def image_bytes(seed: int) -> bytes:
    """Container rotates by id across the LOSSLESS still-image codecs —
    identical pixels in different wire formats, so the pixel-derived
    goldens (pHash, image metrics — computed from the raw synth arrays,
    tools/gen_media_goldens.py) are format-invariant while the
    driver-visible media rows exercise every decoder: PNG, WebP
    lossless (VP8L), TIFF-LZW with horizontal-differencing predictor,
    big-endian TIFF-PackBits, and single-frame GIF (the
    grayscale-replicated palette always fits 256 colors). PNG keeps the
    majority share: its encoder is C-zlib (~1.2 ms/img) while the
    VP8L/TIFF-LZW/PackBits/GIF encoders are honest Python loops
    (~4-12 ms/img) — every decoder is still exercised in every driver
    batch, without the synth stage's cost being dominated by fixture
    encoding."""
    img = synth_image(seed)
    k = int(seed) % 8
    if k == 4:
        from .functions.webp import encode_webp

        return encode_webp(img)
    if k == 5:
        from .functions.tiff import encode_tiff

        return encode_tiff(img, compression=5, predictor=2)
    if k == 6:
        from .functions.tiff import encode_tiff

        return encode_tiff(img, compression=32773, byte_order=">")
    if k == 7:
        from .functions.gif import encode_gif

        return encode_gif(img)
    return encode_png(img)


def synth_audio(seed: int, rate: int = AUDIO_RATE) -> tuple[np.ndarray, int]:
    s = int(seed)
    n = int(rate * (0.4 + 0.1 * (s % 5)))
    t = np.arange(n) / rate
    freq = 120.0 + 13.0 * (s % 37)
    amp = (1.3 if s % 10 == 0 else 0.15 + 0.18 * (s % 5)) * 32767.0
    x = amp * np.sin(2 * np.pi * freq * t)
    sil = int(rate * 0.1 * (s % 4))
    if sil:
        x[-sil:] = 0.0
    samples = np.clip(np.round(x), -32767, 32767).astype(np.int16)
    return samples.reshape(-1, 1), rate


def audio_bytes(seed: int) -> bytes:
    """Container rotates by id across the LOSSLESS audio codecs —
    identical samples in different wire formats (same scheme as
    image_bytes): PCM-16 WAV keeps the majority share (numpy-speed
    encode), every 4th id ships as native FLAC (fixed-predictor
    subset, honest Python Rice coding) so the FLAC decoder is
    exercised in every driver-visible media row while the
    sample-derived goldens stay format-invariant."""
    samples, rate = synth_audio(seed)
    if int(seed) % 4 == 3:
        from .functions.flac import encode_flac

        return encode_flac(samples, rate)
    return encode_wav(samples, rate)


def video_params(seed: int) -> tuple[int, int, int, int]:
    """(n_frames, width, height, delay_cs) as CLOSED-FORM functions of
    the id — the video_info contract oracle recomputes these same
    formulas in SQL, so the engine row is checked against arithmetic,
    not against the codec that produced the bytes."""
    s = int(seed)
    return 2 + s % 5, 16 + 8 * (s % 3), 16 + 8 * ((s // 3) % 3), 4 + s % 4


def synth_video(seed: int) -> bytes:
    """Container rotates by id across the real video containers with
    IDENTICAL structure (frame count, dims, per-frame delay — the only
    things the video_info / video_resolution oracles check, closed-form
    in video_params): GIF keeps the majority share; every 5th id ships
    as Motion-JPEG AVI (id%5==2) or Motion-JPEG MP4 (id%5==4), so the
    RIFF-AVI and ISO-BMFF paths run inside the driver-visible rows.
    All three carry the same timing: fps = 100/delay_cs, duration =
    n*delay_cs/100."""
    from .functions.gif import encode_gif

    n_frames, w, h, delay_cs = video_params(seed)
    s = int(seed)
    frames = [
        np.full((h, w, 3), (s * 37 + i * 40) % 256, dtype=np.uint8)
        for i in range(n_frames)
    ]
    if s % 5 == 2:
        from .functions.avi import encode_avi_mjpeg

        return encode_avi_mjpeg(frames, rate=100, scale=delay_cs)
    if s % 5 == 4:
        from .functions.mp4 import encode_mp4_mjpeg

        return encode_mp4_mjpeg(frames, timescale=100, delta=delay_cs)
    return encode_gif(frames, delay_cs=delay_cs)
