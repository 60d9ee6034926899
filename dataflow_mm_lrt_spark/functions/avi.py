"""AVI (RIFF) container — Motion-JPEG profile: reader + writer.

The classic Microsoft RIFF-AVI layout from the public AVI 1.0 spec
(`RIFF 'AVI ' → LIST hdrl (avih, LIST strl (strh,strf)) → LIST movi
(00dc chunks) → idx1`), restricted to one MJPG video stream whose
frames decode through functions/jpeg.py — the same zero-native-deps
policy as the MP4 module. The reference reaches AVI through
decord/PIL (utils/utils.py:27).

Reader:
* chunk walk with word (2-byte) alignment;
* ``avih`` for fallback timing (µs/frame) + dims;
* ``strh`` (fccType ``vids``) for the authoritative dwRate/dwScale
  fps pair, ``strf`` BITMAPINFOHEADER for the compression fourcc;
* frames from the ``movi`` list's ``00dc``/``00db`` chunks (also
  inside nested ``rec `` lists); non-MJPG compressions probe fine
  but raise ``CodecUnavailable`` on pixel access;
* the optional ``idx1`` index is ignored (chunks are walked
  directly), matching players that tolerate index-less files.

Writer emits avih + strh/strf + movi + a spec-complete idx1 with
keyframe flags.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

from .codecs import CodecUnavailable


def _chunks(buf: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        cid = buf[pos : pos + 4]
        size = struct.unpack_from("<I", buf, pos + 4)[0]
        body_start = pos + 8
        if body_start + size > end:
            raise ValueError(f"bad AVI chunk size at {pos}")
        yield cid, body_start, body_start + size
        pos = body_start + size + (size & 1)  # word aligned


class AviStream:
    def __init__(self, buf: bytes):
        if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
            raise ValueError("not a RIFF/AVI file")
        self.buf = buf
        self.usec_per_frame = 0
        self.total_frames = 0
        self.width = 0
        self.height = 0
        self.rate = 0
        self.scale = 0
        self.compression = b""
        self._movi: tuple[int, int] | None = None

        for cid, s, e in _chunks(buf, 12, len(buf)):
            if cid != b"LIST":
                continue
            ltype = buf[s : s + 4]
            if ltype == b"hdrl":
                self._parse_hdrl(s + 4, e)
            elif ltype == b"movi":
                self._movi = (s + 4, e)
        if self._movi is None:
            raise ValueError("AVI missing movi list")

    def _parse_hdrl(self, start: int, end: int) -> None:
        for cid, s, e in _chunks(self.buf, start, end):
            if cid == b"avih":
                (self.usec_per_frame,) = struct.unpack_from("<I", self.buf, s)
                (self.total_frames,) = struct.unpack_from("<I", self.buf, s + 16)
                self.width, self.height = struct.unpack_from(
                    "<II", self.buf, s + 32
                )
            elif cid == b"LIST" and self.buf[s : s + 4] == b"strl":
                self._parse_strl(s + 4, e)

    def _parse_strl(self, start: int, end: int) -> None:
        is_video = False
        for cid, s, e in _chunks(self.buf, start, end):
            if cid == b"strh":
                fcc = self.buf[s : s + 4]
                if fcc != b"vids":
                    return  # audio/other stream — ignore the whole strl
                is_video = True
                self.scale, self.rate = struct.unpack_from("<II", self.buf, s + 20)
            elif cid == b"strf" and is_video:
                # BITMAPINFOHEADER: biCompression at offset 16
                self.compression = self.buf[s + 16 : s + 20]

    @property
    def fps(self) -> float | None:
        if self.rate and self.scale:
            return self.rate / self.scale
        if self.usec_per_frame:
            return 1e6 / self.usec_per_frame
        return None

    def _frame_chunks(self, start: int, end: int):
        for cid, s, e in _chunks(self.buf, start, end):
            if cid == b"LIST" and self.buf[s : s + 4] == b"rec ":
                yield from self._frame_chunks(s + 4, e)
            elif cid[2:4] in (b"dc", b"db"):
                yield s, e

    def iter_frames(self) -> Iterator[np.ndarray]:
        comp = self.compression.upper()
        if comp not in (b"MJPG", b"JPEG"):
            raise CodecUnavailable(
                f"AVI compression {self.compression!r} not decodable here "
                "(only Motion-JPEG; metadata probe still works)"
            )
        from .jpeg import decode_jpeg

        for s, e in self._frame_chunks(*self._movi):
            yield decode_jpeg(self.buf[s:e])

    @property
    def n_frames(self) -> int:
        return sum(1 for _ in self._frame_chunks(*self._movi))


def probe_avi(buf: bytes) -> dict:
    t = AviStream(buf)
    n = t.n_frames or t.total_frames
    fps = t.fps
    return {
        "n_frames": n,
        "width": t.width,
        "height": t.height,
        "fps": fps,
        "duration_sec": (n / fps) if fps else None,
        "compression": t.compression.decode("latin1"),
    }


def iter_avi_frames(buf: bytes) -> Iterator[np.ndarray]:
    yield from AviStream(buf).iter_frames()


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def _chunk(cid: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return cid + struct.pack("<I", len(payload)) + payload + pad


def _list(ltype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", ltype + payload)


def encode_avi_mjpeg(
    frames: list[np.ndarray], rate: int = 100, scale: int = 4,
    quality: int = 95,
) -> bytes:
    """Frames → MJPG AVI at fps = rate/scale (rate=100, scale=N ⇒ N
    centiseconds per frame — GIF-delay-compatible)."""
    from .jpeg import encode_jpeg

    if not frames:
        raise ValueError("AVI needs at least one frame")
    h, w = frames[0].shape[:2]
    samples = [encode_jpeg(f, quality=quality, subsample="444") for f in frames]
    n = len(samples)
    max_size = max(len(s) for s in samples)

    avih = _chunk(
        b"avih",
        struct.pack(
            "<IIIIIIIIII16x",
            int(1e6 * scale // rate),  # dwMicroSecPerFrame
            0,                         # dwMaxBytesPerSec
            0,                         # dwPaddingGranularity
            0x10,                      # AVIF_HASINDEX
            n, 0, 1, max_size, w, h,
        ),
    )
    strh = _chunk(
        b"strh",
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIIhhhh",
                      0, 0, 0, 0,      # flags, priority, language, initial
                      scale, rate, 0, n, max_size,
                      0xFFFFFFFF, 0,   # quality, sampleSize
                      0, 0, w, h),     # rcFrame
    )
    strf = _chunk(
        b"strf",
        struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                    w * h * 3, 0, 0, 0, 0),
    )
    hdrl = _list(b"hdrl", avih + _list(b"strl", strh + strf))

    movi_payload = b""
    idx_entries = []
    for s in samples:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((4 + len(movi_payload), len(s)))
        movi_payload += _chunk(b"00dc", s)
    movi = _list(b"movi", movi_payload)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, size)
            for off, size in idx_entries
        ),
    )
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload
