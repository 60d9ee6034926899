"""MP4 / ISO base media file format (ISO/IEC 14496-12) — Motion-JPEG
profile: full metadata probe plus real frame decode for streams whose
video track uses the ``jpeg`` VisualSampleEntry (each sample is a
baseline/progressive JPEG picture, decoded by functions/jpeg.py).

The reference reads MP4 through decord/PIL (utils/utils.py:27,
video_scene_filter.py); here the container is parsed natively from the
public spec with zero native deps:

* box walk with 32-bit and 64-bit (``largesize``) box lengths;
* ``moov → trak → mdia`` traversal, video track selected via
  ``hdlr.handler_type == 'vide'``;
* timing from ``mdhd`` (version 0 and 1) + ``stts`` sample deltas;
* sample layout from the full ``stbl`` table set: ``stsd`` (dims +
  coding fourcc), ``stts``, ``stsc`` (chunk runs), ``stsz`` /
  ``stz2``-less uniform sizes, ``stco``/``co64`` chunk offsets;
* frame decode ONLY for the ``jpeg`` coding (Motion-JPEG in MP4 —
  spec-legal and what our writer emits); H.264/HEVC tracks probe
  successfully but raise ``CodecUnavailable`` on pixel access (the
  honest gate, same policy as lossy WebP).

The writer emits a complete single-track MJPEG MP4 (ftyp + mdat +
moov with mvhd/tkhd/mdia/mdhd/hdlr/minf/vmhd/dinf/stbl chain, one
chunk per sample) that any ISO-BMFF demuxer accepts.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

from .codecs import CodecUnavailable


def _iter_boxes(buf: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos : pos + 4], "big")
        btype = buf[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
            hdr = 16
        elif size == 0:  # box extends to end of enclosing scope
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"bad MP4 box size at {pos}")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _iter_boxes(buf, start, end):
        if t == btype:
            return s, e
    return None


class Mp4Track:
    """Parsed video-track tables (sample offsets/sizes/deltas, dims)."""

    def __init__(self, buf: bytes):
        self.buf = buf
        if len(buf) < 12 or buf[4:8] != b"ftyp":
            raise ValueError("not an ISO-BMFF stream (missing ftyp)")
        moov = _find(buf, 0, len(buf), b"moov")
        if moov is None:
            raise ValueError("MP4 missing moov box")
        video = None
        for t, s, e in _iter_boxes(buf, *moov):
            if t != b"trak":
                continue
            mdia = _find(buf, s, e, b"mdia")
            if mdia is None:
                continue
            hdlr = _find(buf, *mdia, b"hdlr")
            if hdlr and buf[hdlr[0] + 8 : hdlr[0] + 12] == b"vide":
                video = mdia
                break
        if video is None:
            raise ValueError("MP4 has no video track")

        mdhd = _find(buf, *video, b"mdhd")
        if mdhd is None:
            raise ValueError("video track missing mdhd")
        ver = buf[mdhd[0]]
        if ver == 1:
            self.timescale = int.from_bytes(buf[mdhd[0] + 20 : mdhd[0] + 24], "big")
            self.duration = int.from_bytes(buf[mdhd[0] + 24 : mdhd[0] + 32], "big")
        else:
            self.timescale = int.from_bytes(buf[mdhd[0] + 12 : mdhd[0] + 16], "big")
            self.duration = int.from_bytes(buf[mdhd[0] + 16 : mdhd[0] + 20], "big")

        minf = _find(buf, *video, b"minf")
        stbl = _find(buf, *minf, b"stbl") if minf else None
        if stbl is None:
            raise ValueError("video track missing stbl")

        stsd = _find(buf, *stbl, b"stsd")
        if stsd is None:
            raise ValueError("missing stsd")
        entry = stsd[0] + 8  # version/flags + entry_count
        self.coding = buf[entry + 4 : entry + 8].decode("latin1")
        self.width = int.from_bytes(buf[entry + 32 : entry + 34], "big")
        self.height = int.from_bytes(buf[entry + 34 : entry + 36], "big")

        stts = _find(buf, *stbl, b"stts")
        self.deltas = np.empty(0, dtype=np.int64)
        if stts:
            n = int.from_bytes(buf[stts[0] + 4 : stts[0] + 8], "big")
            arr = np.frombuffer(
                buf[stts[0] + 8 : stts[0] + 8 + 8 * n], dtype=">u4"
            ).reshape(-1, 2)
            self.deltas = np.repeat(
                arr[:, 1].astype(np.int64), arr[:, 0].astype(np.int64)
            )

        stsz = _find(buf, *stbl, b"stsz")
        if stsz is None:
            raise ValueError("missing stsz")
        uniform = int.from_bytes(buf[stsz[0] + 4 : stsz[0] + 8], "big")
        count = int.from_bytes(buf[stsz[0] + 8 : stsz[0] + 12], "big")
        if uniform:
            self.sizes = np.full(count, uniform, dtype=np.int64)
        else:
            self.sizes = np.frombuffer(
                buf[stsz[0] + 12 : stsz[0] + 12 + 4 * count], dtype=">u4"
            ).astype(np.int64)

        stco = _find(buf, *stbl, b"stco")
        co64 = _find(buf, *stbl, b"co64")
        if stco:
            n = int.from_bytes(buf[stco[0] + 4 : stco[0] + 8], "big")
            chunk_offs = np.frombuffer(
                buf[stco[0] + 8 : stco[0] + 8 + 4 * n], dtype=">u4"
            ).astype(np.int64)
        elif co64:
            n = int.from_bytes(buf[co64[0] + 4 : co64[0] + 8], "big")
            chunk_offs = np.frombuffer(
                buf[co64[0] + 8 : co64[0] + 8 + 8 * n], dtype=">u8"
            ).astype(np.int64)
        else:
            raise ValueError("missing stco/co64")

        stsc = _find(buf, *stbl, b"stsc")
        if stsc is None:
            raise ValueError("missing stsc")
        n = int.from_bytes(buf[stsc[0] + 4 : stsc[0] + 8], "big")
        runs = np.frombuffer(
            buf[stsc[0] + 8 : stsc[0] + 8 + 12 * n], dtype=">u4"
        ).reshape(-1, 3)

        # expand (first_chunk, samples_per_chunk) runs → per-sample offsets
        offsets = []
        sample = 0
        total = len(self.sizes)
        for ri in range(len(runs)):
            first = int(runs[ri][0]) - 1
            spc = int(runs[ri][1])
            last = int(runs[ri + 1][0]) - 1 if ri + 1 < len(runs) else len(chunk_offs)
            for ci in range(first, last):
                if sample >= total:
                    break
                off = int(chunk_offs[ci])
                for _ in range(spc):
                    if sample >= total:
                        break
                    offsets.append(off)
                    off += int(self.sizes[sample])
                    sample += 1
        self.offsets = np.array(offsets, dtype=np.int64)
        if len(self.offsets) != total:
            raise ValueError("stsc/stco tables do not cover all samples")

    @property
    def n_frames(self) -> int:
        return len(self.sizes)

    def iter_frames(self) -> Iterator[np.ndarray]:
        if self.coding != "jpeg":
            raise CodecUnavailable(
                f"MP4 video coding {self.coding!r} not decodable here "
                "(only Motion-JPEG 'jpeg' sample entries; metadata probe "
                "still works)"
            )
        from .jpeg import decode_jpeg

        for off, size in zip(self.offsets, self.sizes):
            yield decode_jpeg(self.buf[int(off) : int(off + size)])


def probe_mp4(buf: bytes) -> dict:
    """Container metadata without touching sample bytes: the
    cv2.CAP_PROP-style probe the reference's VideoInfoFilter performs."""
    t = Mp4Track(buf)
    dur = t.duration / t.timescale if t.timescale else None
    if (not dur) and len(t.deltas) and t.timescale:
        dur = float(t.deltas.sum()) / t.timescale
    fps = t.n_frames / dur if dur else None
    return {
        "n_frames": t.n_frames,
        "width": t.width,
        "height": t.height,
        "duration_sec": dur,
        "fps": fps,
        "coding": t.coding,
    }


def iter_mp4_frames(buf: bytes) -> Iterator[np.ndarray]:
    yield from Mp4Track(buf).iter_frames()


# ---------------------------------------------------------------------------
# writer (single-track Motion-JPEG)
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B", version) + flags.to_bytes(3, "big") + payload)


_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def encode_mp4_mjpeg(
    frames: list[np.ndarray],
    timescale: int = 100,
    delta: int = 4,
    quality: int = 95,
) -> bytes:
    """Frames → single-track Motion-JPEG MP4. ``delta`` is the
    per-sample duration in ``timescale`` units (timescale=100,
    delta=N ⇒ N centiseconds per frame — GIF-delay-compatible)."""
    from .jpeg import encode_jpeg

    if not frames:
        raise ValueError("MP4 needs at least one frame")
    h, w = frames[0].shape[:2]
    samples = [encode_jpeg(f, quality=quality, subsample="444") for f in frames]
    n = len(samples)
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2mp41")
    mdat_payload = b"".join(samples)
    mdat_off = len(ftyp) + 8  # first sample starts right after mdat header
    mdat = _box(b"mdat", mdat_payload)

    offs = []
    off = mdat_off
    for s in samples:
        offs.append(off)
        off += len(s)

    # VisualSampleEntry 'jpeg' (ISO 14496-12 §12.1.3)
    entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)      # data_reference_index
        + b"\x00" * 16              # pre_defined / reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)      # frame_count
        + b"\x00" * 32              # compressorname
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"jpeg", entry))
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">I", n) + b"".join(struct.pack(">I", o) for o in offs),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"mjpeg\x00")
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration) + struct.pack(">HH", 0x55C4, 0),
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0, 7,
        struct.pack(">IIII", 0, 0, 1, 0)      # times, track id, reserved
        + struct.pack(">I", duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)     # layer/group/volume/reserved
        + _MATRIX
        + struct.pack(">II", w << 16, h << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + _MATRIX
        + b"\x00" * 24
        + struct.pack(">I", 2),               # next_track_ID
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
