"""Motion-JPEG AVI + MP4 container tests, and the synth-video container
rotation's structure parity (the video_info/video_resolution oracles
only check frame count / dims / timing, all closed-form in
mediagen.video_params — identical across GIF, AVI, and MP4)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dataflow_mm_lrt_spark import mediagen
from dataflow_mm_lrt_spark.functions import codecs
from dataflow_mm_lrt_spark.functions.avi import (
    encode_avi_mjpeg,
    iter_avi_frames,
    probe_avi,
)
from dataflow_mm_lrt_spark.functions.mp4 import (
    encode_mp4_mjpeg,
    iter_mp4_frames,
    probe_mp4,
)


def _frames(n=4, h=24, w=32, base=11):
    return [
        np.full((h, w, 3), (base + i * 40) % 256, dtype=np.uint8)
        for i in range(n)
    ]


@pytest.mark.parametrize("enc,probe,it,kind", [
    (lambda f: encode_avi_mjpeg(f, rate=100, scale=5), probe_avi,
     iter_avi_frames, "avi"),
    (lambda f: encode_mp4_mjpeg(f, timescale=100, delta=5), probe_mp4,
     iter_mp4_frames, "mp4"),
])
def test_container_roundtrip_and_probe(enc, probe, it, kind):
    frames = _frames()
    buf = enc(frames)
    assert codecs.sniff_video(buf) == kind
    p = probe(buf)
    assert p["n_frames"] == 4 and p["width"] == 32 and p["height"] == 24
    assert abs(p["fps"] - 20.0) < 1e-9
    assert abs(p["duration_sec"] - 0.2) < 1e-9
    dec = list(it(buf))
    assert len(dec) == 4 and dec[0].shape == (24, 32, 3)
    # MJPEG is lossy in general but flat frames quantize exactly at q95
    for i, f in enumerate(dec):
        assert np.abs(f.astype(int) - frames[i].astype(int)).max() <= 3


def test_iter_video_frames_dispatches_containers():
    frames = _frames(n=3)
    for buf in (encode_avi_mjpeg(frames), encode_mp4_mjpeg(frames)):
        got = list(codecs.iter_video_frames(buf))
        assert len(got) == 3 and got[0].shape == (24, 32, 3)


def test_avi_non_mjpg_probes_but_gates_frames():
    # patch the strf compression fourcc to H264: metadata must still
    # probe (the cv2-style path), pixel access must gate
    buf = bytearray(encode_avi_mjpeg(_frames()))
    i = bytes(buf).find(b"MJPG", bytes(buf).find(b"strf"))
    buf[i : i + 4] = b"H264"
    p = probe_avi(bytes(buf))
    assert p["compression"] == "H264" and p["n_frames"] == 4
    with pytest.raises(codecs.CodecUnavailable):
        list(iter_avi_frames(bytes(buf)))


def test_mp4_non_jpeg_probes_but_gates_frames():
    buf = bytearray(encode_mp4_mjpeg(_frames()))
    i = bytes(buf).find(b"jpeg", bytes(buf).find(b"stsd"))
    buf[i : i + 4] = b"avc1"
    p = probe_mp4(bytes(buf))
    assert p["coding"] == "avc1" and p["n_frames"] == 4
    with pytest.raises(codecs.CodecUnavailable):
        list(iter_mp4_frames(bytes(buf)))


def test_corrupt_containers_raise_cleanly():
    avi = encode_avi_mjpeg(_frames())
    with pytest.raises((ValueError, codecs.CodecUnavailable)):
        probe_avi(avi[:40])
    mp4 = encode_mp4_mjpeg(_frames())
    with pytest.raises((ValueError, codecs.CodecUnavailable)):
        probe_mp4(mp4[:40])
    # a clobbered frame payload surfaces as CodecUnavailable via dispatch
    bad = bytearray(avi)
    i = bytes(bad).find(b"00dc") + 8
    bad[i : i + 20] = b"\x00" * 20
    with pytest.raises(codecs.CodecUnavailable):
        list(codecs.iter_video_frames(bytes(bad)))


def test_avi_64bit_alignment_odd_chunks():
    # odd-sized JPEG payloads must be word-padded; 5 frames of varying
    # content produce odd sizes with high likelihood — the chunk walk
    # must still find every frame
    rng = np.random.default_rng(9)
    frames = [rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
              for _ in range(5)]
    buf = encode_avi_mjpeg(frames)
    assert probe_avi(buf)["n_frames"] == 5
    assert len(list(iter_avi_frames(buf))) == 5


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full_box(btype: bytes, payload: bytes) -> bytes:
    return _box(btype, b"\x00\x00\x00\x00" + payload)


def test_mp4_stts_multi_run_co64_and_avc1_gate():
    """Hand-built minimal container: two-run stts, 64-bit co64 chunk
    offsets, per-sample stsz, an avc1 (non-decodable) sample entry —
    the table-parsing paths our writer never emits."""
    from dataflow_mm_lrt_spark.functions.mp4 import Mp4Track

    ftyp = _box(b"ftyp", b"isom\x00\x00\x00\x00isom")
    mdat_payload = b"AAABBBBB"  # two samples: 3 and 5 bytes
    mdat = _box(b"mdat", mdat_payload)
    s0 = len(ftyp) + 8
    entry = (
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">HH", 48, 32)            # width 48, height 32
        + struct.pack(">II", 0x480000, 0x480000) + b"\x00" * 4
        + struct.pack(">H", 1) + b"\x00" * 32 + struct.pack(">Hh", 24, -1)
    )
    stsd = _full_box(b"stsd", struct.pack(">I", 1) + _box(b"avc1", entry))
    stts = _full_box(b"stts", struct.pack(">IIIII", 2, 1, 5, 1, 10))
    stsc = _full_box(b"stsc", struct.pack(">IIII", 1, 1, 2, 1))
    stsz = _full_box(b"stsz", struct.pack(">IIII", 0, 2, 3, 5))
    co64 = _full_box(
        b"co64", struct.pack(">I", 2) + struct.pack(">QQ", s0, s0 + 3)
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + co64)
    minf = _box(b"minf", stbl)
    hdlr = _full_box(b"hdlr", b"\x00" * 4 + b"vide" + b"\x00" * 13)
    mdhd = _full_box(
        b"mdhd", struct.pack(">IIII", 0, 0, 100, 15) + struct.pack(">HH", 0x55C4, 0)
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", mdia)
    moov = _box(b"moov", trak)
    raw = ftyp + mdat + moov

    t = Mp4Track(raw)
    assert t.coding == "avc1"
    assert (t.width, t.height) == (48, 32)
    assert t.deltas.tolist() == [5, 10]
    assert t.sizes.tolist() == [3, 5]
    assert t.offsets.tolist() == [s0, s0 + 3]
    assert t.duration == 15 and t.timescale == 100
    with pytest.raises(codecs.CodecUnavailable):
        list(t.iter_frames())
    from dataflow_mm_lrt_spark.functions.mp4 import probe_mp4

    p = probe_mp4(raw)
    assert p["n_frames"] == 2 and abs(p["duration_sec"] - 0.15) < 1e-12


def test_synth_video_rotation_structure_parity():
    kinds = set()
    for i in range(10):
        buf = mediagen.synth_video(i)
        kinds.add(codecs.sniff_video(buf))
        n, w, h, delay = mediagen.video_params(i)
        kind = codecs.sniff_video(buf)
        if kind == "gif":
            from dataflow_mm_lrt_spark.functions.gif import iter_gif_frames

            fd = list(iter_gif_frames(buf))
            assert len(fd) == n and fd[0][0].shape == (h, w, 3)
            assert all(d == delay for _, d in fd)
        else:
            p = probe_avi(buf) if kind == "avi" else probe_mp4(buf)
            assert p["n_frames"] == n
            assert p["width"] == w and p["height"] == h
            assert abs(p["fps"] - 100.0 / delay) < 1e-9
            assert abs(p["duration_sec"] - n * delay / 100.0) < 1e-9
    assert kinds == {"gif", "avi", "mp4"}


def test_video_info_operator_parity_across_containers(spark):
    """The same frames/timing in all three containers must produce the
    same video_info row (modulo media_id) — the rotation's contract."""
    from dataflow_mm_lrt_spark.operators import media_metrics as mm

    frames = _frames(n=3, h=16, w=24)
    rows = [
        ("gif", __import__(
            "dataflow_mm_lrt_spark.functions.gif", fromlist=["encode_gif"]
        ).encode_gif(frames, delay_cs=5)),
        ("avi", encode_avi_mjpeg(frames, rate=100, scale=5)),
        ("mp4", encode_mp4_mjpeg(frames, timescale=100, delta=5)),
        ("bad", b"\x00\x01\x02"),
    ]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    got = {r["media_id"]: r for r in mm.video_info(df).collect()}
    assert not got["bad"]["success"]
    base = got["gif"]
    for kind in ("avi", "mp4"):
        r = got[kind]
        assert r["success"]
        for f in ("num_frames", "height", "width", "resolution"):
            assert r[f] == base[f], (kind, f)
        for f in ("aspect_ratio", "fps", "duration_sec"):
            assert abs(r[f] - base[f]) < 1e-9, (kind, f)
