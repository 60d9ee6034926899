"""Per-media metric extraction + segmentation — the reference's
video/audio metric-filter family, made real by the pure-numpy codecs.

The reference computes these with model/native stacks (decord, opencv,
silero); SURVEY §2 scoped those out for lack of codecs. With
functions/{png,gif,jpeg,codecs}.py decoding real containers, the
classic non-model baselines become implementable end-to-end:

- ``video_metrics``   — luminance + frame-difference motion, the
  VideoLuminanceEvaluator (eval/video_luminance_*.py:395) and
  VideoMotionScoreFilter (filter/video_motion_score_filter.py) column
  contract with Rec.601 luma and global |Δframe| motion in place of
  optical flow (disclosed analogue, not a port).
- ``video_scene_rows`` — content-change temporal segmentation, 1→N
  scene rows (VideoSceneFilter, video_scene_filter.py:515, run
  557-606), with the same min/max-length constraints
  (:40-41 min_seconds/max_seconds → min/max frames here).
- ``image_metrics``   — brightness/contrast/colorfulness (Hasler &
  Süsstrunk 2003) /sharpness (Laplacian variance), the standard
  no-model image-quality columns the score/range filters consume.
- ``audio_metrics``   — duration/RMS-dB/clipping/silence ratios.
- ``audio_vad``       — energy VAD emitting the SileroVADGenerator
  timestamps contract (`array<struct<start,end>>`,
  audio_silero_vad_generator.py:29, run 262) from frame RMS
  thresholding (model replaced by the classic energy baseline).
- ``audio_chunk_rows`` — slices real WAV bytes by those timestamps,
  1→N chunk rows (TimestampChunkRowGenerator,
  audio_timestamp_chunk_row_generator.py:28, run 181-221) with the
  max-duration split behavior.

All are Arrow-batched ``mapInPandas`` stages over opaque binary
columns: at scale the decode cost dominates and parallelism comes from
input splits; ``_spread`` (dedup.py:31) widens narrow inputs to cluster
parallelism first and is a guarded no-op at real scale (splits ≥
cores), so no exchange is added where it wouldn't help. 1→N operators
emit within the partition. Downstream filtering composes with the existing
schema-tolerant ``range_filter`` (operators/refine.py:80) — that pair
IS the VideoScoreFilter shape (video_score_filter.py:160).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .dedup import _spread
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)


def _luma(frame: np.ndarray) -> np.ndarray:
    f = frame.astype(np.float64)
    return 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]


VIDEO_METRICS_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("n_frames", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("lum_mean", DoubleType()),
        StructField("lum_min", DoubleType()),
        StructField("lum_max", DoubleType()),
        StructField("motion", DoubleType()),
        StructField("static_ratio", DoubleType()),
    ]
)


def video_metrics(df: DataFrame, static_eps: float = 1.0) -> DataFrame:
    """Per-video luminance and motion columns. ``motion`` is the mean
    over consecutive frame pairs of mean |Δluma| (global-motion
    magnitude analogue of the optical-flow score); ``static_ratio`` is
    the fraction of pairs below ``static_eps`` (static-clip detector).
    Single-frame videos report motion 0 and static_ratio 1."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import codecs

        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                frames = list(codecs.iter_video_frames(bytes(c or b"")))
                if not frames:
                    raise codecs.CodecUnavailable("empty video stream")
                lumas = [_luma(f) for f in frames]
                per_frame = [float(l.mean()) for l in lumas]
                diffs = [
                    float(np.abs(b - a).mean())
                    for a, b in zip(lumas, lumas[1:])
                ]
                rows.append(
                    (
                        mid,
                        len(frames),
                        frames[0].shape[1],
                        frames[0].shape[0],
                        float(np.mean(per_frame)),
                        float(np.min(per_frame)),
                        float(np.max(per_frame)),
                        float(np.mean(diffs)) if diffs else 0.0,
                        float(np.mean([d < static_eps for d in diffs]))
                        if diffs
                        else 1.0,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_METRICS_SCHEMA])

    return _spread(df).mapInPandas(run, schema=VIDEO_METRICS_SCHEMA)


SCENE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("scene_idx", IntegerType()),
        StructField("start_frame", IntegerType()),
        StructField("end_frame", IntegerType()),  # exclusive
        StructField("n_frames", IntegerType()),
    ]
)


def _scene_spans(
    lumas: list[np.ndarray],
    threshold: float,
    min_frames: int,
    max_frames: int | None,
) -> list[tuple[int, int]]:
    """Content-change segmentation spans over a luma sequence (shared by
    video_scene_rows and video_clip_rows): cut where mean |Δluma| >
    threshold, merge sub-min scenes into their predecessor (a short
    FIRST scene merges forward), split over-max scenes at fixed
    intervals."""
    n = len(lumas)
    cuts = [0] + [
        i + 1
        for i, (a, b) in enumerate(zip(lumas, lumas[1:]))
        if float(np.abs(b - a).mean()) > threshold
    ] + [n]
    merged: list[list[int]] = []
    for s, e in zip(cuts, cuts[1:]):
        if merged and e - s < min_frames:
            merged[-1][1] = e
        else:
            merged.append([s, e])
    if len(merged) > 1 and merged[0][1] - merged[0][0] < min_frames:
        merged[1][0] = merged[0][0]
        merged.pop(0)
    final: list[tuple[int, int]] = []
    for s, e in merged:
        if max_frames and e - s > max_frames:
            final += [(x, min(x + max_frames, e)) for x in range(s, e, max_frames)]
        else:
            final.append((s, e))
    return final


def video_scene_rows(
    df: DataFrame,
    threshold: float = 30.0,
    min_frames: int = 1,
    max_frames: int | None = None,
) -> DataFrame:
    """1→N temporal segmentation: a new scene starts wherever mean
    |Δluma| between consecutive frames exceeds ``threshold``
    (content-change detection, video_scene_filter.py:557-606). Scenes
    shorter than ``min_frames`` merge into their predecessor; scenes
    longer than ``max_frames`` split at fixed intervals — the
    reference's min_seconds/max_seconds constraints in frame units."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import codecs

        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                lumas = [
                    _luma(f) for f in codecs.iter_video_frames(bytes(c or b""))
                ]
                if not lumas:
                    raise codecs.CodecUnavailable("empty video stream")
                final = _scene_spans(lumas, threshold, min_frames, max_frames)
                for i, (s, e) in enumerate(final):
                    rows.append((mid, i, s, e, e - s))
            yield pd.DataFrame(rows, columns=[f.name for f in SCENE_SCHEMA])

    return _spread(df).mapInPandas(run, schema=SCENE_SCHEMA)


IMAGE_METRICS_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("brightness", DoubleType()),
        StructField("contrast", DoubleType()),
        StructField("colorfulness", DoubleType()),
        StructField("sharpness", DoubleType()),
    ]
)


def image_metrics(df: DataFrame) -> DataFrame:
    """No-model image-quality columns: brightness = mean Rec.601 luma,
    contrast = luma std, colorfulness = Hasler-Süsstrunk M3 metric,
    sharpness = variance of the 3x3 Laplacian of luma (blur proxy)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import codecs

        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                img = codecs.decode_image(bytes(c or b"")).astype(np.float64)
                y = _luma(img)
                rg = img[..., 0] - img[..., 1]
                yb = 0.5 * (img[..., 0] + img[..., 1]) - img[..., 2]
                colorfulness = float(
                    np.sqrt(rg.std() ** 2 + yb.std() ** 2)
                    + 0.3 * np.sqrt(rg.mean() ** 2 + yb.mean() ** 2)
                )
                if y.shape[0] >= 3 and y.shape[1] >= 3:
                    lap = (
                        y[:-2, 1:-1] + y[2:, 1:-1] + y[1:-1, :-2] + y[1:-1, 2:]
                        - 4 * y[1:-1, 1:-1]
                    )
                    sharp = float(lap.var())
                else:
                    sharp = 0.0
                rows.append(
                    (
                        mid,
                        img.shape[1],
                        img.shape[0],
                        float(y.mean()),
                        float(y.std()),
                        colorfulness,
                        sharp,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_METRICS_SCHEMA])

    return _spread(df).mapInPandas(run, schema=IMAGE_METRICS_SCHEMA)


AUDIO_METRICS_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("duration_s", DoubleType()),
        StructField("rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("rms_db", DoubleType()),
        StructField("clipping_ratio", DoubleType()),
        StructField("silence_ratio", DoubleType()),
    ]
)


def _frame_rms_db(mono: np.ndarray, rate: int, frame_ms: int) -> np.ndarray:
    """Per-frame RMS in dBFS (full scale = int16 max)."""
    step = max(1, rate * frame_ms // 1000)
    n = len(mono) // step * step
    if n == 0:
        return np.empty(0)
    frames = mono[:n].reshape(-1, step)
    rms = np.sqrt((frames.astype(np.float64) ** 2).mean(axis=1))
    return 20 * np.log10(np.maximum(rms, 1e-9) / 32768.0)


def audio_metrics(
    df: DataFrame, frame_ms: int = 20, silence_db: float = -40.0
) -> DataFrame:
    """Duration, overall RMS level (dBFS), clipping ratio (|s| at the
    int16 rail), and silence ratio (fraction of ``frame_ms`` frames
    under ``silence_db``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import codecs

        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                samples, rate = codecs.decode_audio(bytes(c or b""))
                x = samples.astype(np.float64)
                mono = x.mean(axis=1)
                rms = float(np.sqrt((x**2).mean())) if x.size else 0.0
                fdb = _frame_rms_db(mono, rate, frame_ms)
                rows.append(
                    (
                        mid,
                        samples.shape[0] / rate,
                        rate,
                        samples.shape[1],
                        20 * np.log10(max(rms, 1e-9) / 32768.0),
                        float((np.abs(samples) >= 32767).mean())
                        if samples.size
                        else 0.0,
                        float((fdb < silence_db).mean()) if fdb.size else 1.0,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_METRICS_SCHEMA])

    return _spread(df).mapInPandas(run, schema=AUDIO_METRICS_SCHEMA)


VAD_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField(
            "timestamps",
            ArrayType(
                StructType(
                    [
                        StructField("start", DoubleType()),
                        StructField("end", DoubleType()),
                    ]
                )
            ),
        ),
    ]
)


def audio_vad(
    df: DataFrame, frame_ms: int = 20, threshold_db: float = -40.0
) -> DataFrame:
    """Energy VAD: frames with RMS above ``threshold_db`` dBFS are
    voice-active; consecutive active frames merge into one
    ``{start, end}`` span (seconds). Output matches the reference
    generator's `timestamps` column contract so the chunker consumes
    it unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import codecs

        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                samples, rate = codecs.decode_audio(bytes(c or b""))
                mono = samples.astype(np.float64).mean(axis=1)
                fdb = _frame_rms_db(mono, rate, frame_ms)
                active = fdb >= threshold_db
                spans = []
                start = None
                for i, a in enumerate(active):
                    if a and start is None:
                        start = i
                    elif not a and start is not None:
                        spans.append(
                            {"start": start * frame_ms / 1000.0,
                             "end": i * frame_ms / 1000.0}
                        )
                        start = None
                if start is not None:
                    spans.append(
                        {"start": start * frame_ms / 1000.0,
                         "end": len(active) * frame_ms / 1000.0}
                    )
                rows.append((mid, spans))
            yield pd.DataFrame(rows, columns=["media_id", "timestamps"])

    return _spread(df).mapInPandas(run, schema=VAD_SCHEMA)


CHUNK_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("chunk_idx", IntegerType()),
        StructField("start", DoubleType()),
        StructField("end", DoubleType()),
        StructField("content", BinaryType()),
    ]
)


def audio_chunk_rows(
    df: DataFrame,
    max_duration_s: float | None = None,
) -> DataFrame:
    """1→N: slice each row's WAV bytes by its ``timestamps`` spans into
    chunk rows of real WAV bytes. Spans longer than ``max_duration_s``
    split at fixed intervals (the reference chunker's split mode,
    audio_timestamp_chunk_row_generator.py:181-221). Cardinality grows
    within the partition — no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import codecs

        for pdf in batches:
            rows = []
            for mid, c, spans in zip(
                pdf["media_id"], pdf["content"], pdf["timestamps"]
            ):
                samples, rate = codecs.decode_audio(bytes(c or b""))
                pieces = []
                for span in spans if spans is not None else []:
                    s = float(span["start"]) if isinstance(span, dict) else float(span[0])
                    e = float(span["end"]) if isinstance(span, dict) else float(span[1])
                    if max_duration_s:
                        x = s
                        while x < e:
                            pieces.append((x, min(x + max_duration_s, e)))
                            x += max_duration_s
                    else:
                        pieces.append((s, e))
                for i, (s, e) in enumerate(pieces):
                    lo, hi = int(round(s * rate)), int(round(e * rate))
                    rows.append(
                        (
                            mid,
                            i,
                            s,
                            e,
                            codecs.encode_wav(samples[lo:hi], rate),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in CHUNK_SCHEMA])

    return _spread(df).mapInPandas(run, schema=CHUNK_SCHEMA)


VIDEO_INFO_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("success", BooleanType()),
        StructField("num_frames", IntegerType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("aspect_ratio", DoubleType()),
        StructField("resolution", IntegerType()),
        StructField("fps", DoubleType()),
        StructField("duration_sec", DoubleType()),
    ]
)


def video_info(df: DataFrame) -> DataFrame:
    """Per-video metadata probe — the reference VideoInfoFilter contract
    (video_info_filter.py:38-48 VideoInfo: success, num_frames, height,
    width, aspect_ratio=w/h, resolution=w*h, fps, duration_sec), probed
    from the REAL container instead of cv2: animated GIF carries
    per-frame delays (centiseconds), so duration = Σdelay/100 and
    fps = num_frames/duration (the reference's average-fps definition);
    AVI (strh dwRate/dwScale) and MP4 (mdhd timescale + stts) probe
    their header timing WITHOUT decoding samples — exactly the
    cv2.CAP_PROP probe the reference performs, so even codings we
    cannot pixel-decode (H.264 in MP4, non-MJPG AVI) report metadata;
    raw concatenated-P6 streams carry no timing → fps/duration NULL.
    Undecodable bytes → success=false, all metrics NULL (the reference's
    per-row error path, :139-160 safe_parallel handling)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import codecs
        from ..functions.gif import probe_gif

        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                buf = bytes(c or b"")
                try:
                    kind = codecs.sniff_video(buf)
                    if kind in ("avi", "mp4"):
                        if kind == "avi":
                            from ..functions.avi import probe_avi as probe
                        else:
                            from ..functions.mp4 import probe_mp4 as probe
                        p = probe(buf)
                        n, w, h = p["n_frames"], p["width"], p["height"]
                        if n < 1 or w < 1 or h < 1:
                            raise codecs.CodecUnavailable("empty video track")
                        rows.append(
                            (mid, True, n, h, w, w / h, w * h,
                             p["fps"], p["duration_sec"])
                        )
                        continue
                    delays = None
                    if kind == "gif":
                        # header walk only (probe_gif): frame count, dims
                        # and per-frame delays all live in the image
                        # descriptors + GCE blocks — decompressing pixels
                        # for a metadata probe was the r6 cost-model wart
                        # (the AVI/MP4 branches above never decode either)
                        n, w, h, delays = probe_gif(buf)
                    else:
                        frames = list(codecs.iter_video_frames(buf))
                        if not frames:
                            raise codecs.CodecUnavailable("no frames")
                        h, w = frames[0].shape[:2]
                        n = len(frames)
                    if n < 1:
                        raise codecs.CodecUnavailable("no frames")
                    if delays is not None and sum(delays) > 0:
                        dur = sum(delays) / 100.0
                        fps = n / dur
                    else:
                        dur, fps = None, None
                    rows.append(
                        (mid, True, n, h, w, w / h, w * h, fps, dur)
                    )
                except Exception:
                    # CodecUnavailable or corrupt container internals —
                    # both are the reference's per-row error path
                    # (success=False), never a task failure
                    rows.append(
                        (mid, False, None, None, None, None, None, None, None)
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_INFO_SCHEMA])

    return _spread(df).mapInPandas(run, schema=VIDEO_INFO_SCHEMA)


def resolution_keep(
    df: DataFrame,
    videos_col: str = "videos",
    min_width: int = 1,
    max_width: int | None = None,
    min_height: int = 1,
    max_height: int | None = None,
    any_or_all: str = "any",
    out_col: str = "passed_filter",
) -> DataFrame:
    """VideoResolutionFilter (video_resolution_filter.py:22-51, 112-155):
    width/height range predicate with the ``any_or_all`` multi-video
    retention strategy over a per-row ``array<struct<width,height>>``.
    The reference's run() handles the single-video degenerate case (one
    path per row, :133-138: non-positive dimensions → not kept); the
    any/all strategy is its documented multi-video config (:26-51, the
    data-juicer semantics it vendors). Pure Catalyst: ``exists`` /
    ``forall`` over the array, no UDF. Empty or NULL video lists are
    not kept under either strategy (a row with no probed video cannot
    pass a resolution gate — matches the reference's error path)."""
    if any_or_all not in ("any", "all"):
        raise ValueError(f"Keep strategy [{any_or_all}] is not supported.")
    max_w = F.lit(max_width) if max_width is not None else F.lit(2**31 - 1)
    max_h = F.lit(max_height) if max_height is not None else F.lit(2**31 - 1)

    def pred(v):
        return (
            (v["width"] > 0) & (v["height"] > 0)
            & (v["width"] >= F.lit(min_width)) & (v["width"] <= max_w)
            & (v["height"] >= F.lit(min_height)) & (v["height"] <= max_h)
        )

    quant = F.exists if any_or_all == "any" else F.forall
    keep = F.when(
        F.col(videos_col).isNotNull() & (F.size(videos_col) > 0),
        quant(F.col(videos_col), pred),
    ).otherwise(F.lit(False))
    return df.withColumn(out_col, keep)


CLIP_ROWS_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("scene_idx", IntegerType()),
        StructField("start_frame", IntegerType()),
        StructField("end_frame", IntegerType()),  # exclusive
        StructField("n_frames", IntegerType()),
        StructField("content", BinaryType()),
        StructField("codec", StringType()),
    ]
)


def video_clip_rows(
    df: DataFrame,
    threshold: float = 30.0,
    min_frames: int = 1,
    max_frames: int | None = None,
) -> DataFrame:
    """VideoSceneClipGenerator / VideoClipGenerator shape
    (video_clip_generator.py:245-330: flatten scene list, CUT each
    span's frames into a standalone clip file) over the real codecs:
    scenes from the shared content-change segmentation, each span's
    frames re-encoded as a standalone animated GIF (each span carries
    its OWN per-frame delays from the source GIF, so variable-delay
    timing survives the cut; >256-color spans fall back to a
    concatenated-P6 stream, ``codec`` says which). 1→N rows emit within
    the partition — no shuffle; clip bytes round-trip through
    iter_video_frames, so downstream media operators consume clips
    exactly like source videos. Undecodable or empty inputs emit ZERO
    rows for that media_id (the reference's safe skip — a per-row
    failure must never kill the task, matching video_info's error
    path)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions import codecs
        from ..functions.gif import encode_gif, iter_gif_frames

        for pdf in batches:
            rows = []
            for mid, c in zip(pdf["media_id"], pdf["content"]):
                try:
                    buf = bytes(c or b"")
                    if buf[:6] in (b"GIF87a", b"GIF89a"):
                        pairs = list(iter_gif_frames(buf))
                        frames = [f for f, _ in pairs]
                        # 0-delay frames render at the de-facto minimum
                        # of 1 cs, per frame
                        delays = [max(d, 1) for _, d in pairs]
                    else:
                        frames = list(codecs.iter_video_frames(buf))
                        delays = [4] * len(frames)
                    if not frames:
                        continue
                    lumas = [_luma(f) for f in frames]
                    spans = _scene_spans(
                        lumas, threshold, min_frames, max_frames
                    )
                    for i, (s, e) in enumerate(spans):
                        clip = frames[s:e]
                        try:
                            blob = encode_gif(clip, delay_cs=delays[s:e])
                            codec = "gif"
                        except ValueError:
                            blob = b"".join(
                                codecs.encode_ppm(f) for f in clip
                            )
                            codec = "ppm"
                        rows.append(
                            (mid, i, s, e, e - s, bytearray(blob), codec)
                        )
                except Exception:
                    continue  # undecodable input: skip, never fail the task
            yield pd.DataFrame(rows, columns=[f.name for f in CLIP_ROWS_SCHEMA])

    return _spread(df).mapInPandas(run, schema=CLIP_ROWS_SCHEMA)
