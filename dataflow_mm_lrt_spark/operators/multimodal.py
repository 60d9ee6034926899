"""Multimodal column plumbing (images/audio/video as opaque binary).

The reference loads pixels/waveforms eagerly per row (utils/utils.py:27
``_load_image``; video ops decode in multiprocessing pools). Here media
travel as ``binary`` columns with typed metadata, and decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so the scan, batching and shuffle layout are real
Spark even though the codec itself is stubbed in this container (no
image/audio libs): the decode body raises ``NotImplementedError`` unless
``fake=True``, in which case a deterministic fake (seeded by the content
hash) produces stable features for tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("content", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _decode(content: bytes, kind: str, fake: bool) -> np.ndarray:
    if not fake:
        raise NotImplementedError(
            "media codecs are not available in this container; "
            "run with fake=True for the deterministic test double"
        )
    # deterministic fake: 8-dim feature seeded by the content digest
    digest = hashlib.md5(content or b"").digest()
    seed = int.from_bytes(digest[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.random(8, dtype=np.float32)


def extract_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas decode/feature stage over binary media rows.

    The Spark-side contract (schema, Arrow batching, partition
    preservation) is real; only the codec body is stubbed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode(c, k, fake)
                for c, k in zip(pdf["content"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("content", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("content", BinaryType()),
    ]
)


def resize_media(
    df: DataFrame, width: int = 224, height: int = 224, fake: bool = False
) -> DataFrame:
    """1→1 resize stage (mapInPandas): same Arrow contract as a real
    image decode+resize; the fake body derives width*height deterministic
    bytes from the content digest."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for c in pdf["content"]:
                if not fake:
                    raise NotImplementedError(
                        "image codecs unavailable in this container; fake=True"
                    )
                digest = hashlib.md5(c or b"").digest()
                reps = (width * height) // len(digest) + 1
                out.append((digest * reps)[: width * height])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": out,
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame, n_frames: int = 4, fake: bool = False
) -> DataFrame:
    """1→N frame sampling (UDTF shape, mapInPandas): each video row
    yields ``n_frames`` frame rows; non-video rows pass through as a
    single frame 0."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, contents = [], [], []
            for mid, kind, c in zip(pdf["media_id"], pdf["kind"], pdf["content"]):
                if not fake:
                    raise NotImplementedError(
                        "video codecs unavailable in this container; fake=True"
                    )
                k = n_frames if kind == "video" else 1
                for i in range(k):
                    digest = hashlib.md5((c or b"") + bytes([i])).digest()
                    ids.append(mid)
                    idxs.append(i)
                    contents.append(digest)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "content": contents}
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def fake_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic binary media fixture."""
    rows = pd.DataFrame(
        {
            "media_id": [f"m{i:05d}" for i in range(n)],
            "kind": [["image", "audio", "video"][i % 3] for i in range(n)],
            "content": [bytes([i % 251]) * (100 + i) for i in range(n)],
            "mime": ["application/octet-stream"] * n,
            "width": [16 + i for i in range(n)],
            "height": [16 + i for i in range(n)],
            "duration_ms": [1000 + i for i in range(n)],
        }
    )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
