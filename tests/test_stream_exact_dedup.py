"""Built-in streaming exact dedup (dropDuplicates + watermark): first
*arrival* wins; a re-arriving fingerprint within the watermark horizon is
suppressed. Verified against the distinct set of fingerprints."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dataflow_mm_lrt_spark.datagen import (
    GenSpec,
    append_punctuation_file,
    generate_transcripts,
)
from dataflow_mm_lrt_spark.streaming.source import transcript_stream
from dataflow_mm_lrt_spark.streaming.stateful import exact_stream_dedup


@pytest.fixture(scope="module")
def dedup_ds(tmp_path_factory):
    d = tmp_path_factory.mktemp("sdedup")
    tr = generate_transcripts(GenSpec(n_convs=30, dup_frac=0.3))
    os.makedirs(d / "transcripts")
    t = pa.Table.from_pandas(tr, preserve_index=False)
    chunk = (len(tr) + 3) // 4
    for i in range(0, len(tr), chunk):
        fp = str(d / "transcripts" / f"part-{i//chunk:05d}.parquet")
        pq.write_table(t.slice(i, chunk), fp)
        os.utime(fp, (1_700_000_000 + i // chunk,) * 2)
    append_punctuation_file(
        str(d / "transcripts"),
        tr["ts"].max().to_datetime64() + np.timedelta64(30, "D"),
    )
    return d, tr


def test_exact_stream_dedup_one_row_per_fingerprint(spark, dedup_ds, tmp_path):
    d, tr = dedup_ds
    src = transcript_stream(spark, str(d / "transcripts"), max_files_per_trigger=2)
    out = exact_stream_dedup(src, watermark_delay="72 hours")
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(str(tmp_path / "out")).toPandas()
    got = got[got.conv_id != "__punctuation__"]

    from dataflow_mm_lrt_spark.oracle.reference_port import normalize

    expected_distinct = tr["text"].map(normalize).nunique()
    got_distinct = got["text"].map(normalize).nunique()
    # exactly one surviving row per fingerprint, none lost
    assert len(got) == expected_distinct == got_distinct


def test_exact_stream_dedup_state_is_bounded(spark, tmp_path):
    """Regression for the round-1 unbounded-state bug: fingerprint state
    must be EVICTED once the watermark passes, so state row counts stay
    bounded by the horizon instead of growing with corpus size."""
    import pandas as pd

    n_files, per_file = 5, 40
    base = np.datetime64("2024-01-01T00:00:00", "us")
    src_dir = tmp_path / "transcripts"
    os.makedirs(src_dir)
    for i in range(n_files):
        # file i = its own 1-minute burst, one hour after file i-1; texts
        # unique per file (plus in-file duplicates to exercise suppression)
        texts = [f"file{i} unique text number {j % (per_file // 2)}" for j in range(per_file)]
        pdf = pd.DataFrame(
            {
                "conv_id": [f"c{i}" for _ in range(per_file)],
                "turn_idx": np.arange(per_file, dtype=np.int32),
                "role": ["human"] * per_file,
                "text": texts,
                "tool": [""] * per_file,
                "ts": base + np.timedelta64(i, "h") + np.arange(per_file) * np.timedelta64(1, "s"),
            }
        )
        fp = str(src_dir / f"part-{i:05d}.parquet")
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), fp)
        os.utime(fp, (1_700_000_000 + i,) * 2)
    append_punctuation_file(str(src_dir), base + np.timedelta64(30, "D"))

    src = transcript_stream(spark, str(src_dir), max_files_per_trigger=1)
    out = exact_stream_dedup(src, watermark_delay="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.read.parquet(str(tmp_path / "out")).toPandas()
    got = got[got.conv_id != "__punctuation__"]
    # per-file duplicate suppression still exact within the horizon
    assert len(got) == n_files * (per_file // 2)

    state_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in (q.recentProgress or [])
        if p.get("stateOperators")
    ]
    total_distinct = n_files * (per_file // 2)
    # state never holds the whole corpus, and ends (after the punctuation
    # watermark advance) with everything before the horizon evicted
    assert max(state_rows) < total_distinct
    assert state_rows[-1] <= per_file // 2 + 1
