"""Tight-watermark determinism (the lossy configuration).

With a watermark delay far smaller than the stream's arrival disorder,
beyond-watermark rows are *dropped* — deterministically, given the same
input stream + watermark progression (BASELINE.json north_rule). The
engine's drain with maxFilesPerTrigger=1 over mtime-ordered files must
equal the faithful micro-batch/watermark simulator
(oracle/pandas_pipeline.microbatch_reference) replaying the same file
sequence.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dataflow_mm_lrt_spark.datagen import (
    GenSpec,
    append_punctuation_file,
    generate_transcripts,
)
from dataflow_mm_lrt_spark.oracle.pandas_pipeline import microbatch_reference
from dataflow_mm_lrt_spark.streaming.run import PipelineConfig, run_pipeline

WATERMARK_DELAY_MS = 30 * 60 * 1000  # 30 minutes — far below disorder
ORDER_SLACK_MS = 120_000


@pytest.fixture(scope="module")
def lossy_ds(tmp_path_factory):
    d = tmp_path_factory.mktemp("lossy_ds")
    tr = generate_transcripts(GenSpec(n_convs=40))
    os.makedirs(d / "transcripts")
    n_files = 5
    chunk = (len(tr) + n_files - 1) // n_files
    table = pa.Table.from_pandas(tr, preserve_index=False)
    file_pdfs = []
    for i in range(0, len(tr), chunk):
        fp = str(d / "transcripts" / f"part-{i//chunk:05d}.parquet")
        pq.write_table(table.slice(i, chunk), fp)
        os.utime(fp, (1_700_000_000 + i // chunk,) * 2)
        file_pdfs.append(tr.iloc[i : i + chunk].reset_index(drop=True))
    punct_ts = tr["ts"].max().to_datetime64() + np.timedelta64(30, "D")
    append_punctuation_file(str(d / "transcripts"), punct_ts)
    punct = pd.DataFrame(
        {
            "conv_id": ["__punctuation__"],
            "turn_idx": np.array([0], dtype=np.int32),
            "role": ["system"],
            "text": ["heartbeat"],
            "tool": pd.Series([None], dtype=object),
            "ts": pd.Series([pd.Timestamp(punct_ts)]),
        }
    )
    file_pdfs.append(punct)
    return d, file_pdfs


def test_lossy_drain_matches_microbatch_simulator(spark, lossy_ds, tmp_path):
    d, file_pdfs = lossy_ds
    cfg = PipelineConfig(
        watermark_delay="30 minutes",
        order_slack_ms=ORDER_SLACK_MS,
        max_files_per_trigger=1,
    )
    sink, _ = run_pipeline(spark, str(d / "transcripts"), str(tmp_path / "out"), cfg)
    got = sink.read_committed(spark).toPandas()
    got = got[got.conv_id != "__punctuation__"]
    got = got.sort_values(["conv_id", "emit_seq"]).reset_index(drop=True)

    exp = microbatch_reference(
        file_pdfs,
        watermark_delay_ms=WATERMARK_DELAY_MS,
        order_slack_ms=ORDER_SLACK_MS,
    )
    exp = exp[exp.conv_id != "__punctuation__"]
    exp = exp.sort_values(["conv_id", "emit_seq"]).reset_index(drop=True)

    assert len(got) > 0
    assert len(got) == len(exp), f"{len(got)} vs {len(exp)}"
    for col in ["conv_id", "turn_idx", "role", "text", "emit_seq"]:
        assert (got[col].to_numpy() == exp[col].to_numpy()).all(), col
    got_ts = got["ts"].to_numpy(dtype="datetime64[us]")
    exp_ts = exp["ts"].to_numpy(dtype="datetime64[us]")
    assert (got_ts == exp_ts).all()
