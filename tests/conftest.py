from __future__ import annotations

import shutil

import pytest

from dataflow_mm_lrt_spark.datagen import GenSpec, generate_tool_events, generate_transcripts
from dataflow_mm_lrt_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_pdf():
    """Small deterministic transcript fixture (seed 42)."""
    return generate_transcripts(GenSpec(n_convs=80))


@pytest.fixture(scope="session")
def tool_events_pdf(transcripts_pdf):
    return generate_tool_events(transcripts_pdf)


@pytest.fixture(scope="session")
def transcripts_df(spark, transcripts_pdf):
    df = spark.createDataFrame(transcripts_pdf)
    df.cache().count()
    return df


@pytest.fixture(scope="session")
def tmp_root(tmp_path_factory):
    p = tmp_path_factory.mktemp("engine")
    yield p
    shutil.rmtree(p, ignore_errors=True)
