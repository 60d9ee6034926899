"""Regression for the round-1 TIMESTAMP_NTZ portability bug.

The verification driver runs contract queries under a *default* Spark
4.1.2 session: ``spark.sql.parquet.inferTimestampNTZ.enabled=true`` (the
testdata's untagged ``timestamp[us]`` columns read as TIMESTAMP_NTZ) and
a machine-local timezone. Round 1 failed 4/27 queries there because
``cast(ts as long)`` is illegal on NTZ. These tests mimic that session
via ``spark.newSession()`` with the driver's confs and assert the
time-based queries still hash-match their DuckDB oracles.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from dataflow_mm_lrt_spark.contract import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"

# the four round-1 reds + every other query touching event-time
TIME_QUERIES = [
    "tumbling_window",
    "sliding_window",
    "session_window",
    "cep_funnel",
    "dedup_first_event",
    "assemble_trail",
]


@pytest.fixture(scope="module")
def driver_like_session(spark):
    """A session with the driver's defaults: NTZ inference ON, non-UTC tz."""
    s = spark.newSession()
    s.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    s.conf.set("spark.sql.session.timeZone", "America/New_York")
    return s


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", TIME_QUERIES)
def test_time_query_under_default_session(driver_like_session, duck, name):
    df = QUERIES[name](driver_like_session, SF_DIR)
    # reads must have come back as NTZ before contract normalization —
    # sanity-check the session really infers NTZ
    raw = driver_like_session.read.parquet(f"{SF_DIR}/events.parquet")
    assert raw.schema["ts"].dataType.typeName() == "timestamp_ntz"
    got = _canon(df.toPandas())
    exp = _canon(duck.sql(ORACLES[name]).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
