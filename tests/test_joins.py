"""asof_join / interval_join unit semantics: inclusive boundaries,
unmatched-null behavior, tolerance voiding, and a pandas merge_asof
cross-check."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from dataflow_mm_lrt_spark.operators.joins import asof_join, interval_join

T0 = np.datetime64("2024-01-01T00:00:00", "us")


def _ts(sec):
    return T0 + np.timedelta64(int(sec * 1_000_000), "us")


@pytest.fixture(scope="module")
def frames(spark):
    left = pd.DataFrame(
        {
            "k": ["a", "a", "a", "b", "c"],
            "ts": [_ts(10), _ts(20), _ts(5), _ts(10), _ts(10)],
            "lv": [1, 2, 3, 4, 5],
        }
    )
    right = pd.DataFrame(
        {
            "k": ["a", "a", "b"],
            "ts": [_ts(8), _ts(15), _ts(10)],
            "rv": ["r8", "r15", "rb10"],
        }
    )
    return spark.createDataFrame(left), spark.createDataFrame(right), left, right


def test_asof_matches_pandas_merge_asof(spark, frames):
    ldf, rdf, left, right = frames
    got = (
        asof_join(ldf, rdf, key_cols=["k"], ts_col="ts")
        .orderBy("k", "ts")
        .toPandas()
    )
    exp = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
        suffixes=("", "_right"),
    ).sort_values(["k", "ts"]).reset_index(drop=True)
    assert list(got["rv_right"].fillna("∅")) == list(exp["rv"].fillna("∅"))


def test_asof_inclusive_equal_ts(spark, frames):
    ldf, rdf, *_ = frames
    got = {
        (r["k"], r["lv"]): r["rv_right"]
        for r in asof_join(ldf, rdf, key_cols=["k"], ts_col="ts").collect()
    }
    # b@10 matches rb10 at exactly the same timestamp (<= is inclusive)
    assert got[("b", 4)] == "rb10"
    # a@5 has no earlier right row; c has no right rows at all
    assert got[("a", 3)] is None
    assert got[("c", 5)] is None


def test_asof_tolerance_voids_stale_matches(spark, frames):
    ldf, rdf, *_ = frames
    got = {
        (r["k"], r["lv"]): r["rv_right"]
        for r in asof_join(
            ldf, rdf, key_cols=["k"], ts_col="ts", tolerance_seconds=3
        ).collect()
    }
    assert got[("a", 1)] == "r8"     # 10-8=2s within tolerance
    assert got[("a", 2)] is None     # 20-15=5s: stale, voided
    assert got[("b", 4)] == "rb10"   # 0s


def test_interval_join_inclusive_bounds(spark, frames):
    ldf, rdf, *_ = frames
    out = interval_join(
        ldf, rdf, key_cols=["k"], lo_seconds=0, hi_seconds=5
    ).collect()
    pairs = {(r["lv"], r["rv_right"]) for r in out}
    # a@10 pairs with r15 (15-10=5, inclusive hi); a@5 with r8 (3s);
    # b@10 with rb10 (0s, inclusive lo); a@20 matches nothing
    assert pairs == {(1, "r15"), (3, "r8"), (4, "rb10")}


def test_asof_tied_right_rows_deterministic(spark):
    """Equal-(key, ts) right rows resolve to the greatest value tuple —
    deterministically, run after run (ADVICE r2: last() over a window
    ordered only by (ts, _side) picked an arbitrary tied row)."""
    left = pd.DataFrame({"k": ["a"], "ts": [_ts(10)], "lv": [1]})
    right = pd.DataFrame(
        {
            "k": ["a"] * 3,
            "ts": [_ts(10)] * 3,
            "rv": ["r_b", "r_c", "r_a"],
        }
    )
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    for _ in range(3):
        got = asof_join(
            ldf.repartition(8), rdf.repartition(8), key_cols=["k"], ts_col="ts"
        ).collect()
        assert len(got) == 1 and got[0]["rv_right"] == "r_c"


def test_asof_null_right_value_not_backfilled(spark):
    """A genuinely-NULL value on the matched right row stays NULL — the
    per-column last(ignorenulls) form would backfill it from an OLDER
    right row, splicing two physical rows into one match."""
    left = pd.DataFrame({"k": ["a"], "ts": [_ts(20)], "lv": [1]})
    right = pd.DataFrame(
        {
            "k": ["a", "a"],
            "ts": [_ts(5), _ts(15)],
            "rv1": ["old", "new"],
            "rv2": ["filled", None],
        }
    )
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)
    row = asof_join(ldf, rdf, key_cols=["k"], ts_col="ts").collect()[0]
    assert row["rv1_right"] == "new"
    assert row["rv2_right"] is None  # from the SAME matched row
