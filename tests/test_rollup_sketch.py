"""hypertable_rollup level-consistency and KMV sketch accuracy/exactness."""

from __future__ import annotations

import pandas as pd
import pytest

from dataflow_mm_lrt_spark.operators.rollup import hypertable_rollup, kmv_distinct

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    df.cache().count()
    return df


def test_rollup_levels_compose(spark, events):
    out = hypertable_rollup(events).toPandas()
    by_res = {r: g for r, g in out.groupby("resolution")}
    raw_n = events.count()
    for res in ("1 minute", "1 hour", "1 day"):
        assert by_res[res]["n_events"].sum() == raw_n, res
    # every hour bucket's count equals the sum of its minute partials
    m = by_res["1 minute"].copy()
    m["hour"] = (m["bucket_start"] // 3600) * 3600
    minute_to_hour = m.groupby(["hour", "key"])["n_events"].sum()
    h = by_res["1 hour"].set_index(["bucket_start", "key"])["n_events"]
    pd.testing.assert_series_equal(
        minute_to_hour.sort_index(), h.sort_index(),
        check_names=False,
    )


def test_rollup_requires_nesting(spark, events):
    # the standard trio always nests; exercise the guard with an
    # injected non-nesting resolution
    from dataflow_mm_lrt_spark.operators import rollup as r

    old = dict(r.RESOLUTIONS)
    try:
        r.RESOLUTIONS["7 minutes"] = 420
        with pytest.raises(ValueError, match="nest"):
            hypertable_rollup(events, resolutions=("1 minute", "7 minutes", "1 hour"))
    finally:
        r.RESOLUTIONS.clear()
        r.RESOLUTIONS.update(old)


def test_kmv_exact_below_k(spark, events):
    true_n = events.select("user_id").distinct().count()
    out = kmv_distinct(events, col="cast(user_id as string)", k=4096).collect()
    assert len(out) == 1
    assert out[0]["distinct_est"] == float(true_n)  # synopsis == distinct set


def test_kmv_estimates_within_tolerance(spark, events):
    true_n = events.select("user_id").distinct().count()
    est = kmv_distinct(events, col="cast(user_id as string)", k=8).collect()[0][
        "distinct_est"
    ]
    assert est != float(true_n)  # the estimator path, not the exact path
    assert 0.3 * true_n <= est <= 3.0 * true_n  # k=8 → ~38% stderr


def test_kmv_salted_merge_matches_single_phase(spark, events):
    a = kmv_distinct(events, col="cast(user_id as string)", k=8, n_salts=1).collect()
    b = kmv_distinct(events, col="cast(user_id as string)", k=8, n_salts=32).collect()
    assert a[0]["kth_min"] == b[0]["kth_min"]
    assert a[0]["distinct_est"] == b[0]["distinct_est"]
