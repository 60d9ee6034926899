"""Operator caches must not accumulate in the block manager
(round-2 VERDICT item 8): intra-op persists are released by the
operator itself; plan-reuse persists are registered and released in one
``cache.release_all()`` call."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataflow_mm_lrt_spark import cache
from dataflow_mm_lrt_spark.contract import EXTRA_QUERIES
from dataflow_mm_lrt_spark.contract import QUERIES as _DRIVER_QUERIES

# cache-release guarantees cover demoted (EXTRA) entries too
QUERIES = {**_DRIVER_QUERIES, **EXTRA_QUERIES}

SF_DIR = "/root/testdata/sf0.001"


def _persistent_rdds(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_intra_op_persists_self_release(spark):
    """keep_top_fraction / kmeans_cells persist only for their own
    driver-side passes and unpersist before returning."""
    cache.release_all()
    base = _persistent_rdds(spark)
    QUERIES["keep_top_fraction"](spark, SF_DIR).count()
    QUERIES["kmeans_cells"](spark, SF_DIR).count()
    assert _persistent_rdds(spark) == base


def test_plan_reuse_persists_released_in_one_call(spark):
    """ngram/tfidf dedup and the rollup register their plan-reuse caches
    with the scoped registry; release_all() drops every block."""
    cache.release_all()
    base = _persistent_rdds(spark)
    QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).count()
    QUERIES["dedup_tfidf_cosine"](spark, SF_DIR).count()
    QUERIES["hypertable_rollup"](spark, SF_DIR).count()
    assert _persistent_rdds(spark) > base  # caches were in use
    cache.release_all()
    assert _persistent_rdds(spark) == base


def test_keep_top_fraction_plan_is_single_filter(spark):
    """The restructured selection returns a pure filter over the input —
    no union, no window, a single reference to the source."""
    from dataflow_mm_lrt_spark.operators.ranking import keep_top_fraction

    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 97).cast("double").alias("score")
    )
    out = keep_top_fraction(df, "score", keep_ratio=0.5, tie_col="id",
                            persist=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert "Window" not in plan
    cache.release_all()
