"""Scoped cache registry: caller-releasable operator caches.

Some operators persist an intermediate whose cache serves the *caller's*
action (the plan references it several times — e.g. the shingle sets in
n-gram dedup, the rollup level partials). Those caches can't be
unpersisted inside the operator without forfeiting the reuse, so they
are registered here and released in one call:

    from dataflow_mm_lrt_spark import cache
    ...run queries, materialize results...
    cache.release_all()

Long-lived sessions (benchmarks, services) should release between
queries; short-lived jobs can rely on Spark's ContextCleaner, which
unpersists automatically once the DataFrames are garbage-collected.
Persists whose benefit is purely internal to an operator (driver-side
quantile/count passes) are instead unpersisted by the operator itself
in a ``finally`` and never appear here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []
_LIVE_BC: list = []


def scoped_broadcast(bc):
    """Register a SparkContext broadcast for ``release_all`` — broadcast
    blocks otherwise accumulate on the driver and executors for the life
    of the session (exactly the long-lived-session scenario this module
    exists for). ``unpersist`` (not ``destroy``) is used on release, so
    a still-referenced plan can lazily re-broadcast if re-executed."""
    _LIVE_BC.append(bc)
    return bc


def scoped_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """Persist ``df`` and register it for ``release_all``. The registry
    holds a strong reference (a weak one would die with the operator's
    local scope and strand the blocks) — bounded by the caller calling
    ``release_all`` between queries."""
    if storage_level is not None:
        df = df.persist(storage_level)
    else:
        df = df.persist()
    _LIVE.append(df)
    return df


def release_all() -> int:
    """Unpersist every registered cache; returns how many."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    while _LIVE_BC:
        bc = _LIVE_BC.pop()
        try:
            bc.unpersist(blocking=False)
            n += 1
        except Exception:
            pass
    return n
