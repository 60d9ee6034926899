"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real definitions live in ``dataflow_mm_lrt_spark.contract`` — one
source of truth builds both the Spark queries and the DuckDB oracles
from the same dual-dialect expression library.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dataflow_mm_lrt_spark import contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return contract.entry_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY query (50/50). The one
    non-SQL-computable entry, ``normalize_en_full`` (per-word FST),
    uses a LOOKUP oracle: a committed golden parquet keyed by
    md5(derived input), generated once from the Python twin that the
    non-circular golden suite validates (tools/gen_en_full_golden.py)."""
    return dict(contract.ORACLES)
