"""SparkSession factory tuned for this engine.

Defaults are chosen for correctness-at-scale, not just local runs:

* AQE on (runtime coalescing + skew-join splitting),
* Arrow enabled for every pandas interchange (the only Python that ever
  touches data is Arrow-batched),
* session timezone pinned to UTC so event-time windows are
  deterministic and comparable with external oracles,
* parquet filter pushdown / column pruning left on (defaults) — the
  operator library is written so predicates reach the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def build_session(
    app_name: str = "dataflow-mm-lrt-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    in the sandbox; on a real cluster pass ``None`` and let
    ``spark-submit`` decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # keep parquet timestamps as plain TimestampType so event-time
        # semantics match a UTC-naive oracle
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.streaming.stateStore.stateSchemaCheck", "true")
        # RocksDB state store: keeps stateful-operator state off the JVM
        # heap (no GC ceiling at high parallelism) and scales to state
        # far beyond memory. Measured (BENCH/BASELINE.md): 8→32-core
        # streaming efficiency 0.72 → 1.07 and +39% absolute throughput
        # at 32 cores vs the default HDFSBacked provider.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
