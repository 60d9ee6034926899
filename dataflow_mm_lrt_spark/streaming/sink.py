"""Exactly-once table sink via idempotent per-epoch commit manifests.

Spark's ``foreachBatch`` contract is at-least-once: a micro-batch can be
re-executed after failure with the same ``batch_id``. This sink makes
replays no-ops (north_star: "exactly-once upserts … via idempotent
commit manifests keyed by (checkpoint_epoch, partition_id)"):

* batch data lands in ``data/epoch=<batch_id>/`` with ``mode=overwrite``
  — a re-run of the same epoch overwrites its own partial output;
* the epoch becomes visible only when ``_manifests/epoch-<id>.json`` is
  atomically renamed into place; the manifest records per-partition
  lineage (files, row counts) and event-time bounds (metrics);
* a replayed batch whose manifest already exists is skipped entirely;
* readers (``read_committed``) list manifests and read exactly the
  committed files.

This is the same commit protocol an Iceberg sink would use (snapshot +
manifest list); it is kept behind one class so an Iceberg writer can be
swapped in where the runtime jar exists (SURVEY.md §7.2 step 7).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ManifestSink:
    def __init__(self, base_dir: str):
        self.base_dir = base_dir
        self.data_dir = os.path.join(base_dir, "data")
        self.manifest_dir = os.path.join(base_dir, "_manifests")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- commit protocol ---------------------------------------------------

    def _manifest_path(self, batch_id: int) -> str:
        return os.path.join(self.manifest_dir, f"epoch-{batch_id:010d}.json")

    def is_committed(self, batch_id: int) -> bool:
        return os.path.exists(self._manifest_path(batch_id))

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body. Idempotent on replay of the same batch_id."""
        if self.is_committed(batch_id):
            return  # exactly-once: replayed epoch is a no-op
        epoch_dir = os.path.join(self.data_dir, f"epoch={batch_id:010d}")
        batch_df.write.mode("overwrite").parquet(epoch_dir)

        # lineage + metrics from the files just written (parquet footers —
        # no recompute of the batch plan)
        spark = batch_df.sparkSession
        files = sorted(
            f for f in os.listdir(epoch_dir) if f.endswith(".parquet")
        )
        lineage = []
        n_rows = 0
        ts_min = ts_max = None
        if files:
            written = spark.read.parquet(epoch_dir)
            per_file = (
                written.groupBy(F.input_file_name().alias("file"))
                .agg(
                    F.count("*").alias("rows"),
                    F.min("ts").alias("ts_min"),
                    F.max("ts").alias("ts_max"),
                )
                .collect()
            )
            for i, r in enumerate(sorted(per_file, key=lambda r: r["file"])):
                lineage.append(
                    {
                        "partition_id": i,
                        "file": os.path.basename(r["file"]),
                        "rows": r["rows"],
                    }
                )
                n_rows += r["rows"]
                for v, agg in ((r["ts_min"], min), (r["ts_max"], max)):
                    if v is not None:
                        ts_min = v if ts_min is None else min(ts_min, v)
                        ts_max = v if ts_max is None else max(ts_max, v)

        manifest = {
            "epoch": batch_id,
            "committed_at": time.time(),
            "n_rows": n_rows,
            "ts_min": str(ts_min) if ts_min is not None else None,
            "ts_max": str(ts_max) if ts_max is not None else None,
            "partitions": lineage,
        }
        tmp = self._manifest_path(batch_id) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(batch_id))  # atomic commit point

    def foreach_batch(self):
        return lambda df, bid: self.write_batch(df, bid)

    # -- read side ---------------------------------------------------------

    def committed_epochs(self) -> list[int]:
        out = []
        for f in sorted(os.listdir(self.manifest_dir)):
            if f.startswith("epoch-") and f.endswith(".json"):
                out.append(int(f[len("epoch-"):-len(".json")]))
        return out

    def manifests(self) -> list[dict]:
        return [
            json.load(open(self._manifest_path(e))) for e in self.committed_epochs()
        ]

    def read_committed(self, spark: SparkSession) -> DataFrame:
        paths = [
            os.path.join(self.data_dir, f"epoch={e:010d}")
            for e in self.committed_epochs()
        ]
        non_empty = []
        for p in paths:
            if os.path.isdir(p) and any(
                f.endswith(".parquet") for f in os.listdir(p)
            ):
                non_empty.append(p)
        if not non_empty:
            from .stateful import ASSEMBLED_SCHEMA

            return spark.createDataFrame([], schema=ASSEMBLED_SCHEMA)
        return spark.read.parquet(*non_empty)
