#!/usr/bin/env python
"""Scaling-efficiency evidence: the same job at two parallelism levels.

BASELINE.json's north rule requires throughput scaling efficiency ≥ 0.8
from N to 4N executors; in this sandbox (no cluster) the evidence is the
same job on identical input at local[8] vs local[32]
(BASELINE.md "Scaling efficiency"). Each level runs in its own python
process (one JVM per process); results land in BENCH/BASELINE.md.

Usage: python bench_scaling.py [--sf 0.1]
Child mode: python bench_scaling.py --child <cpus> <sf>  → one JSON line
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def child(cpus: int, sf: float) -> None:
    from bench import transcript_dataset_for
    from dataflow_mm_lrt_spark.contract import QUERIES
    from dataflow_mm_lrt_spark.session import build_session
    from dataflow_mm_lrt_spark.streaming.run import PipelineConfig, run_pipeline

    sf_dir = f"/root/testdata/sf{sf}"
    spark = build_session(
        app_name=f"scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # batch leg: shuffle/agg/join-heavy headliners
    batch_queries = ["rule_filter", "dedup_exact", "session_window",
                     "pricing_summary", "assemble_trail"]
    t0 = time.time()
    for name in batch_queries:
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    batch_sec = time.time() - t0

    # streaming leg: full pipeline drain (the headline metric)
    ds = transcript_dataset_for(sf)
    in_dir = os.path.join(ds, "transcripts")
    n_turns = spark.read.parquet(in_dir).count()
    out_dir = f"/tmp/spark_graft_scaling_out_{cpus}_{os.getpid()}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    run_pipeline(
        spark,
        in_dir,
        out_dir,
        PipelineConfig(watermark_delay="72 hours", max_files_per_trigger=None),
    )
    stream_sec = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)

    print(
        json.dumps(
            {
                "cpus": cpus,
                "batch_sec": round(batch_sec, 2),
                "stream_sec": round(stream_sec, 2),
                "turns": n_turns,
                "stream_turns_per_sec": round(n_turns / stream_sec, 1),
            }
        )
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), float(sys.argv[3]))
        return
    sf = 0.1
    if "--sf" in sys.argv:
        sf = float(sys.argv[sys.argv.index("--sf") + 1])

    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, __file__, "--child", str(cpus), str(sf)],
            capture_output=True,
            text=True,
            check=True,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(line)

    r8, r32 = results[8], results[32]
    stream_speedup = r8["stream_sec"] / r32["stream_sec"]
    batch_speedup = r8["batch_sec"] / r32["batch_sec"]
    stream_eff = stream_speedup / 4
    batch_eff = batch_speedup / 4

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — measured throughput & scaling (sandbox evidence)

Per BASELINE.md, the two-cluster-size criterion (N → 4N executors,
efficiency ≥ 0.8) is evidenced at two local parallelism levels on
identical input (sf={sf}; deterministic seed-42 transcript stream for
the streaming leg; /root/testdata/sf{sf} for the batch leg).

## Streaming pipeline (ingest → clean → stateful assembly → exactly-once sink)

| parallelism | turns | wall (s) | turns/sec |
|---|---|---|---|
| local[8]  | {r8['turns']} | {r8['stream_sec']} | {r8['stream_turns_per_sec']} |
| local[32] | {r32['turns']} | {r32['stream_sec']} | {r32['stream_turns_per_sec']} |

speedup 8→32 (4× cores): **{stream_speedup:.2f}×** → scaling efficiency **{stream_eff:.2f}**

## Batch operator leg (rule_filter, dedup_exact, session_window, pricing_summary, assemble_trail)

| parallelism | wall (s) |
|---|---|
| local[8]  | {r8['batch_sec']} |
| local[32] | {r32['batch_sec']} |

speedup 8→32: **{batch_speedup:.2f}×** → scaling efficiency **{batch_eff:.2f}**

Notes: single-JVM local mode shares one driver and one disk; shuffle
partitions were set to max(cores, 8) per level. Efficiency on a real
multi-executor cluster benefits from per-executor shuffle/disk
parallelism that local mode cannot express.
"""
        )
    print(
        json.dumps(
            {
                "stream_scaling_efficiency": round(stream_eff, 3),
                "batch_scaling_efficiency": round(batch_eff, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
