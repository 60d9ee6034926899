#!/usr/bin/env python
"""Per-query isolation bench + plan capture (guide §1.1/§1.4/§1.5).

NOT the driver bench — ``bench.py`` is frozen for measurement. This
harness exists so optimization work can time one query at a time with
the noop sink, capture ``explain("formatted")`` for the plan audit in
``plans/r07/``, and compare before/after without paying for the whole
suite.

Usage::

    python bench_extra.py [--plans DIR] [--runs N] name [name ...]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
SPARK_GRAFT_CPUS (default 32) — same contract as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_HZ = os.sysconf("SC_CLK_TCK")


def _proc_stat():
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    busy = v[0] + v[1] + v[2] + v[5] + v[6]
    steal = v[7] if len(v) > 7 else 0
    return busy, steal, busy + v[3] + v[4] + steal


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans", default=None, help="dir to write <name>.txt explain output")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from dataflow_mm_lrt_spark import cache
    from dataflow_mm_lrt_spark.contract import EXTRA_QUERIES, QUERIES
    from dataflow_mm_lrt_spark.session import build_session

    q = {**QUERIES, **EXTRA_QUERIES}
    spark = build_session(
        app_name="bench_extra", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    out = {}
    for name in args.names:
        fn = q[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                ))
            cache.release_all()
        runs = []
        for _ in range(args.runs):
            df = fn(spark, sf_dir)
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            b0, s0, t0 = _proc_stat()
            w0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - w0
            b1, s1, t1 = _proc_stat()
            runs.append({
                "sec": round(wall, 3),
                "steal_pct": round(100.0 * (s1 - s0) / max(t1 - t0, 1), 2),
                "cpu_core_sec": round((b1 - b0) / _HZ, 2),
            })
            spark.sparkContext.setJobDescription(None)
        # release AFTER a query's runs, exactly like bench.py — scoped
        # persists are per-query caches the driver's min-of-N reuses
        cache.release_all()
        out[name] = runs
        print(json.dumps({name: runs}), flush=True)
    print(json.dumps({"summary": {k: min(r["sec"] for r in v) for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
