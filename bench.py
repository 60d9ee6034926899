#!/usr/bin/env python
"""Engine benchmark: headline batch operators + streaming pipeline throughput.

Runs at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>,
     "streaming": {"turns": N, "sec": s, "turns_per_sec": r}}

The streaming section drains a deterministically generated transcript
dataset (seed 42, sized to the sf) through the full S1→S6→sink pipeline
and reports sustained turns/sec — the BASELINE.json headline metric.

STEAL-AWARE (round 6): this host suffers violent hypervisor CPU steal
(the same query measured 4.8 s and 52 s minutes apart on unchanged code
in round 5 while /proc/stat steal swung 10%→18%), so wall-clock alone is
not a valid cross-round comparator. Every timed window now records
/proc/stat deltas:

* ``steal_pct`` — share of the window's jiffies the hypervisor withheld;
* ``cpu_core_sec`` — user+nice+system+irq jiffies actually burned by the
  VM (core-seconds). This is the steal-immune comparator: steal pauses
  the clock but cannot inflate work done. It deliberately uses /proc/stat
  rather than Spark's executorCpuTime because half this engine's hot
  path runs in Arrow/pandas PYTHON workers, which executorCpuTime does
  not count (JVM task threads only).

The streaming drain runs median-of-3 and reports ``turns_per_cpu_core_sec``
(steal-immune) alongside wall-based turns/sec; a ``flags`` list self-marks
the artifact when steal contaminated a window (per-query steal > 5% or
drain spread > 1.5×) so no future round needs hand adjudication.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_HZ = os.sysconf("SC_CLK_TCK")


def _proc_stat() -> tuple[int, int, int]:
    """(busy, steal, total) jiffies from the aggregate cpu line.
    busy = user+nice+system+irq+softirq — work this VM actually did;
    steal — time the hypervisor withheld a runnable vCPU."""
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    busy = v[0] + v[1] + v[2] + v[5] + v[6]
    steal = v[7] if len(v) > 7 else 0
    return busy, steal, busy + v[3] + v[4] + steal


class _Window:
    """One timed window: wall seconds + steal share + CPU core-seconds."""

    def __init__(self) -> None:
        self.b0, self.s0, self.t0 = _proc_stat()
        self.w0 = time.time()

    def stop(self) -> dict:
        b1, s1, t1 = _proc_stat()
        dt = max(t1 - self.t0, 1)
        return {
            "sec": round(time.time() - self.w0, 3),
            "steal_pct": round(100.0 * (s1 - self.s0) / dt, 2),
            "cpu_core_sec": round((b1 - self.b0) / _HZ, 2),
        }

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "rule_filter",
    "text_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "tumbling_window",
    "sliding_window",
    "session_window",
    "cep_funnel",
    "assemble_trail",
    "pricing_summary",
    "top_revenue_orders",
    "knn_brute_cosine",
    # round-2 additions
    "messages_assembly",
    "keep_top_fraction",
    "normalize_en",
    "ann_auto_cells",
    "dedup_tfidf_cosine",
    "asof_join",
    "interval_join",
    "modality_splice",
    "hypertable_rollup",
    "kmv_distinct",
    # round-3 additions
    "ann_lsh_multiprobe",
    "answer_eval",
    "normalize_en_full",
    # round-4 additions
    "normalize_zh",
    "wiki_qa_refiner",
    # round-5 additions
    "dedup_phash",
    "media_metrics",
    # round-6 additions: the reference's flagship AND-composition filter
    # (tfidf ∧ pHash over mixed-codec bytes), and the container metadata
    # probe now rotating across GIF / MJPEG-AVI / MJPEG-MP4 synth bytes
    "image_diversity",
    "video_info",
]


def ann_recall(spark, sf_dir: str, k: int = 3, nprobe: int = 3) -> dict:
    """recall@k of the IVF paths vs the exact brute-force result on the
    embeddings table (the accuracy side of the ANN speed/recall knob)."""
    from pyspark.sql import functions as F

    from dataflow_mm_lrt_spark.operators import similarity

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    emb.cache().count()
    q = emb.filter(F.col("vec_id") % 50 == 0)
    brute = {
        (r[0], r[1])
        for r in similarity.knn_brute_cosine(emb, q, k=k)
        .select("query_id", "neighbor_id").collect()
    }
    out = {}
    cents = similarity.kmeans_fit(emb, k=10, n_iters=2)
    for name, df in {
        f"kmeans_nprobe{nprobe}": similarity.ann_ivf_multiprobe(
            emb, q, cents, k=k, nprobe=nprobe
        ),
        "lsh_single_probe": similarity.ann_ivf_cosine(
            similarity.lsh_cells(emb),
            similarity.lsh_cells(q),
            k=k,
            cell_col="cell",
        ),
        "lsh_nprobe4": similarity.ann_lsh_multiprobe(emb, q, k=k, nprobe=4),
    }.items():
        got = {
            (r[0], r[1])
            for r in df.select("query_id", "neighbor_id").collect()
        }
        out[name] = round(len(got & brute) / len(brute), 3)
    emb.unpersist()
    return out


def sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def transcript_dataset_for(sf: float, n_files: int = 8,
                           arrival: str = "shuffled") -> str:
    """Deterministic transcript dataset cached per (sf, arrival) (seed 42)."""
    from dataflow_mm_lrt_spark import datagen

    suffix = "" if arrival == "shuffled" else f"_{arrival}"
    cache = f"/tmp/spark_graft_transcripts_sf{sf}{suffix}"
    marker = os.path.join(cache, "_COMPLETE")
    if not os.path.exists(marker):
        shutil.rmtree(cache, ignore_errors=True)
        os.makedirs(cache, exist_ok=True)
        datagen.write_dataset(cache, sf=sf, n_files=n_files, arrival=arrival)
        import numpy as np

        # punctuation row drains the stateful stage at the end of the run
        datagen.append_punctuation_file(
            os.path.join(cache, "transcripts"),
            np.datetime64("2026-01-01T00:00:00"),
        )
        open(marker, "w").write("ok")
    return cache


def main() -> None:
    from dataflow_mm_lrt_spark.contract import EXTRA_QUERIES
    from dataflow_mm_lrt_spark.contract import QUERIES as _DRIVER_QUERIES

    # HEADLINE continuity across rounds: names demoted from the driver's
    # 50-row contract into EXTRA_QUERIES keep benching here
    QUERIES = {**_DRIVER_QUERIES, **EXTRA_QUERIES}
    from dataflow_mm_lrt_spark.session import build_session
    from dataflow_mm_lrt_spark.streaming.run import PipelineConfig, run_pipeline

    sf = sf_from_dir(SF_DIR)
    spark = build_session(
        app_name="bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from dataflow_mm_lrt_spark import cache

    per_query: dict[str, float] = {}
    query_metrics: dict[str, dict] = {}
    flags: list[str] = []
    for name in HEADLINE:
        fn = QUERIES[name]
        runs = []
        # min-of-2, plus an adaptive 3rd run while timings are still
        # descending: round-6 dedicated-JVM evidence (BENCH/BASELINE.md)
        # showed run 2 of a heavy query can still carry un-amortized JIT
        # (ngram: 8.2 s → 2.2 s → 1.9 s) — a plateau check catches that
        # without tripling the suite for the fast queries.
        for attempt in range(3):
            df = fn(spark, SF_DIR)
            w = _Window()
            df.write.format("noop").mode("overwrite").save()
            runs.append(w.stop())
            if attempt >= 1 and (
                runs[-1]["sec"] < 1.0
                or runs[-1]["sec"] >= runs[-2]["sec"] * 0.8
            ):
                break  # converged (≤20 % improvement) or already fast
        best = min(runs, key=lambda r: r["sec"])
        per_query[name] = best["sec"]
        query_metrics[name] = {
            "runs_sec": [r["sec"] for r in runs],
            "steal_pct": [r["steal_pct"] for r in runs],
            "cpu_core_sec": [r["cpu_core_sec"] for r in runs],
        }
        if best["steal_pct"] > 5.0:
            flags.append(
                f"{name}: best run under {best['steal_pct']}% steal — "
                "wall-clock suspect, compare cpu_core_sec"
            )
        cache.release_all()  # plan-reuse caches are per-query scoped

    # streaming throughput (headline metric): full-drain of the shuffled
    # (adversarial arrival order) bounded stream — the same configuration
    # the correctness contract tests, measured end-to-end incl. the
    # exactly-once sink
    ds = transcript_dataset_for(sf, n_files=16, arrival="shuffled")
    in_dir = os.path.join(ds, "transcripts")
    n_turns = spark.read.parquet(in_dir).count()
    cfg = PipelineConfig(
        watermark_delay="72 hours", max_files_per_trigger=None
    )
    # warm-up drain over a 2-file subset (JIT for the streaming plan)
    import glob

    warm_in = f"/tmp/spark_graft_bench_warm_{os.getpid()}"
    os.makedirs(warm_in, exist_ok=True)
    for f in sorted(glob.glob(os.path.join(in_dir, "part-0000*.parquet")))[:2]:
        shutil.copy2(f, warm_in)
    warm_out = warm_in + "_out"
    run_pipeline(spark, warm_in, warm_out, cfg)
    shutil.rmtree(warm_out, ignore_errors=True)
    shutil.rmtree(warm_in, ignore_errors=True)

    def drain(pipeline_cfg: PipelineConfig, tag: str, n_runs: int) -> dict:
        """Median-of-n drain of the full dataset. Each run is an
        independent availableNow drain (fresh checkpoint/sink); the
        median wall + the steal-immune cpu-core-sec comparator are
        reported with every raw run kept for audit."""
        from dataflow_mm_lrt_spark.streaming import metrics as smetrics

        runs, emitted, state = [], None, {}
        for i in range(n_runs):
            out_dir = f"/tmp/spark_graft_bench_out_{os.getpid()}_{tag}_{i}"
            shutil.rmtree(out_dir, ignore_errors=True)
            w = _Window()
            sink, _ = run_pipeline(spark, in_dir, out_dir, pipeline_cfg)
            r = w.stop()
            emitted = sum(m["n_rows"] for m in sink.manifests())
            r["turns_per_sec"] = round(n_turns / r["sec"], 1)
            runs.append(r)
            summ = smetrics.summarize(os.path.join(out_dir, "metrics"))
            state = {
                "state_rows_peak": summ.get("state_rows_peak", 0),
                "state_bytes_peak": summ.get("state_bytes_peak", 0),
                "batches": summ.get("batches", 0),
            }
            shutil.rmtree(out_dir, ignore_errors=True)
        med = statistics.median(r["sec"] for r in runs)
        med_cpu = statistics.median(r["cpu_core_sec"] for r in runs)
        spread = max(r["sec"] for r in runs) / max(min(r["sec"] for r in runs), 1e-9)
        if spread > 1.5:
            flags.append(
                f"drain[{tag}]: {spread:.2f}x wall spread across {n_runs} "
                "runs — steal-contaminated window, trust turns_per_cpu_core_sec"
            )
        return {
            "turns_in": n_turns,
            "turns_out": emitted,
            "sec": round(med, 3),
            "turns_per_sec": round(n_turns / med, 1),
            "cpu_core_sec": round(med_cpu, 2),
            "turns_per_cpu_core_sec": round(n_turns / med_cpu, 1),
            "runs": runs,
            **state,
        }

    streaming = drain(cfg, "exact", 3)
    # the near-dup gate (trailing-corpus SimHash folded into assembly
    # state) is stateful and previously unbenched — its cost at this sf
    # is a committed number, not a surprise (VERDICT r5 ask #5)
    nd_cfg = PipelineConfig(
        watermark_delay="72 hours",
        max_files_per_trigger=None,
        neardup_threshold=3,
    )
    streaming_neardup = drain(nd_cfg, "neardup", 3)

    total = round(sum(per_query.values()) + streaming["sec"], 3)
    print(
        json.dumps(
            {
                "metric": "headline operators + streaming drain wall time",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "query_metrics": query_metrics,
                "sf": sf,
                "streaming": streaming,
                "streaming_neardup": streaming_neardup,
                "ann_recall": ann_recall(spark, SF_DIR),
                "cpus": int(CPUS),
                "clk_tck": _HZ,
                "flags": flags,
                "methodology": (
                    "min-of-2 per query (+1 adaptive run while timings "
                    "descend >20%), median-of-3 drains; steal_pct = "
                    "/proc/stat steal share per window; cpu_core_sec = "
                    "user+nice+system+irq jiffies/HZ (steal-immune, counts "
                    "Python workers, unlike executorCpuTime); flags mark "
                    "steal-contaminated windows. /proc/stat is system-wide: "
                    "cpu_core_sec assumes bench is the only load (true for "
                    "driver runs; concurrent processes inflate it)"
                ),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
