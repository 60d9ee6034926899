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
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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
    for name in HEADLINE:
        fn = QUERIES[name]
        best = None
        for _ in range(2):  # min of two runs: exclude one-time JIT compile
            df = fn(spark, SF_DIR)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        per_query[name] = round(best, 3)
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

    out_dir = f"/tmp/spark_graft_bench_out_{os.getpid()}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.time()
    sink, _ = run_pipeline(spark, in_dir, out_dir, cfg)
    stream_sec = time.time() - t0
    emitted = sum(m["n_rows"] for m in sink.manifests())
    shutil.rmtree(out_dir, ignore_errors=True)

    total = round(sum(per_query.values()) + stream_sec, 3)
    print(
        json.dumps(
            {
                "metric": "headline operators + streaming drain wall time",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
                "streaming": {
                    "turns_in": n_turns,
                    "turns_out": emitted,
                    "sec": round(stream_sec, 3),
                    "turns_per_sec": round(n_turns / stream_sec, 1),
                },
                "ann_recall": ann_recall(spark, SF_DIR),
                "cpus": int(CPUS),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
