"""Bench the skew-salting path (VERDICT r6 ask #3): streaming windowed
turn counts over a hot-key input, salted two-phase (streaming/skew.py)
vs the plain single-phase groupBy.

Input: the sf-scaled transcript dataset with 20% of turns remapped onto
ONE conv_id (deterministic hash bucket) — the named skew story of the
north star (SURVEY §4.1). Both queries drain the same availableNow
stream into a noop sink; results are verified identical on the batch
path first. Reports wall seconds, steal-immune cpu-core-sec and
turns/sec for each leg, n_runs each.

Usage::  python tools/bench_skew.py [sf_dir_cache] [n_runs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_HZ = os.sysconf("SC_CLK_TCK")


def _cpu() -> tuple[float, float]:
    with open("/proc/stat") as f:
        v = [int(x) for x in f.readline().split()[1:]]
    busy = (v[0] + v[1] + v[2] + v[5] + v[6]) / _HZ
    steal = (v[7] if len(v) > 7 else 0) / _HZ
    return busy, steal


def main() -> None:
    from pyspark.sql import functions as F

    from dataflow_mm_lrt_spark.session import build_session
    from dataflow_mm_lrt_spark.streaming.skew import salted_turn_counts
    from dataflow_mm_lrt_spark.streaming.source import transcript_stream

    src_dir = sys.argv[1] if len(sys.argv) > 1 else (
        "/tmp/spark_graft_transcripts_sf1.0/transcripts"
    )
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = build_session(app_name="bench_skew")
    spark.sparkContext.setLogLevel("ERROR")

    # hot-key variant: one conv_id owns ~20% of all turns
    hot_dir = "/tmp/spark_graft_skew_input"
    marker = os.path.join(hot_dir, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(hot_dir, ignore_errors=True)
        (
            spark.read.parquet(src_dir)
            .withColumn(
                "conv_id",
                F.when(
                    F.pmod(F.hash("conv_id"), F.lit(5)) == 0, F.lit("HOT-CONV")
                ).otherwise(F.col("conv_id")),
            )
            .repartition(16)
            .write.mode("overwrite").parquet(hot_dir)
        )
        open(marker, "w").write("ok")
    n_turns = spark.read.parquet(hot_dir).count()
    hot_share = (
        spark.read.parquet(hot_dir)
        .filter(F.col("conv_id") == "HOT-CONV").count() / n_turns
    )

    def plain_counts(turns, streaming=True):
        s = turns.withWatermark("ts", "10 minutes") if streaming else turns
        return (
            s.groupBy(F.window("ts", "5 minutes").alias("w"), "conv_id")
            .agg(F.count("*").alias("n_turns"))
            .select(
                "conv_id",
                F.col("w.start").cast("timestamp").cast("long").alias(
                    "window_start"
                ),
                "n_turns",
            )
        )

    # semantics check on the batch path: salted == plain
    batch = spark.read.parquet(hot_dir)
    a = {tuple(r) for r in salted_turn_counts(batch, streaming=False).collect()}
    b = {tuple(r) for r in plain_counts(batch, streaming=False).collect()}
    assert a == b, f"salted != plain ({len(a)} vs {len(b)} rows)"

    def drain(tag: str, make_query) -> list[dict]:
        runs = []
        for i in range(n_runs):
            ckpt = f"/tmp/skew_ckpt_{tag}_{i}"
            shutil.rmtree(ckpt, ignore_errors=True)
            stream = transcript_stream(spark, hot_dir, max_files_per_trigger=None)
            out = make_query(stream)
            b0, s0 = _cpu()
            t0 = time.time()
            q = (
                out.writeStream.outputMode("append").format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True).start()
            )
            q.awaitTermination()
            wall = time.time() - t0
            b1, s1 = _cpu()
            runs.append({
                "sec": round(wall, 1),
                "turns_per_sec": round(n_turns / wall, 1),
                "cpu_core_sec": round(b1 - b0, 1),
                "steal_core_sec": round(s1 - s0, 1),
            })
            shutil.rmtree(ckpt, ignore_errors=True)
        return runs

    # ---- collect-shaped aggregation (the shape skew actually hurts) --
    # count/sum have map-side partial aggregation, so a hot key never
    # concentrates raw rows in one task; collect_list partials still
    # funnel the hot conversation's full array merge into ONE reduce
    # task. Two-level (key, salt) aggregation is §2.5's prescription.
    trail_digest = (
        "md5(array_join(transform(array_sort(_arr), "
        "s -> cast(s.turn_idx as string)), ','))"
    )

    def plain_collect(b):
        return (
            b.groupBy("conv_id")
            .agg(F.expr("collect_list(struct(ts, turn_idx))").alias("_arr"))
            .select("conv_id", F.expr(trail_digest).alias("digest"))
        )

    def salted_collect(b, n_salts=16):
        p1 = (
            b.withColumn("_salt", F.pmod(F.hash("turn_idx"), F.lit(n_salts)))
            .groupBy("conv_id", "_salt")
            .agg(F.expr("collect_list(struct(ts, turn_idx))").alias("_part"))
        )
        return (
            p1.groupBy("conv_id")
            .agg(F.expr("flatten(collect_list(_part))").alias("_arr"))
            .select("conv_id", F.expr(trail_digest).alias("digest"))
        )

    assert (
        {tuple(r) for r in plain_collect(batch).collect()}
        == {tuple(r) for r in salted_collect(batch).collect()}
    ), "salted collect != plain collect"

    def batch_time(tag, make):
        runs = []
        for _ in range(n_runs):
            b0, s0 = _cpu()
            t0 = time.time()
            make(spark.read.parquet(hot_dir)).write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.time() - t0
            b1, s1 = _cpu()
            runs.append({
                "sec": round(wall, 1),
                "turns_per_sec": round(n_turns / wall, 1),
                "cpu_core_sec": round(b1 - b0, 1),
                "steal_core_sec": round(s1 - s0, 1),
            })
        return runs

    result = {
        "input": {"turns": n_turns, "hot_conv_share": round(hot_share, 4)},
        "windowed_counts": {
            "salted_n16": drain("salted", salted_turn_counts),
            "plain": drain("plain", plain_counts),
        },
        "trail_collect": {
            "salted_n16": batch_time("csalt", salted_collect),
            "plain": batch_time("cplain", plain_collect),
        },
        "note": (
            "hot-key input at local[$SPARK_GRAFT_CPUS], outputs verified "
            "identical for both shapes. windowed_counts: availableNow "
            "streaming drain — count aggregation has map-side partials, "
            "so the hot key never concentrates and the salted two-phase "
            "is pure extra-stage overhead (measured SLOWER: salting does "
            "not apply to partially-aggregable shapes). trail_collect: "
            "collect_list per conversation — the hot conversation's full "
            "array merge lands in one reduce task unsalted; (key, salt) "
            "two-level aggregation spreads it (guide §2.5)"
        ),
    }
    print(json.dumps(result, indent=2))
    with open("BENCH_skew_r07.json", "w") as f:
        json.dump(result, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
