"""Manifest compaction (VERDICT r3 item 7): a long-running stream
accumulates one commit manifest per epoch; ``compact_manifests`` rolls
them into a single snapshot file (the Iceberg manifest-list analogue)
without changing what readers see or breaking replay idempotence.
"""

from __future__ import annotations

import json

import pandas as pd
import pytest

from dataflow_mm_lrt_spark.streaming.sink import ManifestSink


def test_thousand_epochs_compact_to_few_files(spark, tmp_path):
    sink = ManifestSink(str(tmp_path / "t"))
    sink._jvm_fs()  # create dirs
    # commit the manifest layer directly (no data writes: this tests the
    # manifest protocol, not the parquet writer)
    for e in range(1000):
        sink._write_atomic(
            sink._manifest_path(e),
            json.dumps({"epoch": e, "n_rows": e * 10, "partitions": []}),
        )
    assert len(sink._list(sink.manifest_dir)) == 1000
    n_files = sink.compact_manifests()
    assert n_files <= 10
    assert sink.committed_epochs() == list(range(1000))
    assert all(sink.is_committed(e) for e in (0, 1, 500, 999))
    assert not sink.is_committed(1000)
    ms = sink.manifests()
    assert len(ms) == 1000 and ms[7]["n_rows"] == 70
    # a fresh reader (cold cache) sees the same state
    fresh = ManifestSink(str(tmp_path / "t"))
    assert fresh.committed_epochs() == list(range(1000))
    assert fresh.manifests()[999]["n_rows"] == 9990
    # re-compacting is idempotent and keeps one snapshot
    assert fresh.compact_manifests() <= 10


def test_incremental_compaction_and_replay_noop(spark, tmp_path):
    sink = ManifestSink(str(tmp_path / "t"), compact_every=4)
    rows_per_epoch = 3
    for e in range(11):
        pdf = pd.DataFrame(
            {
                "conv_id": [f"c{e}"] * rows_per_epoch,
                "v": list(range(rows_per_epoch)),
                "ts": pd.to_datetime(
                    [f"2026-01-{e + 1:02d}"] * rows_per_epoch
                ),
            }
        )
        sink.write_batch(spark.createDataFrame(pdf), e)
    # auto-compaction kept the manifest dir small while committing 11
    assert len(sink._list(sink.manifest_dir)) <= 4
    assert sink.committed_epochs() == list(range(11))
    got = sink.read_committed(spark)
    assert got.count() == 11 * rows_per_epoch
    # replay of a COMPACTED epoch must stay a no-op (exactly-once)
    before = got.count()
    poison = pd.DataFrame(
        {
            "conv_id": ["poison"],
            "v": [0],
            "ts": pd.to_datetime(["2026-02-01"]),
        }
    )
    sink.write_batch(spark.createDataFrame(poison), 0)
    assert sink.read_committed(spark).count() == before
    assert "poison" not in [
        r["conv_id"] for r in sink.read_committed(spark).select("conv_id").distinct().collect()
    ]


def test_crash_between_snapshot_and_delete_is_harmless(spark, tmp_path):
    sink = ManifestSink(str(tmp_path / "t"))
    sink._jvm_fs()
    for e in range(6):
        sink._write_atomic(
            sink._manifest_path(e), json.dumps({"epoch": e, "partitions": []})
        )
    sink.compact_manifests()
    # simulate the crash window: a loose manifest reappears for an epoch
    # the snapshot already covers (duplicate coverage)
    sink._write_atomic(
        sink._manifest_path(3), json.dumps({"epoch": 3, "partitions": []})
    )
    assert sink.committed_epochs() == list(range(6))  # deduped
    assert len(sink.manifests()) == 6
    assert sink.compact_manifests() <= 10  # next compaction heals it
    assert sink.committed_epochs() == list(range(6))


def test_uncommitted_probe_is_one_rpc_steady_state(spark, tmp_path):
    """ADVICE r4: the per-micro-batch is_committed probe must cost one
    exists() RPC in steady state, not a manifest-directory listing —
    LIST ~10× HEAD on object stores. The first probe may list once (to
    learn whether snapshots exist); after that, listings on the
    uncommitted path are zero."""
    sink = ManifestSink(str(tmp_path / "t"))
    sink._jvm_fs()
    calls = {"n": 0}
    orig = sink._list

    def counted(path):
        calls["n"] += 1
        return orig(path)

    sink._list = counted
    assert not sink.is_committed(0)  # may list once (snapshot discovery)
    first = calls["n"]
    assert first <= 1
    for e in range(1, 20):
        assert not sink.is_committed(e)
    assert calls["n"] == first  # steady state: exists() only

    # compaction flips the cached snapshot flag without re-listing on
    # the probe path; committed epochs resolve through the snap cache
    for e in range(5):
        sink._write_atomic(
            sink._manifest_path(e),
            json.dumps({"epoch": e, "n_rows": 1, "partitions": []}),
        )
    sink.compact_manifests()
    base = calls["n"]
    assert sink.is_committed(3)      # in snapshot (cached doc)
    assert not sink.is_committed(99)
    assert calls["n"] == base        # snap names + docs fully cached
