"""Stateful ordered conversation assembly (the engine's core stage).

``ordered_assembly`` implements the north-star "sorted-run" state:
``conv_id → sorted run of (turn_idx, ts)`` with watermark-driven
eviction (BASELINE.json north_star), via ``applyInPandasWithState``:

* every micro-batch appends the conversation's new turns to a buffered
  run (rows already older than the watermark are dropped; that drop is
  deterministic given the same input stream + watermark progression);
* a turn is *ready* once ``watermark ≥ ts + order_slack`` — the slack is
  the bounded intra-conversation disorder between event time and
  turn_idx (fixture bound: 90 s; default 120 s). Ready turns are emitted
  sorted by (turn_idx, ts) with a per-conversation ``emit_seq``;
* in-conversation keep-first dedup happens at emission: a turn whose
  normalized-text fingerprint (``fp``, computed upstream in Catalyst by
  ``fingerprint_sql`` — no hashing in Python) was already emitted in
  this conversation is skipped. This is the deterministic, order-stable
  generalization of the reference's sequential corpus dedup
  (image_diversity_filter.py:20-34): first occurrence in stable
  (turn_idx, ts) order wins;
* state is evicted ``state_ttl`` past the conversation's last event time
  (bounded state; the streaming analogue of the reference's
  max_corpus=10000 bound, image_diversity_filter.py:15).

The group function is Arrow-batched and fully pandas-vectorized — the
only Python executed per *row* is pickle of the bounded buffer.
Emission is deterministic for a fixed input stream + watermark sequence
— the contract pytest replays (FIXTURES.md §4).

Spark 4's successor API ``transformWithStateInPandas`` (ValueState/
ListState without whole-buffer pickling, timers, initial state) was
probed in this environment on 2026-08-18 and is BLOCKED: its state
protocol imports ``google.protobuf``, which is not installed in this
container (the TWS driver worker crashes with
``ImportError: cannot import name 'descriptor' from 'google.protobuf'``
inside pyspark's StateMessage_pb2 before any user code runs; no pip
installs allowed here). Re-probe when protobuf appears — the sorted-run
state maps 1:1 onto a ListState of (turn_idx, ts, fp) plus a ValueState
watermark cursor, which would drop the per-batch pickle round-trip.
"""

from __future__ import annotations

import pickle
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions.normalize import fingerprint_sql

ASSEMBLED_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
        StructField("emit_seq", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("buf", BinaryType()),
        StructField("seen", BinaryType()),
        StructField("emit_seq", LongType()),
        StructField("last_ts_ms", LongType()),
    ]
)

_BUF_COLS = ["turn_idx", "ts_us", "role", "text", "tool", "fp"]

DEFAULT_ORDER_SLACK_MS = 120_000
DEFAULT_STATE_TTL_MS = 6 * 3600 * 1000

#: cap on the per-conversation emitted-fingerprint set — the analogue of
#: the reference's bounded dedup corpus (image_diversity_filter.py:15,
#: max_corpus=10000). Without it ``seen`` grows with conversation length
#: until TTL eviction: bounded in practice, unbounded in principle.
#: Eviction is deterministic oldest-first in EMISSION order, so a
#: fingerprint can only be re-emitted after 10k *newer* distinct turns —
#: the same forgetting semantics as the reference's corpus window.
MAX_SEEN_FPS = 10_000


def _empty_buf(with_simhash: bool = False) -> pd.DataFrame:
    cols = {
        "turn_idx": pd.Series(dtype="int64"),
        "ts_us": pd.Series(dtype="int64"),
        "role": pd.Series(dtype=object),
        "text": pd.Series(dtype=object),
        "tool": pd.Series(dtype=object),
        "fp": pd.Series(dtype=object),
    }
    if with_simhash:
        cols["simhash"] = pd.Series(dtype="int64")
    return pd.DataFrame(cols)


def make_assembly_func(
    order_slack_ms: int,
    state_ttl_ms: int,
    max_seen_fps: int = MAX_SEEN_FPS,
    neardup_threshold: int | None = None,
    neardup_max_corpus: int = MAX_SEEN_FPS,
):
    nd = neardup_threshold is not None

    def assemble(
        key, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        ring = np.empty(0, dtype=np.int64)
        if state.exists:
            if nd:
                buf_b, seen_b, emit_seq, last_ts_ms, ring_b = state.get
                ring = pickle.loads(ring_b)
            else:
                buf_b, seen_b, emit_seq, last_ts_ms = state.get
            buf: pd.DataFrame = pickle.loads(buf_b)
            loaded = pickle.loads(seen_b)
            # insertion-ordered dict = emission order (oldest first);
            # tolerate a set pickled by the pre-cap state layout
            seen: dict[str, None] = (
                loaded if isinstance(loaded, dict)
                else dict.fromkeys(sorted(loaded))
            )
        else:
            buf, seen, emit_seq, last_ts_ms = _empty_buf(nd), {}, 0, 0

        wm = state.getCurrentWatermarkMs()

        chunks = [buf]
        for pdf in pdf_iter:
            if state.hasTimedOut or len(pdf) == 0:
                continue
            ts_us = pd.Series(
                pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
                // 1_000,
                index=pdf.index,
            )
            cols = {
                "turn_idx": pdf["turn_idx"].astype("int64"),
                "ts_us": ts_us,
                "role": pdf["role"],
                "text": pdf["text"],
                "tool": pdf["tool"],
                "fp": pdf["fp"],
            }
            if nd:
                cols["simhash"] = pdf["simhash"].astype("int64")
            fresh = pd.DataFrame(cols)
            fresh = fresh[fresh["ts_us"] // 1000 >= wm]  # deterministic late drop
            if len(fresh):
                chunks.append(fresh)
                last_ts_ms = max(last_ts_ms, int(fresh["ts_us"].max() // 1000))
        buf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else buf

        ready_mask = (buf["ts_us"] // 1000 + order_slack_ms) <= wm
        out = None
        if bool(ready_mask.any()):
            ready = (
                buf[ready_mask]
                .sort_values(["turn_idx", "ts_us"], kind="mergesort")
                .reset_index(drop=True)
            )
            buf = buf[~ready_mask].reset_index(drop=True)
            # keep-first dedup: drop already-seen fps and intra-flush repeats
            keep = (~ready["fp"].isin(seen.keys())) & (~ready["fp"].duplicated())
            emitted = ready[keep.to_numpy()]
            if nd and len(emitted):
                # trailing-corpus near-dup gate (reference sequential
                # semantics, image_diversity_filter.py:15-34): suppressed
                # rows never enter the ring OR the seen set
                from .neardup import trailing_mark

                keep2, _, ring = trailing_mark(
                    emitted["simhash"].to_numpy(dtype=np.int64),
                    ring,
                    neardup_threshold,
                    neardup_max_corpus,
                )
                emitted = emitted[keep2]
            seen.update(dict.fromkeys(emitted["fp"].tolist()))
            # bounded state: deterministic oldest-first (emission-order)
            # eviction at the reference's max_corpus=10000 analogue
            while len(seen) > max_seen_fps:
                del seen[next(iter(seen))]
            if len(emitted):
                out = pd.DataFrame(
                    {
                        "conv_id": np.repeat(conv_id, len(emitted)),
                        "turn_idx": emitted["turn_idx"].astype("int32"),
                        "role": emitted["role"],
                        "text": emitted["text"],
                        "tool": emitted["tool"],
                        "ts": pd.to_datetime(emitted["ts_us"], unit="us"),
                        "emit_seq": np.arange(
                            emit_seq, emit_seq + len(emitted), dtype="int64"
                        ),
                    }
                )
                emit_seq += len(emitted)

        if len(buf) == 0 and state.hasTimedOut and wm >= last_ts_ms + state_ttl_ms:
            state.remove()
        else:
            fields = [pickle.dumps(buf), pickle.dumps(seen), emit_seq, last_ts_ms]
            if nd:
                fields.append(pickle.dumps(ring))
            state.update(tuple(fields))
            if len(buf):
                nxt = int(buf["ts_us"].min() // 1000) + order_slack_ms
            else:
                nxt = last_ts_ms + state_ttl_ms
            state.setTimeoutTimestamp(max(nxt, wm + 1))

        if out is not None:
            yield out

    return assemble


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds the Catalyst-computed dedup fingerprint column ``fp``."""
    return df.withColumn("fp", F.expr(fingerprint_sql("spark", text_col)))


def ordered_assembly(
    turns: DataFrame,
    watermark_delay: str = "10 minutes",
    order_slack_ms: int = DEFAULT_ORDER_SLACK_MS,
    state_ttl_ms: int = DEFAULT_STATE_TTL_MS,
    neardup_threshold: int | None = None,
    neardup_max_corpus: int = MAX_SEEN_FPS,
) -> DataFrame:
    """Streaming stage: watermarked turns → ordered, deduped turns.

    Input columns: conv_id, turn_idx, role, text, tool, ts; an ``fp``
    column is added here if missing. Output: ASSEMBLED_SCHEMA with
    ``emit_seq`` (per-conversation emission order).

    ``neardup_threshold`` (optional) folds the trailing-corpus SimHash
    near-dup gate (streaming/neardup.py semantics) into THIS operator's
    state — Spark allows only one applyInPandasWithState per streaming
    query, so mid-pipeline near-dup composes here rather than as a
    second stateful stage. Emission-time order: exact fp keep-first,
    then the Hamming ring gate; suppressed rows enter neither corpus.
    """
    if "fp" not in turns.columns:
        turns = with_fingerprint(turns)
    if neardup_threshold is not None and "simhash" not in turns.columns:
        from ..operators.dedup import with_simhash

        turns = with_simhash(turns)
    func = make_assembly_func(
        order_slack_ms,
        state_ttl_ms,
        neardup_threshold=neardup_threshold,
        neardup_max_corpus=neardup_max_corpus,
    )
    state_schema = (
        STATE_SCHEMA
        if neardup_threshold is None
        else StructType(STATE_SCHEMA.fields + [StructField("ring", BinaryType())])
    )
    return (
        turns.withWatermark("ts", watermark_delay)
        .groupBy("conv_id")
        .applyInPandasWithState(
            func,
            outputStructType=ASSEMBLED_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def exact_stream_dedup(
    df: DataFrame,
    watermark_delay: str = "10 minutes",
    text_col: str = "text",
) -> DataFrame:
    """Built-in global streaming dedup (first *arrival* wins) — Spark's
    ``dropDuplicatesWithinWatermark`` so fingerprint state is EVICTED
    once the watermark passes (round-1 used ``dropDuplicates`` without
    the event-time column in the key, which never evicts and grows state
    unboundedly on a long-running stream). A fingerprint re-arriving
    after its state expired is emitted again — the documented horizon
    semantics of watermark dedup; corpus-global exactness beyond the
    horizon belongs to the batch ``dedup.exact_keep_first`` compaction.
    The keyed, order-deterministic dedup lives in ``ordered_assembly``."""
    return (
        df.withColumn("_fp", F.expr(fingerprint_sql("spark", text_col)))
        .withWatermark("ts", watermark_delay)
        .dropDuplicatesWithinWatermark(["_fp"])
        .drop("_fp")
    )
