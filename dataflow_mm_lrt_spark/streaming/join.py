"""Stream-stream join: turns ⋈ tool-call events (north_star S7).

The reference's closest analogue is the positional splice of modality
paths into turns (conversation_to_message.py:83-92); the engine
generalizes it to a watermarked left-outer equi-join on
(conv_id, turn_idx) with an event-time bound — required by Spark so both
join states are watermark-evictable (outer results emit once the bound
expires).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def turns_with_tool_events(
    turns: DataFrame,
    tool_events: DataFrame,
    turn_watermark: str = "10 minutes",
    event_watermark: str = "10 minutes",
    bound_seconds: int = 300,
    how: str = "leftOuter",
) -> DataFrame:
    """turns ⋈ tool_events on (conv_id, turn_idx), |ev.ts − turn.ts| ≤ bound.

    Works in both batch and streaming mode (same plan API). Output: all
    turn columns + tool_payload (null when no event matched within the
    bound) + event_ts.
    """
    t = turns.withWatermark("ts", turn_watermark).alias("t")
    e = (
        tool_events.select(
            F.col("conv_id").alias("e_conv_id"),
            F.col("turn_idx").alias("e_turn_idx"),
            F.col("tool").alias("e_tool"),
            F.col("payload").alias("tool_payload"),
            F.col("ts").alias("event_ts"),
        )
        .withWatermark("event_ts", event_watermark)
        .alias("e")
    )
    cond = (
        (F.col("t.conv_id") == F.col("e.e_conv_id"))
        & (F.col("t.turn_idx") == F.col("e.e_turn_idx"))
        & (
            F.col("e.event_ts")
            >= F.col("t.ts") - F.expr(f"INTERVAL {bound_seconds} SECONDS")
        )
        & (
            F.col("e.event_ts")
            <= F.col("t.ts") + F.expr(f"INTERVAL {bound_seconds} SECONDS")
        )
    )
    return t.join(e, cond, how).drop("e_conv_id", "e_turn_idx", "e_tool")


def asof_tool_context(
    turns: DataFrame,
    tool_events: DataFrame,
    tolerance_seconds: int = 600,
    turn_watermark: str = "10 minutes",
    event_watermark: str = "10 minutes",
) -> DataFrame:
    """Stream-stream AS-OF: each turn + the latest tool event at or
    before it for the same conversation, within ``tolerance_seconds``
    (null columns when none) — the streaming twin of
    ``operators/joins.asof_join`` (round-2 lead #9).

    Streaming can't run the batch union-scan (an unbounded keyed window
    is not watermark-evictable), so the same semantics compose from two
    watermark-evictable stateful operators Spark does support chaining
    (3.5+): a range-bounded left-outer join picks up every candidate
    event in ``(turn.ts - tolerance, turn.ts]``, and a per-turn
    event-time aggregation keeps the greatest ``(event_ts, value…)``
    struct — the identical deterministic tie rule as the batch
    operator's struct carry, so stream ≡ batch row-for-row (tested in
    tests/test_streaming_join_skew.py). State in both stages evicts at
    the watermark; the join bound keeps candidate state per key at
    O(events in tolerance window).

    Works identically on static frames (batch mode) for the parity
    oracle. Output: turn columns + (tool, payload, ts) of the matched
    event with a ``_right`` suffix.

    Precondition (ADVICE r3 item 4): ``turns`` must be unique on
    ``(conv_id, turn_idx, role, text, ts)`` — the final groupBy keys.
    Two byte-identical turn rows would collapse to one output row,
    whereas the batch ``asof_join`` emits one row per left row. A
    streaming-safe uniquifier does not exist: pre-aggregating duplicate
    counts would chain an aggregation before a stream-stream join
    (unsupported), and ``monotonically_increasing_id`` is not stable
    across replay. The engine pipeline guarantees the precondition via
    its upstream exact-dedup stage (streaming/stateful.py keyed dedup);
    callers joining raw streams should dedup first."""
    t = turns.withWatermark("ts", turn_watermark).alias("t")
    e = (
        tool_events.select(
            F.col("conv_id").alias("e_conv_id"),
            F.col("tool").alias("e_tool"),
            F.col("payload").alias("e_payload"),
            F.col("ts").alias("event_ts"),
        )
        .withWatermark("event_ts", event_watermark)
        .alias("e")
    )
    cond = (
        (F.col("t.conv_id") == F.col("e.e_conv_id"))
        & (F.col("e.event_ts") <= F.col("t.ts"))
        & (
            F.col("e.event_ts")
            >= F.col("t.ts") - F.expr(f"INTERVAL {tolerance_seconds} SECONDS")
        )
    )
    joined = t.join(e, cond, "leftOuter")
    latest = F.max(
        F.struct(
            F.col("event_ts").alias("_ts"),
            F.col("e_tool").alias("tool"),
            F.col("e_payload").alias("payload"),
        )
    ).alias("_m")
    agg = joined.groupBy("conv_id", "turn_idx", "role", "text", "ts").agg(latest)
    return agg.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "ts",
        F.col("_m.tool").alias("tool_right"),
        F.col("_m.payload").alias("payload_right"),
        F.col("_m._ts").alias("ts_right"),
    )
