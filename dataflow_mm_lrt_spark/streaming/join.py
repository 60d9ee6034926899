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
