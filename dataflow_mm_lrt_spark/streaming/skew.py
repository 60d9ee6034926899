"""Skew handling for hot conversations: salted two-phase aggregation.

~1% of conversations carry 100× turn volume (FIXTURES.md §1). A plain
``groupBy(conv_id)`` windowed count lands each hot key's entire volume
in one state-store partition/task. Salting splits a key's rows across
``n_salts`` sub-keys (phase 1: partial counts per (key, salt, window) —
parallel, uniformly distributed), then merges the partials per
(key, window) (phase 2: tiny input, n_salts rows per key per window).

Spark ≥3.4 supports chaining the two windowed aggregations in one
streaming query (multiple stateful operators with aligned watermarks);
``salted_turn_counts`` emits final per-(conv_id, window) counts in
append mode. The same function works unchanged on a batch DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_turn_counts(
    turns: DataFrame,
    window_duration: str = "5 minutes",
    n_salts: int = 16,
    watermark_delay: str = "10 minutes",
    streaming: bool = True,
) -> DataFrame:
    """(conv_id, window_start, n_turns) with salt-spread phase-1 state."""
    src = turns
    if streaming:
        src = src.withWatermark("ts", watermark_delay)
    salt = F.pmod(F.hash("turn_idx"), F.lit(n_salts)).alias("salt")
    phase1 = (
        src.select("conv_id", "ts", salt)
        .groupBy(F.window("ts", window_duration).alias("w"), "conv_id", "salt")
        .agg(F.count("*").alias("partial_n"))
    )
    # phase 2: merge partials; group on the phase-1 window struct itself
    # (Spark recognizes `window(w, d)` over an existing window column as
    # the chained-aggregation pattern)
    phase2 = (
        phase1.groupBy(F.window("w", window_duration).alias("w2"), "conv_id")
        .agg(F.sum("partial_n").alias("n_turns"))
        .select(
            "conv_id",
            F.col("w2.start").cast("timestamp").cast("long").alias("window_start"),
            "n_turns",
        )
    )
    return phase2
