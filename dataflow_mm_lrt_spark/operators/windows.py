"""Event-time windowing (tumbling / sliding / session) + CEP patterns.

The reference's only temporal segmentation is media scene splitting
(video_scene_filter.py:515-606: min/max-duration content-gap
segmentation) — these stages are its event-time generalization and the
batch twins of the streaming stages in ``streaming/``.

Window starts are emitted as epoch seconds (bigint) so results are
timezone/type-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    duration: str = "1 hour",
    value_col: str = "value",
) -> DataFrame:
    """groupBy(window(ts, d), key) → count + sum. Partial aggregation is
    map-side; the shuffle key (window, key) is low-cardinality-safe."""
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("timestamp").cast("long").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    duration: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Sliding window counts — each event lands in duration/slide windows."""
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").cast("timestamp").cast("long").alias("window_start"),
            key_col,
            "n_events",
        )
    )


def session_windows(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """session_window(ts, gap) keyed by user/conversation: start epoch,
    event count, ordered event-type trail (the batch twin of the
    streaming session stage)."""
    return (
        df.withColumn(
            "_line",
            F.struct(
                F.col(ts_col).alias("ts"), F.col("event_id").alias("event_id"),
                F.col("event_type").alias("event_type"),
            ),
        )
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(
            F.count("*").alias("n_events"),
            F.expr(
                "array_join(transform(array_sort(collect_list(_line)), "
                "s -> s.event_type), '>')"
            ).alias("trail"),
        )
        .select(
            F.col(key_col),
            F.col("w.start").cast("timestamp").cast("long").alias("session_start"),
            "n_events",
            "trail",
        )
    )


def transcript_sessions(
    turns: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str | None = None,
) -> DataFrame:
    """session_window(ts, gap) keyed by conv_id over transcripts — the
    north-star session stage (works for batch and, with a watermark,
    streaming append mode). Output: conv_id, session_start (epoch s),
    n_turns, ordered turn_idx trail."""
    src = turns
    if watermark_delay is not None:
        src = src.withWatermark("ts", watermark_delay)
    return (
        src.withColumn(
            "_t", F.struct(F.col("turn_idx"), F.col("ts"))
        )
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("conv_id"))
        .agg(
            F.count("*").alias("n_turns"),
            F.expr(
                "array_join(transform(array_sort(collect_list(_t)), "
                "s -> cast(s.turn_idx as string)), '>')"
            ).alias("turn_trail"),
        )
        .select(
            "conv_id",
            F.col("w.start").cast("timestamp").cast("long").alias("session_start"),
            "n_turns",
            "turn_trail",
        )
    )


def cep_funnel(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    first_event: str = "view",
    second_event: str = "purchase",
    within_seconds: int = 1800,
) -> DataFrame:
    """CEP pattern: A followed by B within t, per key.

    Expressed as a lead() scan over the per-key event-time order —
    one shuffle on the key, no self-join. Emits one row per matched
    (A, B) pair with both epochs.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col("event_id"))
    sub = df.filter(F.col("event_type").isin(first_event, second_event))
    seq = sub.withColumns(
        {
            "next_type": F.lead("event_type").over(w),
            "next_ts": F.lead(ts_col).over(w),
        }
    )
    return (
        seq.filter(
            (F.col("event_type") == first_event)
            & (F.col("next_type") == second_event)
            & (
                F.col("next_ts").cast("timestamp").cast("long")
                - F.col(ts_col).cast("timestamp").cast("long")
                <= F.lit(within_seconds)
            )
        )
        .select(
            key_col,
            F.col(ts_col).cast("timestamp").cast("long").alias("first_ts"),
            F.col("next_ts").cast("timestamp").cast("long").alias("second_ts"),
        )
    )
