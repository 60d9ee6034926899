"""Temporal joins Spark lacks as built-ins: as-of and interval (range).

The reference has no table joins at all (SURVEY.md §2.9 — its only
cross-row association is Conversation2Message's positional modality
splice); these are the net-new temporal-join operators a transcript /
event engine needs, expressed so Catalyst keeps them shuffle-minimal.

* ``asof_join`` — for each left row, the most recent right row with
  ``right.ts <= left.ts`` per key (pandas ``merge_asof`` / kdb ``aj``
  semantics). NOT implemented as a join: a theta-join on ``ts <=`` would
  explode to a per-key cross product and then need a rank filter. The
  union-scan form is one shuffle + one in-partition sort: tag both
  sides, sort (key, ts, side), carry the last right value forward with
  ``last(..., ignoreNulls=True)``, keep left rows. Cost is
  ``sort(|L|+|R|)`` per key — the optimal single-pass plan. A pathological
  hot key serializes its own sort (like any keyed window); the scale
  remedy is time-slicing the hot key's partition and carrying the last
  right value across slice boundaries (two passes) — not needed at the
  transcript key cardinalities this engine targets.
* ``interval_join`` — pairs (l, r) sharing a key with ``r.ts`` in
  ``[l.ts + lo, l.ts + hi]``. Equi-join on the key plus the range
  predicate; AQE handles key skew. For key-less range joins, bucketize
  time into ``hi - lo`` buckets first (not needed for the keyed
  transcript shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row + the latest right row at or
    before its timestamp (per key); unmatched → nulls. ``tolerance``
    voids matches older than the bound (merge_asof's ``tolerance``)."""
    value_cols = value_cols or [
        c for c in right.columns if c not in (*key_cols, ts_col)
    ]
    # the whole matched right row rides in ONE struct so (a) every output
    # value comes from the same physical right row — per-column
    # last(ignorenulls) would backfill a genuinely-NULL right value from
    # an older row — and (b) equal-(key, ts) right rows resolve by the
    # struct's lexicographic order: deterministic across runs/partitions.
    r_tagged = right.select(
        *key_cols,
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.struct(
            F.col(ts_col).cast("timestamp").alias("_ts"),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("_r"),
    )
    l_tagged = left.select(
        *key_cols,
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_tagged.schema["_r"].dataType).alias("_r"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    r_tagged = r_tagged.withColumn(
        "_l", F.lit(None).cast(l_tagged.schema["_l"].dataType)
    )
    # right sorts before left at equal ts (_side 0 < 1) → inclusive <=;
    # tied right rows sort by _r, so last() picks the greatest tuple
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc(),
                 F.col("_r").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_m")
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        in_tol = (
            F.col(ts_col).cast("timestamp").cast("long")
            - F.col("_m._ts").cast("long")
        ) <= tolerance_seconds
        out = out.withColumn("_m", F.when(in_tol, F.col("_m")))
    return out.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(f"{c}{suffix}") for c in value_cols],
        F.col("_m._ts").alias(f"{ts_col}{suffix}"),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    lo_seconds: int = 0,
    hi_seconds: int = 1800,
    suffix: str = "_right",
) -> DataFrame:
    """All (l, r) pairs sharing the key with r.ts ∈ [l.ts+lo, l.ts+hi]."""
    lts = F.col(f"l.{ts_col}").cast("timestamp").cast("long")
    rts = F.col(f"r.{ts_col}").cast("timestamp").cast("long")
    cond = [F.col(f"l.{k}") == F.col(f"r.{k}") for k in key_cols]
    cond += [rts >= lts + lo_seconds, rts <= lts + hi_seconds]
    l, r = left.alias("l"), right.alias("r")
    r_cols = [c for c in right.columns if c not in key_cols]
    return l.join(r, cond).select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}").alias(f"{c}{suffix}") for c in r_cols],
    )
