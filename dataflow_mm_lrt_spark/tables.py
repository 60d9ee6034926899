"""Table layout helpers — bucket(conv_id) alignment (north_star S8/S9).

On a production cluster the transcripts and every conv_id-keyed derived
table live in Iceberg with ``bucket(N, conv_id)`` partition transforms,
so the stateful shuffle, the stream-stream join and downstream reads all
hash rows identically and storage-partitioned joins
(``spark.sql.sources.v2.bucketing.enabled``) skip the exchange.

In this sandbox (no Iceberg runtime jar) the equivalent layout is
Spark's native bucketed tables: same hash family (Murmur3 on the bucket
column), same shuffle-avoidance property — verified by
``tests/test_plans.py::test_bucketed_join_avoids_shuffle``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_BUCKETS = 16


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "conv_id",
    n_buckets: int = DEFAULT_BUCKETS,
    sort_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    mode: str = "overwrite",
) -> None:
    """Persist a conv-keyed table bucketed (and sorted) for exchange-free
    downstream joins. Iceberg equivalent:

        CREATE TABLE ... PARTITIONED BY (bucket(N, conv_id))
    """
    (
        df.write.bucketBy(n_buckets, bucket_col)
        .sortBy(*sort_cols)
        .mode(mode)
        .saveAsTable(table)
    )


def aligned_join(
    spark: SparkSession, left_table: str, right_table: str, on: str = "conv_id"
):
    """Join two identically-bucketed tables — no Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on)
