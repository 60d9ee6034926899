"""Streaming sources.

In production the source is an Iceberg table scanned incrementally (or
Kafka); in this sandbox the equivalent bounded-replay source is a
parquet-file directory stream: each file becomes (at most) one
micro-batch via ``maxFilesPerTrigger``, giving deterministic replay of
the same input stream + watermark progression — the contract the
correctness gate requires (BASELINE.json ``north_rule``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)

TOOL_EVENT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("tool", StringType()),
        StructField("payload", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # process files oldest-first so replay order is deterministic
    reader = reader.option("latestFirst", "false")
    return reader.parquet(path)


def tool_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = 1
) -> DataFrame:
    reader = spark.readStream.schema(TOOL_EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    reader = reader.option("latestFirst", "false")
    return reader.parquet(path)
