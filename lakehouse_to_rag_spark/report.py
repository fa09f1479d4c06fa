"""Data-quality / content-analysis report over the medallion layers —
parity with the reference's analytics CLIs (`python
src/helpers/duckdb_queries.py` main, duckdb_queries.py:139-159, and
delta_queries.py:64-79): run every reference query over
bronze/silver/gold and print the results.

Usage: python -m lakehouse_to_rag_spark.report [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession

from lakehouse_to_rag_spark.operators import analytics
from lakehouse_to_rag_spark.operators.pipeline import run_medallion


def data_quality_report(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """All reference analytics queries (A1-A7, A4/T1, A5, A6, D1) over
    the three medallion layers, as named lazy DataFrames."""
    layers = run_medallion(spark, sf_dir)
    tables = {k: layers[k] for k in ("bronze", "silver", "gold")}
    # gold rows carry `chunk`; content stats there describe the chunk
    gold_chunks = layers["gold"].withColumnRenamed("chunk", "chunk_text")
    return {
        "record_counts": analytics.table_row_counts(tables),
        "content_length_stats": analytics.content_length_stats(tables),
        "missing_values": analytics.missing_values(tables, cols=("content", "title")),
        "word_frequency": analytics.word_frequency(layers["silver"]),
        "duplicate_analysis": analytics.duplicate_analysis(layers["silver"]),
        "avg_length_by_source": analytics.avg_length_by_group_topk(gold_chunks,
                                                                   content_col="chunk_text"),
        "duplicate_rows": analytics.duplicate_rows(
            layers["bronze"].select("url", "content"), ["content"]
        ),
    }


def main() -> None:
    from lakehouse_to_rag_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("lakehouse-to-rag-report")
    spark.sparkContext.setLogLevel("ERROR")
    for name, df in data_quality_report(spark, sf_dir).items():
        print(f"=== {name} ===")
        df.show(10, truncate=60)
    spark.stop()


if __name__ == "__main__":
    main()
