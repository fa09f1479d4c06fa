"""End-to-end ETL entrypoint — the reference's Airflow DAG collapsed
to one callable (SURVEY.md §2.14: scrape >> bronze >> silver >> gold,
airflow/dags/etl.py:253-307, with the DockerOperator scrape stage
replaced by any directory/bucket of scraped JSON objects).

A reference user's migration path:
    raw MinIO bucket of <url>.json objects
      -> run_etl(spark, "s3a://raw/*.json", "s3a://datalake")
      -> bronze/silver/gold written under the target (Delta when
         delta-spark is on the classpath, parquet otherwise — unlike
         the reference, gold is written to the GOLD path, fixing the
         gold-overwrites-silver bug at etl.py:240).

Usage: python -m lakehouse_to_rag_spark.etl <raw_glob> <out_dir>
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession

from lakehouse_to_rag_spark.operators.bronze import bronze_transform
from lakehouse_to_rag_spark.operators.gold import gold_transform
from lakehouse_to_rag_spark.operators.silver import silver_transform
from lakehouse_to_rag_spark.sources.lakehouse import write_layer
from lakehouse_to_rag_spark.sources.raw_json import read_raw_json


def run_etl(
    spark: SparkSession,
    raw_glob: str,
    out_dir: str,
    selector_fields: list[str] | None = None,
    min_content_length: int = 50,
    chunk_size: int = 200,
    chunk_overlap: int = 10,
    processed_at: str | None = None,
) -> dict[str, str]:
    """Raw JSON -> bronze -> silver -> gold, each layer persisted.
    Returns {layer: path}. Defaults mirror the reference's parameters
    (min length 50: etl.py:131; chunks 200/10: etl.py:211-213)."""
    raw = read_raw_json(spark, raw_glob, selector_fields)
    bronze = bronze_transform(raw, processed_at=processed_at)
    paths = {"bronze": f"{out_dir}/bronze"}
    write_layer(bronze, paths["bronze"])

    # downstream stages reuse the lazy lineage (one Catalyst plan);
    # the persisted layer is the durable artifact, not a required
    # read-back boundary as in the reference (etl.py:127-128, 224-228)
    silver = silver_transform(
        bronze,
        key_col="url",
        order_cols=("processed_at", "url"),
        min_content_length=min_content_length,
        silver_processed_at=processed_at,
    )
    paths["silver"] = f"{out_dir}/silver"
    write_layer(silver, paths["silver"])

    gold = gold_transform(
        silver, chunk_size=chunk_size, chunk_overlap=chunk_overlap, with_index=True
    )
    paths["gold"] = f"{out_dir}/gold"
    write_layer(gold, paths["gold"])
    return paths


def main() -> None:
    from lakehouse_to_rag_spark.session import get_spark

    raw_glob, out_dir = sys.argv[1], sys.argv[2]
    spark = get_spark("lakehouse-to-rag-etl")
    spark.sparkContext.setLogLevel("ERROR")
    paths = run_etl(spark, raw_glob, out_dir)
    for layer, path in paths.items():
        n = spark.read.parquet(path).count()
        print(f"{layer}: {n} rows -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
