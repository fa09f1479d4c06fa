"""End-to-end medallion pipeline over the harness `documents` table.

The reference pipeline's corpus is scraped web pages keyed by ``url``;
the harness corpus is ``documents.parquet`` (doc_id, text, lang,
source, n_chars). ``documents_as_raw`` adapts the latter to the raw
shape (url/source/title/content) so bronze→silver→gold run unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lakehouse_to_rag_spark.operators.bronze import bronze_transform
from lakehouse_to_rag_spark.operators.gold import gold_transform
from lakehouse_to_rag_spark.operators.silver import silver_transform
from lakehouse_to_rag_spark.sources.tables import load_table

# Fixed timestamp for deterministic pipeline runs (oracle comparison).
DETERMINISTIC_TS = "2025-01-01 00:00:00"


def documents_as_raw(docs: DataFrame) -> DataFrame:
    """documents(doc_id,text,lang,source,n_chars) -> raw(url,source,title,content)."""
    return docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.col("source"),
        F.concat(F.lit("doc "), F.col("doc_id").cast("string")).alias("title"),
        F.col("text").alias("content"),
        F.col("doc_id"),
        F.col("lang"),
    )


def run_medallion(
    spark: SparkSession,
    sf_dir: str,
    deterministic: bool = True,
    min_content_length: int = 50,
) -> dict[str, DataFrame]:
    """Load documents and run bronze→silver→gold; returns all layers."""
    ts = DETERMINISTIC_TS if deterministic else None
    raw = documents_as_raw(load_table(spark, sf_dir, "documents"))
    bronze = bronze_transform(
        raw,
        id_cols=("url", "source", "title", "doc_id", "lang"),
        processed_at=ts,
    )
    silver = silver_transform(
        bronze,
        key_col="url",
        # processed_at is constant within a run; doc_id makes the
        # W1 tie-break deterministic (SURVEY.md §5.2).
        order_cols=("processed_at", "doc_id"),
        min_content_length=min_content_length,
        silver_processed_at=ts,
    )
    gold = gold_transform(silver, with_index=True)
    return {"raw": raw, "bronze": bronze, "silver": silver, "gold": gold}
