#!/usr/bin/env python
"""Single-node throughput shootout: reference-shaped pipeline vs this engine.

The reference (silwalumit/lakehouse-to-rag) executes its medallion
pipeline as sequential Airflow tasks, each fully materializing a layer
in memory: DuckDB SQL over a registered pandas/arrow table for
bronze/silver (etl.py:94-115, 154-198), a row-wise LangChain
RecursiveCharacterTextSplitter loop in pandas for gold
(etl.py:211-244), and DuckDB SQL for the analytics report
(duckdb_queries.py:34-154). This script re-executes that exact shape —
same SQL, same per-row chunk loop (via our LangChain-semantics
reimplementation, functions/chunker.py), same full materialization
between stages — against {sf_dir}/documents.parquet, then runs THIS
engine's equivalent (run_medallion + operators/analytics.py) on the
same input in one Spark session.

Prints one JSON line:
  {"reference_shaped_sec": ..., "spark_sec": ..., "stages": {...}, "sf": ...}

Both sides compute: bronze -> silver -> gold(chunk 200/10) plus the
report queries A1-A6 (row counts, length stats, missing values, word
freq top-10, duplicate analysis, avg-length-by-source top-5).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

from lakehouse_to_rag_spark.functions.chunker import split_text_recursive  # noqa: E402

MIN_CONTENT_LENGTH = 50


def run_reference_shaped(sf_dir: str, multiplier: int = 1) -> dict[str, float]:
    """The reference's execution model: sequential stages, DuckDB SQL
    on registered in-memory tables, pandas row loop for chunking, full
    materialization after every stage (etl.py materializes
    .to_pyarrow_table()/.to_pandas() between all tasks).

    ``multiplier`` replicates the corpus with distinct doc_ids — the
    scale-up axis the reference has no answer to beyond one process's
    memory and one core's chunking loop."""
    t: dict[str, float] = {}
    con = duckdb.connect()

    t0 = time.perf_counter()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    if multiplier > 1:
        docs = pd.concat(
            [docs.assign(doc_id=docs["doc_id"] + i * 10**9) for i in range(multiplier)],
            ignore_index=True,
        )
    raw = pd.DataFrame(
        {
            "url": "doc://" + docs["doc_id"].astype(str),
            "source": docs["source"],
            "title": "doc " + docs["doc_id"].astype(str),
            "content": docs["text"],
        }
    )
    t["load"] = time.perf_counter() - t0

    # bronze (etl.py:98-107): projection + derived cols + non-empty filter
    t0 = time.perf_counter()
    con.register("raw_table", raw)
    bronze = con.execute(
        """
        SELECT url, source, title, TRIM(content) AS content,
               TIMESTAMP '2025-01-01 00:00:00' AS processed_at,
               LENGTH(TRIM(content)) AS content_length
        FROM raw_table
        WHERE content IS NOT NULL AND LENGTH(TRIM(content)) > 0
        """
    ).df()
    t["bronze"] = time.perf_counter() - t0

    # silver (etl.py:154-198): normalize + row_number dedup + filters
    t0 = time.perf_counter()
    con.register("bronze_table", bronze)
    silver = con.execute(
        f"""
        WITH cleaned AS (
          SELECT url, source, title,
                 TRIM(REGEXP_REPLACE(LOWER(REGEXP_REPLACE(content,
                     '[^\\w\\d\\s\\.,!?;:\\-\\(\\)]', ' ', 'g')),
                     '\\s+', ' ', 'g')) AS cleaned_content,
                 processed_at
          FROM bronze_table
          WHERE content IS NOT NULL
        ), ranked AS (
          SELECT *, ROW_NUMBER() OVER (
              PARTITION BY url ORDER BY processed_at) AS rn
          FROM cleaned
        )
        SELECT url, source, title, cleaned_content AS content,
               processed_at,
               TIMESTAMP '2025-01-01 00:00:00' AS silver_processed_at,
               LENGTH(cleaned_content) AS content_length
        FROM ranked
        WHERE rn = 1 AND LENGTH(cleaned_content) > {MIN_CONTENT_LENGTH}
        """
    ).df()
    t["silver"] = time.perf_counter() - t0

    # gold (etl.py:211-244): row-wise recursive chunker in pandas
    t0 = time.perf_counter()
    records = []
    for row in silver.itertuples(index=False):
        for chunk in split_text_recursive(row.content, 200, 10):
            records.append(
                {
                    "url": row.url,
                    "source": row.source,
                    "title": row.title,
                    "content": row.content,
                    "chunk": chunk,
                }
            )
    gold = pd.DataFrame.from_records(records)
    t["gold"] = time.perf_counter() - t0

    # report (duckdb_queries.py:34-154): A1-A6 over the layers
    t0 = time.perf_counter()
    con.register("silver_table", silver)
    con.register("gold_table", gold)
    con.execute(
        """
        SELECT 'bronze' AS table_name, COUNT(*) AS row_count FROM bronze_table
        UNION ALL SELECT 'silver', COUNT(*) FROM silver_table
        UNION ALL SELECT 'gold', COUNT(*) FROM gold_table
        """
    ).fetchall()
    con.execute(
        """
        SELECT 'bronze' AS t, AVG(LENGTH(content)) a, MIN(LENGTH(content)) mn,
               MAX(LENGTH(content)) mx FROM bronze_table
        UNION ALL SELECT 'silver', AVG(LENGTH(content)), MIN(LENGTH(content)),
               MAX(LENGTH(content)) FROM silver_table
        UNION ALL SELECT 'gold', AVG(LENGTH(chunk)), MIN(LENGTH(chunk)),
               MAX(LENGTH(chunk)) FROM gold_table
        """
    ).fetchall()
    con.execute(
        """
        SELECT COUNT(*) - COUNT(content) AS missing_content,
               COUNT(*) - COUNT(title) AS missing_title FROM bronze_table
        """
    ).fetchall()
    con.execute(
        """
        SELECT word, COUNT(*) AS frequency
        FROM (SELECT UNNEST(STRING_SPLIT(LOWER(chunk), ' ')) AS word
              FROM gold_table)
        WHERE LENGTH(word) > 3
        GROUP BY word ORDER BY frequency DESC, word LIMIT 10
        """
    ).fetchall()
    con.execute(
        """
        SELECT COUNT(*) AS total, COUNT(DISTINCT chunk) AS uniq,
               COUNT(*) - COUNT(DISTINCT chunk) AS dups FROM gold_table
        """
    ).fetchall()
    con.execute(
        """
        SELECT source, AVG(LENGTH(chunk)) AS avg_length FROM gold_table
        GROUP BY source ORDER BY avg_length DESC LIMIT 5
        """
    ).fetchall()
    t["report"] = time.perf_counter() - t0
    return t


def run_spark_engine(spark, sf_dir: str, multiplier: int = 1) -> dict[str, float]:
    """This engine: bronze/silver/gold persisted in memory (the honest
    equivalent of the reference's per-stage materialization — except
    distributed and spillable), one action materializes all three,
    then the report runs over cached layers."""
    from pyspark.sql import functions as F

    from lakehouse_to_rag_spark.operators import analytics
    from lakehouse_to_rag_spark.operators.bronze import bronze_transform
    from lakehouse_to_rag_spark.operators.gold import gold_transform
    from lakehouse_to_rag_spark.operators.pipeline import (
        DETERMINISTIC_TS,
        documents_as_raw,
    )
    from lakehouse_to_rag_spark.operators.silver import silver_transform
    from lakehouse_to_rag_spark.sources.tables import load_table

    t: dict[str, float] = {}
    t0 = time.perf_counter()
    docs = load_table(spark, sf_dir, "documents")
    if multiplier > 1:
        # Replicate via explode(sequence), NOT an N-way self-union: a
        # union of N branches each carrying the downstream expression
        # tree blows past whole-stage-codegen limits and falls back to
        # interpreted evaluation (measured 200x slower at N=32).
        docs = (
            docs.withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(multiplier - 1))))
            .withColumn("doc_id", F.col("doc_id") + F.col("rep").cast("long") * F.lit(10**9))
            .drop("rep")
            .repartition(spark.sparkContext.defaultParallelism)
        )
    raw = documents_as_raw(docs)
    bronze = bronze_transform(
        raw,
        id_cols=("url", "source", "title", "doc_id", "lang"),
        processed_at=DETERMINISTIC_TS,
    ).persist()
    silver = silver_transform(
        bronze,
        key_col="url",
        order_cols=("processed_at", "doc_id"),
        min_content_length=MIN_CONTENT_LENGTH,
        silver_processed_at=DETERMINISTIC_TS,
    ).persist()
    gold = gold_transform(silver, with_index=True).persist()
    gold.count()  # one action fills all three caches
    t["pipeline_to_gold"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    tables = {"bronze": bronze, "silver": silver, "gold": gold}
    analytics.table_row_counts(tables).collect()
    analytics.content_length_stats({"bronze": bronze, "silver": silver}).collect()
    analytics.content_length_stats({"gold": gold}, content_col="chunk").collect()
    analytics.missing_values({"bronze": bronze}, ("content", "title")).collect()
    analytics.word_frequency(gold, content_col="chunk").collect()
    analytics.duplicate_analysis(gold, col="chunk").collect()
    analytics.avg_length_by_group_topk(
        gold, group_col="source", content_col="chunk", k=5
    ).collect()
    t["report"] = time.perf_counter() - t0
    for df in (bronze, silver, gold):
        df.unpersist()
    return t


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    multipliers = [
        int(m) for m in os.environ.get("SHOOTOUT_MULTS", "1,8,32").split(",")
    ]

    from lakehouse_to_rag_spark.session import get_spark

    t0 = time.perf_counter()
    spark = get_spark("single-node-shootout")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    # Warm the Python-worker/Arrow path once (first pandas_udf call
    # forks workers, ~3-5s) so tier 1 measures throughput, not fork().
    from lakehouse_to_rag_spark.operators.pipeline import run_medallion

    run_medallion(spark, sf_dir)["gold"].limit(20).count()
    startup = time.perf_counter() - t0

    tiers = []
    for mult in multipliers:
        ref = run_reference_shaped(sf_dir, mult)
        spk = run_spark_engine(spark, sf_dir, mult)
        tiers.append(
            {
                "multiplier": mult,
                "docs": 5000 * mult if sf == 0.1 else None,
                "reference_shaped_sec": round(sum(ref.values()), 3),
                "spark_sec": round(sum(spk.values()), 3),
                "stages": {
                    "reference": {k: round(v, 3) for k, v in ref.items()},
                    "spark": {k: round(v, 3) for k, v in spk.items()},
                },
            }
        )
        print(
            f"# mult={mult}: reference={tiers[-1]['reference_shaped_sec']}s "
            f"spark={tiers[-1]['spark_sec']}s",
            file=sys.stderr,
        )
    spark.stop()
    print(json.dumps({"sf": sf, "spark_startup_sec": round(startup, 3), "tiers": tiers}))


if __name__ == "__main__":
    main()
