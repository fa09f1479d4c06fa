"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``lakehouse_to_rag_spark`` (see SURVEY.md §2
for the operator inventory each entry maps to).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from lakehouse_to_rag_spark.plans.registry import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full medallion pipeline (bronze P1-P2 → silver
    P3-P5+W1 → gold F1/T2 recursive chunking) on sf0.001 documents."""
    from lakehouse_to_rag_spark.operators.pipeline import run_medallion

    gold = run_medallion(spark, "/root/testdata/sf0.001")["gold"]
    return gold.select("doc_id", "source", "chunk_index", "chunk", "content_length")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle per SQL-expressible query."""
    return dict(ORACLES)
