"""Bronze stage: raw ingest -> trimmed, non-empty documents.

Reference semantics (airflow/dags/etl.py:85-119):
  SELECT url, source, title, TRIM(content) AS content,
         NOW()::TIMESTAMP AS processed_at,
         LENGTH(TRIM(content)) AS content_length
  WHERE content IS NOT NULL AND LENGTH(TRIM(content)) > 0

One narrow projection + one filter — both fully pushdown-able: at scale
the parquet scan reads only the referenced columns, and the non-empty
filter runs before any shuffle (there is none in this stage).
``processed_at`` is injectable for deterministic testing (SURVEY.md
§5.2 determinism discipline); default matches the reference's
per-statement ``NOW()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bronze_transform(
    raw: DataFrame,
    id_cols: tuple[str, ...] = ("url", "source", "title"),
    content_col: str = "content",
    processed_at: str | None = None,
) -> DataFrame:
    """Pure function raw -> bronze. ``processed_at`` is an ISO timestamp
    literal for deterministic runs; None -> current_timestamp()."""
    ts = (
        F.to_timestamp(F.lit(processed_at))
        if processed_at is not None
        else F.current_timestamp()
    )
    cleaned = F.trim(F.col(content_col))
    return raw.filter(
        F.col(content_col).isNotNull() & (F.length(cleaned) > 0)
    ).select(
        *[F.col(c) for c in id_cols],
        cleaned.alias("content"),
        ts.alias("processed_at"),
        F.length(cleaned).alias("content_length"),
    )
