"""Silver stage: text normalization + per-key dedup.

Reference semantics (airflow/dags/etl.py:146-204), a 2-CTE query:
  cleaned: TRIM(REGEXP_REPLACE(LOWER(REGEXP_REPLACE(content,
             '[^\\w\\d\\s.,!?;:\\-()]', ' ', 'g')), '\\s+', ' ', 'g'))
           WHERE content IS NOT NULL
  ranked:  ROW_NUMBER() OVER (PARTITION BY url ORDER BY processed_at)
  final:   WHERE rn = 1 AND LENGTH(cleaned_content) > min_content_length

Scale notes: the single shuffle in this stage is the hash exchange on
the dedup key for the window. At 100 TB, ``row_number`` over
``partitionBy(key)`` is the right shape (hash-partition then per-key
sort — no global sort); a heavily-skewed key (one URL scraped millions
of times) would hot-spot one task, in which case pre-aggregate with
``min_by``-style reduction instead — exposed as ``dedup_keep_first``
(same semantics when the orderings agree, map-side combinable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_to_rag_spark.functions.text import normalize_text

DEFAULT_MIN_CONTENT_LENGTH = 50  # reference airflow/dags/etl.py:131,148


def silver_transform(
    bronze: DataFrame,
    key_col: str = "url",
    order_cols: tuple[str, ...] = ("processed_at",),
    content_col: str = "content",
    min_content_length: int = DEFAULT_MIN_CONTENT_LENGTH,
    silver_processed_at: str | None = None,
) -> DataFrame:
    """Pure function bronze -> silver. Keeps the earliest row per key
    (ties broken by ``order_cols``; add a unique column for full
    determinism)."""
    ts = (
        F.to_timestamp(F.lit(silver_processed_at))
        if silver_processed_at is not None
        else F.current_timestamp()
    )
    cleaned = normalize_text(content_col).alias("cleaned_content")
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])

    out_cols = [c for c in bronze.columns if c not in (content_col, "content_length")]
    return (
        bronze.filter(F.col(content_col).isNotNull())
        .select(*out_cols, cleaned)
        .withColumn("rn", F.row_number().over(w))
        .filter(
            (F.col("rn") == 1)
            & (F.length("cleaned_content") > min_content_length)
        )
        .drop("rn")
        .withColumnRenamed("cleaned_content", "content")
        .withColumn("silver_processed_at", ts)
        .withColumn("content_length", F.length("content"))
    )


def dedup_keep_first(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Skew-robust variant of the W1 dedup: ``min_by`` over a struct of
    (order_cols, all columns). Unlike ``row_number`` + filter, this is a
    partial-aggregatable reduction — map-side combine shrinks each
    partition to one row per key BEFORE the shuffle, so a hot key costs
    one combiner per upstream partition rather than one giant sorted
    task."""
    ordering = F.struct(*[F.col(c) for c in order_cols])
    packed = F.struct(*[F.col(c) for c in df.columns])
    agg = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.min_by(packed, ordering).alias("_row")
    )
    return agg.select("_row.*")
