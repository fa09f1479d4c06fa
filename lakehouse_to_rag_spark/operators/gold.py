"""Gold stage: RAG chunk fan-out.

Reference semantics (airflow/dags/etl.py:218-250): pandas
``.apply(_split_content)`` + ``.explode("chunks")`` + rename -> one row
per ~200-char chunk, all silver columns replicated; an empty chunk list
keeps one row with NULL chunk (pandas explode keeps NaN — we match with
``explode_outer``, SURVEY.md §2.9 T2).

Note: the reference writes gold to the *silver* path (etl.py:240, a
latent bug); we implement the documented intent (separate gold output,
README.md:157-161).

Scale notes: chunking is embarrassingly parallel — no shuffle at all in
this stage; the pandas_udf runs Arrow-batched on every executor core.
The explode multiplies rows ~len/stride×; downstream consumers should
repartition by size, not count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakehouse_to_rag_spark.functions.chunker import (
    DEFAULT_CHUNK_OVERLAP,
    DEFAULT_CHUNK_SIZE,
    chunks_udf,
    fixed_stride_chunks,
)


def gold_transform(
    silver: DataFrame,
    content_col: str = "content",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
    with_index: bool = False,
) -> DataFrame:
    """Pure function silver -> gold (one row per chunk).

    ``with_index=True`` adds a ``chunk_index`` column via posexplode —
    an extension over the reference that RAG retrieval needs to
    reconstruct document order.
    """
    arr = chunks_udf(chunk_size, chunk_overlap)(F.col(content_col))
    if with_index:
        return silver.select(
            "*", F.posexplode_outer(arr).alias("chunk_index", "chunk")
        )
    return silver.withColumn("chunk", F.explode_outer(arr))


def gold_transform_fixed_stride(
    silver: DataFrame,
    content_col: str = "content",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    chunk_overlap: int = DEFAULT_CHUNK_OVERLAP,
) -> DataFrame:
    """SQL-only chunking variant (sequence+substring, zero Python) —
    oracle-expressible and the fastest path when recursive-splitter
    boundary snapping isn't required."""
    arr = fixed_stride_chunks(content_col, chunk_size, chunk_overlap)
    return silver.select(
        "*", F.posexplode_outer(arr).alias("chunk_index", "chunk")
    )
