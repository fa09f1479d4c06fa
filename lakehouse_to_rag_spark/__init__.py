"""lakehouse_to_rag_spark — a PySpark-native analytics engine.

A from-scratch Spark rebuild of the capabilities of the reference
``silwalumit/lakehouse-to-rag`` lakehouse-to-RAG pipeline (medallion
bronze/silver/gold ETL + SQL analytics), extended with the operators a
large-scale LLM-training-data pipeline needs: deduplication (exact,
MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine), similarity
search, text analysis, and multimodal column plumbing.

Design stance (SURVEY.md §7.0): every operator is a pure
``DataFrame -> DataFrame`` function; plans are declared with the
DataFrame / Spark SQL API so Catalyst handles pushdown, pruning,
join strategy and AQE; Python UDFs appear only where built-in
expressions genuinely cannot express the semantics (the recursive
RAG chunker, multimodal decode) and are always Arrow-batched.
"""

__version__ = "0.1.0"

from lakehouse_to_rag_spark.session import get_spark  # noqa: F401
