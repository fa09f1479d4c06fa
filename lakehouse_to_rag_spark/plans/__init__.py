from lakehouse_to_rag_spark.plans.registry import QUERIES, ORACLES  # noqa: F401
