from lakehouse_to_rag_spark.operators.bronze import bronze_transform  # noqa: F401
from lakehouse_to_rag_spark.operators.silver import silver_transform  # noqa: F401
from lakehouse_to_rag_spark.operators.gold import gold_transform  # noqa: F401
