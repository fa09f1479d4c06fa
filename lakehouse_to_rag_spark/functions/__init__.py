from lakehouse_to_rag_spark.functions.text import normalize_text  # noqa: F401
from lakehouse_to_rag_spark.functions.chunker import (  # noqa: F401
    split_text_recursive,
    chunks_udf,
)
from lakehouse_to_rag_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
