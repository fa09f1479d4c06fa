from lakehouse_to_rag_spark.sources.tables import (  # noqa: F401
    TABLES,
    load_table,
    register_views,
)
from lakehouse_to_rag_spark.sources.raw_json import read_raw_json  # noqa: F401
