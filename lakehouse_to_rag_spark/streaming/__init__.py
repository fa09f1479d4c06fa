from lakehouse_to_rag_spark.streaming.pipeline import (  # noqa: F401
    stream_raw_json,
    bronze_stream,
    silver_stream_dedup,
    gold_stream,
    hourly_rollup_stream,
)
