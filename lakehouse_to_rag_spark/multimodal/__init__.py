from lakehouse_to_rag_spark.multimodal.ops import (  # noqa: F401
    MEDIA_SCHEMA,
    synth_media_table,
    decode_metadata,
    resize_images,
    sample_frames,
    extract_features,
)
