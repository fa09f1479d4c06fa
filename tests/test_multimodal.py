"""Multimodal plumbing tests: schema, mapInPandas batch shape, fan-out,
and the embedding contract into the similarity operators."""

import pytest
from pyspark.sql import functions as F

from lakehouse_to_rag_spark.multimodal.ops import (
    decode_metadata,
    extract_features,
    resize_images,
    sample_frames,
    synth_media_table,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media_table(spark, 60).cache()


def test_decode_metadata(media):
    out = decode_metadata(media)
    rows = out.collect()
    assert len(rows) == 60
    assert all(r["width"] >= 64 and r["height"] >= 64 for r in rows)
    images = [r for r in rows if r["media_type"] == "image"]
    assert all(r["n_frames"] == 1 for r in images)


def test_resize_images(media):
    out = resize_images(media, 224, 224)
    meta = decode_metadata(out).collect()
    assert len(meta) == 20
    assert all(r["width"] == 224 and r["height"] == 224 for r in meta)


def test_sample_frames_fanout(media):
    frames = sample_frames(media, every_n=10)
    per_vid = frames.groupBy("media_id").count().collect()
    assert len(per_vid) == 20  # one third are videos
    meta = {r["media_id"]: r["n_frames"] for r in decode_metadata(media).collect()}
    for r in per_vid:
        expected = (meta[r["media_id"]] + 9) // 10
        assert r["count"] == expected


def test_extract_features_contract(media, spark):
    emb = extract_features(media, dim=64)
    row = emb.first()
    assert len(row["embedding"]) == 64
    # plugs into the similarity operator unchanged
    from lakehouse_to_rag_spark.operators.similarity import knn_bruteforce

    corpus = emb.withColumnRenamed("media_id", "vec_id")
    queries = corpus.filter(F.col("vec_id") < 3)
    topk = knn_bruteforce(corpus, queries, k=3)
    assert topk.count() == 9


def test_real_decode_raises(spark):
    fake = spark.createDataFrame(
        [(0, "image", b"\x89PNG....", "image/png", 8)],
        synth_media_table(spark, 1).schema,
    )
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        decode_metadata(fake).collect()


def test_binary_digest_arrow_equals_pandas(spark, sf_dir):
    """mapInArrow digest must be byte-identical to the mapInPandas
    form (same md5, same lengths) on real binary payloads."""
    from pyspark.sql import functions as F

    from lakehouse_to_rag_spark.multimodal.ops import (
        binary_digest,
        binary_digest_arrow,
    )
    from lakehouse_to_rag_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    a = sorted(map(tuple, binary_digest(docs).collect()))
    b = sorted(map(tuple, binary_digest_arrow(docs).collect()))
    assert a == b and len(a) > 0
