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


class TestBmpCodec:
    """Real 24-bit BMP codec (pure numpy): the one dependency-free
    format where decode/resize run on REAL pixels, not header fakes."""

    def test_roundtrip_identity(self):
        import numpy as np

        from lakehouse_to_rag_spark.multimodal.ops import decode_bmp, encode_bmp

        rng = np.random.default_rng(7)
        for w, h in [(1, 1), (5, 3), (16, 12), (33, 21)]:  # incl. row-padding cases
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            assert (decode_bmp(encode_bmp(px)) == px).all()

    def test_non_bmp_raises_not_implemented(self):
        import pytest

        from lakehouse_to_rag_spark.multimodal.ops import decode_bmp

        with pytest.raises(NotImplementedError):
            decode_bmp(b"\x89PNG____not_a_bmp")

    def test_decode_stats_distributed(self, spark):
        import numpy as np

        from lakehouse_to_rag_spark.multimodal.ops import (
            decode_bmp,
            decode_bmp_stats,
            synth_bmp_table,
        )

        media = synth_bmp_table(spark, n=30)
        got = {r["media_id"]: r for r in decode_bmp_stats(media).collect()}
        assert len(got) == 30
        # spot-check one image against a local decode
        payload = media.filter("media_id = 7").collect()[0]["payload"]
        px = decode_bmp(bytes(payload))
        r = got[7]
        assert (r["height"], r["width"]) == px.shape[:2]
        assert abs(r["mean_r"] - px.reshape(-1, 3).mean(axis=0)[0]) < 1e-3

    def test_resize_changes_pixels_not_just_header(self, spark):
        import numpy as np

        from lakehouse_to_rag_spark.multimodal.ops import (
            decode_bmp,
            resize_bmp,
            synth_bmp_table,
        )

        media = synth_bmp_table(spark, n=6)
        out = resize_bmp(media, width=8, height=8).collect()
        assert len(out) == 6
        for row in out:
            px = decode_bmp(bytes(row["payload"]))
            assert px.shape == (8, 8, 3)
        # resized content must come from the source image (gradient
        # corner pixels survive nearest-neighbor)
        src = decode_bmp(bytes(media.filter("media_id = 0").collect()[0]["payload"]))
        dst = decode_bmp(bytes([r for r in out if r["media_id"] == 0][0]["payload"]))
        assert (dst[0, 0] == src[0, 0]).all()
