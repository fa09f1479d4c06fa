"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (SURVEY.md §2.13 / BASELINE.json north-star).

The Spark-side plumbing is real and tested — schemas, Arrow-batched
``mapInPandas`` UDF signatures, batch shapes, partition sizing. Codec
calls that need PIL/ffmpeg/librosa are STUBBED because the harness
container ships no media libraries: each stub raises
``NotImplementedError`` when a real decode is requested, and provides
a deterministic fake (parsing our synthetic header format) so the
distributed pipeline around it is exercised end-to-end. Seven
codecs/containers ARE real: 24-bit BMP (pure numpy), non-interlaced
8-bit RGB/RGBA PNG (stdlib zlib, all five scanline filters on
decode), animated GIF (full LZW), 16-bit PCM WAV, baseline JPEG
(``jpeg.py``), FLAC (``flac.py``), and MJPEG-in-AVI (``avi.py``) —
so the image path (metadata, stats, resize, features) runs with real
pixels in four formats, the audio path (stats, spectral features,
resample) runs with real samples in both an uncompressed and a
losslessly-compressed container, and the video path (frame sampling
-> per-frame image ops) runs on a real RIFF container of real JPEG
frames. MP3/MP4/etc. remain stubbed (they genuinely need
libmpg123/ffmpeg).

Scale notes: media rows are large and skewed — batch size is governed
by ``spark.sql.execution.arrow.maxRecordsPerBatch`` (bytes, not rows,
are what matters; lower it for video). Binary payloads never pass
through Python row-at-a-time; Arrow moves them zero-copy per batch.
Repartition by byte size (``n_bytes``) before heavy decode stages so
one task doesn't get all the 4K videos.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

_MAGIC = b"SYNM"  # synthetic media header: MAGIC u32(width) u32(height) u32(frames)


def _synth_payload(media_id: int, media_type: str) -> bytes:
    w = 64 + (media_id * 37) % 512
    h = 64 + (media_id * 53) % 512
    frames = 1 if media_type == "image" else 1 + (media_id * 11) % 120
    body = bytes((media_id * (i + 7)) % 256 for i in range(128))
    return _MAGIC + struct.pack("<III", w, h, frames) + body


def synth_media_table(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic synthetic media corpus for tests (seeded by id)."""
    types = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        t = types[i % 3]
        p = _synth_payload(i, t)
        rows.append((i, t, p, f"application/x-synthetic-{t}", len(p)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _parse_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) from a payload HEADER alone — no
    pixel decode (except WAV, which reads its fmt/data chunks).
    Understands the SYNM synthetic format plus every real codec in
    this package (BMP, PNG, GIF, JPEG, MJPEG-AVI — and WAV/FLAC,
    mapped as width=sample_rate, height=n_channels,
    n_frames=n_samples), so
    ``decode_metadata`` is format-aware wherever a real decoder
    exists; everything else needs PIL/ffmpeg and raises.

    Contract: EVERY undecodable payload — unknown magic OR a payload
    whose magic matches but is truncated/corrupt — raises
    NotImplementedError, so one bad row fails under the documented
    contract instead of leaking struct.error/IndexError and killing
    the whole Arrow batch with an undocumented exception type."""
    try:
        if payload is not None and payload.startswith(_MAGIC):
            w, h, frames = struct.unpack_from("<III", payload, len(_MAGIC))
            return w, h, frames
        if payload is not None and payload[:2] == b"BM":
            w, h = struct.unpack_from("<ii", payload, 18)
            return w, abs(h), 1
        if payload is not None and payload[:8] == b"\x89PNG\r\n\x1a\n":
            # IHDR is always the first chunk: sig(8) len(4) tag(4) W H ...
            w, h = struct.unpack_from(">II", payload, 16)
            return w, h, 1
        if payload is not None and payload[:6] in (b"GIF87a", b"GIF89a"):
            w, h, n = _gif_header_scan(payload)
            return w, h, n
        if (
            payload is not None
            and payload[:4] == b"RIFF"
            and payload[8:12] == b"WAVE"
        ):
            # audio mapping, documented: width=sample_rate,
            # height=n_channels, n_frames=n_samples
            rate, frames = decode_wav(payload)
            return rate, frames.shape[1], frames.shape[0]
        if payload is not None and payload[:2] == b"\xff\xd8":
            from lakehouse_to_rag_spark.multimodal.jpeg import jpeg_dimensions

            w, h = jpeg_dimensions(payload)
            return w, h, 1
        if (
            payload is not None
            and payload[:4] == b"RIFF"
            and payload[8:12] == b"AVI "
        ):
            from lakehouse_to_rag_spark.multimodal.avi import avi_info

            w, h, n, _fps = avi_info(payload)
            return w, h, n
        if payload is not None and payload[4:8] == b"ftyp":
            from lakehouse_to_rag_spark.multimodal.mp4 import mp4_info

            w, h, n, _fps = mp4_info(payload)
            return w, h, n
        if payload is not None and payload[:4] == b"fLaC":
            from lakehouse_to_rag_spark.multimodal.flac import (
                flac_streaminfo,
            )

            # same audio mapping as WAV: width=sample_rate,
            # height=n_channels, n_frames=n_samples — from the 34-byte
            # STREAMINFO alone, honoring this function's header-only
            # contract (a full decode here would Rice-decode every
            # sample just to report three fields)
            rate, ch, total = flac_streaminfo(payload)
            return rate, ch, total
    except (struct.error, IndexError, ValueError) as exc:
        raise NotImplementedError(
            f"corrupt/truncated media payload (magic matched but header "
            f"parse failed: {exc})"
        ) from exc
    raise NotImplementedError(
        "real media decode requires PIL/ffmpeg (not in this container); "
        "only SYNM/BMP/PNG/GIF/JPEG/WAV/FLAC/AVI/MP4 payloads are "
        "decodable here"
    )


def _gif_header_scan(payload: bytes) -> tuple[int, int, int]:
    """(canvas_w, canvas_h, n_frames) from GIF structure alone — walks
    the block graph counting image descriptors, no LZW decode."""
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    if flags & 0x80:
        pos += 3 * (1 << ((flags & 7) + 1))
    n_frames = 0

    def skip_blocks(p: int) -> int:
        while payload[p]:
            p += payload[p] + 1
        return p + 1

    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:
            break
        if b == 0x21:
            pos = skip_blocks(pos + 2)
        elif b == 0x2C:
            iflags = payload[pos + 9]
            pos += 10
            if iflags & 0x80:
                pos += 3 * (1 << ((iflags & 7) + 1))
            pos += 1  # LZW min code size
            pos = skip_blocks(pos)
            n_frames += 1
        else:
            raise NotImplementedError(f"unknown GIF block 0x{b:02x}")
    return w, h, n_frames


_DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def decode_metadata(media: DataFrame) -> DataFrame:
    """Decode per-item metadata with an Arrow-batched mapInPandas —
    the shape a real decoder plugs into (payload bytes in, typed
    struct out; one batch per Arrow chunk, never per row)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(_parse_header)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "width": meta.map(lambda m: m[0]),
                    "height": meta.map(lambda m: m[1]),
                    "n_frames": meta.map(lambda m: m[2]),
                    "n_bytes": pdf["n_bytes"],
                }
            )

    return media.mapInPandas(_decode, schema=_DECODED_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize: REAL pixel resample (nearest neighbor) for payloads
    with a real codec (BMP/PNG — decode, resample, re-encode in the
    same format); header rewrite for SYNM synthetic payloads (the
    stub a PIL transcode would replace). Output schema = input
    schema — resize composes with any downstream media op."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def _one(p: bytes) -> bytes:
                _parse_header(p)  # validates / raises for unknown formats
                if not p.startswith(_MAGIC):
                    return encode_image_like(
                        _nn_resize(decode_image(p), width, height), p
                    )
                _, _, frames = struct.unpack_from("<III", p, len(_MAGIC))
                return _MAGIC + struct.pack("<III", width, height, frames) + p[16:]

            out = pdf.copy()
            out["payload"] = out["payload"].map(_one)
            out["n_bytes"] = out["payload"].map(len)
            yield out

    return media.filter(F.col("media_type") == "image").mapInPandas(
        _resize, schema=MEDIA_SCHEMA
    )


_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", LongType()),
        StructField("frame_payload", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video: one output row per sampled frame.
    The fan-out ratio (n_frames/every_n) is why this runs AFTER a
    repartition at scale. Real GIF payloads decode to real frames
    re-encoded as PNG (so sampled frames feed the image pipeline with
    actual pixels); SYNM payloads emit the deterministic stamp a real
    ffmpeg impl would replace."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for _, row in pdf.iterrows():
                p = bytes(row["payload"])
                if p[:6] in (b"GIF87a", b"GIF89a"):
                    # REAL path: decode the animation, emit sampled
                    # frames as real PNG payloads -> the sampled frames
                    # flow straight into the image pipeline (features,
                    # resize, stats) with actual pixels
                    all_frames = decode_gif(p)
                    for fi in range(0, len(all_frames), every_n):
                        ids.append(row["media_id"])
                        idxs.append(fi)
                        payloads.append(encode_png(all_frames[fi]))
                    continue
                if p[:4] == b"RIFF" and p[8:12] == b"AVI ":
                    # REAL path #2: demux MJPEG AVI, decode sampled
                    # JPEG frames, re-emit as lossless PNG so the
                    # downstream image ops see exact pixels
                    from lakehouse_to_rag_spark.multimodal.avi import (
                        decode_avi_mjpeg,
                    )
                    from lakehouse_to_rag_spark.multimodal.jpeg import (
                        decode_jpeg,
                    )

                    jpegs = decode_avi_mjpeg(p)
                    for fi in range(0, len(jpegs), every_n):
                        ids.append(row["media_id"])
                        idxs.append(fi)
                        payloads.append(encode_png(decode_jpeg(jpegs[fi])))
                    continue
                if p[4:8] == b"ftyp":
                    # REAL path #3: demux MJPEG MP4 (ISO BMFF), decode
                    # sampled JPEG frames, re-emit as lossless PNG —
                    # same contract as the AVI path above
                    from lakehouse_to_rag_spark.multimodal.jpeg import (
                        decode_jpeg,
                    )
                    from lakehouse_to_rag_spark.multimodal.mp4 import (
                        decode_mp4_mjpeg,
                    )

                    jpegs = decode_mp4_mjpeg(p)
                    for fi in range(0, len(jpegs), every_n):
                        ids.append(row["media_id"])
                        idxs.append(fi)
                        payloads.append(encode_png(decode_jpeg(jpegs[fi])))
                    continue
                _, _, frames = _parse_header(row["payload"])
                for fi in range(0, frames, every_n):
                    ids.append(row["media_id"])
                    idxs.append(fi)
                    payloads.append(
                        _MAGIC + struct.pack("<III", 0, 0, fi) + row["payload"][16:32]
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_payload": payloads}
            )

    return media.filter(F.col("media_type") == "video").mapInPandas(
        _sample, schema=_FRAME_SCHEMA
    )


def extract_features(media: DataFrame, dim: int = 64) -> DataFrame:
    """Feature extraction: for payloads with a real codec (BMP/PNG)
    the embedding is a REAL pixel feature — the image resampled to a
    fixed grid, channel-interleaved, L2-normalized (the classic
    tiny-thumbnail descriptor; deterministic, resolution-invariant-ish,
    and meaningful for near-dup detection). SYNM payloads keep the
    deterministic byte-hash pseudo-embedding (a real impl would run a
    vision/audio encoder there). Output feeds directly into
    operators.similarity / dedup.embedding — the array<float>
    contract is the real interface."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(payload: pd.Series) -> pd.Series:
        def _one(p: bytes) -> list[float]:
            _parse_header(p)
            if not p.startswith(_MAGIC):
                px = decode_image(p)[:, :, :3].astype(np.float32)
                side = max(1, int(np.sqrt(dim / 3.0)))
                v = np.resize(_nn_resize(px, side, side).ravel(), dim)
            else:
                rng = np.frombuffer(p[: 16 + 64].ljust(80, b"\0"), dtype=np.uint8)
                v = np.resize(rng.astype(np.float32), dim)
            n = float(np.sqrt((v * v).sum()))
            return (v / n if n else v).tolist()

        return payload.map(_one)

    return media.select(
        "media_id", "media_type", _embed(F.col("payload")).alias("embedding")
    )


def binary_digest(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Opaque-binary ingest fingerprint: byte length + md5 digest per
    payload via Arrow-batched mapInPandas — the identity/dedup step a
    media pipeline runs before any decode (content-addressed storage,
    exact-duplicate pruning). Unlike the SYNM-gated decoders above
    this works on ANY binary payload, so it is fully oracle-checkable
    (DuckDB md5 over the same bytes).
    """
    import hashlib

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_bytes", LongType()),
            StructField("digest", StringType()),
        ]
    )

    def _digest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "digest": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_digest, schema=out_schema)


def binary_digest_arrow(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """``binary_digest`` on the ``mapInArrow`` surface: the UDF sees
    raw ``pyarrow.RecordBatch``es with NO pandas conversion on either
    side. For binary payloads that conversion is the dominant UDF-side
    cost (pandas boxes every payload into a Python bytes object even
    when the function only needs a buffer view), so the Arrow form is
    the right default for large media columns; semantics are
    byte-identical to the pandas form (equality-tested).
    """
    import hashlib

    import pyarrow as pa

    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_bytes", LongType()),
            StructField("digest", StringType()),
        ]
    )

    def _digest(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column(0)
            payloads = batch.column(1)
            # buffer-view access: no per-row bytes boxing
            digests = [
                hashlib.md5(payloads[i].as_buffer()).hexdigest()
                for i in range(len(payloads))
            ]
            n_bytes = [len(payloads[i].as_buffer()) for i in range(len(payloads))]
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(n_bytes, type=pa.int64()), pa.array(digests)],
                names=["doc_id", "n_bytes", "digest"],
            )

    return df.select(id_col, payload_col).mapInArrow(_digest, schema=out_schema)


# =====================================================================
# Real codec: 24-bit uncompressed BMP (pure numpy — no media libs)
# =====================================================================
# One honest, dependency-free codec so the image path is exercised with
# REAL pixels end-to-end: BMP is a fixed-layout format (14-byte file
# header + 40-byte BITMAPINFOHEADER + bottom-up BGR rows padded to 4
# bytes), decodable with struct + numpy alone. PIL/ffmpeg formats stay
# stubbed (NotImplementedError above); everything downstream —
# batching, resize, features — is identical code for any codec.


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BMP."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    # BMP stores bottom-up BGR
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP into an (h, w, 3) uint8 RGB
    array. Raises NotImplementedError for any other format — the same
    contract as the stubbed codecs."""
    if payload is None or payload[:2] != b"BM":
        raise NotImplementedError("only 24-bit BMP is decodable without media libs")
    offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp, compression = struct.unpack_from("<HI", payload, 28)
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP supported")
    flipped = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=offset)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if flipped:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR -> RGB


# =====================================================================
# Real codec #2: PNG (stdlib zlib + struct + numpy — no media libs)
# =====================================================================
# Non-interlaced 8-bit-per-channel RGB/RGBA PNG. Encode emits
# filter-0 scanlines in one zlib stream; decode handles ALL five
# scanline filters (None/Sub/Up/Average/Paeth), so PNGs produced by
# real encoders — which pick filters per row — decode too, not just
# our own output. Same contract as the BMP codec: any unsupported
# shape raises NotImplementedError.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) RGB or (h, w, 4) RGBA uint8 array as a
    non-interlaced 8-bit PNG (filter 0 scanlines, one IDAT)."""
    import zlib

    h, w, ch = pixels.shape
    if ch not in (3, 4):
        raise NotImplementedError("encode_png supports RGB/RGBA only")
    color_type = 2 if ch == 3 else 6

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.empty((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 0] = 0  # filter type None per scanline
    raw[:, 1:] = pixels.reshape(h, w * ch)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering: sequential over rows (Up/Average/
    Paeth reference the prior reconstructed row), vectorized across
    each row where the filter allows."""
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = raw.reshape(h, 1 + stride)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int32)
        if ft == 0:  # None
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft == 1:  # Sub = per-channel cumulative sum mod 256
            cur = (
                np.cumsum(line.reshape(-1, bpp), axis=0, dtype=np.int64) & 0xFF
            ).reshape(-1).astype(np.int32)
        elif ft in (3, 4):  # Average / Paeth: left+up sequential
            cur = line.copy()
            if ft == 3:
                for x in range(stride):
                    left = cur[x - bpp] if x >= bpp else 0
                    cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
            else:
                for x in range(stride):
                    a = cur[x - bpp] if x >= bpp else 0
                    b = prev[x]
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise NotImplementedError(f"PNG filter type {ft} is invalid")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit RGB/RGBA PNG into an (h, w, 3|4)
    uint8 array. Raises NotImplementedError for anything else
    (palette, 16-bit, interlaced) — same contract as decode_bmp."""
    import zlib

    if payload is None or payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise NotImplementedError("not a PNG payload")
    pos, idat, meta = len(_PNG_SIG), [], None
    while pos + 8 <= len(payload):
        ln, tag = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # len + tag + body + crc
        if tag == b"IHDR":
            meta = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if meta is None or not idat:
        raise NotImplementedError("malformed PNG (missing IHDR/IDAT)")
    w, h, depth, color_type, comp, filt, interlace = meta
    if depth != 8 or color_type not in (2, 6) or comp or filt or interlace:
        raise NotImplementedError(
            "only non-interlaced 8-bit RGB/RGBA PNG decodable without media libs"
        )
    ch = 3 if color_type == 2 else 4
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (1 + stride):
        raise NotImplementedError("PNG scanline payload size mismatch")
    return _png_unfilter(raw, h, stride, ch).reshape(h, w, ch)


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-dispatch decode over the real codecs (24-bit BMP, 8-bit
    RGB/RGBA PNG, GIF -> first frame, baseline JPEG). The pipeline
    stages below call THIS, so every stage runs unchanged over any
    format with a real decoder; unsupported formats raise
    NotImplementedError exactly like the PIL/ffmpeg stubs."""
    if payload is not None and payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    if payload is not None and payload[:6] in (b"GIF87a", b"GIF89a"):
        frames = decode_gif(payload)
        if not frames:
            raise NotImplementedError("GIF with no image frames")
        return frames[0]
    if payload is not None and payload[:2] == b"\xff\xd8":
        from lakehouse_to_rag_spark.multimodal.jpeg import decode_jpeg

        return decode_jpeg(payload)
    return decode_bmp(payload)


def encode_image_like(pixels: np.ndarray, original: bytes) -> bytes:
    """Re-encode pixels in the ORIGINAL payload's format — keeps
    resize/transcode stages format-preserving for every dispatched
    format (PNG stays PNG, GIF stays single-frame GIF, BMP stays BMP).

    GIF re-encode builds the palette from the image's distinct colors
    (exact — no quantization); pixels that resize/crop out of an
    existing GIF always satisfy this. >256 distinct colors would need
    a quantizer (PIL territory) and raises NotImplementedError rather
    than silently switching container formats. JPEG re-encodes as
    baseline quality-90 4:4:4 (lossy by nature — the one format where
    a resize roundtrip is approximate, as with any real tool)."""
    if original[: len(_PNG_SIG)] == _PNG_SIG:
        return encode_png(pixels)
    if original[:2] == b"\xff\xd8":
        from lakehouse_to_rag_spark.multimodal.jpeg import encode_jpeg

        return encode_jpeg(pixels[:, :, :3], quality=90)
    if original[:6] in (b"GIF87a", b"GIF89a"):
        rgb = np.ascontiguousarray(pixels[:, :, :3], dtype=np.uint8)
        h, w, _ = rgb.shape
        flat = rgb.reshape(-1, 3)
        palette, inverse = np.unique(flat, axis=0, return_inverse=True)
        if len(palette) > 256:
            raise NotImplementedError(
                "GIF re-encode with >256 distinct colors requires a "
                "quantizer (PIL); refusing to silently emit another format"
            )
        return encode_gif(
            [inverse.reshape(h, w).astype(np.uint8)], palette
        )
    return encode_bmp(pixels[:, :, :3])


def _nn_resize(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample via two fancy-index gathers."""
    h, w, _ = px.shape
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return px[yi][:, xi]


_BMP_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_r", FloatType()),
        StructField("mean_g", FloatType()),
        StructField("mean_b", FloatType()),
    ]
)


def decode_image_stats(media: DataFrame) -> DataFrame:
    """Decode real image payloads (any format ``decode_image``
    dispatches — BMP and PNG) and emit per-image pixel statistics —
    the canonical decode→aggregate media stage, Arrow-batched."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "width", "height", "mean_r", "mean_g", "mean_b")}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(payload)[:, :, :3]
                means = px.reshape(-1, 3).mean(axis=0)
                out["media_id"].append(mid)
                out["height"].append(px.shape[0])
                out["width"].append(px.shape[1])
                out["mean_r"].append(np.float32(means[0]))
                out["mean_g"].append(np.float32(means[1]))
                out["mean_b"].append(np.float32(means[2]))
            yield pd.DataFrame(out)

    return media.mapInPandas(_stats, schema=_BMP_STATS_SCHEMA)


def resize_real_images(
    media: DataFrame, width: int, height: int, method: str = "nearest"
) -> DataFrame:
    """Real pixel resize with format-preserving re-encode (BMP stays
    BMP, PNG stays PNG); ``method`` is "nearest" (exact gathers) or
    "bilinear" (4-gather lerp, the PIL/OpenCV default look). Output
    schema = input schema, so it composes with any downstream op."""
    fn = {"nearest": _nn_resize, "bilinear": _bilinear_resize}[method]

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_image_like(fn(decode_image(p), width, height), p)
                for p in pdf["payload"]
            ]
            out = pdf.copy()
            out["payload"] = payloads
            out["n_bytes"] = [len(p) for p in payloads]
            yield out

    return media.mapInPandas(_resize, schema=media.schema)


def synth_bmp_table(spark: SparkSession, n: int = 50) -> DataFrame:
    """Deterministic real-BMP corpus: gradient + id-seeded pattern
    pixels, sized (16 + id % 17) × (12 + id % 13)."""
    rows = []
    for i in range(n):
        w, h = 16 + i % 17, 12 + i % 13
        y, x = np.mgrid[0:h, 0:w]
        px = np.stack(
            [
                (x * 255 // max(w - 1, 1)).astype(np.uint8),
                (y * 255 // max(h - 1, 1)).astype(np.uint8),
                ((x * y + i) % 256).astype(np.uint8),
            ],
            axis=2,
        )
        p = encode_bmp(px)
        rows.append((i, "image", p, "image/bmp", len(p)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_png_table(spark: SparkSession, n: int = 50) -> DataFrame:
    """Deterministic real-PNG corpus: same pixel recipe as the BMP
    table (so cross-format tests can compare decoded pixels), RGBA on
    every third image to exercise the 4-channel path."""
    rows = []
    for i in range(n):
        w, h = 16 + i % 17, 12 + i % 13
        y, x = np.mgrid[0:h, 0:w]
        chans = [
            (x * 255 // max(w - 1, 1)).astype(np.uint8),
            (y * 255 // max(h - 1, 1)).astype(np.uint8),
            ((x * y + i) % 256).astype(np.uint8),
        ]
        if i % 3 == 0:
            chans.append(((x + y + i) % 256).astype(np.uint8))
        p = encode_png(np.stack(chans, axis=2))
        rows.append((i, "image", p, "image/png", len(p)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# Backward-compatible aliases from the BMP-only era of this module.
decode_bmp_stats = decode_image_stats
resize_bmp = resize_real_images


# =====================================================================
# Real codec #3: WAV / PCM16 audio (stdlib struct + numpy)
# =====================================================================
# Canonical RIFF/WAVE with one fmt and one data chunk, 16-bit signed
# PCM, any channel count. This puts the AUDIO leg of the multimodal
# pipeline on real samples the same way BMP/PNG did for images;
# compressed audio (mp3/flac/ogg) genuinely needs codec libs and
# stays stubbed.


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode an (n,) mono or (n, ch) int16 array as 16-bit PCM WAV."""
    if samples.dtype != np.int16:
        raise NotImplementedError("encode_wav takes int16 PCM samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    byte_rate = sample_rate * ch * 2
    data = samples.astype("<i2").tobytes()  # interleaved frames
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a 16-bit PCM WAV into (sample_rate, (n, ch) int16
    array). Raises NotImplementedError for float/compressed/other-
    depth WAV — same contract as the other real codecs."""
    if (
        payload is None
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WAVE"
    ):
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag, ln = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            data = body
    if fmt is None or data is None:
        raise NotImplementedError("malformed WAV (missing fmt/data chunk)")
    audio_format, ch, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            "only 16-bit integer PCM WAV decodable without audio libs"
        )
    frames = np.frombuffer(data, dtype="<i2", count=(len(data) // (2 * ch)) * ch)
    return sample_rate, frames.reshape(-1, ch)


def decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    """Magic-dispatched audio decode: RIFF/WAVE -> ``decode_wav``
    (int16 PCM), fLaC -> ``flac.decode_flac`` (lossless, int32) —
    one entry point so every audio operator (stats, features,
    resample) accepts either container unchanged. Anything else keeps
    the family's fail-closed contract."""
    if payload is not None and payload[:4] == b"fLaC":
        from lakehouse_to_rag_spark.multimodal.flac import decode_flac

        return decode_flac(payload)
    return decode_wav(payload)


_AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_channels", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_sec", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("peak", LongType()),
        StructField("zero_crossings", LongType()),
    ]
)


def audio_stats(media: DataFrame) -> DataFrame:
    """Decode real WAV payloads and emit per-clip signal statistics
    (duration, RMS, peak, zero-crossing count) — the audio analogue of
    ``decode_image_stats``, Arrow-batched. RMS/duration are exact
    integer-sum / count arithmetic, so results are engine-portable.

    Channel convention: rms/peak/zero_crossings are computed over
    CHANNEL 0 only (the reference channel), NOT a mono mixdown —
    unlike ``audio_features``, which mean-mixes. Channel-0 keeps the
    stats exact integers reproducible by a SQL oracle; a mixdown
    introduces fractional samples. Stereo callers wanting all-channel
    stats should mix before encoding or use ``audio_features``."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "sample_rate", "n_channels", "n_samples",
                "duration_sec", "rms", "peak", "zero_crossings",
            )}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, frames = decode_audio(payload)
                mono = frames[:, 0].astype(np.int64)
                n = len(mono)
                out["media_id"].append(mid)
                out["sample_rate"].append(rate)
                out["n_channels"].append(frames.shape[1])
                out["n_samples"].append(n)
                out["duration_sec"].append(n / rate)
                out["rms"].append(
                    float(np.sqrt((mono * mono).sum() / n)) if n else 0.0
                )
                out["peak"].append(int(np.abs(mono).max()) if n else 0)
                sign = mono >= 0
                out["zero_crossings"].append(
                    int((sign[1:] != sign[:-1]).sum()) if n > 1 else 0
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(_stats, schema=_AUDIO_STATS_SCHEMA)


def audio_features(media: DataFrame, n_bands: int = 16) -> DataFrame:
    """Real audio embedding: log-energy in ``n_bands`` equal FFT bands
    of the (mono-mixed) signal, L2-normalized — the deterministic
    spectral descriptor feeding similarity/dedup, like the pixel-grid
    descriptor for images. Output contract: (media_id, embedding
    array<float>)."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(payload: pd.Series) -> pd.Series:
        def _one(p: bytes) -> list[float]:
            _, frames = decode_audio(p)
            mono = frames.mean(axis=1).astype(np.float64)
            if len(mono) == 0:
                return [0.0] * n_bands
            spec = np.abs(np.fft.rfft(mono))
            bands = np.array_split(spec, n_bands)
            v = np.array(
                [np.log1p(float((b * b).sum())) for b in bands],
                dtype=np.float32,
            )
            norm = float(np.sqrt((v * v).sum()))
            return (v / norm if norm else v).tolist()

        return payload.map(_one)

    return media.select("media_id", _embed(F.col("payload")).alias("embedding"))


def synth_wav_table(spark: SparkSession, n: int = 50) -> DataFrame:
    """Deterministic real-WAV corpus: integer sawtooth samples
    s[i] = ((i*k + id) % 65536) - 32768 with id-dependent length and
    step — closed-form enough that a SQL oracle can re-derive every
    statistic exactly. Every third clip is stereo (second channel a
    shifted copy — NOT inverted, which would cancel to silence under
    mean-mixing) to exercise the channel path."""
    rows = []
    for i in range(n):
        length = 800 + (i % 7) * 100
        k = 3 + i % 5
        idx = np.arange(length, dtype=np.int64)
        mono = (((idx * k + i) % 65536) - 32768).astype(np.int16)
        samples = (np.stack([mono, np.roll(mono, 7)], axis=1)
                   if i % 3 == 0 else mono)
        p = encode_wav(samples, sample_rate=8000)
        rows.append((i, "audio", p, "audio/wav", len(p)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_flac_table(spark: SparkSession, n: int = 50) -> DataFrame:
    """The ``synth_wav_table`` corpus re-containered as FLAC: the SAME
    deterministic sawtooth samples, losslessly compressed (block size
    256 so every clip spans several frames and the subframe-type
    rotation in ``flac.encode_flac`` gets exercised; every third clip
    stereo to force the mid/side decorrelation path). Because FLAC is
    lossless, any statistic over the decoded samples has the identical
    closed-form oracle as the WAV corpus."""
    from lakehouse_to_rag_spark.multimodal.flac import encode_flac

    rows = []
    for i in range(n):
        length = 800 + (i % 7) * 100
        k = 3 + i % 5
        idx = np.arange(length, dtype=np.int64)
        mono = (((idx * k + i) % 65536) - 32768).astype(np.int16)
        samples = (np.stack([mono, np.roll(mono, 7)], axis=1)
                   if i % 3 == 0 else mono)
        p = encode_flac(samples, sample_rate=8000, block_size=256)
        rows.append((i, "audio", p, "audio/flac", len(p)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# =====================================================================
# Real codec #4: GIF — animated, LZW, stdlib-only
# =====================================================================
# GIF87a/89a with global/local color tables and full LZW (variable
# code width 3..12 bits, clear/EOI codes, deferred-clear streams).
# Animated GIF is the one *video* container decodable without ffmpeg,
# which puts the video leg of the pipeline (frame sampling ->
# per-frame image ops) on real pixel data. Interlaced images raise;
# frame composition replaces the frame's rectangle (disposal methods
# beyond that are ignored — documented, tests use full-frame frames).


def _lzw_decode(data: bytes, min_code_size: int) -> list[int]:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    code_size = min_code_size + 1
    table: dict[int, tuple[int, ...]] = {}
    next_code = end + 1
    out: list[int] = []
    prev: tuple[int, ...] | None = None
    bitpos, total_bits = 0, len(data) * 8
    while bitpos + code_size <= total_bits:
        # LSB-first variable-width read
        byte_i, bit_i = bitpos >> 3, bitpos & 7
        window = int.from_bytes(
            data[byte_i : byte_i + 3].ljust(3, b"\0"), "little"
        )
        code = (window >> bit_i) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = {}
            next_code = end + 1
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = (code,)
            if code >= clear:
                raise NotImplementedError("corrupt GIF LZW stream")
        elif code < clear:
            entry = (code,)
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + (prev[0],)
        else:
            raise NotImplementedError("corrupt GIF LZW stream")
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        out.extend(entry)
        prev = entry
    return out


def _lzw_encode(indices, min_code_size: int) -> bytes:
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    acc, nbits = 0, 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    code_size = min_code_size + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    emit(clear, code_size)
    w: tuple[int, ...] = ()
    for k in indices:
        k = int(k)
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], code_size)
        table[wk] = next_code
        next_code += 1
        # the decoder learns this entry one code later, so IT grows its
        # read width when ITS next_code (= ours - 1) hits 2^size; match
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code == 4096:  # table full: reset both sides
            emit(clear, code_size)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = (k,)
    if w:
        emit(table[w], code_size)
    emit(end, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Wrap raw bytes into GIF 255-byte data sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    delay_cs: int = 10,
) -> bytes:
    """Encode index-array frames (each (h, w) uint8, values indexing
    ``palette`` of shape (n<=256, 3)) as an animated GIF89a with one
    global color table. Taking indices+palette keeps encoding exact
    (no quantization step), which is what the roundtrip oracle needs."""
    if not frames:
        raise NotImplementedError("encode_gif needs at least one frame")
    h, w = frames[0].shape
    p = max(2, int(np.ceil(np.log2(max(2, len(palette))))))
    gct = np.zeros((1 << p, 3), dtype=np.uint8)
    gct[: len(palette)] = palette
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((p - 1) << 4) | (p - 1), 0, 0)
    out += gct.tobytes()
    min_code = max(2, p)
    for fr in frames:
        if fr.shape != (h, w):
            raise NotImplementedError("all GIF frames must share the canvas size")
        out += b"\x21\xf9\x04"  # graphic control extension
        out += struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(min_code)
        out += _sub_blocks(_lzw_encode(fr.ravel(), min_code))
    out += b"\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> list[np.ndarray]:
    """Decode an (animated) GIF into a list of (h, w, 3) uint8 RGB
    frames. Each frame is the full composited canvas (a frame's
    rectangle replaces that region of the previous canvas). Interlaced
    images raise NotImplementedError; transparency/disposal beyond
    replace-composition are ignored."""
    if payload is None or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF payload")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 1 << ((flags & 7) + 1)
        gct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None:
        canvas[:] = gct[_bg] if _bg < len(gct) else 0
    frames: list[np.ndarray] = []

    def skip_blocks(p: int) -> int:
        while payload[p]:
            p += payload[p] + 1
        return p + 1

    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            pos = skip_blocks(pos + 2)
            continue
        if b != 0x2C:
            raise NotImplementedError(f"unknown GIF block 0x{b:02x}")
        left, top, fw, fh, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
        pos += 10
        if iflags & 0x40:
            raise NotImplementedError("interlaced GIF not supported")
        ct = gct
        if iflags & 0x80:
            n = 1 << ((iflags & 7) + 1)
            ct = np.frombuffer(payload, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise NotImplementedError("GIF frame without any color table")
        min_code = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos]:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += ln + 1
        pos += 1
        idx = np.array(_lzw_decode(bytes(data), min_code), dtype=np.int32)
        if len(idx) < fw * fh:
            raise NotImplementedError("GIF frame pixel data truncated")
        idx = idx[: fw * fh].reshape(fh, fw)
        canvas[top : top + fh, left : left + fw] = ct[np.clip(idx, 0, len(ct) - 1)]
        frames.append(canvas.copy())
    return frames


def synth_gif_table(spark: SparkSession, n: int = 20) -> DataFrame:
    """Deterministic real-GIF corpus: id-seeded moving-block animation
    over a 6x6x6 color-cube palette, (3 + id % 5) frames each."""
    cube = np.array(
        [(r, g, b) for r in range(6) for g in range(6) for b in range(6)],
        dtype=np.int64,
    )
    palette = (cube * 51).astype(np.uint8)
    rows = []
    for i in range(n):
        w, h = 24 + i % 9, 18 + i % 7
        nf = 3 + i % 5
        frames = []
        for f in range(nf):
            y, x = np.mgrid[0:h, 0:w]
            fr = ((x + y + i + f * 3) % len(palette)).astype(np.uint8)
            bx = (i + f * 2) % max(1, w - 6)
            fr[2:6, bx : bx + 6] = (i + f) % len(palette)
            frames.append(fr)
        p = encode_gif(frames, palette)
        rows.append((i, "video", p, "image/gif", len(p)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# =====================================================================
# Real container #6: MJPEG-in-AVI video (avi.py) — synth corpus
# =====================================================================


def synth_avi_table(spark: SparkSession, n: int = 20) -> DataFrame:
    """Deterministic real-AVI corpus: per id, (2 + id % 4) FLAT-color
    JPEG frames muxed into one MJPEG AVI. Flat color keeps the lossy
    JPEG arithmetic closed-form (the ``jpeg_pixel_stats`` discipline),
    and (id + frame) parity alternates quality 75 / 4:4:4 with
    quality 90 / 4:2:0 so both subsampling paths ride inside every
    container. The recipe is mirrored verbatim by the
    ``avi_frame_stats`` oracle in plans/registry.py."""
    from lakehouse_to_rag_spark.multimodal.avi import encode_avi_mjpeg
    from lakehouse_to_rag_spark.multimodal.jpeg import encode_jpeg

    rows = []
    for i in range(n):
        w, h, nf = 9 + i % 17, 6 + i % 13, 2 + i % 4
        frames = []
        for f in range(nf):
            rgb = ((i * 37 + f * 41) % 256,
                   (i * 91 + f * 67) % 256,
                   (i * 53 + f * 29) % 256)
            px = np.full((h, w, 3), rgb, dtype=np.uint8)
            quality, sub = (75, "444") if (i + f) % 2 == 0 else (90, "420")
            frames.append(encode_jpeg(px, quality=quality, subsampling=sub))
        p = encode_avi_mjpeg(frames, fps=5 + i % 10)
        rows.append((i, "video", p, "video/x-msvideo", len(p)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# =====================================================================
# Real container #7: MJPEG-in-MP4 (ISO BMFF) video (mp4.py) — synth
# corpus
# =====================================================================


def synth_mp4_table(spark: SparkSession, n: int = 20) -> DataFrame:
    """Deterministic real-MP4 corpus: per id, (3 + id % 3) FLAT-color
    JPEG frames muxed into one MJPEG MP4 (ftyp+mdat+moov, 'mp4v'
    sample entry with JPEG OTI). Flat color keeps the lossy JPEG
    arithmetic closed-form (the ``jpeg_pixel_stats`` discipline), and
    (id + frame) parity alternates quality 80 / 4:4:4 with quality
    60 / 4:2:0 so both subsampling paths ride inside every container
    — deliberately DIFFERENT quality points from ``synth_avi_table``
    so the two containers' oracles pin different quant tables. The
    recipe is mirrored verbatim by the ``mp4_frame_stats`` oracle in
    plans/registry.py."""
    from lakehouse_to_rag_spark.multimodal.jpeg import encode_jpeg
    from lakehouse_to_rag_spark.multimodal.mp4 import encode_mp4_mjpeg

    rows = []
    for i in range(n):
        w, h, nf = 8 + i % 19, 8 + i % 11, 3 + i % 3
        frames = []
        for f in range(nf):
            rgb = ((i * 59 + f * 43) % 256,
                   (i * 83 + f * 23) % 256,
                   (i * 47 + f * 71) % 256)
            px = np.full((h, w, 3), rgb, dtype=np.uint8)
            quality, sub = (80, "444") if (i + f) % 2 == 0 else (60, "420")
            frames.append(encode_jpeg(px, quality=quality, subsampling=sub))
        p = encode_mp4_mjpeg(frames, fps=4 + i % 12)
        rows.append((i, "video", p, "video/mp4", len(p)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _bilinear_resize(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Bilinear resample via four gathers + vectorized lerp (align to
    pixel centers, the OpenCV/PIL convention). uint8 in, uint8 out."""
    h, w, ch = px.shape
    ys = (np.arange(height) + 0.5) * h / height - 0.5
    xs = (np.arange(width) + 0.5) * w / width - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    p = px.astype(np.float64)
    top = p[y0][:, x0] * (1 - wx) + p[y0][:, x1] * wx
    bot = p[y1][:, x0] * (1 - wx) + p[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def resample_audio(
    media: DataFrame, target_rate: int = 16000
) -> DataFrame:
    """Linear-interpolation resample of real WAV/FLAC payloads to
    ``target_rate`` (np.interp per channel — deterministic, no
    windowed sinc needed for pipeline plumbing); output schema = input
    schema with re-encoded payloads, so it composes like the image
    resize. Output is always 16-bit PCM WAV with the mime rewritten to
    match (a FLAC input whose rate already matches passes through
    untouched, mime intact); audio deeper than 16 bits refuses rather
    than silently clipping (fail-closed, like the image family)."""

    def _resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def _one(p: bytes) -> tuple[bytes, str | None]:
                rate, frames = decode_audio(p)
                if rate == target_rate:
                    return p, None  # pass-through, mime unchanged
                if frames.size and (
                    frames.max() > 32767 or frames.min() < -32768
                ):
                    raise NotImplementedError(
                        "resample_audio supports 16-bit audio only; "
                        "deeper FLAC streams would be silently clipped"
                    )
                n = frames.shape[0]
                m = max(1, int(round(n * target_rate / rate)))
                src_t = np.arange(n, dtype=np.float64) / rate
                dst_t = np.arange(m, dtype=np.float64) / target_rate
                chans = [
                    np.interp(dst_t, src_t, frames[:, c].astype(np.float64))
                    for c in range(frames.shape[1])
                ]
                out = np.stack(chans, axis=1)
                out = np.clip(np.floor(out + 0.5), -32768, 32767).astype(
                    np.int16
                )
                return encode_wav(out, sample_rate=target_rate), "audio/wav"

            out = pdf.copy()
            res = out["payload"].map(_one)
            out["payload"] = res.map(lambda t: t[0])
            out["mime"] = [
                m if new is None else new
                for m, new in zip(out["mime"], res.map(lambda t: t[1]))
            ]
            out["n_bytes"] = out["payload"].map(len)
            yield out

    return media.mapInPandas(_resample, schema=MEDIA_SCHEMA)
