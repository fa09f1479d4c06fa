"""Real container #6: MJPEG-in-AVI (RIFF) video — pure stdlib.

Mux/demux for the one video *container* whose frame payloads this
package can already decode end-to-end: Motion-JPEG inside a canonical
AVI RIFF file (Microsoft "AVI RIFF File Reference" — public
documentation; OpenDML/AVI 2.0 extensions are out of scope). Each
frame is a complete baseline-JFIF payload (``multimodal/jpeg.py``)
stored in a ``00dc`` chunk under the ``movi`` LIST, with a standard
``idx1`` index, so files written here open in ffmpeg/VLC players and
simple MJPEG AVIs produced elsewhere demux here.

This puts the VIDEO leg of the multimodal pipeline on a real
container + real codec: synth -> mux -> demux -> per-frame JPEG
decode -> image ops, oracle-gated end-to-end by ``avi_frame_stats``
in plans/registry.py (flat-color frames make the lossy JPEG
arithmetic exactly replayable in SQL — the ``jpeg_pixel_stats``
discipline, fanned out per frame like ``gif_frame_stats``).

Scope boundaries fail CLOSED, like every sibling codec here: exactly
ONE stream, fccType ``vids`` with an MJPG handler; audio streams,
other video codecs, OpenDML ``indx``/``RIFF AVIX`` spanning, and
``rec `` interleave grouping raise NotImplementedError naming the
reason; truncated or structurally corrupt payloads raise
NotImplementedError, never struct.error/IndexError.

Reference parity note: the reference pipeline stores scraped media as
opaque objects (src/scraper/scraper.py:155-192); video decode is an
extension surface per SURVEY §2.13 (multimodal), not a reference
behavior.
"""

from __future__ import annotations

import struct

_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010
_MJPG_HANDLERS = (b"MJPG", b"mjpg", b"dmb1", b"DMB1")


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(frames: list[bytes], fps: int = 10) -> bytes:
    """Mux pre-encoded JPEG payloads into a single-stream MJPEG AVI.

    Every frame must be a decodable JPEG with identical dimensions
    (the AVI stream header carries ONE frame size); the muxer never
    touches pixel data, so mux->demux returns the input payloads
    byte-identically.
    """
    from lakehouse_to_rag_spark.multimodal.jpeg import jpeg_dimensions

    if not frames:
        raise NotImplementedError("empty MJPEG frame list")
    if fps <= 0:
        raise NotImplementedError("AVI fps must be positive")
    dims = [jpeg_dimensions(f) for f in frames]  # raises on non-JPEG
    w, h = dims[0]
    if any(d != (w, h) for d in dims):
        raise NotImplementedError(
            "MJPEG AVI requires constant frame dimensions"
        )
    n, maxf = len(frames), max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        maxf * fps,        # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        _AVIF_HASINDEX,
        n,                 # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        maxf,              # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHH8I4h",
        b"vids", b"MJPG",
        0, 0, 0,           # dwFlags, wPriority, wLanguage
        0,                 # dwInitialFrames
        1, fps,            # dwScale / dwRate = frame rate
        0, n,              # dwStart, dwLength (frames)
        maxf,              # dwSuggestedBufferSize
        10_000,            # dwQuality (driver scale 0..10000)
        0,                 # dwSampleSize (0 = variable, one frame/chunk)
        0, 0, w, h,        # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b""
    idx = []
    for f in frames:
        # idx1 offsets are movi-relative: from the position of the
        # 'movi' fourcc to the chunk's ckid (first chunk -> 4)
        idx.append(
            struct.pack("<4s3I", b"00dc", _AVIIF_KEYFRAME,
                        4 + len(movi_body), len(f))
        )
        movi_body += _chunk(b"00dc", f)
    riff_body = (
        b"AVI " + hdrl + _list(b"movi", movi_body)
        + _chunk(b"idx1", b"".join(idx))
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _walk(d: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for the chunks of one
    RIFF list level. Chunk bodies are even-padded; a declared size
    that overruns the level is corruption and raises."""
    while pos + 8 <= end:
        fourcc = d[pos:pos + 4]
        (size,) = struct.unpack_from("<I", d, pos + 4)
        body = pos + 8
        if body + size > end:
            raise NotImplementedError(
                f"truncated AVI chunk {fourcc!r} (declared {size} bytes past "
                "the end of its list)"
            )
        yield fourcc, body, size
        pos = body + size + (size & 1)


def _parse_hdrl(d: bytes, body: int, size: int):
    """-> (width, height, n_frames, fps) after enforcing the
    single-stream MJPEG scope contract."""
    avih = strh = strf = None
    for fourcc, b2, s2 in _walk(d, body, body + size):
        if fourcc == b"avih":
            avih = struct.unpack_from("<14I", d, b2)
        elif fourcc == b"LIST" and d[b2:b2 + 4] == b"strl":
            for ck, b3, s3 in _walk(d, b2 + 4, b2 + s2):
                if ck == b"strh":
                    strh = struct.unpack_from("<4s4sIHH8I4h", d, b3)
                elif ck == b"strf":
                    strf = struct.unpack_from("<IiiHH4s", d, b3)
    if avih is None or strh is None or strf is None:
        raise NotImplementedError("AVI hdrl missing avih/strh/strf")
    if avih[6] != 1:
        raise NotImplementedError(
            f"AVI with {avih[6]} streams unsupported (audio/extra video "
            "streams need ffmpeg); only single-stream MJPEG is in scope"
        )
    if strh[0] != b"vids":
        raise NotImplementedError(
            f"AVI stream type {strh[0]!r} unsupported (only 'vids' MJPEG)"
        )
    if strh[1] not in _MJPG_HANDLERS or strf[5] not in _MJPG_HANDLERS:
        raise NotImplementedError(
            f"AVI video codec {strh[1]!r}/{strf[5]!r} needs ffmpeg; only "
            "MJPG is decodable here"
        )
    w, h, n = avih[8], avih[9], avih[4]
    if (strf[1], abs(strf[2])) != (w, h):
        raise NotImplementedError(
            "AVI avih and strf disagree on frame dimensions"
        )
    scale, rate = strh[6], strh[7]
    if scale == 0 or rate == 0:
        raise NotImplementedError("AVI stream header has zero scale/rate")
    return w, h, n, rate / scale


def _parse(payload: bytes, want_frames: bool):
    if (
        payload is None
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"AVI "
    ):
        raise NotImplementedError("not an AVI payload")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if 8 + riff_size > len(payload):
        raise NotImplementedError("truncated AVI RIFF payload")
    end = 8 + riff_size
    header = None
    frames: list[tuple[int, int]] = []  # (body_start, size) of 00dc chunks
    movi_pos = None
    idx1 = None
    for fourcc, body, size in _walk(payload, 12, end):
        if fourcc == b"LIST" and payload[body:body + 4] == b"hdrl":
            header = _parse_hdrl(payload, body + 4, size - 4)
        elif fourcc == b"LIST" and payload[body:body + 4] == b"movi":
            movi_pos = body
            if not want_frames:
                continue
            for ck, b2, s2 in _walk(payload, body + 4, body + size):
                if ck in (b"00dc", b"00db"):
                    frames.append((b2, s2))
                elif ck == b"JUNK":  # alignment padding, spec-blessed
                    continue
                elif ck == b"LIST" and payload[b2:b2 + 4] == b"rec ":
                    raise NotImplementedError(
                        "'rec ' interleave grouping unsupported (implies "
                        "multi-stream interleave; single-stream scope)"
                    )
                else:
                    raise NotImplementedError(
                        f"unexpected movi chunk {ck!r} in single-stream "
                        "MJPEG AVI"
                    )
        elif fourcc == b"idx1":
            idx1 = (body, size)
    if header is None:
        raise NotImplementedError("AVI payload has no hdrl header list")
    if not want_frames:
        return header, None
    if movi_pos is None:
        raise NotImplementedError("AVI payload has no movi list")
    if header[2] != len(frames):
        raise NotImplementedError(
            f"AVI header declares {header[2]} frames but movi holds "
            f"{len(frames)}"
        )
    if idx1 is not None:
        _verify_idx1(payload, idx1, frames, movi_pos)
    out = []
    for b2, s2 in frames:
        f = payload[b2:b2 + s2]
        if f[:2] != b"\xff\xd8":
            raise NotImplementedError(
                "AVI '00dc' chunk is not a JPEG payload (non-MJPEG data)"
            )
        out.append(f)
    return header, out


def _verify_idx1(
    d: bytes, idx1: tuple[int, int], frames: list[tuple[int, int]],
    movi_pos: int,
) -> None:
    """Cross-check idx1 against the movi walk. Both offset
    conventions in the wild are accepted — movi-relative (offset from
    the 'movi' fourcc; the spec's wording) and absolute file offsets
    (what several mainstream writers emit) — but the index must agree
    with the walk under ONE of them, or the file is corrupt."""
    body, size = idx1
    if size % 16:
        raise NotImplementedError("AVI idx1 size is not a multiple of 16")
    entries = [
        struct.unpack_from("<4s3I", d, body + i * 16)
        for i in range(size // 16)
    ]
    data = [e for e in entries if e[0] in (b"00dc", b"00db")]
    if len(data) != len(frames):
        raise NotImplementedError(
            f"AVI idx1 indexes {len(data)} frame chunks but movi holds "
            f"{len(frames)}"
        )
    for (ckid, _flags, off, ln), (b2, s2) in zip(data, frames):
        # chunk ckid position under each convention
        rel_ok = movi_pos + off == b2 - 8 and ln == s2
        abs_ok = off == b2 - 8 and ln == s2
        if not (rel_ok or abs_ok):
            raise NotImplementedError(
                "AVI idx1 disagrees with the movi chunk walk "
                f"(entry {ckid!r} offset {off}, length {ln})"
            )


def decode_avi_mjpeg(payload: bytes) -> list[bytes]:
    """Demux an MJPEG AVI into its JPEG frame payloads (byte-exact —
    feed each to ``jpeg.decode_jpeg`` for pixels). idx1, when present,
    is verified against the movi walk; any disagreement raises."""
    try:
        _header, frames = _parse(payload, want_frames=True)
    except (struct.error, IndexError, ValueError) as exc:
        raise NotImplementedError(f"corrupt AVI payload: {exc}") from exc
    return frames


def avi_info(payload: bytes) -> tuple[int, int, int, float]:
    """(width, height, n_frames, fps) from the hdrl header alone —
    no frame demux, honoring decode_metadata's header-only contract."""
    try:
        header, _ = _parse(payload, want_frames=False)
    except (struct.error, IndexError, ValueError) as exc:
        raise NotImplementedError(f"corrupt AVI payload: {exc}") from exc
    return header
