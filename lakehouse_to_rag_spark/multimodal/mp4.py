"""Real container #7: Motion-JPEG in MP4 (ISO BMFF) — pure stdlib.

Mux/demux for Motion-JPEG inside an ISO base-media file (ISO/IEC
14496-12, the public MP4 spec) — the second video container whose
frame payloads this package decodes end-to-end with its own baseline
JPEG codec (``multimodal/jpeg.py``). The writer emits the canonical
``ftyp`` + ``mdat`` + ``moov`` layout with an ``mp4v`` visual sample
entry whose ``esds`` declares ObjectTypeIndication 0x6C (JPEG, per
the MP4 registration authority) — the same mapping ffmpeg uses when
muxing mjpeg into .mp4 — so files written here open in mainstream
players, and simple MJPEG MP4s produced elsewhere demux here. The
reader additionally accepts the QuickTime-style ``jpeg`` sample
entry, general ``stsc`` sample-to-chunk runs (not just the writer's
one-sample-per-chunk layout), and 64-bit ``co64`` chunk offsets.

This completes the honest closure of the "MP4 needs ffmpeg" stub:
synth -> mux -> demux -> per-frame JPEG decode -> image ops,
oracle-gated end-to-end by ``mp4_frame_stats`` in plans/registry.py
(flat-color frames make the lossy JPEG arithmetic exactly replayable
in SQL — the ``jpeg_pixel_stats`` discipline, fanned out per frame
like ``gif_frame_stats``/``avi_frame_stats``).

Scope boundaries fail CLOSED, like every sibling codec here: exactly
ONE track, handler ``vide``, sample entry ``jpeg`` or ``mp4v`` with
OTI 0x6C; audio tracks, other codecs (``avc1``/``hev1``/…),
fragmented files (``moof``), edit lists that re-time samples, and
encrypted tracks raise NotImplementedError naming the reason;
truncated or structurally corrupt payloads raise
NotImplementedError, never struct.error/IndexError. Every sample's
byte range is verified to lie inside an ``mdat`` box and to start
with the JPEG SOI marker, so a stale ``stco``/``stsz`` table is
corruption, not garbage pixels.

Reference parity note: the reference pipeline stores scraped media as
opaque objects (src/scraper/scraper.py:155-192); video decode is an
extension surface per SURVEY §2.13 (multimodal), not a reference
behavior.
"""

from __future__ import annotations

import struct

_VIDEO_BRANDS = (b"isom", b"mp41", b"mp42", b"qt  ", b"avc1", b"iso2")
_JPEG_OTI = 0x6C  # MP4RA ObjectTypeIndication: JPEG (ISO/IEC 10918-1)


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + body)


def _mpeg4_desc(tag: int, body: bytes) -> bytes:
    """MPEG-4 expandable-length descriptor (ISO 14496-1 §8.3.3).
    Our bodies are tiny, so one length byte suffices; the PARSER
    accepts the multi-byte 0x80-continued form writers like ffmpeg
    emit."""
    assert len(body) < 128
    return bytes([tag, len(body)]) + body


def _esds_jpeg() -> bytes:
    """ES_Descriptor declaring a JPEG visual stream: DecoderConfig
    OTI 0x6C, streamType 4 (visual), plus the mandatory SLConfig
    (predefined 2 = MP4 reserved)."""
    dcd = _mpeg4_desc(
        0x04,
        struct.pack(">BB3xII", _JPEG_OTI, (4 << 2) | 1, 0, 0),
    )
    slc = _mpeg4_desc(0x06, b"\x02")
    es = _mpeg4_desc(0x03, struct.pack(">HB", 1, 0) + dcd + slc)
    return _full(b"esds", 0, 0, es)


def encode_mp4_mjpeg(frames: list[bytes], fps: int = 10) -> bytes:
    """Mux pre-encoded JPEG payloads into a single-track MJPEG MP4.

    Every frame must be a decodable JPEG with identical dimensions
    (the visual sample entry carries ONE frame size); the muxer never
    touches pixel data, so mux->demux returns the input payloads
    byte-identically. Layout is ``ftyp`` + ``mdat`` + ``moov`` with
    one sample per chunk and 32-bit ``stco`` offsets.
    """
    from lakehouse_to_rag_spark.multimodal.jpeg import jpeg_dimensions

    if not frames:
        raise NotImplementedError("empty MJPEG frame list")
    if fps <= 0:
        raise NotImplementedError("MP4 fps must be positive")
    dims = [jpeg_dimensions(f) for f in frames]  # raises on non-JPEG
    w, h = dims[0]
    if any(d != (w, h) for d in dims):
        raise NotImplementedError(
            "MJPEG MP4 requires constant frame dimensions"
        )
    n = len(frames)
    timescale = fps  # 1 tick per frame: stts delta 1, duration n
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isommp41")
    mdat = _box(b"mdat", b"".join(frames))
    # absolute offsets of each sample (one sample per chunk)
    base = len(ftyp) + 8
    offs = []
    pos = base
    for f in frames:
        offs.append(pos)
        pos += len(f)

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, n)          # times, dur
        + struct.pack(">IH2xII", 0x00010000, 0x0100, 0, 0)  # rate, vol
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)                           # unity matrix
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0)              # predefined
        + struct.pack(">I", 2),                             # next track
    )
    # ISO 14496-12 8.3.2 v0 body (80 bytes): creation, modification,
    # track_ID, reserved(4), duration, reserved(8), layer,
    # alternate_group, volume (0 for video), reserved(2), matrix,
    # 16.16 width/height.  (Round-6 ADVICE fix: the prior pack put
    # duration in the reserved slot and dropped the volume pair,
    # misaligning matrix/width/height for conforming parsers.)
    tkhd = _full(
        b"tkhd", 0, 3,  # flags: enabled | in-movie
        struct.pack(">III4xI8xHHH2x", 0, 0, 1, n, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                      0x40000000)
        + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, timescale, n, 0x55C4, 0),  # 'und'
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I4s3I", 0, b"vide", 0, 0, 0) + b"MJPEG video\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0,
                 struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)
    sample_entry = _box(
        b"mp4v",
        struct.pack(">6xH", 1)                      # data_reference_index
        + struct.pack(">HH3I", 0, 0, 0, 0, 0)       # predefined/reserved
        + struct.pack(">HHIIIH", w, h, 0x00480000, 0x00480000, 0, 1)
        + b"\x00" * 32                              # compressorname
        + struct.pack(">Hh", 24, -1)                # depth, color table
        + _esds_jpeg(),
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _full(
        b"stco", 0, 0,
        struct.pack(">I", n) + b"".join(struct.pack(">I", o) for o in offs),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _walk(d: bytes, pos: int, end: int, top_level: bool = False):
    """Yield (fourcc, body_start, body_end) for one box level.
    Accepts 64-bit largesize boxes; size 0 (box extends to EOF) is
    honored ONLY when ``top_level`` — ISO 14496-12 permits it solely
    for the final top-level box, so a zero-size box at any nested
    level is corruption and fails closed instead of silently
    swallowing its sibling boxes (round-6 ADVICE fix). A declared
    size that overruns the level is corruption and raises."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", d, pos)
        fourcc = d[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize follows
            if body + 8 > end:
                raise NotImplementedError("truncated MP4 largesize box")
            (size,) = struct.unpack_from(">Q", d, body)
            body += 8
            size -= 8
        elif size == 0:  # to end of enclosing scope
            if not top_level:
                raise NotImplementedError(
                    f"zero-size MP4 box {fourcc!r} below top level "
                    "(spec allows it only for the final top-level box)"
                )
            size = end - pos
        if size < body - pos or pos + size > end:
            raise NotImplementedError(
                f"truncated MP4 box {fourcc!r} (declared {size} bytes past "
                "the end of its container)"
            )
        yield fourcc, body, pos + size
        pos += size


def _child(d: bytes, pos: int, end: int, fourcc: bytes):
    for fc, b, e in _walk(d, pos, end):
        if fc == fourcc:
            return b, e
    return None


def _parse_esds_oti(d: bytes, pos: int, end: int) -> int:
    """ObjectTypeIndication from an esds box body (after the
    FullBox header). Parses the expandable-length descriptor form
    (any number of 0x80-continued length bytes)."""
    def read_desc(p):
        if p >= end:
            raise NotImplementedError("truncated esds descriptor")
        tag = d[p]
        p += 1
        ln = 0
        for _ in range(4):
            if p >= end:
                raise NotImplementedError("truncated esds length")
            b = d[p]
            p += 1
            ln = (ln << 7) | (b & 0x7F)
            if not b & 0x80:
                break
        return tag, p, ln

    tag, p, ln = read_desc(pos)
    if tag != 0x03:
        raise NotImplementedError("esds does not start with ES_Descriptor")
    # ES_ID(2) + flags(1); stream-dependence/URL flags add fields we
    # don't expect from any MJPEG writer
    flags = d[p + 2]
    if flags & 0xE0:
        raise NotImplementedError("esds ES_Descriptor with optional fields")
    p += 3
    while p < end:
        tag, q, ln = read_desc(p)
        if tag == 0x04:  # DecoderConfigDescriptor: OTI is byte 0
            return d[q]
        p = q + ln
    raise NotImplementedError("esds has no DecoderConfigDescriptor")


def _parse_stbl(d: bytes, pos: int, end: int):
    """-> (width, height, sizes, offsets, stts_entries) after
    enforcing the MJPEG sample-entry scope."""
    r = _child(d, pos, end, b"stsd")
    if r is None:
        raise NotImplementedError("MP4 stbl missing stsd")
    b, e = r
    (count,) = struct.unpack_from(">I", d, b + 4)
    if count != 1:
        raise NotImplementedError(
            f"MP4 stsd with {count} sample entries unsupported"
        )
    entries = list(_walk(d, b + 8, e))
    fmt, sb, se = entries[0]
    if fmt not in (b"mp4v", b"jpeg"):
        raise NotImplementedError(
            f"MP4 video codec {fmt!r} needs ffmpeg; only MJPEG "
            "('jpeg' sample entry or 'mp4v' with JPEG OTI) is decodable "
            "here"
        )
    # VisualSampleEntry: 6 reserved + dref index, 16 predefined bytes,
    # then width/height at offset 24
    w, h = struct.unpack_from(">HH", d, sb + 24)
    if fmt == b"mp4v":
        r = _child(d, sb + 78, se, b"esds")
        if r is None:
            raise NotImplementedError("mp4v sample entry missing esds")
        eb, ee = r
        oti = _parse_esds_oti(d, eb + 4, ee)
        if oti != _JPEG_OTI:
            raise NotImplementedError(
                f"mp4v ObjectTypeIndication 0x{oti:02X} needs ffmpeg; "
                "only JPEG (0x6C) is decodable here"
            )

    r = _child(d, pos, end, b"stsz")
    if r is None:
        raise NotImplementedError("MP4 stbl missing stsz")
    b, e = r
    fixed, n = struct.unpack_from(">II", d, b + 4)
    if fixed:
        sizes = [fixed] * n
    else:
        if b + 12 + 4 * n > e:
            raise NotImplementedError("truncated MP4 stsz table")
        sizes = list(struct.unpack_from(f">{n}I", d, b + 12))

    co = _child(d, pos, end, b"stco")
    if co is not None:
        b, e = co
        (nc,) = struct.unpack_from(">I", d, b + 4)
        if b + 8 + 4 * nc > e:
            raise NotImplementedError("truncated MP4 stco table")
        chunk_offs = list(struct.unpack_from(f">{nc}I", d, b + 8))
    else:
        co = _child(d, pos, end, b"co64")
        if co is None:
            raise NotImplementedError("MP4 stbl missing stco/co64")
        b, e = co
        (nc,) = struct.unpack_from(">I", d, b + 4)
        if b + 8 + 8 * nc > e:
            raise NotImplementedError("truncated MP4 co64 table")
        chunk_offs = list(struct.unpack_from(f">{nc}Q", d, b + 8))

    r = _child(d, pos, end, b"stsc")
    if r is None:
        raise NotImplementedError("MP4 stbl missing stsc")
    b, e = r
    (nr,) = struct.unpack_from(">I", d, b + 4)
    if b + 8 + 12 * nr > e:
        raise NotImplementedError("truncated MP4 stsc table")
    runs = [
        struct.unpack_from(">III", d, b + 8 + 12 * i) for i in range(nr)
    ]
    # expand stsc runs -> samples-per-chunk for each chunk, then
    # per-sample absolute offsets (within-chunk position = sum of the
    # preceding samples' stsz sizes — ISO 14496-12 §8.7.4/8.7.5)
    offsets: list[int] = []
    si = 0
    for ri, (first, per, _desc_idx) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else len(chunk_offs)
        if first < 1 or last < first - 1:
            raise NotImplementedError("MP4 stsc runs are not ascending")
        for ci in range(first - 1, last):
            at = chunk_offs[ci]
            for _ in range(per):
                if si >= n:
                    break
                offsets.append(at)
                at += sizes[si]
                si += 1
    if si != n:
        raise NotImplementedError(
            f"MP4 stsc/stco map {si} samples but stsz declares {n}"
        )

    r = _child(d, pos, end, b"stts")
    if r is None:
        raise NotImplementedError("MP4 stbl missing stts")
    b, e = r
    (nt,) = struct.unpack_from(">I", d, b + 4)
    stts = [struct.unpack_from(">II", d, b + 8 + 8 * i) for i in range(nt)]
    if sum(c for c, _ in stts) != n:
        raise NotImplementedError("MP4 stts sample count disagrees with stsz")
    return w, h, sizes, offsets, stts


def _parse(payload: bytes, want_frames: bool):
    if payload is None or len(payload) < 12 or payload[4:8] != b"ftyp":
        raise NotImplementedError("not an MP4 payload")
    end = len(payload)
    moov = None
    mdats: list[tuple[int, int]] = []
    for fourcc, body, bend in _walk(payload, 0, end, top_level=True):
        if fourcc == b"moov":
            moov = (body, bend)
        elif fourcc == b"mdat":
            mdats.append((body, bend))
        elif fourcc in (b"moof", b"sidx", b"styp"):
            raise NotImplementedError(
                "fragmented MP4 (moof/sidx) unsupported; only plain "
                "moov+mdat files are in scope"
            )
    if moov is None:
        raise NotImplementedError("MP4 payload has no moov box")
    mb, me = moov

    traks = [(b, e) for fc, b, e in _walk(payload, mb, me) if fc == b"trak"]
    if len(traks) != 1:
        raise NotImplementedError(
            f"MP4 with {len(traks)} tracks unsupported (audio/extra video "
            "tracks need ffmpeg); only single-track MJPEG is in scope"
        )
    tb, te = traks[0]
    r = _child(payload, tb, te, b"mdia")
    if r is None:
        raise NotImplementedError("MP4 trak missing mdia")
    db, de = r
    r = _child(payload, db, de, b"hdlr")
    if r is None:
        raise NotImplementedError("MP4 mdia missing hdlr")
    hb, _he = r
    handler = payload[hb + 8:hb + 12]
    if handler != b"vide":
        raise NotImplementedError(
            f"MP4 handler {handler!r} unsupported (only 'vide' MJPEG)"
        )
    r = _child(payload, db, de, b"mdhd")
    if r is None:
        raise NotImplementedError("MP4 mdia missing mdhd")
    hb, _he = r
    version = payload[hb]
    if version == 0:
        timescale, = struct.unpack_from(">I", payload, hb + 12)
    elif version == 1:
        timescale, = struct.unpack_from(">I", payload, hb + 20)
    else:
        raise NotImplementedError(f"MP4 mdhd version {version}")
    if timescale == 0:
        raise NotImplementedError("MP4 mdhd has zero timescale")
    r = _child(payload, tb, te, b"edts")
    if r is not None:
        raise NotImplementedError(
            "MP4 edit lists (edts) re-time samples; unsupported"
        )
    r = _child(payload, db, de, b"minf")
    if r is None:
        raise NotImplementedError("MP4 mdia missing minf")
    nb, ne = r
    r = _child(payload, nb, ne, b"stbl")
    if r is None:
        raise NotImplementedError("MP4 minf missing stbl")
    w, h, sizes, offsets, stts = _parse_stbl(payload, r[0], r[1])

    # fps from the (single-rate) stts: timescale ticks/s over the
    # first run's per-sample delta. Variable frame rate is real MP4
    # but meaningless for frame STATS; report the dominant rate.
    delta = stts[0][1] if stts else 1
    if delta == 0:
        raise NotImplementedError("MP4 stts has zero sample delta")
    header = (int(w), int(h), len(sizes), timescale / delta)
    if not want_frames:
        return header, None

    out = []
    for off, size in zip(offsets, sizes):
        if not any(b <= off and off + size <= e for b, e in mdats):
            raise NotImplementedError(
                f"MP4 sample [{off}, {off + size}) lies outside every mdat "
                "box (stale stco/stsz table)"
            )
        f = payload[off:off + size]
        if f[:2] != b"\xff\xd8":
            raise NotImplementedError(
                "MP4 sample is not a JPEG payload (non-MJPEG data)"
            )
        out.append(f)
    return header, out


def decode_mp4_mjpeg(payload: bytes) -> list[bytes]:
    """Demux an MJPEG MP4 into its JPEG frame payloads (byte-exact —
    feed each to ``jpeg.decode_jpeg`` for pixels). Every sample range
    is bounds-checked against the mdat boxes and must start with the
    JPEG SOI marker; any disagreement raises."""
    try:
        _header, frames = _parse(payload, want_frames=True)
    except (struct.error, IndexError, ValueError) as exc:
        raise NotImplementedError(f"corrupt MP4 payload: {exc}") from exc
    return frames


def mp4_info(payload: bytes) -> tuple[int, int, int, float]:
    """(width, height, n_frames, fps) from the moov metadata alone —
    no sample reads, honoring decode_metadata's header-only
    contract."""
    try:
        header, _ = _parse(payload, want_frames=False)
    except (struct.error, IndexError, ValueError) as exc:
        raise NotImplementedError(f"corrupt MP4 payload: {exc}") from exc
    return header
