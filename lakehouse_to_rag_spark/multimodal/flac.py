"""Real codec #5: FLAC (Free Lossless Audio Codec) — pure stdlib.

Implements the published FLAC format (xiph.org format spec, now also
RFC 9639): STREAMINFO parsing, frame headers with all block-size /
sample-rate / sample-size code variants, CONSTANT / VERBATIM / FIXED
(orders 0-4) / LPC subframes, Rice residual coding (both 4- and 5-bit
parameter methods, escape partitions, multi-partition layouts), wasted
bits, all four channel layouts (independent, left/side, right/side,
mid/side), and the three integrity checks the spec mandates (frame
header CRC-8, whole-frame CRC-16, stream MD5).

This closes the "compressed audio is impossible without codec libs"
stub honestly, the same way ``jpeg.py`` did for DCT images: FLAC's
arithmetic is integer-exact by design (lossless), so a decoded stream
is bit-identical to the encoder input and every downstream statistic
is reproducible by a closed-form SQL oracle on the synthesis recipe.

The companion encoder emits a deterministic spec-subset stream
(16-bit, mono independent or stereo mid/side, fixed block size) that
deliberately rotates through CONSTANT / FIXED / LPC / VERBATIM
subframes so a round-trip exercises every decoder path. Scope
boundaries fail CLOSED: anything outside the implemented surface
(reserved codes, corrupt payloads, CRC/MD5 mismatches) raises
NotImplementedError with the reason — never a silently wrong sample.

Reference parity note: the reference pipeline stores scraped media as
opaque objects (src/scraper/scraper.py:155-192); decode is an
extension surface per SURVEY §2.13 (multimodal), not a reference
behavior.
"""

from __future__ import annotations

import hashlib

import numpy as np

# ------------------------------------------------------------- bit IO


class _BitWriter:
    """MSB-first bit accumulator (FLAC is big-endian at the bit level)."""

    def __init__(self) -> None:
        self._buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._buf.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_unary(self, q: int) -> None:
        """q zero bits then a one bit (Rice quotient form)."""
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def getvalue(self) -> bytes:
        assert self._nbits == 0, "unaligned frame"
        return bytes(self._buf)


class _BitReader:
    def __init__(self, data: bytes, pos_bytes: int = 0) -> None:
        self._d = data
        self._pos = pos_bytes * 8  # absolute bit position

    @property
    def byte_pos(self) -> int:
        assert self._pos % 8 == 0
        return self._pos // 8

    def read(self, nbits: int) -> int:
        end = self._pos + nbits
        if end > len(self._d) * 8:
            raise NotImplementedError("truncated FLAC bitstream")
        v = 0
        pos = self._pos
        while nbits:
            byte = self._d[pos >> 3]
            avail = 8 - (pos & 7)
            take = min(avail, nbits)
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            nbits -= take
        self._pos = pos
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >> (nbits - 1) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self._pos = (self._pos + 7) & ~7


# ----------------------------------------------------------- checksums


def _crc8(data: bytes) -> int:
    """CRC-8 poly x^8+x^2+x+1 (0x07), init 0 — the frame-header CRC."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 poly x^16+x^15+x^2+1 (0x8005), init 0 — the frame CRC."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                (crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1
            ) & 0xFFFF
    return crc


# ------------------------------------------- UTF-8-style frame numbers


def _utf8_encode_num(n: int) -> bytes:
    """FLAC's UTF-8-like variable-length integer (up to 36 bits)."""
    if n < 0x80:
        return bytes([n])
    for nbytes in range(2, 8):
        if n < (1 << (1 + 5 * nbytes)):
            lead = (0xFF << (8 - nbytes)) & 0xFF
            out = [lead | (n >> (6 * (nbytes - 1)))]
            for i in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise NotImplementedError("frame number exceeds 36 bits")


def _utf8_decode_num(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    mask = 0x80
    while b0 & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 2 or nbytes > 7:
        raise NotImplementedError("malformed FLAC frame number")
    n = b0 & (0xFF >> (nbytes + 1))
    for _ in range(nbytes - 1):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise NotImplementedError("malformed FLAC frame number")
        n = (n << 6) | (c & 0x3F)
    return n


# ------------------------------------------------------------- tables

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


# ------------------------------------------------------------- encoder


def encode_flac(
    samples: np.ndarray, sample_rate: int = 8000, block_size: int = 4096
) -> bytes:
    """Encode an (n,) mono or (n, 2) stereo int16 array as a legal
    FLAC stream. Deterministic: fixed-blocksize strategy; stereo uses
    mid/side decorrelation; per block the subframe type rotates
    (all-equal -> CONSTANT; block%5==4 -> VERBATIM; block%3==2 -> LPC
    order 1 with coefficient 1, arithmetically identical to FIXED
    order 1; otherwise FIXED order 2) so decode round-trips cover
    every subframe kind. Residuals are Rice method 0, partition order
    0, parameter fitted to the block's mean zig-zag magnitude."""
    if samples.dtype != np.int16:
        raise NotImplementedError("encode_flac takes int16 PCM samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    if ch not in (1, 2):
        raise NotImplementedError("encode_flac supports 1 or 2 channels")
    if not 16 <= block_size <= 32768:
        raise NotImplementedError("block_size outside FLAC's 16..32768")
    bps = 16
    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()

    out = bytearray(b"fLaC")
    # STREAMINFO (metadata block type 0, last-metadata flag set)
    si = _BitWriter()
    si.write(block_size, 16)  # min block size
    si.write(block_size, 16)  # max block size
    si.write(0, 24)  # min frame size unknown
    si.write(0, 24)  # max frame size unknown
    si.write(sample_rate, 20)
    si.write(ch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.getvalue() + md5
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for frame_no, start in enumerate(range(0, n, block_size)):
        blk = samples[start : start + block_size].astype(np.int64)
        out += _encode_frame(
            blk, frame_no, block_size, sample_rate, ch, bps
        )
    return bytes(out)


def _encode_frame(blk, frame_no, nominal_bs, sample_rate, ch, bps) -> bytes:
    nb = len(blk)
    w = _BitWriter()
    w.write(0b11111111111110, 14)  # sync
    w.write(0, 1)  # reserved
    w.write(0, 1)  # fixed-blocksize strategy (number = frame index)
    # block size code: common power-of-two table, else explicit 16-bit
    bs_tail = b""
    if nb == nominal_bs and nb in (
        256, 512, 1024, 2048, 4096, 8192, 16384, 32768
    ):
        w.write(8 + (nb.bit_length() - 9), 4)
    else:
        w.write(0b0111, 4)
        bs_tail = (nb - 1).to_bytes(2, "big")
    w.write(0, 4)  # sample rate: from STREAMINFO
    w.write(0b1010 if ch == 2 else 0, 4)  # mid/side or mono
    w.write(0b100, 3)  # 16-bit samples
    w.write(0, 1)  # reserved
    header = w.getvalue() + _utf8_encode_num(frame_no) + bs_tail
    header += bytes([_crc8(header)])

    body = _BitWriter()
    if ch == 2:
        left, right = blk[:, 0], blk[:, 1]
        mid = (left + right) >> 1
        side = left - right
        _encode_subframe(body, mid, bps, frame_no)
        _encode_subframe(body, side, bps + 1, frame_no)
    else:
        _encode_subframe(body, blk[:, 0], bps, frame_no)
    body.align()
    frame = header + body.getvalue()
    return frame + _crc16(frame).to_bytes(2, "big")


def _encode_subframe(w: _BitWriter, s, bps: int, frame_no: int) -> None:
    nb = len(s)
    if np.all(s == s[0]):
        w.write(0, 1)
        w.write(0b000000, 6)  # CONSTANT
        w.write(0, 1)  # no wasted bits
        w.write(int(s[0]), bps)
        return
    if frame_no % 5 == 4 or nb < 4:
        w.write(0, 1)
        w.write(0b000001, 6)  # VERBATIM
        w.write(0, 1)
        for v in s:
            w.write(int(v), bps)
        return
    if frame_no % 3 == 2:
        # LPC order 1, coefficient 1, shift 0: predictor s[i-1] — the
        # arithmetic twin of FIXED order 1, through the LPC path
        order, shift, precision, coeffs = 1, 0, 15, [1]
        w.write(0, 1)
        w.write(0b100000 | (order - 1), 6)
        w.write(0, 1)
        for v in s[:order]:
            w.write(int(v), bps)
        w.write(precision - 1, 4)
        w.write(shift, 5)
        for c in coeffs:
            w.write(c, precision)
        resid = s[order:] - s[order - 1 : -1]
    else:
        order = 2
        w.write(0, 1)
        w.write(0b001000 | order, 6)  # FIXED order 2
        w.write(0, 1)
        for v in s[:order]:
            w.write(int(v), bps)
        resid = s[2:] - 2 * s[1:-1] + s[:-2]
    # Rice: method 0, partition order 0, fitted parameter
    zig = np.where(resid >= 0, 2 * resid, -2 * resid - 1)
    mean = int(zig.mean()) if len(zig) else 0
    param = min(max(mean.bit_length() - 1, 0), 14)
    w.write(0b00, 2)
    w.write(0, 4)
    w.write(param, 4)
    for u in zig:
        u = int(u)
        w.write_unary(u >> param)
        w.write(u, param)


# ------------------------------------------------------------- decoder


def flac_streaminfo(payload: bytes) -> tuple[int, int, int]:
    """(sample_rate, n_channels, total_samples) from the fixed 34-byte
    STREAMINFO block alone — the header-only metadata path
    (``ops._parse_header`` contract: no sample decode). Raises the
    family's NotImplementedError on anything that is not a FLAC
    stream with a leading STREAMINFO."""
    if payload is None or payload[:4] != b"fLaC":
        raise NotImplementedError("not a FLAC payload")
    if len(payload) < 4 + 4 + 34 or (payload[4] & 0x7F) != 0:
        raise NotImplementedError("FLAC stream missing leading STREAMINFO")
    b = payload[8:42]
    rate = (b[10] << 12) | (b[11] << 4) | (b[12] >> 4)
    ch = ((b[12] >> 1) & 0x7) + 1
    total = ((b[13] & 0x0F) << 32) | int.from_bytes(b[14:18], "big")
    return rate, ch, total


def decode_flac(payload: bytes) -> tuple[int, np.ndarray]:
    """Decode a FLAC stream into (sample_rate, (n, ch) int32 array).
    Verifies every frame's CRC-8/CRC-16 and, when the STREAMINFO
    carries a non-zero MD5 and a byte-aligned bit depth, the stream
    MD5 — any mismatch raises NotImplementedError (corrupt payloads
    fail closed, same contract as the JPEG/PNG/GIF codecs)."""
    if payload is None or payload[:4] != b"fLaC":
        raise NotImplementedError("not a FLAC payload")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise NotImplementedError("truncated FLAC metadata")
        head = payload[pos]
        blen = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        btype, last = head & 0x7F, bool(head & 0x80)
        body = payload[pos + 4 : pos + 4 + blen]
        pos += 4 + blen
        if btype == 0:
            if blen != 34:
                raise NotImplementedError("malformed STREAMINFO")
            r = _BitReader(body)
            r.read(16)  # min block size
            r.read(16)  # max block size
            r.read(24)
            r.read(24)
            info = {
                "rate": r.read(20),
                "ch": r.read(3) + 1,
                "bps": r.read(5) + 1,
                "total": r.read(36),
                "md5": body[18:34],
            }
        elif btype == 127:
            raise NotImplementedError("invalid FLAC metadata block type")
        if last:
            break
    if info is None:
        raise NotImplementedError("FLAC stream missing STREAMINFO")

    chans: list[list[int]] = [[] for _ in range(info["ch"])]
    got = 0
    while got < info["total"] and pos < len(payload):
        pos, blocks = _decode_frame(payload, pos, info)
        for c, blk in enumerate(blocks):
            chans[c].extend(blk)
        got += len(blocks[0])
    if got < info["total"]:
        raise NotImplementedError("FLAC stream ends before total_samples")
    arr = np.array(chans, dtype=np.int64).T[: info["total"]]
    if info["bps"] % 8 == 0 and info["md5"] != b"\0" * 16:
        width = info["bps"] // 8
        raw = (
            arr.astype(f"<i{width}") if width in (1, 2, 4)
            else arr.astype("<i4")
        )
        if width in (1, 2, 4) and (
            hashlib.md5(raw.tobytes()).digest() != info["md5"]
        ):
            raise NotImplementedError("FLAC MD5 mismatch — corrupt stream")
    return info["rate"], arr.astype(np.int32)


def _decode_frame(payload, pos, info):
    r = _BitReader(payload, pos)
    if r.read(14) != 0b11111111111110:
        raise NotImplementedError("lost FLAC frame sync")
    if r.read(1):
        raise NotImplementedError("reserved frame-header bit set")
    r.read(1)  # blocking strategy (number semantics don't affect decode)
    bs_code = r.read(4)
    sr_code = r.read(4)
    ch_asgn = r.read(4)
    ss_code = r.read(3)
    if r.read(1):
        raise NotImplementedError("reserved frame-header bit set")
    _utf8_decode_num(r)
    if bs_code == 0:
        raise NotImplementedError("reserved block-size code")
    elif bs_code == 1:
        nb = 192
    elif bs_code <= 5:
        nb = 576 << (bs_code - 2)
    elif bs_code == 6:
        nb = r.read(8) + 1
    elif bs_code == 7:
        nb = r.read(16) + 1
    else:
        nb = 256 << (bs_code - 8)
    if sr_code == 0:
        rate = info["rate"]
    elif sr_code in _SAMPLE_RATES:
        rate = _SAMPLE_RATES[sr_code]
    elif sr_code == 12:
        rate = r.read(8) * 1000
    elif sr_code == 13:
        rate = r.read(16)
    elif sr_code == 14:
        rate = r.read(16) * 10
    else:
        raise NotImplementedError("invalid sample-rate code")
    if rate != info["rate"]:
        raise NotImplementedError("frame sample rate != STREAMINFO")
    if ss_code == 0:
        bps = info["bps"]
    elif ss_code in _SAMPLE_SIZES:
        bps = _SAMPLE_SIZES[ss_code]
    else:
        raise NotImplementedError("reserved sample-size code")
    header_end = r.byte_pos if r._pos % 8 == 0 else None
    if header_end is None:
        raise NotImplementedError("unaligned FLAC frame header")
    if _crc8(payload[pos:header_end]) != r.read(8):
        raise NotImplementedError("FLAC frame header CRC-8 mismatch")

    if ch_asgn <= 7:
        nch = ch_asgn + 1
        side_ch = -1
    elif ch_asgn in (8, 10):
        nch, side_ch = 2, 1  # left/side, mid/side: side is channel 1
    elif ch_asgn == 9:
        nch, side_ch = 2, 0  # right/side: side is channel 0
    else:
        raise NotImplementedError("reserved channel assignment")
    if nch != info["ch"]:
        raise NotImplementedError("frame channel count != STREAMINFO")

    subs = [
        _decode_subframe(r, nb, bps + (1 if c == side_ch else 0))
        for c in range(nch)
    ]
    r.align()
    crc_end = r.byte_pos
    if _crc16(payload[pos:crc_end]) != r.read(16):
        raise NotImplementedError("FLAC frame CRC-16 mismatch")

    if ch_asgn == 8:  # left/side
        left, side = subs
        subs = [left, [a - b for a, b in zip(left, side)]]
    elif ch_asgn == 9:  # right/side (side stored FIRST)
        side, right = subs
        subs = [[a + b for a, b in zip(right, side)], right]
    elif ch_asgn == 10:  # mid/side
        mid, side = subs
        left = [((m << 1) | (s & 1)) + s >> 1 for m, s in zip(mid, side)]
        subs = [left, [le - s for le, s in zip(left, side)]]
    return r.byte_pos, subs


def _decode_subframe(r: _BitReader, nb: int, bps: int) -> list[int]:
    if r.read(1):
        raise NotImplementedError("subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
        if wasted >= bps:
            # corrupt stream: would leave <=0 sample bits; fail closed
            # HERE (the frame CRC only runs after subframe decode)
            raise NotImplementedError(
                f"corrupt FLAC subframe: {wasted} wasted bits on a "
                f"{bps}-bit channel"
            )
        bps -= wasted
    if stype == 0:  # CONSTANT
        out = [r.read_signed(bps)] * nb
    elif stype == 1:  # VERBATIM
        out = [r.read_signed(bps) for _ in range(nb)]
    elif 8 <= stype <= 12:  # FIXED order 0..4
        order = stype - 8
        out = [r.read_signed(bps) for _ in range(order)]
        resid = _decode_residual(r, nb, order)
        coeffs = _FIXED_COEFFS[order]
        for e in resid:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coeffs))
            out.append(pred + e)
    elif stype >= 32:  # LPC
        order = (stype & 0x1F) + 1
        out = [r.read_signed(bps) for _ in range(order)]
        prec = r.read(4) + 1
        if prec == 16:
            raise NotImplementedError("invalid LPC precision code")
        shift = r.read_signed(5)
        if shift < 0:
            raise NotImplementedError("negative LPC shift is reserved")
        coeffs = [r.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(r, nb, order)
        for e in resid:
            pred = sum(c * out[-i - 1] for i, c in enumerate(coeffs))
            out.append((pred >> shift) + e)
    else:
        raise NotImplementedError(f"reserved subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _decode_residual(r: _BitReader, nb: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise NotImplementedError("reserved residual coding method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if nb % nparts or nb >> porder <= order and nparts > 1:
        raise NotImplementedError("invalid Rice partition order")
    out: list[int] = []
    for p in range(nparts):
        count = (nb >> porder) - (order if p == 0 else 0)
        if count < 0:
            raise NotImplementedError("invalid Rice partition order")
        param = r.read(pbits)
        if param == escape:
            raw = r.read(5)
            out.extend(
                r.read_signed(raw) if raw else 0 for _ in range(count)
            )
        else:
            for _ in range(count):
                q = r.read_unary()
                u = (q << param) | r.read(param)
                out.append((u >> 1) ^ -(u & 1))
    return out
