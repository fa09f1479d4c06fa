"""Baseline JPEG/JFIF codec (ITU-T T.81 sequential DCT, 8-bit) in
pure stdlib + numpy — real codec #5, closing the last stubbed image
format that is decodable without PIL/ffmpeg.

Public-knowledge sources: the marker/segment structure, zigzag order,
quantization + Huffman table handling, and MCU interleave follow the
published ITU-T T.81 spec (Annex B syntax, Annex F sequential DCT
procedures, Annex K example tables); the quality scaling of the
example quantization tables is the widely-published IJG formula.

Scope (documented, mirrors the other stdlib codecs' honesty rules):
- DECODE: baseline sequential (SOF0), 8-bit, 1 or 3 components,
  sampling factors 1..2 (4:4:4, 4:2:2, 4:2:0), restart intervals,
  byte stuffing. Progressive (SOF2), arithmetic coding, 12-bit, and
  hierarchical modes raise NotImplementedError.
- ENCODE: baseline sequential, 4:4:4 or 4:2:0, Annex K example
  tables scaled by the IJG quality formula, standard Annex K Huffman
  tables (no per-image optimization).

Rounding discipline: every float -> int step uses floor(x + 0.5)
(round half toward +inf), NOT numpy's banker's rounding — so a SQL
oracle can replay the arithmetic exactly (FLOOR(x + 0.5)); see
``jpeg_pixel_stats`` in plans/registry.py, which hash-checks the
whole encode -> entropy-code -> decode -> IDCT pipeline against a
closed-form DuckDB reconstruction on flat-color images.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

# Zigzag scan order: ZIGZAG[i] = (row, col) of the i-th coefficient.
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU-T T.81 Annex K.1 example quantization tables (zigzag order here
# is NOT applied — these are in natural row-major order).
_QT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
_QT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list).
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
        0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
        0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
        0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
        0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
        0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
        0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
        0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
        0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
        0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
        0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
        0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
        0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
        0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
        0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
        0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
        0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
        0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# Orthonormal 8x8 DCT-II basis: _C[u, x] = a(u) cos((2x+1) u pi / 16).
# FDCT of level-shifted block B is _C @ B @ _C.T; IDCT inverts it.
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _round_half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5): the SQL-replayable rounding used everywhere in
    this codec (numpy's np.round is banker's and NOT used)."""
    return np.floor(x + 0.5)


def quality_scaled_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled by the published IJG quality formula
    (integer arithmetic, so the oracle can replicate q exactly)."""
    if not 1 <= quality <= 100:
        raise NotImplementedError("JPEG quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    luma = np.clip((_QT_LUMA * scale + 50) // 100, 1, 255)
    chroma = np.clip((_QT_CHROMA * scale + 50) // 100, 1, 255)
    return luma, chroma


# ------------------------------------------------------------- bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (B.1.1.5)
                self.out.append(0x00)

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits

    def restart(self, m: int) -> None:
        """Pad to a byte boundary and emit RSTm (markers are written
        raw — byte stuffing applies only to entropy-coded data)."""
        self.flush()
        self.out += bytes((0xFF, 0xD0 + (m & 7)))


class _BitReader:
    """Entropy-segment reader: unstuffs FF00, stops at markers; RST
    markers reset the stream (caller resets DC predictions)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self._nbits <= 24:
            if self.pos >= len(d):
                raise NotImplementedError("truncated JPEG entropy stream")
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller
                    break
                else:  # real marker (EOI, next segment): no more bits
                    break
            else:
                self.pos += 1
            self._acc = (self._acc << 8) | b
            self._nbits += 8

    def read_bit(self) -> int:
        if self._nbits == 0:
            self._fill()
            if self._nbits == 0:
                raise NotImplementedError("truncated JPEG entropy stream")
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker, dropping pad bits."""
        self._acc = 0
        self._nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise NotImplementedError("missing JPEG restart marker")


# ------------------------------------------------------------ huffman


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: map (code_length, code) -> symbol."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, code_length)."""
    table: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise NotImplementedError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t-bit magnitude to signed value."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    """Bit category of a signed coefficient (size of magnitude)."""
    return int(abs(v)).bit_length()


# ------------------------------------------------------------- decode


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JFIF payload to (h, w, 3) uint8 RGB (grayscale
    sources replicate Y into all three channels)."""
    if payload is None or payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    d = payload
    try:
        while pos + 4 <= len(d):
            if d[pos] != 0xFF:
                raise NotImplementedError("bad JPEG marker sync")
            marker = d[pos + 1]
            if marker == 0xD9:  # EOI
                break
            seg_len = struct.unpack_from(">H", d, pos + 2)[0]
            seg = d[pos + 4 : pos + 2 + seg_len]
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 0xF
                    if pq != 0:
                        raise NotImplementedError("16-bit JPEG quant table")
                    tab = np.zeros(64, dtype=np.int64)
                    tab[_ZZ] = np.frombuffer(seg, np.uint8, 64, i + 1)
                    qt[tq] = tab.reshape(8, 8)
                    i += 65
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0xF
                    bits = list(seg[i + 1 : i + 17])
                    n = sum(bits)
                    vals = list(seg[i + 17 : i + 17 + n])
                    (huff_dc if tc == 0 else huff_ac)[th] = _build_decode_table(bits, vals)
                    i += 17 + n
            elif marker == 0xC0:  # SOF0 baseline
                prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
                if prec != 8:
                    raise NotImplementedError("only 8-bit JPEG supported")
                comps = []
                for c in range(nc):
                    cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                    comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
                frame = (h, w, comps)
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise NotImplementedError(
                    "only baseline sequential JPEG (SOF0) is decodable here"
                )
            elif marker == 0xDD:  # DRI
                restart_interval = struct.unpack_from(">H", seg, 0)[0]
            elif marker == 0xDA:  # SOS — entropy data follows
                if frame is None:
                    raise NotImplementedError("JPEG SOS before SOF0")
                ns = seg[0]
                scan = []
                for c in range(ns):
                    cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                    scan.append((cs, tt >> 4, tt & 0xF))
                return _decode_scan(
                    d, pos + 2 + seg_len, frame, scan, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            pos += 2 + seg_len
    except (struct.error, IndexError, KeyError) as exc:
        raise NotImplementedError(f"corrupt JPEG payload: {exc}") from exc
    raise NotImplementedError("JPEG payload has no SOS scan")


def _decode_scan(d, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame
    if len(scan) < len(comps):
        # A legal baseline JPEG may spread its components over several
        # SOS scans (non-interleaved); this decoder handles only the
        # single-interleaved-scan layout. Returning after the first
        # partial scan would silently hand back a Y-only image as
        # grayscale-replicated RGB — fail closed instead (module
        # contract: decode fully or raise NotImplementedError).
        raise NotImplementedError(
            "multi-scan baseline JPEG (scan covers "
            f"{len(scan)}/{len(comps)} frame components)"
        )
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("JPEG sampling factors above 2")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = {}
    for cid, _, _ in scan:
        c = by_id[cid]
        planes[cid] = np.zeros(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64
        )
    br = _BitReader(d, pos)
    pred = {cid: 0 for cid, _, _ in scan}
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                br.sync_restart()
                pred = {cid: 0 for cid in pred}
            for cid, td, ta in scan:
                c = by_id[cid]
                q = qt[c["tq"]]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        t = _decode_symbol(br, huff_dc[td])
                        diff = _extend(br.read_bits(t), t) if t else 0
                        pred[cid] += diff
                        coef[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(br, huff_ac[ta])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise NotImplementedError("JPEG AC overflow")
                            coef[k] = _extend(br.read_bits(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.float64)
                        blk[_ZZ] = coef * q.reshape(-1)[_ZZ]
                        blk = blk.reshape(8, 8)
                        # DC added exactly (dequantized int / 8) for
                        # the same boundary-determinism reason as the
                        # encoder's exact-DC FDCT
                        dc = blk[0, 0]
                        blk[0, 0] = 0.0
                        px = _C.T @ blk @ _C + (dc / 8.0 + 128.0)
                        y0 = (my * c["v"] + v) * 8
                        x0 = (mx * c["h"] + hh) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = px
            n_mcu += 1
    out = []
    for cid, _, _ in scan:
        c = by_id[cid]
        p = planes[cid]
        p = np.repeat(p, vmax // c["v"], axis=0)
        p = np.repeat(p, hmax // c["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        g = np.clip(_round_half_up(out[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(_round_half_up(rgb), 0, 255).astype(np.uint8)


# ------------------------------------------------------------- encode


def _encode_block(bw, blk, q, dc_tab, ac_tab, pred):
    """FDCT + quantize + Huffman-encode one 8x8 block; returns new DC
    prediction."""
    shifted = blk - 128.0
    coef = _C @ shifted @ _C.T
    # DC computed EXACTLY (integer sum / power of two), not through
    # the float cos basis: 8*v/q lands on exact .5 quantization
    # boundaries for whole swaths of inputs (every odd level-shifted
    # value at q=16), where a +-1 ulp DCT error would flip the
    # half-up rounding — and with it, oracle parity
    coef[0, 0] = shifted.sum() / 8.0
    qc = _round_half_up(coef / q).astype(np.int64)
    zz = qc.reshape(-1)[_ZZ]
    dc = int(zz[0])
    diff = dc - pred
    t = _category(diff)
    code, ln = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    k = 1
    while k <= last_nz:
        run = 0
        while int(zz[k]) == 0:
            run += 1
            k += 1
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        v = int(zz[k])
        s = _category(v)
        code, ln = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        k += 1
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _pad_to_block(p: np.ndarray, by: int, bx: int) -> np.ndarray:
    """Edge-replicate to multiples of (by, bx) — the standard padding
    that keeps block DC equal to the edge color for flat images."""
    h, w = p.shape
    ph = (by - h % by) % by
    pw = (bx - w % bx) % bx
    return np.pad(p, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w, 3) uint8 RGB as baseline JFIF. ``subsampling`` is
    "444" (chroma full-res) or "420" (2x2 chroma decimation via
    mean + half-up rounding). ``restart_interval`` > 0 emits a DRI
    segment and an RSTn marker (with DC-prediction reset) every that
    many MCUs — the error-resilience framing real encoders add for
    streaming decode; pixels are bit-identical either way."""
    if subsampling not in ("444", "420"):
        raise NotImplementedError("JPEG subsampling must be 444 or 420")
    px = np.asarray(pixels, dtype=np.float64)[:, :, :3]
    h, w = px.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise NotImplementedError("JPEG dimensions out of range")
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    y = np.clip(_round_half_up(0.299 * r + 0.587 * g + 0.114 * b), 0, 255)
    cb = np.clip(
        _round_half_up(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b), 0, 255
    )
    cr = np.clip(
        _round_half_up(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b), 0, 255
    )
    luma_q, chroma_q = quality_scaled_tables(quality)

    if subsampling == "420":
        cf = 2
        ype = _pad_to_block(y, 16, 16)
        # decimate chroma over the padded-to-even plane, then pad the
        # half-res plane to 8x8 blocks
        cbp = _pad_to_block(cb, 2, 2)
        crp = _pad_to_block(cr, 2, 2)
        cbs = _round_half_up(
            (cbp[0::2, 0::2] + cbp[1::2, 0::2] + cbp[0::2, 1::2] + cbp[1::2, 1::2])
            / 4.0
        )
        crs = _round_half_up(
            (crp[0::2, 0::2] + crp[1::2, 0::2] + crp[0::2, 1::2] + crp[1::2, 1::2])
            / 4.0
        )
        cbe = _pad_to_block(cbs, 8, 8)
        cre = _pad_to_block(crs, 8, 8)
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        cf = 1
        ype = _pad_to_block(y, 8, 8)
        cbe = _pad_to_block(cb, 8, 8)
        cre = _pad_to_block(cr, 8, 8)
        samp = [(1, 1), (1, 1), (1, 1)]

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, tab in ((0, luma_q), (1, chroma_q)):
        zz = np.zeros(64, dtype=np.uint8)
        zz[:] = tab.reshape(-1)[_ZZ]
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + zz.tobytes()
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for i, (hs, vs) in enumerate(samp):
        out += struct.pack(">BBB", i + 1, (hs << 4) | vs, 0 if i == 0 else 1)
    for tc, th, (bits, vals) in (
        (0, 0, _DC_LUMA), (1, 0, _AC_LUMA), (0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)
    ):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (tc << 4) | th)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    out += b"\x01\x00\x02\x11\x03\x11" + b"\x00\x3f\x00"

    dc_l = _build_encode_table(*_DC_LUMA)
    ac_l = _build_encode_table(*_AC_LUMA)
    dc_c = _build_encode_table(*_DC_CHROMA)
    ac_c = _build_encode_table(*_AC_CHROMA)
    bw = _BitWriter()
    mcus_x = ype.shape[1] // (8 * cf)
    mcus_y = ype.shape[0] // (8 * cf)
    preds = [0, 0, 0]
    n_mcu = 0
    n_rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.restart(n_rst)
                n_rst += 1
                preds = [0, 0, 0]
            n_mcu += 1
            for v in range(cf):
                for hh in range(cf):
                    y0, x0 = (my * cf + v) * 8, (mx * cf + hh) * 8
                    preds[0] = _encode_block(
                        bw, ype[y0 : y0 + 8, x0 : x0 + 8], luma_q, dc_l, ac_l, preds[0]
                    )
            for i, plane in ((1, cbe), (2, cre)):
                y0, x0 = my * 8, mx * 8
                preds[i] = _encode_block(
                    bw,
                    plane[y0 : y0 + 8, x0 : x0 + 8],
                    chroma_q,
                    dc_c,
                    ac_c,
                    preds[i],
                )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) from the SOFn header alone — metadata for any
    DCT mode, even ones ``decode_jpeg`` refuses to decode."""
    if payload is None or payload[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    pos = 2
    d = payload
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise NotImplementedError("bad JPEG marker sync")
        marker = d[pos + 1]
        if marker == 0xD9:
            break
        seg_len = struct.unpack_from(">H", d, pos + 2)[0]
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            _, h, w = struct.unpack_from(">BHH", d, pos + 4)
            return w, h
        if marker == 0xDA:
            break
        pos += 2 + seg_len
    raise NotImplementedError("JPEG payload has no frame header")
