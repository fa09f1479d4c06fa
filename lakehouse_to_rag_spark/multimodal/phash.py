"""Perceptual image hashing: dHash and pHash over decoded pixel
arrays, engineered for EXACT cross-engine replay (SURVEY.md §2.13
multimodal dedup — the capability the round-5 verdict named as the
one remaining gap: the engine decoded six media formats and deduped
text/embeddings, but had no image-content dedup operator).

Both hashes follow the standard constructions (Krawetz's dHash;
pHash's low-frequency DCT signature) with three determinism anchors
so a SQL engine reproduces every bit:

1. grayscale is INTEGER BT.601: (299*r + 587*g + 114*b) // 1000 —
   no float luma.
2. resampling is NEAREST-NEIGHBOR with floor index arithmetic
   (src = (dst * src_dim) // out_dim) — no interpolation floats.
3. the pHash DCT is computed in integer MICRO-UNITS: each term
   (gray * cos_u) * cos_v — evaluated in exactly that association
   order with libm ``math.cos`` (the same cos any SQL engine's
   double ``cos()`` calls) — is rounded floor(x*1e6 + 0.5) to an
   int64 BEFORE summation, so the coefficient is an exact integer
   sum immune to accumulation order (the package-wide micro-unit
   discipline from the NB/DSIR scorers).

The hashes feed the same pigeonhole-banded Hamming join as SimHash
(operators/dedup.py::_banded_hamming_pairs): both fold to
non-negative int64 signatures (dHash uses 64 bits but the banded
join is signed-safe; pHash uses 63 bits).
"""

from __future__ import annotations

import math

import numpy as np

# 8x32 DCT-II basis slice: CI[u, i] = cos(pi * (2i+1) * u / 64),
# libm cos over left-to-right products — the exact expression a SQL
# replay writes as cos(pi() * (2*i+1) * u / 64.0)
_CI = np.array(
    [
        [math.cos(math.pi * (2 * i + 1) * u / 64) for i in range(32)]
        for u in range(8)
    ]
)


def grayscale_bt601(px: np.ndarray) -> np.ndarray:
    """Integer BT.601 luma of an (h, w, 3) uint8 array -> (h, w)
    int64. Floor division keeps it exact in any engine."""
    r = px[:, :, 0].astype(np.int64)
    g = px[:, :, 1].astype(np.int64)
    b = px[:, :, 2].astype(np.int64)
    return (299 * r + 587 * g + 114 * b) // 1000


def nn_resize(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample by floor index arithmetic:
    src_row(i) = (i * h) // out_h (top-left convention). Replayable
    as integer division in SQL; no interpolation."""
    h, w = gray.shape
    if h < 1 or w < 1:
        raise NotImplementedError("empty image")
    rows = (np.arange(out_h) * h) // out_h
    cols = (np.arange(out_w) * w) // out_w
    return gray[np.ix_(rows, cols)]


def dhash64(px: np.ndarray) -> int:
    """Difference hash: 9x8 nearest-neighbor grayscale; bit (i, j) =
    1 iff gray[i, j+1] > gray[i, j] (row-major, 64 bits). Purely
    integer — bit-exact in any engine."""
    g = nn_resize(grayscale_bt601(px), 8, 9)
    out = 0
    idx = 0
    for i in range(8):
        for j in range(8):
            if g[i, j + 1] > g[i, j]:
                out |= 1 << idx
            idx += 1
    # fold to signed-long range the way the banded join stores it
    return out - (1 << 64) if out >= (1 << 63) else out


def phash_coeffs_micro(px: np.ndarray) -> np.ndarray:
    """The 8x8 low-frequency DCT block of the 32x32 nearest-neighbor
    grayscale, in exact integer micro-units (see module docstring
    anchors). Returns an (8, 8) int64 array."""
    g32 = nn_resize(grayscale_bt601(px), 32, 32).astype(np.float64)
    # term[u, v, i, j] = (g32[i, j] * CI[u, i]) * CI[v, j] — the
    # parenthesization is the contract; each term micro-rounds before
    # the exact integer sum
    t = (g32[None, None, :, :] * _CI[:, None, :, None]) * _CI[None, :, None, :]
    return np.floor(t * 1e6 + 0.5).astype(np.int64).sum(axis=(2, 3))


def phash63(px: np.ndarray) -> int:
    """Perceptual hash: 63 bits over the 8x8 DCT block minus the DC
    term, bit k = 1 iff coeff_k > median (the 32nd-smallest of the 63
    AC coefficients, index 31 zero-based — the strict > means the
    median element itself is always 0, so the value is well-defined
    under ties). Row-major bit index k = u*8 + v - 1. Non-negative
    (bit 63 unused)."""
    coef = phash_coeffs_micro(px)
    flat = [coef[u, v] for u in range(8) for v in range(8) if (u, v) != (0, 0)]
    med = sorted(flat)[31]
    out = 0
    for idx, c in enumerate(flat):
        if c > med:
            out |= 1 << idx
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def synth_gradient_image(doc_id: int) -> np.ndarray:
    """THE planted-near-duplicate image recipe — the single source of
    truth shared by the oracle-gated ``image_phash_dedup`` registry
    entry, the scale probe, and the margin tests (three hand-synced
    copies would let a tweak silently desynchronize the probe/test
    numbers from the gated entry; any change here must be mirrored in
    the `_IMAGE_PHASH_ORACLE` SQL). Docs 2k and 2k+1 share a base
    gradient; the odd one gets a +3 red-channel brightness shift.
    Empirical pHash margins: planted pairs <= 2 bits, closest
    cross-pair 10."""
    base, pert = doc_id // 2, doc_id % 2
    w, h = 33 + base % 31, 33 + base % 29
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * (7 + base % 13) + yy * (5 + base % 11) + base * 11) % 256
    if pert:
        r = np.minimum(255, r + 3)
    g = (xx * (3 + base % 7) + yy * (2 + base % 5) + base * 7) % 256
    b = (xx * 2 + yy * 3 + base) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def synth_am_waveform(doc_id: int) -> np.ndarray:
    """THE planted-near-duplicate audio recipe (single source of
    truth for the ``audio_fingerprint_dedup`` entry, probe, and
    tests; mirror any change into `_AUDIO_FP_ORACLE`). 2048 int16
    samples: a pseudo-random base signal amplitude-modulated by an
    md5-derived per-frame envelope (md5, NOT an LCG: an affine-in-
    frame hash makes every base a rotation of one orbit and
    collapses cross-base margins — measured). Odd docs get a +3
    amplitude shift. Empirical fingerprint margins: planted pairs
    <= 4 bits, closest cross-pair 15."""
    import hashlib

    base, pert = doc_id // 2, doc_id % 2
    t = np.arange(2048, dtype=np.int64)
    amp = (
        t * (3 + base % 17) + (t * t) // (2 + base % 5) + base * 7
    ) % 256 - 128
    if pert:
        amp = np.minimum(127, amp + 3)
    env = np.array(
        [
            1
            + int(hashlib.md5(f"{base}:{f}".encode()).hexdigest()[:15], 16)
            % 13
            for f in range(64)
        ],
        dtype=np.int64,
    )[t // 32]
    return (amp * env * 9).astype(np.int16)


def audio_envelope_fp63(samples: np.ndarray, n_frames: int = 64) -> int:
    """Perceptual AUDIO fingerprint: the energy-envelope difference
    signature (the simplified Shazam/Chromaprint shape — the temporal
    loudness contour survives re-encoding and mild level shifts that
    break byte dedup). The signal is cut into ``n_frames`` equal
    frames (tail truncated); bit f = 1 iff frame f+1 has strictly
    more energy (exact integer sum of squares) than frame f — 63
    bits for the default 64 frames, purely integer arithmetic, so
    any engine reproduces every bit. Non-negative int64."""
    s = np.asarray(samples, dtype=np.int64).reshape(-1)
    if len(s) < n_frames:
        raise NotImplementedError(
            f"audio fingerprint needs >= {n_frames} samples, got {len(s)}"
        )
    per = len(s) // n_frames
    e = (s[: per * n_frames] ** 2).reshape(n_frames, per).sum(axis=1)
    out = 0
    for f in range(n_frames - 1):
        if e[f + 1] > e[f]:
            out |= 1 << f
    return out
