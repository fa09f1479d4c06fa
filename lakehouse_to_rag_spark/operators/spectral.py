"""Distributed PCA over embedding columns (spectral model training).

The reference has no embedding operators at all (its compute surface is
DuckDB SQL over scraped text — ``src/helpers/duckdb_queries.py``); this
module is part of the SURVEY §2.13 LLM-pipeline extension surface:
dimensionality reduction / whitening is a standard preprocessing step
before large-scale embedding dedup and ANN indexing.

Design for 100 TB
-----------------
PCA at scale is ONE pass over the corpus: each Arrow batch reduces to a
``d x d`` integer second-moment partial (``Q^T Q``), the per-dimension
sums, and a row count — model state is O(d^2), independent of corpus
size, so the reduce shuffles ``partitions x d^2/2`` tiny rows and the
driver only ever sees the d x d matrix. Power iteration + deflation then
run on the driver against that matrix (O(k * iters * d^2) flops — micro
seconds), and projection is a second embarrassingly-parallel Arrow pass
with the k x d component matrix riding the closure. No corpus collect,
no per-row Python, no iterative corpus scans (contrast Lloyd's k-means,
which rescans per iteration).

Oracle-parity discipline (the trained-model-replay trick shared with
``similarity.kmeans_centroids``): every cross-engine order-divergent
float reduction is either EXACT — covariance moments are int64 sums
over 1e6-quantized values, so Spark's partial-sum tree and DuckDB's
sequential SUM agree bit-for-bit — or collapsed onto a decimal grid
coarser than worst-case summation drift (ROUND 10 after d-term
matvecs, where drift <= (d-1) * eps * sum|terms| ~ 1e-13 << the 5e-11
half-step). The int64 moments make even the *training input* exact, a
stronger guarantee than the kmeans path (which rounds means at 12dp).

Overflow contract: int64 moments require n * (scale * max|x|)^2 < 2^62
(~9e6 rows at |x|<=2, scale=1e6). ``pca_power_model`` enforces this
loudly. At true 100 TB scale the oracle-parity constraint is moot and
the guard points callers at float64 partials (same one-pass shape,
last-ulp-inexact) — flip ``exact=False``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from .similarity import _round_away

_MOMENT_SCHEMA = StructType(
    [
        StructField("i", LongType()),
        StructField("j", LongType()),
        StructField("s", LongType()),
    ]
)

# (i, j) row conventions in the moment pass (dims are 1-based to match
# the oracle's generate_subscripts):
#   (i>=1, j>=i) -> sum over rows of q_i * q_j   (upper triangle)
#   (i>=1, j=0)  -> sum over rows of q_i
#   (0, 0)       -> row count
#   (-1, 0)      -> max |q| over rows (aggregated with MAX, not SUM)


def _moment_partials(vec_col: str, scale: float, exact: bool):
    def run(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            q = _round_away(m * scale, 0)
            if exact:
                q = q.astype(np.int64)
            d = q.shape[1]
            sp = q.T @ q  # (d x d); int64 exact under the n*max^2 guard
            sv = q.sum(axis=0)
            iu, ju = np.triu_indices(d)
            rows_i = np.concatenate([iu + 1, np.arange(1, d + 1), [0], [-1]])
            rows_j = np.concatenate([ju + 1, np.zeros(d, np.int64), [0], [0]])
            rows_s = np.concatenate(
                [sp[iu, ju], sv, [len(q)], [np.abs(q).max()]]
            )
            yield pd.DataFrame({"i": rows_i, "j": rows_j, "s": rows_s})

    return run


def pca_power_model(
    embeddings: DataFrame,
    k: int = 4,
    iterations: int = 20,
    vec_col: str = "embedding",
    scale: float = 1e6,
    exact: bool = True,
    squarings: int = 5,
):
    """Train a PCA model: returns ``(mu, components, eigvals, n)`` where
    ``mu`` is the per-dimension mean in quantized units (numpy (d,)),
    ``components`` is a (k, d) row-per-component orthonormal-ish matrix
    (power iteration + deflation, deterministic), ``eigvals`` are the
    Rayleigh quotients of the max-and-dim NORMALIZED covariance (only
    their ratios are meaningful), and ``n`` the row count.

    Spectral sharpening: before iterating, the normalized covariance
    is squared ``squarings`` times (C -> C^(2^squarings), renormalized
    each time) — eigenvectors are unchanged while every eigenvalue gap
    is raised to the 2^squarings power, so power iteration converges
    even on near-flat spectra (real embedding corpora; measured: plain
    30-iter iteration left |cos| vs eigh at 0.79-0.95 on the harness
    data, 5 squarings + 20 iters reach 1.0 on all four components).

    Determinism: quantize -> exact int64 moments -> identical float
    expression tree -> ROUND-collapsed squarings (14dp) and power
    iteration (10dp). The whole training replays in sequential SQL
    (see the ``embedding_pca`` oracle in ``plans/registry.py``).
    """
    import numpy as np

    v = embeddings.select(
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(vec_col)
    )
    merged = (
        v.mapInPandas(_moment_partials(vec_col, scale, exact), _MOMENT_SCHEMA)
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"), F.max("s").alias("mx"))
        .collect()
    )
    n = 0
    maxq = 0
    sv: dict[int, int] = {}
    sp: dict[tuple[int, int], int] = {}
    for r in merged:
        i, j = int(r["i"]), int(r["j"])
        if (i, j) == (0, 0):
            n = int(r["s"])
        elif i == -1:
            maxq = int(r["mx"])
        elif j == 0:
            sv[i] = int(r["s"])
        else:
            sp[(i, j)] = int(r["s"])
    if n == 0:
        raise ValueError("pca_power_model: empty corpus")
    d = max(sv)
    if exact and n * (maxq * maxq) >= 2**62:
        raise ValueError(
            f"pca_power_model: n={n} rows at max|q|={maxq} overflows the "
            "int64 exact-moment contract (n * max|q|^2 >= 2^62). Lower "
            "`scale`, or pass exact=False to use float64 moments (same "
            "one-pass shape, no bit-exact SQL replay)."
        )

    # Driver-side model build — every float op below mirrors the SQL
    # oracle's expression tree exactly (left-assoc products, CAST
    # placement), so keep shapes/ordering boring and explicit.
    svec = np.array([sv[i] for i in range(1, d + 1)], dtype=np.float64)
    smat = np.zeros((d, d), dtype=np.float64)
    for (i, j), s in sp.items():
        smat[i - 1, j - 1] = s
        smat[j - 1, i - 1] = s
    mu = svec / n
    cov = smat / n - np.multiply.outer(mu, mu)
    norm = np.max(np.abs(cov)) * float(d)
    if norm == 0.0:
        raise ValueError("pca_power_model: zero covariance (constant corpus)")
    c0 = cov / norm

    # Spectral sharpening: C^(2^squarings), renormalized to keep every
    # entry <= 1/d (the bound the matvec ROUND-10 analysis needs).
    # Round 14dp after each square: sum|terms| <= 1/d so cross-engine
    # drift <= (d-1)*eps/d ~ 1e-16, 45x inside the 5e-15 half-step.
    c = c0
    for _ in range(squarings):
        r = _round_away(c @ c, 14)
        m = np.max(np.abs(r)) * float(d)
        if m == 0.0:
            raise ValueError("pca_power_model: covariance power vanished")
        c = r / m

    comps = []
    eigvals = []
    for ci in range(k):
        vvec = np.full(d, 1.0 / math.sqrt(d))
        vvec = _round_away(vvec, 12)
        for _ in range(iterations):
            w = _round_away(c @ vvec, 10)
            s2 = _round_away(float(np.sum(w * w)), 10)
            if s2 == 0.0:
                raise ValueError(
                    f"pca_power_model: power iteration collapsed at "
                    f"component {ci + 1} (covariance rank < k={k})"
                )
            vvec = _round_away(w / math.sqrt(s2), 12)
        # Sign convention: the largest-|value| coordinate (smallest dim
        # on 12dp ties) is positive — argmax is first-max, i.e. the
        # oracle's ORDER BY ROUND(ABS(val),12) DESC, dim ASC LIMIT 1.
        top = int(np.argmax(_round_away(np.abs(vvec), 12)))
        if vvec[top] < 0:
            vvec = -vvec
        # Deflate the SHARPENED matrix (same eigenvectors); report the
        # Rayleigh quotient against the original normalized covariance
        # so eigval ratios stay meaningful to callers.
        u = _round_away(c @ vvec, 10)
        lam = _round_away(float(np.sum(vvec * u)), 10)
        u0 = _round_away(c0 @ vvec, 10)
        eigvals.append(_round_away(float(np.sum(vvec * u0)), 10))
        comps.append(vvec)
        if ci < k - 1:
            # (lam * v_i) * v_j — left-assoc, matching the oracle's
            # `l.lam * a.val * b.val`
            c = c - np.multiply.outer(lam * vvec, vvec)
    return mu, np.array(comps), eigvals, n


def pca_project(
    embeddings: DataFrame,
    k: int = 4,
    iterations: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 1e6,
    exact: bool = True,
    squarings: int = 5,
) -> DataFrame:
    """Project every embedding onto the top-k principal components:
    ``(id, pc1..pck)``, scores in original units rounded to 6dp. One
    training pass + one projection pass; both Arrow batch GEMMs."""
    import numpy as np
    import pandas as pd

    mu, comps, _eig, _n = pca_power_model(
        embeddings, k, iterations, vec_col, scale, exact, squarings
    )

    out_schema = StructType(
        [StructField(id_col, LongType())]
        + [StructField(f"pc{c + 1}", DoubleType()) for c in range(k)]
    )

    def project(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            q = _round_away(m * scale, 0)
            # (q - mu) @ comps^T, back to original units, 6dp — the
            # oracle's ROUND(SUM((CAST(q AS DOUBLE)-mu)*val)/scale, 6)
            p = _round_away(((q - mu) @ comps.T) / scale, 6)
            out = {id_col: pdf[id_col].values}
            for c in range(comps.shape[0]):
                out[f"pc{c + 1}"] = p[:, c]
            yield pd.DataFrame(out)

    v = embeddings.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(vec_col),
    )
    return v.mapInPandas(project, out_schema)


# =====================================================================
# Johnson-Lindenstrauss random projection (Achlioptas 2003 signs)
# =====================================================================


def jl_sign_matrix(k: int, d: int, seed: int = 0):
    """Deterministic ±1 projection matrix (k x d), entry (j, i) =
    +1 iff the first hex digit of md5("seed:j:i") is below 8 —
    Achlioptas (2003) showed iid signs satisfy the JL lemma with the
    same distortion bound as Gaussian entries. md5-derived (not a
    JVM/numpy RNG) so the SAME matrix is constructible in any engine:
    the ``embedding_rp`` oracle rebuilds it in DuckDB SQL from the
    identical string recipe. Rows index output dims, 1-based i/j in
    the hash input to match SQL's generate_subscripts convention."""
    import hashlib

    import numpy as np

    m = np.empty((k, d), dtype=np.float64)
    for j in range(1, k + 1):
        for i in range(1, d + 1):
            h = hashlib.md5(f"{seed}:{j}:{i}".encode()).hexdigest()
            m[j - 1, i - 1] = 1.0 if int(h[0], 16) < 8 else -1.0
    return m


def jl_project(
    embeddings: DataFrame,
    k: int = 16,
    seed: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: float = 1e6,
) -> DataFrame:
    """Johnson-Lindenstrauss projection of every embedding to k dims:
    ``(id, rp1..rpk)``, values in original units rounded to 6dp.

    100 TB shape: ONE map-only Arrow pass — the k x d sign matrix
    rides the closure (k*d doubles, e.g. 16 x 64 = 8 KB), there is no
    training pass, no shuffle, no collect; this is the cheap
    front-end that shrinks vectors before the ANN / dedup machinery
    (``similarity.py``/``dedup.py``) whose costs scale with dim.

    Oracle-parity discipline (shared with ``pca_project``): inputs
    are 1e6-quantized to int64, and the signs are ±1, so the dot
    product is an EXACT int64 sum — Spark's partial-sum tree and
    DuckDB's sequential SUM agree bit-for-bit; the single division by
    ``scale * sqrt(k)`` and the 6dp half-away round are then
    deterministic in both engines. Same overflow contract as the
    moment pass: d * scale * max|x| < 2^62 per output coordinate —
    far looser than PCA's quadratic one, no guard needed at any
    plausible embedding magnitude."""
    import numpy as np
    import pandas as pd

    signs = jl_sign_matrix(k, embeddings_dim(embeddings, vec_col), seed)
    div = scale * math.sqrt(k)

    out_schema = StructType(
        [StructField(id_col, LongType())]
        + [StructField(f"rp{c + 1}", DoubleType()) for c in range(k)]
    )

    def project(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(list(pdf[vec_col]), dtype=np.float64)
            q = _round_away(m * scale, 0)
            p = _round_away((q @ signs.T) / div, 6)
            out = {id_col: pdf[id_col].values}
            for c in range(k):
                out[f"rp{c + 1}"] = p[:, c]
            yield pd.DataFrame(out)

    v = embeddings.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias(vec_col),
    )
    return v.mapInPandas(project, out_schema)


def embeddings_dim(embeddings: DataFrame, vec_col: str = "embedding") -> int:
    """Embedding dimensionality from ONE row (the schema carries no
    array length). A single-row collect, not a corpus scan."""
    row = embeddings.select(F.size(F.col(vec_col)).alias("d")).head(1)
    if not row:
        raise ValueError("cannot infer embedding dim from an empty corpus")
    return int(row[0]["d"])
