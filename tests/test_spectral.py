"""Distributed PCA (operators/spectral.py): accuracy against a direct
eigendecomposition, projection semantics, determinism, and the
exact-int64 overflow contract. Oracle parity itself is covered by
test_oracle_parity.py (the embedding_pca entry replays the full
training in DuckDB)."""

import numpy as np
import pytest

from lakehouse_to_rag_spark.operators.spectral import (
    pca_power_model,
    pca_project,
)
from tests.conftest import SF_DIR_001


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR_001}/embeddings.parquet")


@pytest.fixture(scope="module")
def model(emb):
    return pca_power_model(emb, k=4, iterations=20)


def _true_components(emb, k):
    rows = emb.orderBy("vec_id").collect()
    m = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    cov = np.cov(m, rowvar=False, bias=True)
    _w, v = np.linalg.eigh(cov)
    return m, v[:, ::-1][:, :k].T


def test_components_match_eigh(emb, model):
    """Sharpened power iteration recovers the true top-4 eigenvectors
    even on the near-flat harness spectrum (gap ratio ~0.93)."""
    _mu, comps, _eig, _n = model
    _m, true = _true_components(emb, 4)
    for c in range(4):
        assert abs(float(np.dot(comps[c], true[c]))) > 0.999, f"pc{c + 1}"


def test_components_orthonormal(model):
    _mu, comps, _eig, _n = model
    dev = np.abs(comps @ comps.T - np.eye(4)).max()
    assert dev < 1e-3


def test_eigvals_descending_positive(model):
    _mu, _comps, eig, _n = model
    assert all(e > 0 for e in eig)
    assert eig == sorted(eig, reverse=True)


def test_projection_semantics(emb, model):
    """pc scores == centered data times components, in original units
    (up to the documented 1e-6 quantization + 6dp output grid)."""
    mu, comps, _eig, _n = model
    rows = pca_project(emb, k=4, iterations=20).orderBy("vec_id").collect()
    got = np.array([[r[f"pc{c + 1}"] for c in range(4)] for r in rows])
    m, _true = _true_components(emb, 4)
    expect = (m - m.mean(axis=0)) @ comps.T
    assert np.abs(got - expect).max() < 5e-6


def test_projection_deterministic(emb):
    a = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in pca_project(emb, k=2, iterations=20).collect()
    }
    b = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in pca_project(emb, k=2, iterations=20).collect()
    }
    assert a == b


def test_overflow_contract_raises(emb):
    """A scale that pushes n * max|q|^2 past 2^62 must refuse loudly,
    naming the float64 escape hatch, not wrap silently."""
    with pytest.raises(ValueError, match="exact=False"):
        pca_power_model(emb, k=1, iterations=1, scale=1e13)


def test_inexact_path_close_to_exact(emb):
    """exact=False (float64 moments — the >9e6-row scale path) agrees
    with the exact path to well under the quantization grid."""
    _mu_a, comps_a, _e, _n = pca_power_model(emb, k=2, iterations=20)
    _mu_b, comps_b, _e2, _n2 = pca_power_model(
        emb, k=2, iterations=20, exact=False
    )
    assert np.abs(comps_a - comps_b).max() < 1e-6


def test_projection_plan_is_pure_map(emb):
    """The projection pass must be scan -> Arrow eval only: training
    already reduced to O(d^2) driver state, so the output plan carries
    NO shuffle (at 100 TB the projection is embarrassingly parallel)."""
    plan = (
        pca_project(emb, k=2, iterations=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan or "ArrowEval" in plan


# ------------------------------------------------- JL random projection


def test_jl_distance_preservation(emb):
    """The JL lemma's whole point: pairwise distances survive the
    16-dim projection within bounded distortion. With k=16 the bound
    is loose (eps ~ sqrt(ln n / k) ~ 0.5 at n=40) — assert the
    projected/original squared-distance ratio stays within a wide
    [0.1, 4] band for every sampled pair and its MEDIAN is near 1
    (unbiasedness of the sign estimator)."""
    from lakehouse_to_rag_spark.operators.spectral import jl_project

    rows = emb.orderBy("vec_id").limit(40).collect()
    ids = [r["vec_id"] for r in rows]
    orig = {r["vec_id"]: np.array(list(r["embedding"]), float) for r in rows}
    proj = {
        r["vec_id"]: np.array([r[f"rp{c}"] for c in range(1, 17)])
        for r in jl_project(emb.limit(40), k=16).collect()
    }
    ratios = []
    for a in ids[:20]:
        for b in ids[20:]:
            d0 = float(((orig[a] - orig[b]) ** 2).sum())
            d1 = float(((proj[a] - proj[b]) ** 2).sum())
            if d0 > 1e-9:
                ratios.append(d1 / d0)
    assert ratios
    assert all(0.1 < r < 4.0 for r in ratios), (min(ratios), max(ratios))
    med = sorted(ratios)[len(ratios) // 2]
    assert 0.75 < med < 1.3, med


def test_jl_deterministic_and_seeded(emb):
    from lakehouse_to_rag_spark.operators.spectral import jl_project

    a = sorted(map(tuple, jl_project(emb, k=4, seed=0).collect()))
    b = sorted(map(tuple, jl_project(emb, k=4, seed=0).collect()))
    c = sorted(map(tuple, jl_project(emb, k=4, seed=1).collect()))
    assert a == b
    assert a != c  # a different seed is a different matrix


def test_jl_semantics_vs_numpy(emb):
    """Engine output == the quantize -> exact-int dot -> divide ->
    round pipeline computed directly in numpy."""
    from lakehouse_to_rag_spark.operators.spectral import (
        jl_project,
        jl_sign_matrix,
    )

    rows = emb.orderBy("vec_id").limit(10).collect()
    m = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    q = np.floor(np.abs(m * 1e6) + 0.5) * np.sign(m * 1e6)
    s = jl_sign_matrix(8, m.shape[1], seed=3)
    want = (q @ s.T) / (1e6 * np.sqrt(8))
    want = np.floor(np.abs(want * 1e6) + 0.5) * np.sign(want) / 1e6
    got = {r["vec_id"]: [r[f"rp{c}"] for c in range(1, 9)]
           for r in jl_project(emb.limit(10), k=8, seed=3).collect()}
    for i, r in enumerate(rows):
        assert np.allclose(got[r["vec_id"]], want[i], atol=1e-12)


def test_jl_plan_is_pure_map(emb):
    """No training pass at all: the whole operator is scan -> Arrow
    eval, zero Exchange (at 100 TB this is the cheapest possible
    per-row op)."""
    from lakehouse_to_rag_spark.operators.spectral import jl_project

    plan = (
        jl_project(emb, k=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "MapInPandas" in plan or "ArrowEval" in plan
