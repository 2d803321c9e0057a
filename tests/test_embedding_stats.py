"""Distributed embedding moments / PCA / whitening (round 5)."""

import numpy as np
import pyarrow as pa

import ray

from opengxt_ray.vector.stats import (embedding_moments, pca_fit,
                                      pca_transform)


def _mk(V, nblocks=5):
    t = pa.table({"vec_id": pa.array(np.arange(len(V)), pa.int64()),
                  "embedding": pa.array([list(map(float, v)) for v in V],
                                        pa.list_(pa.float32()))})
    return ray.data.from_arrow(t).repartition(nblocks)


def test_moments_match_numpy(ray_session):
    rs = np.random.RandomState(2)
    V = rs.standard_normal((4000, 16)) * rs.gamma(2, size=16) + rs.randn(16)
    V32 = V.astype(np.float32).astype(np.float64)  # storage precision
    n, mean, cov = embedding_moments(_mk(V))
    assert n == 4000
    np.testing.assert_allclose(mean, V32.mean(axis=0), rtol=1e-9,
                               atol=1e-9)
    np.testing.assert_allclose(cov, np.cov(V32.T, bias=True),
                               rtol=1e-6, atol=1e-9)


def test_moments_block_layout_invariant(ray_session):
    rs = np.random.RandomState(4)
    V = rs.standard_normal((1000, 8))
    _, m1, c1 = embedding_moments(_mk(V, nblocks=2))
    _, m2, c2 = embedding_moments(_mk(V, nblocks=13))
    np.testing.assert_allclose(m1, m2, rtol=1e-12)
    np.testing.assert_allclose(c1, c2, rtol=1e-9, atol=1e-12)


def test_pca_recovers_principal_axes_and_whitens(ray_session):
    rs = np.random.RandomState(9)
    # anisotropic Gaussian with known axes
    A = np.diag([5.0, 2.0, 0.5, 0.1])
    R, _ = np.linalg.qr(rs.standard_normal((4, 4)))
    V = rs.standard_normal((20000, 4)) @ A @ R.T + np.array(
        [1.0, -2.0, 0.5, 3.0])
    mean, comps, w = pca_fit(_mk(V))
    # eigenvalues ≈ squared scales, descending
    np.testing.assert_allclose(np.sqrt(w), [5.0, 2.0, 0.5, 0.1],
                               rtol=0.05)
    # components ≈ rows of R.T up to sign
    for i in range(4):
        dot = abs(comps[i] @ R[:, i])
        assert dot > 0.99, (i, dot)
    # whitening: projected covariance ≈ identity
    mean_w, comps_w, _ = pca_fit(_mk(V), whiten=True)
    out = pca_transform(_mk(V), mean_w, comps_w).take_all()
    P = np.stack([r["embedding"] for r in out]).astype(np.float64)
    np.testing.assert_allclose(np.cov(P.T, bias=True), np.eye(4),
                               atol=0.05)


def test_pca_truncation_and_schema(ray_session):
    rs = np.random.RandomState(1)
    V = rs.standard_normal((500, 8))
    mean, comps, w = pca_fit(_mk(V), n_components=3)
    assert comps.shape == (3, 8) and w.shape == (3,)
    out = pca_transform(_mk(V), mean, comps, out_col="pca").take_all()
    assert len(out[0]["pca"]) == 3
    assert "vec_id" in out[0] and "embedding" not in out[0]
