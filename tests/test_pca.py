"""PCA/whitening: parity with a numpy reference, invariances
(rotation, whitened identity covariance, explained-variance order),
determinism of the sign/order pinning, and the diagonal degenerate
case the oracle query relies on."""
import numpy as np
import pytest

from vtk_reserves_spark.operators.pca import (
    pca_fit,
    pca_transform,
    pca_whiten,
)


def _df(spark, mat, parts=4):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(mat)]
    return spark.createDataFrame(
        rows, "id long, embedding array<double>"
    ).repartition(parts)


def _np_reference(mat):
    mat = np.asarray(mat, np.float64)
    mean = mat.mean(0)
    cov = (mat - mean).T @ (mat - mean) / len(mat)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1]
    eigvals = np.maximum(eigvals[order], 0)
    comps = eigvecs[:, order].T
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, eigvals


def test_fit_matches_numpy(spark):
    rs = np.random.RandomState(3)
    mat = rs.randn(200, 6) @ rs.randn(6, 6) + rs.randn(6)
    model = pca_fit(_df(spark, mat))
    mean, comps, eigvals = _np_reference(mat)
    np.testing.assert_allclose(model["mean"], mean, atol=1e-9)
    np.testing.assert_allclose(model["eigvals"], eigvals, atol=1e-9)
    np.testing.assert_allclose(model["components"], comps, atol=1e-7)
    assert model["n"] == 200
    assert abs(model["explained"].sum() - 1.0) < 1e-12


def test_partitioning_invariance(spark):
    """Partial-moment combination must not depend on partitioning."""
    rs = np.random.RandomState(5)
    mat = rs.randn(150, 4)
    m1 = pca_fit(_df(spark, mat, parts=1))
    m8 = pca_fit(_df(spark, mat, parts=8))
    np.testing.assert_allclose(m1["eigvals"], m8["eigvals"], atol=1e-9)
    np.testing.assert_allclose(
        m1["components"], m8["components"], atol=1e-9
    )


def test_whitened_identity_covariance(spark):
    rs = np.random.RandomState(7)
    mat = rs.randn(500, 5) @ np.diag([5.0, 3.0, 2.0, 1.0, 0.5])
    out = pca_whiten(_df(spark, mat), k=5).toPandas()
    y = np.stack(out.sort_values("id")["projected"].to_numpy())
    cov = y.T @ y / len(y) - np.outer(y.mean(0), y.mean(0))
    np.testing.assert_allclose(cov, np.eye(5), atol=1e-8)


def test_rotation_invariant_eigvals(spark):
    rs = np.random.RandomState(9)
    mat = rs.randn(300, 4) * np.array([4.0, 2.0, 1.0, 0.25])
    q, _ = np.linalg.qr(rs.randn(4, 4))
    m1 = pca_fit(_df(spark, mat))
    m2 = pca_fit(_df(spark, mat @ q.T))
    np.testing.assert_allclose(m1["eigvals"], m2["eigvals"], atol=1e-8)


def test_projection_top_k_reconstruction(spark):
    rs = np.random.RandomState(13)
    base = rs.randn(100, 2) @ rs.randn(2, 6)  # rank 2 + tiny noise
    mat = base + 1e-6 * rs.randn(100, 6)
    model = pca_fit(_df(spark, mat))
    assert model["explained"][:2].sum() > 0.999
    out = pca_transform(_df(spark, mat), model, k=2).toPandas()
    y = np.stack(out.sort_values("id")["projected"].to_numpy())
    assert y.shape == (100, 2)
    # k=2 projection preserves essentially all variance
    assert abs(y.var(0).sum() - np.asarray(mat).var(0).sum()) < 1e-3


def test_diagonal_degenerate_axis_aligned(spark):
    """Exactly-diagonal covariance (the oracle twin's construction):
    components are axis-aligned with + sign, whitened values equal
    (x - mean) / std per dimension."""
    n = 105 * 4
    ids = np.arange(n)
    mat = np.stack(
        [(ids % 7).astype(float), 2.0 * (ids % 5), (ids % 3).astype(float)],
        axis=1,
    )
    model = pca_fit(_df(spark, mat))
    # var(uniform{0..6})=4, var(2*uniform{0..4})=8, var(uniform{0..2})=2/3
    np.testing.assert_allclose(model["eigvals"], [8.0, 4.0, 2 / 3],
                               atol=1e-12)
    expect = np.zeros((3, 3))
    expect[0, 1] = expect[1, 0] = expect[2, 2] = 1.0  # order by variance
    np.testing.assert_allclose(model["components"], expect, atol=1e-12)
    out = pca_transform(_df(spark, mat), model, whiten=True).toPandas()
    y = np.stack(out.sort_values("id")["projected"].to_numpy())
    manual = (mat - mat.mean(0)) / mat.std(0)
    np.testing.assert_allclose(y, manual[:, [1, 0, 2]], atol=1e-12)


def test_zero_variance_whiten_guard(spark):
    mat = np.ones((50, 3))
    mat[:, 0] = np.arange(50)
    model = pca_fit(_df(spark, mat))
    with pytest.raises(ValueError, match="zero-variance"):
        pca_transform(_df(spark, mat), model, whiten=True)
    # eps path works
    out = pca_transform(_df(spark, mat), model, whiten=True, eps=1e-9)
    assert out.count() == 50
