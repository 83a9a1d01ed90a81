"""Logistic regression: parity with a numpy IRLS reference,
partitioning invariance, separable-data behavior, the d=1 one-step
closed form the oracle twin uses, and pure-Catalyst scoring."""
import numpy as np
import pytest

from vtk_reserves_spark.operators.logreg import (
    _sigmoid,
    logreg_fit,
    logreg_predict,
)


def _df(spark, x, y, parts=4):
    rows = [([float(v) for v in xi], int(yi)) for xi, yi in zip(x, y)]
    return spark.createDataFrame(
        rows, "features array<double>, label int"
    ).repartition(parts)


def _np_irls(x, y, n_iter, reg=0.0, intercept=True):
    x = np.asarray(x, float)
    if intercept:
        x = np.hstack([x, np.ones((len(x), 1))])
    y = np.asarray(y, float)
    k = x.shape[1]
    w = np.zeros(k)
    for _ in range(n_iter):
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        g = x.T @ (y - p)
        h = (x * (p * (1 - p))[:, None]).T @ x
        if reg:
            ridge = np.full(k, reg)
            if intercept:
                ridge[-1] = 0.0
            g -= ridge * w
            h += np.diag(ridge)
        w = w + np.linalg.solve(h, g)
    return w


def test_fit_matches_numpy_reference(spark):
    rs = np.random.RandomState(1)
    x = rs.randn(400, 3)
    logit = x @ np.array([1.5, -2.0, 0.5]) + 0.3
    y = (rs.rand(400) < 1 / (1 + np.exp(-logit))).astype(int)
    model = logreg_fit(_df(spark, x, y), n_iter=6, reg=1e-6)
    ref = _np_irls(x, y, 6, reg=1e-6)
    np.testing.assert_allclose(model["weights"], ref[:3], atol=1e-8)
    np.testing.assert_allclose(model["intercept"], ref[3], atol=1e-8)
    assert model["n"] == 400


def test_partitioning_invariance(spark):
    rs = np.random.RandomState(5)
    x = rs.randn(200, 2)
    y = (x[:, 0] + 0.3 * rs.randn(200) > 0).astype(int)
    m1 = logreg_fit(_df(spark, x, y, parts=1), n_iter=4, reg=1e-4)
    m8 = logreg_fit(_df(spark, x, y, parts=8), n_iter=4, reg=1e-4)
    np.testing.assert_allclose(m1["weights"], m8["weights"], atol=1e-9)
    np.testing.assert_allclose(m1["intercept"], m8["intercept"], atol=1e-9)


def test_one_step_d1_closed_form(spark):
    """The q:logreg_degenerate device: one Newton step from zero with
    d=1, no intercept, no reg gives w = 4 * sum(x*(y-0.5)) / sum(x*x)."""
    rs = np.random.RandomState(9)
    x = rs.rand(150, 1) * 3 + 0.1
    y = (x[:, 0] > 1.5).astype(int)
    model = logreg_fit(
        _df(spark, x, y), n_iter=1, reg=0.0, intercept=False
    )
    w_closed = 4.0 * np.sum(x[:, 0] * (y - 0.5)) / np.sum(x[:, 0] ** 2)
    np.testing.assert_allclose(model["weights"][0], w_closed, rtol=1e-12)


def test_predict_pure_catalyst(spark):
    rs = np.random.RandomState(3)
    x = rs.randn(50, 2)
    y = (x[:, 0] > 0).astype(int)
    model = logreg_fit(_df(spark, x, y), n_iter=4, reg=1e-3)
    out = logreg_predict(_df(spark, x, y), model).toPandas()
    # no Python stage in the scoring plan
    plan = logreg_predict(_df(spark, x, y), model)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Python" not in plan.split("Scan ExistingRDD")[0]
    w = np.asarray(model["weights"])
    expect = _sigmoid(x @ w + model["intercept"])
    got = out.sort_index()["prob"].to_numpy()
    # row order from toPandas matches createDataFrame order per partition
    np.testing.assert_allclose(np.sort(got), np.sort(expect), atol=1e-12)


def test_separable_data_survives(spark):
    x = np.linspace(-2, 2, 40).reshape(-1, 1)
    y = (x[:, 0] > 0).astype(int)  # perfectly separable
    model = logreg_fit(_df(spark, x, y), n_iter=10, reg=1e-6)
    out = logreg_predict(_df(spark, x, y), model).toPandas()
    assert np.isfinite(out["prob"]).all()
    assert model["weights"][0] > 2  # steep but finite


def test_empty_input_raises(spark):
    df = spark.createDataFrame([], "features array<double>, label int")
    with pytest.raises(ValueError, match="empty"):
        logreg_fit(df)
