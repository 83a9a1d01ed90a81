"""Distributed logistic regression — the quality-classifier trainer.

Corpus curation pipelines (CCNet, Gopher/FineWeb-style) train small
linear classifiers over cheap text features to score documents; this
is that trainer, built on the same scale shape as `operators/pca.py`:

* each IRLS/Newton iteration is **one narrow Arrow pass** — with the
  current weights broadcast in the closure, every partition computes
  its partial gradient ``X'(y - p)`` and Hessian ``X'WX`` with BLAS
  and emits ONE small row (d + d² doubles);
* the driver combines partition rows and solves the (d+1) x (d+1)
  system — d is the feature width (tens), never n;
* prediction is a second narrow pass (one matmul per batch).

Fully deterministic: weights start at zero, iteration count is fixed,
and L2 regularization is explicit — so a one-step d=1 model is
closed-form (w = 4 * Σx(y-½) / Σx²) and SQL-replayable, the same
degenerate-twin device the kriging and PCA families use
(q:logreg_degenerate); multi-feature multi-step training stays
rows-only (q:quality_classifier).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["logreg_fit", "logreg_predict"]


def _sigmoid(z: np.ndarray) -> np.ndarray:
    out = np.empty_like(z)
    pos = z >= 0
    out[pos] = 1.0 / (1.0 + np.exp(-z[pos]))
    ez = np.exp(z[~pos])
    out[~pos] = ez / (1.0 + ez)
    return out


def logreg_fit(
    df: DataFrame,
    features_col: str = "features",
    label_col: str = "label",
    n_iter: int = 8,
    reg: float = 0.0,
    intercept: bool = True,
) -> dict:
    """Newton/IRLS fit -> ``{"weights", "intercept", "n", "n_iter"}``.

    ``reg`` is the L2 coefficient added to the Hessian diagonal (not
    applied to the intercept).  One distributed pass per iteration;
    weights move on the driver.
    """
    if n_iter < 1:
        raise ValueError("logreg_fit: n_iter must be >= 1")
    first = df.select(F.size(features_col)).first()
    if first is None:
        raise ValueError("logreg_fit: empty input")
    d = int(first[0])
    k = d + (1 if intercept else 0)
    w = np.zeros(k)

    def make_pass(w_now: np.ndarray):
        def part(batches):
            import pandas as pd

            g = np.zeros(k)
            h = np.zeros((k, k))
            n = 0
            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.stack(
                    [np.asarray(v, np.float64) for v in pdf["f"]]
                )
                if intercept:
                    x = np.hstack([x, np.ones((len(x), 1))])
                y = pdf["y"].to_numpy(np.float64)
                p = _sigmoid(x @ w_now)
                g += x.T @ (y - p)
                wdiag = p * (1.0 - p)
                h += (x * wdiag[:, None]).T @ x
                n += len(x)
            if n:
                yield pd.DataFrame(
                    {
                        "n": [n],
                        "g": [g.tolist()],
                        "h": [h.reshape(-1).tolist()],
                    }
                )

        return part

    data = df.select(
        F.col(features_col).alias("f"),
        F.col(label_col).cast("double").alias("y"),
    )
    # every iteration re-scans `data`; persist the narrow (f, y)
    # projection so iterations 2..n read the cached columns instead of
    # re-running the feature-extraction lineage (regex/text exprs cost
    # far more than the per-row BLAS).  Single-iteration fits skip the
    # cache write — there is no reuse to pay for.
    if n_iter > 1:
        data = data.persist()
    n_total = 0
    try:
        for _ in range(n_iter):
            parts = data.mapInPandas(
                make_pass(w.copy()),
                "n long, g array<double>, h array<double>",
            ).collect()  # driver-sized: one small row per partition
            if not parts:
                raise ValueError("logreg_fit: empty input")
            n_total = sum(r["n"] for r in parts)
            g = np.zeros(k)
            h = np.zeros((k, k))
            for r in parts:
                g += np.asarray(r["g"])
                h += np.asarray(r["h"]).reshape(k, k)
            if reg:
                ridge = np.full(k, reg)
                if intercept:
                    ridge[-1] = 0.0
                g -= ridge * w
                h += np.diag(ridge)
            # damped fallback keeps a singular Hessian (separable data /
            # constant features) from aborting the fit
            try:
                step = np.linalg.solve(h, g)
            except np.linalg.LinAlgError:
                step = np.linalg.lstsq(h, g, rcond=None)[0]
            w = w + step
    finally:
        if n_iter > 1:
            data.unpersist()
    return {
        "weights": w[:d],
        "intercept": float(w[d]) if intercept else 0.0,
        "n": int(n_total),
        "n_iter": n_iter,
    }


def logreg_predict(
    df: DataFrame,
    model: dict,
    features_col: str = "features",
    out_col: str = "prob",
) -> DataFrame:
    """Score rows with a fitted model — pure Catalyst (zip_with dot
    product + sigmoid), no Python in the scoring path."""
    wts = [float(v) for v in model["weights"]]
    b = float(model.get("intercept", 0.0))
    from vtk_reserves_spark.functions.plan_literals import lit_double_array

    dot = F.aggregate(
        F.zip_with(
            F.col(features_col),
            lit_double_array(wts),
            lambda a, c: a * c,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    z = dot + F.lit(b)
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
