"""PCA / whitening over embedding columns — distributed moments,
driver-side eigendecomposition.

The embedding-pipeline companion to `operators/similarity.py`:
dimensionality reduction / whitening is the standard preprocessing
step before ANN indexing (IVF trains better on whitened vectors) and
before near-dup thresholds transfer across corpora.

Scale design (the only part that touches n rows):

* **one narrow pass** computes per-partition partial moments
  ``(count, Σx, ΣxxT)`` inside ``mapInPandas`` (Arrow-batched BLAS
  ``M.T @ M``, no Python-per-row) — the classic treeAggregate shape:
  the driver then combines **one small row per partition**
  (d + d² doubles each), driver-sized by construction like the
  convergence counts in `operators/graph.py`;
* the d x d eigendecomposition is driver-side numpy (d ≤ a few
  thousand — for 100 TB corpora d is the embedding width, not n);
* the transform broadcasts ``(mean, W)`` into a second narrow pass
  (one BLAS matmul per Arrow batch, no shuffle anywhere).

Eigenvector conventions are pinned so results are deterministic and
oracle-checkable: components sort by eigenvalue descending
(ties: first-dimension order) and each component's
largest-|coordinate| entry is made positive.  Whitening divides by
``sqrt(eigenvalue)`` with **population** (1/n) covariance.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pca_fit", "pca_transform", "pca_whiten"]


def pca_fit(df: DataFrame, vec_col: str = "embedding") -> dict:
    """One distributed pass -> ``{"mean", "components", "eigvals",
    "explained", "n"}`` (components as rows, sorted by eigenvalue
    descending, sign-pinned)."""

    def part(batches):
        import pandas as pd

        count = 0
        s = None
        ss = None
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(
                [np.asarray(v, np.float64) for v in pdf[vec_col]]
            )
            count += len(m)
            s = m.sum(0) if s is None else s + m.sum(0)
            ss = m.T @ m if ss is None else ss + m.T @ m
        if count:
            yield pd.DataFrame(
                {
                    "c": [count],
                    "s": [s.tolist()],
                    "ss": [ss.reshape(-1).tolist()],
                }
            )

    parts = (
        df.select(vec_col)
        .mapInPandas(part, "c long, s array<double>, ss array<double>")
        .collect()  # driver-sized: one small row per partition
    )
    if not parts:
        raise ValueError("pca_fit: empty input")
    n = sum(r["c"] for r in parts)
    d = len(parts[0]["s"])
    s = np.zeros(d)
    ss = np.zeros((d, d))
    for r in parts:
        s += np.asarray(r["s"])
        ss += np.asarray(r["ss"]).reshape(d, d)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)  # population covariance
    cov = (cov + cov.T) / 2.0
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1]  # descending
    eigvals = np.maximum(eigvals[order], 0.0)
    comps = eigvecs[:, order].T  # rows = components
    # sign pin: largest-|coordinate| entry positive
    for i in range(d):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    total = float(eigvals.sum()) or 1.0
    return {
        "mean": mean,
        "components": comps,
        "eigvals": eigvals,
        "explained": eigvals / total,
        "n": int(n),
    }


def pca_transform(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    k: int | None = None,
    whiten: bool = False,
    out_col: str = "projected",
    eps: float = 0.0,
) -> DataFrame:
    """Project (and optionally whiten) ``vec_col`` onto the top-k
    components — a second narrow pass, ``(mean, W)`` broadcast in the
    UDF closure, one BLAS matmul per Arrow batch."""
    mean = np.asarray(model["mean"], np.float64)
    comps = np.asarray(model["components"], np.float64)
    eig = np.asarray(model["eigvals"], np.float64)
    if k is not None:
        comps = comps[:k]
        eig = eig[:k]
    w = comps.T  # (d, k)
    if whiten and eps == 0.0 and np.any(eig == 0.0):
        raise ValueError(
            "pca_transform: whitening a zero-variance component; "
            "pass eps > 0 or reduce k"
        )
    scale = 1.0 / np.sqrt(eig + eps) if whiten else None

    @F.pandas_udf("array<double>")
    def project(vs):
        import pandas as pd

        if not len(vs):
            return pd.Series([], dtype=object)
        m = np.stack([np.asarray(v, np.float64) for v in vs])
        y = (m - mean) @ w
        if scale is not None:
            y = y * scale
        return pd.Series(list(y))

    return df.withColumn(out_col, project(F.col(vec_col)))


def pca_whiten(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int | None = None,
    whiten: bool = True,
    out_col: str = "projected",
) -> DataFrame:
    """Fit + transform in one call (two narrow passes total)."""
    model = pca_fit(df, vec_col)
    return pca_transform(
        df, model, vec_col=vec_col, k=k, whiten=whiten, out_col=out_col
    )
