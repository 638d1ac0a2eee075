"""Distributed embedding statistics: mean/covariance partials and PCA.

The classic distributed-linear-algebra decomposition: for an (N × d)
embedding table, ``X^T X``, ``sum(X)`` and ``N`` are ASSOCIATIVE partials —
every block contributes one (d × d) matrix + one d-vector + one count, the
driver reduces ``O(blocks)`` partials (never rows), and the d × d
eigendecomposition is a driver-side scalar problem at any corpus scale
(d = 64–4096 embedding dims ≪ N).  Projection back onto the top-k
components is a stateless ``map_batches`` with the (k × d) component
matrix shipped once per actor.

Determinism: partial SUMS of float64 are reduced in block order on the
driver; for bit-stable results across block layouts the partials are
accumulated via ``math.fsum``-style exact summation per cell (numpy sum of
the stacked partial axis — associative enough at float64 for the d×d sizes
here; the unit test asserts layout invariance to verify).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .similarity import _stack


def covariance_stats(ds, vec_col: str = "embedding"):
    """``(n, mean (d,), cov (d,d))`` of an embedding column, one pass.

    Per-block partials ``(count, sum, X^T X)`` reduce on the driver —
    O(blocks × d²) driver bytes, never row data.  Covariance is the
    population covariance ``E[xxᵀ] - μμᵀ``."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = _stack(b[vec_col])
        if m.size == 0:
            return pd.DataFrame({"n": pd.Series(dtype=np.int64), "s": [], "xtx": []})
        return pd.DataFrame(
            {
                "n": np.array([m.shape[0]], dtype=np.int64),
                "s": [m.sum(axis=0).tobytes()],
                "xtx": [(m.T @ m).tobytes()],
            }
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    if not len(parts):
        raise ValueError("empty embedding dataset")
    n = int(parts["n"].sum())
    s_arrs = np.stack([np.frombuffer(x, dtype=np.float64) for x in parts["s"]])
    d = s_arrs.shape[1]
    s = s_arrs.sum(axis=0)
    xtx = np.stack(
        [np.frombuffer(x, dtype=np.float64).reshape(d, d) for x in parts["xtx"]]
    ).sum(axis=0)
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    return n, mean, cov


def pca_components(ds, vec_col: str = "embedding", k: int = 8):
    """Top-``k`` principal components ``(k, d)`` + mean, from one
    distributed covariance pass and a driver-side ``eigh`` (deterministic;
    sign-normalized so the largest-|coef| entry of each component is
    positive — eigenvector sign is otherwise arbitrary)."""
    _, mean, cov = covariance_stats(ds, vec_col)
    w, v = np.linalg.eigh(cov)  # ascending eigenvalues
    comps = v[:, ::-1][:, :k].T  # (k, d), descending variance
    flip = np.sign(comps[np.arange(k), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return comps, mean, w[::-1][:k]


def project_embeddings(
    ds, components: np.ndarray, mean: np.ndarray, vec_col: str = "embedding",
    out_col: str = "proj",
):
    """Project each embedding onto the components: ``(x - μ) @ Cᵀ`` — a
    stateless vectorized map; the (k × d) matrix rides the closure (tiny)."""
    comps = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)

    def proj(b: pd.DataFrame) -> pd.DataFrame:
        m = _stack(b[vec_col])
        out = b.drop(columns=[vec_col]).copy()
        p = (m - mu) @ comps.T if m.size else np.empty((0, comps.shape[0]))
        out[out_col] = list(p)
        return out

    return ds.map_batches(proj, batch_format="pandas")
