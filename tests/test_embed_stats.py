"""Distributed covariance/PCA and the mergeable quantile summary."""

import numpy as np
import pandas as pd

import ray.data as rd

from quanterra_pipeline_ray.functions.embed_stats import (
    covariance_stats,
    pca_components,
    project_embeddings,
)
from quanterra_pipeline_ray.state.sketch import QuantileSummary, approx_quantiles


def _emb(n=800, d=16, seed=2):
    rng = np.random.default_rng(seed)
    # anisotropic data so PCA has a meaningful answer
    base = rng.normal(size=(n, d)) * np.linspace(5, 0.1, d)
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(base)})


def test_covariance_matches_numpy_and_is_layout_invariant():
    df = _emb()
    x = np.stack(df["embedding"].to_numpy())
    n1, mean1, cov1 = covariance_stats(rd.from_pandas(df))
    n2, mean2, cov2 = covariance_stats(rd.from_pandas(df).repartition(13))
    assert n1 == n2 == len(df)
    assert np.allclose(mean1, x.mean(axis=0)) and np.allclose(mean1, mean2)
    ref = (x.T @ x) / len(x) - np.outer(x.mean(axis=0), x.mean(axis=0))
    assert np.allclose(cov1, ref) and np.allclose(cov1, cov2)


def test_pca_projection_recovers_variance_order():
    df = _emb()
    comps, mean, eigvals = pca_components(rd.from_pandas(df), k=4)
    assert comps.shape == (4, 16)
    assert (np.diff(eigvals) <= 1e-9).all()  # descending variance
    out = project_embeddings(rd.from_pandas(df).repartition(7), comps, mean).to_pandas()
    p = np.stack(out.sort_values("vec_id")["proj"].to_numpy())
    # projected variance per axis equals the eigenvalues (population var)
    assert np.allclose(p.var(axis=0), eigvals, rtol=1e-6)
    # components orthonormal
    assert np.allclose(comps @ comps.T, np.eye(4), atol=1e-9)


def test_quantile_summary_rank_error_bound():
    rng = np.random.default_rng(7)
    v = rng.lognormal(0, 1.0, 200_000)  # continuous domain: exact histogram inapplicable
    blocks = np.array_split(v, 64)
    acc = QuantileSummary.from_values(blocks[0], max_size=1024)
    for b in blocks[1:]:
        acc = acc.merge(QuantileSummary.from_values(b, max_size=1024))
    s = np.sort(v)
    for q in [0.01, 0.1, 0.5, 0.9, 0.99]:
        got = acc.quantile(q)
        true_rank = np.searchsorted(s, got) / len(s)
        assert abs(true_rank - q) < np.log2(64) * 1.0 / 1024 + 2 / 1024, (q, true_rank)


def test_approx_quantiles_dataset_roundtrip():
    rng = np.random.default_rng(9)
    df = pd.DataFrame({"x": rng.normal(size=50_000)})
    out = approx_quantiles(rd.from_pandas(df).repartition(16), "x", [0.25, 0.5, 0.75])
    s = np.sort(df["x"].to_numpy())
    for q, gv in zip(out["q"], out["v"]):
        true_rank = np.searchsorted(s, gv) / len(s)
        assert abs(true_rank - q) < 0.02


def test_grouped_approx_quantiles_error_bound():
    rng = np.random.default_rng(13)
    n = 60_000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "x": rng.lognormal(0, 1.0, n),
        }
    )
    from quanterra_pipeline_ray.state.sketch import grouped_approx_quantiles

    out = (
        grouped_approx_quantiles(
            rd.from_pandas(df).repartition(16), "g", "x", [0.1, 0.5, 0.9]
        )
        .to_pandas()
    )
    assert len(out) == 9
    for k, g in df.groupby("g"):
        s = np.sort(g["x"].to_numpy())
        for _, row in out[out["g"] == k].iterrows():
            true_rank = np.searchsorted(s, row["v"]) / len(s)
            assert abs(true_rank - row["q"]) < 0.03, (k, row["q"], true_rank)
