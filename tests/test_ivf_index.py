"""Persisted IVF embedding index: build / extend / search / near-dup probe."""

import glob
import os

import numpy as np
import pandas as pd

import ray.data as rd

from quanterra_pipeline_ray.functions.ivf_index import (
    _partition_files,
    build_ivf_index,
    extend_ivf_index,
    probe_ivf_near_dups,
    read_ivf_meta,
    search_ivf_index,
)


def _vectors(seed: int, n: int, dim: int = 16, start_id: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim))
    return pd.DataFrame(
        {
            "vec_id": np.arange(start_id, start_id + n, dtype=np.int64),
            "embedding": [row.astype(np.float32).tolist() for row in m],
        }
    )


def _brute_topk(corpus: pd.DataFrame, queries: np.ndarray, k: int) -> list:
    m = np.stack([np.asarray(v, dtype=np.float64) for v in corpus["embedding"]])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    q = np.asarray(queries, dtype=np.float64)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    s = q @ m.T
    ids = corpus["vec_id"].to_numpy()
    out = []
    for qi in range(len(q)):
        order = sorted(zip(-s[qi], ids))[:k]  # score desc, id asc tiebreak
        out.append([int(i) for _, i in order])
    return out


def test_build_search_exact_when_all_lists_probed(ray_session, tmp_path):
    df = _vectors(5, 200)
    idx = str(tmp_path / "ivf")
    meta = build_ivf_index(rd.from_pandas(df), idx, n_lists=8)
    assert meta["n_vectors"] == 200 and meta["n_lists"] == 8

    q = np.stack([np.asarray(v, dtype=np.float64) for v in df.head(3)["embedding"]])
    got = search_ivf_index(q, idx, k=10, nprobe=8)
    expected = _brute_topk(df, q, 10)
    for qi in range(3):
        rows = got[got["query_id"] == qi].sort_values(
            ["score", "vec_id"], ascending=[False, True]
        )
        assert list(rows["vec_id"].astype(int)) == expected[qi]


def test_extend_then_search_sees_new_vectors(ray_session, tmp_path):
    base = _vectors(7, 150)
    batch = _vectors(11, 50, start_id=10_000)
    # plant: batch contains an exact copy of a base vector under a new id
    batch.at[0, "embedding"] = base["embedding"].iloc[0]
    idx = str(tmp_path / "ivf")
    build_ivf_index(rd.from_pandas(base), idx, n_lists=8)
    files_before = set(glob.glob(os.path.join(idx, "vectors", "*", "*.parquet")))
    extend_ivf_index(rd.from_pandas(batch), idx)
    files_after = set(glob.glob(os.path.join(idx, "vectors", "*", "*.parquet")))
    assert files_before < files_after  # append-only: old files untouched
    assert read_ivf_meta(idx)["n_vectors"] == 200

    union = pd.concat([base, batch], ignore_index=True)
    q = np.stack([np.asarray(base["embedding"].iloc[0], dtype=np.float64)])
    got = search_ivf_index(q, idx, k=5, nprobe=8)
    expected = _brute_topk(union, q, 5)[0]
    rows = got[got["query_id"] == 0].sort_values(["score", "vec_id"], ascending=[False, True])
    assert list(rows["vec_id"].astype(int)) == expected
    assert 10_000 in expected  # the planted copy ranks at the top


def test_search_prunes_partitions(ray_session, tmp_path):
    df = _vectors(13, 300)
    idx = str(tmp_path / "ivf")
    build_ivf_index(rd.from_pandas(df), idx, n_lists=16)
    all_files = _partition_files(idx, range(16))
    some_files = _partition_files(idx, range(2))
    assert 0 < len(some_files) < len(all_files)

    q = np.stack([np.asarray(df["embedding"].iloc[0], dtype=np.float64)])
    got = search_ivf_index(q, idx, k=3, nprobe=2)
    # with nprobe=2 the query's own vector is in its nearest list -> found
    assert int(df["vec_id"].iloc[0]) in set(got["vec_id"].astype(int))


def test_near_dup_probe_finds_cross_and_within_batch_pairs(ray_session, tmp_path):
    base = _vectors(17, 100)
    batch = _vectors(19, 30, start_id=10_000)
    batch.at[0, "embedding"] = base["embedding"].iloc[3]  # cross pair
    batch.at[1, "embedding"] = batch["embedding"].iloc[5]  # within-batch pair
    idx = str(tmp_path / "ivf")
    build_ivf_index(rd.from_pandas(base), idx, n_lists=8)
    pairs = probe_ivf_near_dups(
        rd.from_pandas(batch), idx, threshold=0.999, probes=2
    ).to_pandas()
    got = set(zip(pairs["a"].astype(int), pairs["b"].astype(int)))
    assert (3, 10_000) in got
    assert (10_001, 10_005) in got
    # every pair touches the batch; cosines are ~1 for planted copies
    assert all(a >= 10_000 or b >= 10_000 for a, b in got)
    assert (pairs["cosine"] >= 0.999).all()
