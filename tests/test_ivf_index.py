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


def test_rebalance_splits_hot_lists_and_stays_exact(ray_session, tmp_path):
    """A skewed index rebalance: splits reduce the max/mean list-size ratio,
    n_vectors is preserved, full-probe search still equals brute force, and
    extend keeps working under the new centroid set."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.functions.ivf_index import (
        build_ivf_index,
        extend_ivf_index,
        list_sizes,
        read_ivf_meta,
        rebalance_ivf_index,
        search_ivf_index,
    )
    from quanterra_pipeline_ray.functions.similarity import _normalize

    rng = np.random.default_rng(4)
    # skew: 80% of vectors in one tight cluster, rest spread out
    hot = rng.normal(loc=5.0, scale=0.05, size=(400, 16))
    cold = rng.normal(loc=0.0, scale=3.0, size=(100, 16))
    vecs = np.vstack([hot, cold])
    df = pd.DataFrame(
        {"vec_id": np.arange(len(vecs), dtype=np.int64),
         "embedding": [v.astype(np.float32).tolist() for v in vecs]}
    )
    idx = str(tmp_path / "ivf")
    build_ivf_index(rd.from_pandas(df), idx, n_lists=8)

    before = list_sizes(idx)
    meta = rebalance_ivf_index(idx, max_ratio=2.0)
    after = list_sizes(idx)
    assert int(after.sum()) == len(df) == meta["n_vectors"]
    assert meta["n_lists"] == len(after) > 8
    assert after.max() / after.mean() < before.max() / before.mean()

    # exactness at full probe, before vs after must both match brute force
    q = vecs[:2]
    got = search_ivf_index(q, idx, k=5, nprobe=meta["n_lists"])
    qn = _normalize(np.asarray(q, dtype=np.float64))
    # reference must use the STORED (float32-rounded) corpus values — the
    # hot cluster is near-tied, so pre-rounding vectors flip the top-k
    stored = np.stack([np.asarray(v, dtype=np.float32) for v in df["embedding"]])
    vn = _normalize(stored.astype(np.float64))
    s = qn @ vn.T
    # the hot cluster is near-TIED at the ulp level (400 vectors within
    # ~1e-6 cosine), so id-set equality is ill-defined across summation
    # orders; assert score-level exactness instead: 5 results per query,
    # every returned score >= the reference 5th-best (up to 1e-9)
    for qi in range(2):
        ref5 = np.sort(s[qi])[::-1][:5]
        g = got[got["query_id"] == qi]
        assert len(g) == 5
        have_scores = np.sort(s[qi][g["vec_id"].astype(int).to_numpy()])[::-1]
        assert (have_scores >= ref5[-1] - 1e-9).all()
        assert np.allclose(have_scores, ref5, atol=1e-9)

    # extend after rebalance routes under the new table
    extra = pd.DataFrame(
        {"vec_id": np.array([9_000], dtype=np.int64),
         "embedding": [vecs[0].astype(np.float32).tolist()]}
    )
    extend_ivf_index(rd.from_pandas(extra), idx)
    got2 = search_ivf_index(vecs[:1], idx, k=2, nprobe=read_ivf_meta(idx)["n_lists"])
    assert 9_000 in set(got2["vec_id"].astype(int))


def test_rebalance_sweeps_orphan_dirs_and_noops_when_balanced(ray_session, tmp_path):
    import os

    import numpy as np
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.functions.ivf_index import (
        build_ivf_index,
        list_sizes,
        rebalance_ivf_index,
    )

    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(120, 8))
    df = pd.DataFrame(
        {"vec_id": np.arange(len(vecs), dtype=np.int64),
         "embedding": [v.astype(np.float32).tolist() for v in vecs]}
    )
    idx = str(tmp_path / "ivf")
    build_ivf_index(rd.from_pandas(df), idx, n_lists=4)

    # simulate a crash-between-steps leftover: a dir whose id is not in the
    # centroid table must be swept, never probed
    orphan = os.path.join(idx, "vectors", "lst=999")
    os.makedirs(orphan)
    pd.DataFrame({"vec_id": [1], "embedding": [vecs[0].astype(np.float32).tolist()]}).to_parquet(
        os.path.join(orphan, "junk.parquet")
    )
    meta = rebalance_ivf_index(idx, max_ratio=1e9)  # threshold too high: no split
    assert not os.path.isdir(orphan)
    assert meta["last_rebalance"]["split"] == 0 or meta["last_rebalance"]["hot"] == []
    assert int(list_sizes(idx).sum()) == len(df)
