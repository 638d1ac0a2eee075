import numpy as np
import pandas as pd
import ray.data as rd

from quanterra_pipeline_ray.functions.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    ivf_topk,
)

SF = "/root/testdata/sf0.001"


def _corpus():
    df = pd.read_parquet(f"{SF}/embeddings.parquet")
    return df, np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])


def test_brute_force_topk_matches_numpy():
    df, mat = _corpus()
    q = mat[:3]
    ds = rd.from_pandas(df)
    got = brute_force_topk(ds, q, k=5)
    # oracle: plain numpy cosine
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    scores = qn @ mn.T
    for qi in range(3):
        mine = got[got["query_id"] == qi]["vec_id"].tolist()
        order = np.lexsort((df["vec_id"].to_numpy(), -scores[qi]))
        expect = df["vec_id"].to_numpy()[order][:5].tolist()
        assert mine == expect
    # self-match is rank 1
    assert got[got["query_id"] == 0].iloc[0]["vec_id"] == df["vec_id"][0]


def test_ivf_topk_recall():
    df, mat = _corpus()
    q = mat[:5]
    ds = rd.from_pandas(df)
    exact = brute_force_topk(ds, q, k=5)
    approx = ivf_topk(ds, q, k=5, n_lists=8, nprobe=4)
    # recall@5 of the approximate index is decent on 500 vectors
    recalls = []
    for qi in range(5):
        e = set(exact[exact["query_id"] == qi]["vec_id"])
        a = set(approx[approx["query_id"] == qi]["vec_id"])
        recalls.append(len(e & a) / 5)
    assert np.mean(recalls) >= 0.5
    # self-vector always found (its list is the nearest probed)
    for qi in range(5):
        assert df["vec_id"][qi] in set(approx[approx["query_id"] == qi]["vec_id"])


def test_embedding_near_dup_pairs_finds_planted():
    df, mat = _corpus()
    df = df.head(50).copy()
    dup = df.head(2).copy()
    dup["vec_id"] = dup["vec_id"] + 9000  # identical vectors -> cosine 1.0
    all_df = pd.concat([df, dup], ignore_index=True)
    ds = rd.from_pandas(all_df)
    pairs = embedding_near_dup_pairs(ds, threshold=0.999)
    found = set(zip(pairs["a"], pairs["b"]))
    assert (df["vec_id"][0], df["vec_id"][0] + 9000) in found
    assert (df["vec_id"][1], df["vec_id"][1] + 9000) in found
    assert (pairs["cosine"] >= 0.999).all()


def test_seeded_sample_is_block_order_independent():
    import ray.data as rd

    from quanterra_pipeline_ray.functions.similarity import seeded_sample_vectors

    rng = np.random.default_rng(0)
    df = pd.DataFrame(
        {"vec_id": np.arange(100, dtype=np.int64), "embedding": list(rng.normal(size=(100, 8)))}
    )
    a = seeded_sample_vectors(rd.from_pandas(df), 8)
    perm = rng.permutation(100)
    b = seeded_sample_vectors(rd.from_pandas([df.iloc[perm[:50]], df.iloc[perm[50:]]]), 8)
    assert np.array_equal(a, b)


def test_ivf_full_probe_matches_brute_force():
    import ray.data as rd

    from quanterra_pipeline_ray.functions.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(1)
    df = pd.DataFrame(
        {"vec_id": np.arange(200, dtype=np.int64), "embedding": list(rng.normal(size=(200, 16)))}
    )
    q = np.stack(df["embedding"].head(2).to_numpy())
    ds = rd.from_pandas(df)
    bf = brute_force_topk(ds, q, k=5)
    ivf = ivf_topk(ds, q, k=5, n_lists=8, nprobe=8)
    assert bf["vec_id"].tolist() == ivf["vec_id"].tolist()


def test_embedding_near_dups_blocked_finds_planted(tmp_path):
    import ray.data as rd

    from quanterra_pipeline_ray.functions.similarity import embedding_near_dup_pairs

    rng = np.random.default_rng(2)
    base = pd.DataFrame(
        {"vec_id": np.arange(60, dtype=np.int64), "embedding": list(rng.normal(size=(60, 12)))}
    )
    copies = base.assign(vec_id=base["vec_id"] + 1000)
    pairs = embedding_near_dup_pairs(
        rd.from_pandas(pd.concat([base, copies], ignore_index=True)), threshold=0.999, n_lists=4
    )
    got = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    assert got == {(i, i + 1000) for i in range(60)}


def test_ivf_assign_persisted_reuse():
    """ivf_assign's materialized assignment is reusable across queries (the
    scale path: compute lists once, not per query run)."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.similarity import (
        brute_force_topk,
        ivf_assign,
        ivf_topk,
        seeded_sample_vectors,
    )

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {"vec_id": np.arange(120, dtype=np.int64), "embedding": list(rng.normal(size=(120, 8)))}
    )
    ds = rd.from_pandas(df)
    assigned, centroids = ivf_assign(ds, n_lists=6)
    assigned = assigned.materialize()
    q = np.stack(df["embedding"].head(2).to_numpy())
    a = ivf_topk(ds, q, k=4, n_lists=6, nprobe=6, assigned=assigned, centroids=centroids)
    b = brute_force_topk(ds, q, k=4)
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
