"""Persisted MinHash-LSH band index: build / extend / probe."""

import itertools

import numpy as np
import pandas as pd

import ray.data as rd

from quanterra_pipeline_ray.functions.dedup import ngram_jaccard
from quanterra_pipeline_ray.functions.minhash_index import (
    build_minhash_index,
    extend_minhash_index,
    probe_minhash_index,
    read_minhash_meta,
)


def _corpus(seed: int, n: int, start_id: int = 0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel"]
    texts = []
    for i in range(n):
        base = " ".join(rng.choice(words, size=30))
        texts.append(base)
        if i % 3 == 0:
            toks = base.split()
            toks[rng.integers(len(toks))] = "zulu"  # near-dup, J >> 0.8
            texts.append(" ".join(toks))
        if i % 7 == 0:
            texts.append(base)  # identical copy
    return pd.DataFrame(
        {"doc_id": np.arange(start_id, start_id + len(texts), dtype=np.int64), "text": texts}
    )


def _true_pairs(df, new_ids, threshold=0.8):
    return sorted(
        (int(a), int(b))
        for (a, ta), (b, tb) in itertools.combinations(zip(df["doc_id"], df["text"]), 2)
        if (int(a) in new_ids or int(b) in new_ids) and ngram_jaccard(ta, tb, 5) >= threshold
    )


def test_probe_matches_reference(ray_session, tmp_path):
    df = _corpus(13, 24)
    new_mask = df["doc_id"] % 4 == 0
    old, new = df[~new_mask], df[new_mask]
    idx = str(tmp_path / "mh")
    meta = build_minhash_index(rd.from_pandas(old), idx, n_buckets=32)
    assert meta["n_docs"] == len(old)

    got = (
        probe_minhash_index(rd.from_pandas(new), idx, rd.from_pandas(df), threshold=0.8)
        .to_pandas()
    )
    got_pairs = sorted(zip(got["a"].astype(int), got["b"].astype(int)))
    expected = _true_pairs(df, set(new["doc_id"].astype(int)))
    assert expected
    assert got_pairs == expected  # banding recall is perfect on planted dups


def test_extend_then_probe(ray_session, tmp_path):
    b0 = _corpus(5, 10)
    b1 = _corpus(50, 5, start_id=1_000)
    b2 = pd.DataFrame({"doc_id": [2_000], "text": [b1["text"].iloc[0]]})  # dup of b1 doc
    idx = str(tmp_path / "mh")
    build_minhash_index(rd.from_pandas(b0), idx, n_buckets=32)
    extend_minhash_index(rd.from_pandas(b1), idx)
    assert read_minhash_meta(idx)["n_docs"] == len(b0) + len(b1)

    union = pd.concat([b0, b1, b2], ignore_index=True)
    got = (
        probe_minhash_index(rd.from_pandas(b2), idx, rd.from_pandas(union), threshold=0.8)
        .to_pandas()
    )
    pairs = set(zip(got["a"].astype(int), got["b"].astype(int)))
    assert (int(b1["doc_id"].iloc[0]), 2_000) in pairs
    assert all(a == 2_000 or b == 2_000 for a, b in pairs)


def test_probe_empty_and_disjoint(ray_session, tmp_path):
    df = pd.DataFrame(
        {"doc_id": np.arange(3, dtype=np.int64),
         "text": ["aaaaa bbbbb ccccc", "ddddd eeeee fffff", "ggggg hhhhh iiiii"]}
    )
    idx = str(tmp_path / "mh")
    build_minhash_index(rd.from_pandas(df), idx, n_buckets=8)
    new = pd.DataFrame({"doc_id": [9], "text": ["jjjjj kkkkk lllll"]})
    res = probe_minhash_index(rd.from_pandas(new), idx, rd.from_pandas(pd.concat([df, new])))
    assert res.count() == 0


def test_minhash_index_compaction_layout_only(ray_session, tmp_path):
    import glob

    from quanterra_pipeline_ray.functions.minhash_index import (
        build_minhash_index,
        compact_minhash_index,
        extend_minhash_index,
        probe_minhash_index,
    )

    old = _corpus(41, 24)
    idx = str(tmp_path / "mhidx")
    build_minhash_index(rd.from_pandas(old.iloc[:20]), idx, n_buckets=16)
    extend_minhash_index(rd.from_pandas(old.iloc[20:30]), idx)
    extend_minhash_index(rd.from_pandas(old.iloc[30:]), idx)
    new = _corpus(42, 6, start_id=10_000)
    corpus = rd.from_pandas(pd.concat([old, new], ignore_index=True))

    def got(res):
        p = res.to_pandas()
        return sorted(zip(p["a"].astype(int), p["b"].astype(int)))

    before = got(probe_minhash_index(rd.from_pandas(new), idx, corpus))
    files_before = len(glob.glob(f"{idx}/bands/bkt=*/*.parquet"))
    stats = compact_minhash_index(idx)
    assert stats["buckets_compacted"] > 0
    files_after = len(glob.glob(f"{idx}/bands/bkt=*/*.parquet"))
    assert files_after < files_before
    assert got(probe_minhash_index(rd.from_pandas(new), idx, corpus)) == before
