import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from quanterra_pipeline_ray.functions.dedup import (
    MinHasher,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard,
    simhash_dedup,
)

SF = "/root/testdata/sf0.001"


def _docs_with_dups() -> pd.DataFrame:
    base = pd.read_parquet(f"{SF}/documents.parquet")[["doc_id", "text"]].head(60)
    exact = base.head(5).copy()
    exact["doc_id"] = exact["doc_id"] + 10_000  # exact dup of docs 0-4
    near = base.iloc[5:10].copy()
    near["doc_id"] = near["doc_id"] + 20_000
    near["text"] = near["text"] + " tail"  # near dup of docs 5-9
    return pd.concat([base, exact, near], ignore_index=True)


def test_exact_dedup_removes_only_exact():
    df = _docs_with_dups()
    ds = rd.from_pandas(df)
    out = exact_dedup(ds, "doc_id", "text").to_pandas()
    assert len(out) == 65  # 60 unique + 5 near (not exact)
    # survivor of each exact pair is the lower id
    assert set(out["doc_id"]) >= set(range(5))
    assert not (out["doc_id"] >= 10_000).iloc[:0].any()
    assert not set(out["doc_id"]).intersection(range(10_000, 10_005))


def test_ngram_jaccard_values():
    assert ngram_jaccard("abcdef", "abcdef") == 1.0
    assert ngram_jaccard("abcdef", "zzzzzz") == 0.0
    j = ngram_jaccard("the quick brown fox", "the quick brown cat")
    assert 0.3 < j < 0.9


def test_minhash_similarity_tracks_jaccard():
    m = MinHasher()
    a = "the quick brown fox jumps over the lazy dog " * 4
    b = a + " extra tail"
    c = "completely different content with other words entirely " * 4
    sim_ab = (m.signature(a) == m.signature(b)).mean()
    sim_ac = (m.signature(a) == m.signature(c)).mean()
    assert sim_ab > 0.7
    assert sim_ac < 0.2


def test_minhash_lsh_dedup_groups():
    df = _docs_with_dups()
    ds = rd.from_pandas(df)
    groups = minhash_lsh_dedup(ds, "doc_id", "text", threshold=0.7).to_pandas()
    assert len(groups) == len(df)
    g = groups.set_index("doc_id")["dup_group"]
    for i in range(5):  # exact dups grouped with originals
        assert g[i + 10_000] == g[i] == i
    for i in range(5, 10):  # near dups grouped too (small tail)
        assert g[i + 20_000] == g[i]
    # distinct docs keep themselves as group
    assert g[20] == 20


def test_simhash_finds_near_dups():
    df = _docs_with_dups()
    ds = rd.from_pandas(df)
    pairs = simhash_dedup(ds, "doc_id", "text", max_hamming=6).to_pandas()
    found = set(zip(pairs["a"], pairs["b"]))
    for i in range(5):
        assert (i, i + 10_000) in found  # exact dup -> hamming 0
    assert all(h <= 6 for h in pairs["hamming"])
