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


def test_connected_components_transitive_chain():
    """Verdict r1 done-criterion: a-b, b-c chain topology must yield one
    transitive group under the distributed min-label propagation."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.dedup import connected_components

    pairs = rd.from_pandas(pd.DataFrame({"a": [10, 20, 50], "b": [20, 30, 60]}))
    comp = connected_components(pairs)
    assert comp == {10: 10, 20: 10, 30: 10, 50: 50, 60: 50}


def test_connected_components_long_chain_converges():
    import ray.data as rd

    from quanterra_pipeline_ray.functions.dedup import connected_components

    n = 24
    pairs = rd.from_pandas(pd.DataFrame({"a": list(range(n)), "b": list(range(1, n + 1))}))
    comp = connected_components(pairs)
    assert set(comp.values()) == {0} and len(comp) == n + 1


def test_minhash_dedup_no_driver_corpus_materialization():
    """minhash_lsh_dedup returns a lazy Dataset labeled via a broadcast
    component map — the corpus itself is never collected."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.dedup import minhash_lsh_dedup

    df = pd.DataFrame(
        {
            "doc_id": np.arange(8, dtype=np.int64),
            "text": [
                "the quick brown fox jumps over the lazy dog again and again",
                "the quick brown fox jumps over the lazy dog again and again!",  # near-dup of 0
                "completely different words about tables and shuffles here",
                "another unrelated document mentioning manifests and snapshots",
                "the quick brown fox jumps over the lazy dog again and again",   # exact dup of 0
                "short text one", "short text two", "unrelated third phrase entirely",
            ],
        }
    )
    out = minhash_lsh_dedup(rd.from_pandas(df), threshold=0.8)
    assert not isinstance(out, (pd.DataFrame, pa.Table))  # stays a Dataset
    got = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got.loc[0, "dup_group"] == 0 and got.loc[1, "dup_group"] == 0
    assert got.loc[4, "dup_group"] == 0
    assert got.loc[2, "dup_group"] == 2 and got.loc[3, "dup_group"] == 3


def test_popcount64_vectorized():
    from quanterra_pipeline_ray.functions.dedup import popcount64

    x = np.array([0, 1, 3, 0xFFFFFFFFFFFFFFFF, 1 << 63, 0x5555555555555555], dtype=np.uint64)
    assert popcount64(x).tolist() == [0, 1, 2, 64, 1, 32]


def test_simhash_exact_pairs_finds_planted_copies():
    import ray.data as rd

    from quanterra_pipeline_ray.functions.dedup import simhash_exact_pairs

    df = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["alpha beta gamma delta", "epsilon zeta eta theta",
                     "alpha beta gamma delta", "iota kappa lambda mu"],
        }
    )
    pairs = simhash_exact_pairs(rd.from_pandas(df)).to_pandas()
    assert list(map(tuple, pairs[["a", "b"]].to_numpy())) == [(0, 2)]


def test_exact_shingles_match_sql_gram_semantics():
    """exact_shingles == distinct substr(text, i, 5) gram set (the oracle's
    definition), byte-for-byte for ASCII."""
    from quanterra_pipeline_ray.functions.dedup import exact_shingles, ngram_jaccard

    t = "abcdefg abcdefg"
    grams = {t[i : i + 5] for i in range(len(t) - 4)}
    # k<=8 shingles pack bijectively into uint64 (big-endian byte value)
    got = {
        int(g).to_bytes(5, "big").decode() for g in exact_shingles(t, 5)
    }
    assert got == grams
    # k>8 keeps the fixed-width byte representation
    got9 = {g.decode() for g in exact_shingles(t, 9)}
    assert got9 == {t[i : i + 9] for i in range(len(t) - 8)}
    assert ngram_jaccard(t, t) == 1.0
    assert 0.0 < ngram_jaccard("abcdefghij", "abcdefzzzz") < 1.0


def test_ngram_jaccard_join_matches_bruteforce():
    """Prefix-filtered exact Jaccard join == brute-force all-pairs scan
    (completeness of the AllPairs prefix filter on real-ish text)."""
    import itertools

    import ray.data as rd

    from quanterra_pipeline_ray.functions.dedup import ngram_jaccard, ngram_jaccard_join

    rng = np.random.default_rng(11)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel"]
    texts = []
    for i in range(30):
        base = " ".join(rng.choice(words, size=30))
        texts.append(base)
        if i % 3 == 0:  # planted near-dup: one word substituted
            toks = base.split()
            toks[rng.integers(len(toks))] = "zulu"
            texts.append(" ".join(toks))
        if i % 7 == 0:
            texts.append(base)  # identical copy
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})

    expected = sorted(
        (int(a), int(b))
        for (a, ta), (b, tb) in itertools.combinations(zip(df["doc_id"], df["text"]), 2)
        if ngram_jaccard(ta, tb, 5) >= 0.8
    )
    assert expected, "fixture must contain true near-dup pairs"

    got = ngram_jaccard_join(rd.from_pandas(df), threshold=0.8, n_buckets=8).to_pandas()
    assert sorted(zip(got["a"], got["b"])) == expected


def test_ngram_jaccard_join_empty_and_disjoint():
    import ray.data as rd

    from quanterra_pipeline_ray.functions.dedup import ngram_jaccard_join

    df = pd.DataFrame(
        {"doc_id": np.arange(4, dtype=np.int64),
         "text": ["aaaaa bbbbb", "ccccc ddddd", "eeeee fffff", "ggggg hhhhh"]}
    )
    got = ngram_jaccard_join(rd.from_pandas(df), threshold=0.8, n_buckets=4)
    assert got.count() == 0


def test_batched_shingle_hashes_bit_identical_to_per_doc():
    """The batched rolling-hash kernel must return EXACTLY what the per-doc
    kernel returns (same base, padding, distinct + per-doc sort) — including
    short docs (padded to one window), empty strings, and unicode."""
    from quanterra_pipeline_ray.functions.dedup import (
        _batched_shingle_hashes,
        _shingle_hashes,
    )

    rng = np.random.default_rng(3)
    words = ["alpha", "bravo", "charlie", "δδδ", "中文中文", "e"]
    texts = [" ".join(rng.choice(words, size=n)) for n in (1, 2, 5, 30, 80)]
    texts += ["", "ab", "aaaaa", "exactly5char"]
    for k in (3, 5, 9):
        sh, starts = _batched_shingle_hashes(texts, k)
        assert len(starts) == len(texts) + 1
        for i, t in enumerate(texts):
            got = sh[starts[i] : starts[i + 1]]
            want = _shingle_hashes(t, k)
            assert np.array_equal(got, want), (i, k)


def test_minhasher_batched_signatures_bit_identical():
    """MinHasher's batched segmented-reduce path == the per-doc signature()."""
    from quanterra_pipeline_ray.functions.dedup import MinHasher

    rng = np.random.default_rng(11)
    words = ["alpha", "bravo", "charlie", "delta", "echo"]
    texts = [" ".join(rng.choice(words, size=n)) for n in (2, 3, 10, 40, 200)]
    m = MinHasher(num_hashes=32, shingle_k=5, seed=99)
    batch = pd.DataFrame({"text": texts})
    out = m(batch.copy())
    for sig, t in zip(out["__sig"], texts):
        assert np.array_equal(np.asarray(sig), m.signature(t))
