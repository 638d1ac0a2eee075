"""Benchmark-contamination flagging (functions/contamination.py)."""

import numpy as np
import pandas as pd

import ray.data as rd

from quanterra_pipeline_ray.functions.contamination import (
    benchmark_phrases,
    flag_contaminated,
)


def _corpus():
    texts = [
        "the quick brown fox jumps over the lazy dog and runs away fast tonight ok",
        "AAAA completely unrelated document about parquet file compaction strategies",
        "prefix THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG embedded in other text",
        "short",
        "regex special chars like a+b*c (paren) [brkt] should be literal matches!!",
        "payload regex special chars like a+b*c (paren) [brkt] should be literal.",
    ]
    return pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})


def test_flag_contaminated_substring_semantics():
    df = _corpus()
    # hand-built benchmark: phrase from doc 0 (chars 4..44) and a regex-special one
    phrases = [df["text"][0][4:44].lower(), "a+b*c (paren) [brkt]"]
    got = (
        flag_contaminated(rd.from_pandas(df), phrases)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = [
        any(p in t.lower() for p in phrases) for t in df["text"]
    ]
    assert got["contaminated"].to_list() == want
    assert got["contaminated"].to_list() == [True, False, True, False, True, True]


def test_benchmark_phrases_deterministic_and_bounded():
    rng = np.random.default_rng(3)
    n = 4_000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["word%d " % i * 20 for i in range(n)],
        }
    )
    p1 = benchmark_phrases(rd.from_pandas(df), fraction=0.02, seed=7)
    p2 = benchmark_phrases(rd.from_pandas(df).repartition(13), fraction=0.02, seed=7)
    assert p1 == p2  # layout-invariant and deterministic
    assert 0 < len(p1) < 0.05 * n  # the small side stays small
    assert all(p == p.lower() and len(p) == 40 for p in p1)


def test_flag_contaminated_empty_benchmark():
    df = _corpus()
    got = flag_contaminated(rd.from_pandas(df), []).to_pandas()
    assert not got["contaminated"].any()


def test_flag_contaminated_ngrams_membership_semantics():
    from quanterra_pipeline_ray.functions.contamination import (
        _word_ngrams,
        benchmark_ngrams,
        flag_contaminated_ngrams,
    )

    df = _corpus()
    grams = frozenset(_word_ngrams(df["text"][0], 3))
    got = (
        flag_contaminated_ngrams(rd.from_pandas(df), grams, n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = [
        any(x in grams for x in _word_ngrams(t, 3)) for t in df["text"]
    ]
    assert got["contaminated"].to_list() == want
    assert want[0] and want[2] and not want[1]  # doc 2 shares doc 0's grams case-folded

    # benchmark set is deterministic and layout-invariant
    b1 = benchmark_ngrams(rd.from_pandas(df), fraction=0.5, n=3, seed=13)
    b2 = benchmark_ngrams(rd.from_pandas(df).repartition(5), fraction=0.5, n=3, seed=13)
    assert b1 == b2 and len(b1) > 0

    # short docs (< n words) are never flagged
    short = pd.DataFrame({"doc_id": [99], "text": ["two words"]})
    out = flag_contaminated_ngrams(rd.from_pandas(short), b1, n=3).to_pandas()
    assert not out["contaminated"].any()


def test_aho_corasick_matches_regex_semantics():
    """AC == compiled-alternation regex on adversarial cases: overlapping
    phrases, phrases that are prefixes/suffixes of each other, fail-link
    transitions mid-match, and random corpora."""
    import re

    from quanterra_pipeline_ray.functions.contamination import AhoCorasick

    cases = [
        (["he", "she", "his", "hers"], ["ushers", "shis", "ahishe", "xyz", "hh", ""]),
        (["aa", "aaa"], ["a", "aa", "baa", "ab"]),
        (["abcd"], ["abcabcd", "abc", "ababcd"]),
        (["b", "abc"], ["aac", "ab", "c"]),
    ]
    rng = np.random.default_rng(3)
    alpha = list("abcde")
    rand_phrases = [
        "".join(rng.choice(alpha, size=int(rng.integers(2, 6)))) for _ in range(50)
    ]
    rand_texts = ["".join(rng.choice(alpha, size=200)) for _ in range(40)]
    cases.append((sorted(set(rand_phrases)), rand_texts))

    for phrases, texts in cases:
        ac = AhoCorasick(phrases)
        rx = re.compile("|".join(re.escape(p) for p in phrases))
        for t in texts:
            assert ac.contains_any(t) == bool(rx.search(t)), (phrases, t)


def test_flag_contaminated_ac_matches_regex_flagger():
    from quanterra_pipeline_ray.functions.contamination import (
        benchmark_phrase_windows,
        flag_contaminated,
        flag_contaminated_ac,
    )

    rng = np.random.default_rng(9)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "purchase"]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(120, dtype=np.int64),
            "text": [
                " ".join(rng.choice(words, size=int(rng.integers(20, 60))))
                for _ in range(120)
            ],
        }
    )
    ds = rd.from_pandas(df)
    phrases = benchmark_phrase_windows(ds, fraction=0.5, seed=7, count=4)
    assert len(phrases) > 10
    a = flag_contaminated_ac(ds, phrases).to_pandas().sort_values("doc_id")
    b = flag_contaminated(ds, phrases).to_pandas().sort_values("doc_id")
    assert a["contaminated"].to_list() == b["contaminated"].to_list()
    assert a["contaminated"].any()

    # empty benchmark: nothing flagged
    none = flag_contaminated_ac(ds, []).to_pandas()
    assert not none["contaminated"].any()

    # deterministic + layout-invariant phrase windows
    p2 = benchmark_phrase_windows(ds.repartition(7), fraction=0.5, seed=7, count=4)
    assert phrases == p2


def test_flag_contaminated_ac_sharded_matches_unsharded():
    """Shard-count invariance: the chained shard stages produce the same
    flags as the single automaton for K in {1, 3, 7} (incl. K > the
    useful phrase count edge), and the empty set flags nothing."""
    from quanterra_pipeline_ray.functions.contamination import (
        benchmark_phrase_windows,
        flag_contaminated_ac,
        flag_contaminated_ac_sharded,
    )

    rng = np.random.default_rng(21)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "purchase"]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(150, dtype=np.int64),
            "text": [
                " ".join(rng.choice(words, size=int(rng.integers(20, 60))))
                for _ in range(150)
            ],
        }
    )
    ds = rd.from_pandas(df)
    phrases = benchmark_phrase_windows(ds, fraction=0.5, seed=7, count=4)
    assert len(phrases) > 10
    want = (
        flag_contaminated_ac(ds, phrases)
        .to_pandas()
        .sort_values("doc_id")["contaminated"]
        .to_list()
    )
    assert any(want)
    for k in (1, 3, 7):
        got = (
            flag_contaminated_ac_sharded(ds, phrases, n_shards=k)
            .to_pandas()
            .sort_values("doc_id")["contaminated"]
            .to_list()
        )
        assert got == want, f"n_shards={k}"

    none = flag_contaminated_ac_sharded(ds, [], n_shards=3).to_pandas()
    assert not none["contaminated"].any()
