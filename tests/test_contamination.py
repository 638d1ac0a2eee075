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
