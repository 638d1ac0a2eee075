"""Continuous-ingest dedup flow: probe -> greedy survivors -> append+extend."""

import itertools

import numpy as np
import pandas as pd

import ray.data as rd

from quanterra_pipeline_ray.functions.dedup import ngram_jaccard
from quanterra_pipeline_ray.pipelines.incremental_ingest import (
    _survivors,
    ingest_with_dedup,
)


def _mk(ids, texts):
    return pd.DataFrame({"doc_id": np.asarray(ids, dtype=np.int64), "text": texts})


def _greedy_reference(batches, threshold=0.8):
    """Brute-force sequential semantics: accepted history always wins; within
    a batch, ascending id, drop iff similar to any accepted doc."""
    accepted = []  # (id, text)
    kept_per_batch = []
    for df in batches:
        kept_now = []
        for i, t in sorted(zip(df["doc_id"], df["text"])):
            blocked = any(
                ngram_jaccard(t, t2, 5) >= threshold for _, t2 in accepted
            ) or any(ngram_jaccard(t, t2, 5) >= threshold for _, t2 in kept_now)
            if not blocked:
                kept_now.append((int(i), t))
        accepted.extend(kept_now)
        kept_per_batch.append({i for i, _ in kept_now})
    return kept_per_batch


def test_survivors_greedy_chain():
    """Chain a~b~c (a<b<c, a!~c): greedy keeps a and c, drops only b."""
    pairs = pd.DataFrame({"a": [1, 2], "b": [2, 3]})
    kept, drops = _survivors(np.array([1, 2, 3]), pairs)
    assert kept == {1, 3}
    assert drops == [(2, 1)]


def test_survivors_history_always_blocks():
    """A pair against a history id (not in the batch) drops the batch doc."""
    pairs = pd.DataFrame({"a": [900], "b": [5]})  # 900 = history
    kept, drops = _survivors(np.array([5, 6]), pairs)
    assert kept == {6}
    assert drops == [(5, 900)]


def test_ingest_flow_matches_sequential_reference(ray_session, tmp_path):
    rng = np.random.default_rng(31)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf", "hotel"]

    def text():
        return " ".join(rng.choice(words, size=30))

    base_texts = [text() for _ in range(12)]
    # batch 0: unique docs + one in-batch duplicate pair
    b0 = _mk(range(0, 13), base_texts + [base_texts[0]])
    # batch 1: two dups of batch-0 docs + fresh docs
    b1 = _mk(range(100, 106), [base_texts[1], base_texts[2]] + [text() for _ in range(4)])
    # batch 2: dup of a batch-1 FRESH doc + dup of a batch-1 DROPPED doc's
    # text (blocked by the batch-0 original that was kept) + fresh
    b1_fresh = b1["text"].iloc[3]
    b2 = _mk(range(200, 204), [b1_fresh, base_texts[1], text(), text()])

    store = str(tmp_path / "store")
    reports = [
        ingest_with_dedup(rd.from_pandas(b), store, threshold=0.8)
        for b in (b0, b1, b2)
    ]
    expected = _greedy_reference([b0, b1, b2])

    got_corpus = pd.read_parquet(f"{store}/corpus")
    kept_ids = set(got_corpus["doc_id"].astype(int))
    assert kept_ids == set().union(*expected)
    for rep, exp in zip(reports, expected):
        assert rep["n_kept"] == len(exp)
    # the planted cases actually exercised the paths
    assert 12 not in kept_ids  # in-batch dup of doc 0
    assert 100 not in kept_ids and 101 not in kept_ids  # cross-batch dups
    assert 200 not in kept_ids and 201 not in kept_ids
    # every drop names its blocker
    all_drops = dict((d, k) for rep in reports for d, k in rep["drops"])
    assert all_drops[12] == 0
    assert all_drops[201] in (1,)  # blocked by the ORIGINAL, 101 was never accepted


def test_ingest_flow_state_counts(ray_session, tmp_path):
    store = str(tmp_path / "store")
    b0 = _mk([1, 2], ["aaaa bbbb cccc dddd", "eeee ffff gggg hhhh"])
    rep0 = ingest_with_dedup(rd.from_pandas(b0), store)
    assert rep0 == {
        "batch_no": 0, "n_batch": 2, "n_kept": 2, "n_dropped": 0, "drops": [],
    }
    b1 = _mk([3], ["aaaa bbbb cccc dddd"])  # exact dup of doc 1
    rep1 = ingest_with_dedup(rd.from_pandas(b1), store)
    assert rep1["n_kept"] == 0 and rep1["drops"] == [(3, 1)]
    import json

    state = json.load(open(f"{store}/ingest_state.json"))
    assert state == {"batches": 2, "docs": 2}
