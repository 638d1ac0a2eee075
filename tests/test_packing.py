"""Distributed prefix sum and fixed-budget sequence packing."""

import numpy as np
import pandas as pd

import ray.data as rd

from quanterra_pipeline_ray.functions.packing import global_cumsum, pack_sequences


def test_global_cumsum_matches_pandas():
    rng = np.random.default_rng(3)
    n = 5_000
    ids = rng.permutation(n).astype(np.int64)  # unique, shuffled arrival order
    vals = rng.integers(0, 50, size=n).astype(np.int64)
    df = pd.DataFrame({"doc_id": ids, "tokens": vals})

    got = (
        global_cumsum(rd.from_pandas(df), "tokens", "doc_id", n_buckets=16)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values("doc_id").reset_index(drop=True)
    ref["cumsum_before"] = ref["tokens"].cumsum() - ref["tokens"]
    pd.testing.assert_frame_equal(
        got[["doc_id", "tokens", "cumsum_before"]],
        ref[["doc_id", "tokens", "cumsum_before"]],
    )


def test_global_cumsum_inclusive_and_sparse_keys():
    # sparse, highly-skewed key space: most rows land in one range bucket
    ids = np.array([0, 1, 2, 3, 1_000_000], dtype=np.int64)
    vals = np.array([10, 20, 30, 40, 50], dtype=np.int64)
    df = pd.DataFrame({"k": ids, "v": vals})
    got = (
        global_cumsum(rd.from_pandas(df), "v", "k", inclusive=True, n_buckets=8)
        .to_pandas()
        .sort_values("k")
    )
    assert list(got["cumsum_before"]) == [10, 30, 60, 100, 150]


def test_pack_sequences_matches_window_rule():
    rng = np.random.default_rng(9)
    n = 2_000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "tokens": rng.integers(1, 200, size=n).astype(np.int64),
        }
    )
    cap = 1024
    got = (
        pack_sequences(
            rd.from_pandas(df), token_col="tokens", order_col="doc_id", capacity=cap, n_buckets=8
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    before = df["tokens"].cumsum() - df["tokens"]
    expected = (before // cap).astype(np.int64)
    assert list(got["seq_id"]) == list(expected)
    # packing is dense: sequence ids are contiguous from 0
    assert got["seq_id"].min() == 0
    assert set(got["seq_id"]) == set(range(int(got["seq_id"].max()) + 1))


def test_pack_sequences_append_stability():
    """Appending new docs (higher keys) never re-packs earlier sequences."""
    df1 = pd.DataFrame(
        {"doc_id": np.arange(100, dtype=np.int64), "tokens": np.full(100, 30, dtype=np.int64)}
    )
    df2 = pd.DataFrame(
        {"doc_id": np.arange(100, 150, dtype=np.int64) + 100, "tokens": np.full(50, 30, dtype=np.int64)}
    )
    cap = 256
    p1 = (
        pack_sequences(rd.from_pandas(df1), token_col="tokens", order_col="doc_id", capacity=cap)
        .to_pandas()
        .sort_values("doc_id")
    )
    p12 = (
        pack_sequences(
            rd.from_pandas(pd.concat([df1, df2], ignore_index=True)),
            token_col="tokens",
            order_col="doc_id",
            capacity=cap,
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    pd.testing.assert_frame_equal(
        p1.reset_index(drop=True), p12.head(100).reset_index(drop=True)
    )
