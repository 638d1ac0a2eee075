"""Deterministic global shuffle rank (functions/ordering.py)."""

import hashlib

import numpy as np
import pandas as pd

import ray.data as rd

from quanterra_pipeline_ray.functions.ordering import shuffle_order


def _df(n=3_000):
    rng = np.random.default_rng(9)
    return pd.DataFrame(
        {
            "doc_id": rng.permutation(np.arange(10 * n, dtype=np.int64))[:n],
            "v": rng.integers(0, 100, size=n),
        }
    )


def test_shuffle_order_matches_row_number():
    df = _df()
    got = shuffle_order(rd.from_pandas(df), id_col="doc_id", seed=42).to_pandas()
    keys = np.array(
        [hashlib.md5(f"{i}:42".encode()).hexdigest() for i in df["doc_id"]], dtype=object
    )
    want = df.assign(__k=keys).sort_values(["__k", "doc_id"]).reset_index(drop=True)
    got = got.sort_values("pos").reset_index(drop=True)
    assert got["pos"].to_list() == list(range(len(df)))
    assert got["doc_id"].to_list() == want["doc_id"].to_list()
    assert got["pos"].dtype == np.int64


def test_shuffle_order_block_layout_invariant():
    df = _df(800)
    a = shuffle_order(rd.from_pandas(df), seed=7).to_pandas().sort_values("doc_id")
    b = shuffle_order(
        rd.from_pandas(df).repartition(17), seed=7
    ).to_pandas().sort_values("doc_id")
    assert a["pos"].to_list() == b["pos"].to_list()
    # a different seed produces a different permutation
    c = shuffle_order(rd.from_pandas(df), seed=8).to_pandas().sort_values("doc_id")
    assert a["pos"].to_list() != c["pos"].to_list()


def test_shuffle_order_bucket_count_invariant():
    """n_buckets is a layout knob only — ranks are identical at any count,
    including non-power-of-16 counts (monotone prefix->bucket mapping)."""
    df = _df(1_500)
    base = (
        shuffle_order(rd.from_pandas(df), seed=3, n_buckets=256)
        .to_pandas()
        .sort_values("doc_id")
    )
    for nb in (16, 100, 4096):
        got = (
            shuffle_order(rd.from_pandas(df), seed=3, n_buckets=nb)
            .to_pandas()
            .sort_values("doc_id")
        )
        assert base["pos"].to_list() == got["pos"].to_list(), nb
    # derived default (n_buckets=None) also matches
    auto = shuffle_order(rd.from_pandas(df), seed=3).to_pandas().sort_values("doc_id")
    assert base["pos"].to_list() == auto["pos"].to_list()


def test_hex_prefix_ints_vectorized_matches_int_parse():
    from quanterra_pipeline_ray.functions.ordering import bucket_of_keys, hex_prefix_ints

    keys = np.array(
        [hashlib.md5(str(i).encode()).hexdigest() for i in range(500)], dtype=object
    )
    for w in (1, 2, 4, 8):
        want = np.array([int(k[:w], 16) for k in keys], dtype=np.int64)
        assert (hex_prefix_ints(keys, w) == want).all(), w
    # bucket mapping is monotone in the full key order
    order = np.argsort(keys)
    bkts = bucket_of_keys(keys, 1000)[order]
    assert (np.diff(bkts) >= 0).all()
    assert bkts.min() >= 0 and bkts.max() < 1000
