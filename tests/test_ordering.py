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
