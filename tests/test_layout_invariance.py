"""Block-layout invariance: operators must give identical results no matter
how the input is split into blocks (i.e. on any cluster shape / parallelism).

These are the distributed-correctness properties the oracle checks imply
but don't isolate: each test runs the same operator over the same rows in
radically different block layouts and asserts bit-equality."""

import numpy as np
import pandas as pd

import ray.data as rd

from quanterra_pipeline_ray.functions.packing import pack_sequences
from quanterra_pipeline_ray.functions.sampling import quota_sample
from quanterra_pipeline_ray.pipelines.relational import (
    distinct_count_by,
    quantiles_disc,
    topk_per_group,
)


def _layouts(df: pd.DataFrame):
    """The same rows as: one block; many tiny blocks; shuffled row order."""
    yield rd.from_pandas(df)
    yield rd.from_pandas(df).repartition(17)
    shuffled = df.sample(frac=1.0, random_state=7).reset_index(drop=True)
    yield rd.from_pandas(shuffled).repartition(5)


def _df(n=3_000):
    rng = np.random.default_rng(42)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "grp": rng.choice(["a", "b", "c", "d"], size=n),
            "tokens": rng.integers(1, 120, size=n).astype(np.int64),
        }
    )


def test_quota_sample_layout_invariant():
    df = _df()
    results = [
        quota_sample(ds, "grp", 200, id_col="doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        for ds in _layouts(df)
    ]
    for r in results[1:]:
        pd.testing.assert_frame_equal(results[0], r)


def test_pack_sequences_layout_and_bucket_invariant():
    df = _df()
    base = None
    for ds, nb in zip(_layouts(df), (64, 7, 13)):
        got = (
            pack_sequences(ds, token_col="tokens", order_col="doc_id", capacity=512, n_buckets=nb)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        if base is None:
            base = got
        else:
            pd.testing.assert_frame_equal(base, got)


def test_topk_and_distinct_layout_invariant():
    df = _df()
    topks = [
        topk_per_group(ds, ["grp"], ["tokens"], k=9, tiebreak=["doc_id"])
        .to_pandas()
        .sort_values(["grp", "tokens", "doc_id"])
        .reset_index(drop=True)
        for ds in _layouts(df)
    ]
    for r in topks[1:]:
        pd.testing.assert_frame_equal(topks[0], r)
    distincts = [
        distinct_count_by(ds, ["grp"], "tokens")
        .to_pandas()
        .sort_values("grp")
        .reset_index(drop=True)
        for ds in _layouts(df)
    ]
    for r in distincts[1:]:
        pd.testing.assert_frame_equal(distincts[0], r)


def test_quantiles_layout_invariant():
    df = _df()
    results = [
        quantiles_disc(ds, "tokens", [0.1, 0.5, 0.9], n_buckets=nb)
        for ds, nb in zip(_layouts(df), (64, 5, 16))
    ]
    for r in results[1:]:
        pd.testing.assert_frame_equal(results[0], r)


def test_jaccard_index_probe_layout_invariant(tmp_path):
    """Probe pairs are identical no matter how the batch is blocked."""
    from quanterra_pipeline_ray.functions.jaccard_index import (
        build_jaccard_index,
        probe_jaccard_index,
    )

    rng = np.random.default_rng(33)
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot"]
    texts = [" ".join(rng.choice(words, size=25)) for _ in range(40)]
    texts += [texts[0], texts[3]]  # dups
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    old, new = df[df["doc_id"] < 30], df[df["doc_id"] >= 30]
    idx = str(tmp_path / "jidx")
    build_jaccard_index(rd.from_pandas(old), idx, n_buckets=16)

    results = []
    for ds in _layouts(new):
        p = (
            probe_jaccard_index(ds, idx, rd.from_pandas(df), threshold=0.8)
            .to_pandas()
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
        results.append(p)
    assert len(results[0]) > 0
    for r in results[1:]:
        pd.testing.assert_frame_equal(results[0], r)
