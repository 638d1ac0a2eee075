"""Deterministic hash sampling and per-group quota sampling."""

import hashlib

import numpy as np
import pandas as pd

import ray.data as rd

from quanterra_pipeline_ray.functions.sampling import (
    fraction_threshold_hex,
    hash_sample,
    quota_sample,
)


def _df(n=2_000, groups=("a", "b", "c")):
    rng = np.random.default_rng(4)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "grp": rng.choice(groups, size=n),
            "payload": rng.integers(0, 1000, size=n),
        }
    )


def test_hash_sample_matches_reference_predicate():
    df = _df()
    got = hash_sample(rd.from_pandas(df), 0.25, id_col="doc_id", seed=42).to_pandas()
    thr = fraction_threshold_hex(0.25)
    assert thr == "40000000"
    expected = df[
        [hashlib.md5(f"{i}:42".encode()).hexdigest() < thr for i in df["doc_id"]]
    ]
    assert sorted(got["doc_id"]) == sorted(expected["doc_id"])
    # roughly a quarter, deterministic across invocations
    assert 0.2 < len(got) / len(df) < 0.3
    again = hash_sample(rd.from_pandas(df), 0.25, id_col="doc_id", seed=42).to_pandas()
    assert sorted(again["doc_id"]) == sorted(got["doc_id"])
    # different seed -> different subset
    other = hash_sample(rd.from_pandas(df), 0.25, id_col="doc_id", seed=7).to_pandas()
    assert sorted(other["doc_id"]) != sorted(got["doc_id"])


def test_hash_sample_edges():
    df = _df(100)
    assert hash_sample(rd.from_pandas(df), 0.0).count() == 0
    assert hash_sample(rd.from_pandas(df), 1.0).count() == 100


def test_quota_sample_matches_reference_ranking():
    df = _df()
    cap = 37
    got = quota_sample(rd.from_pandas(df), "grp", cap, id_col="doc_id", seed=42).to_pandas()

    ref = df.copy()
    ref["__key"] = [hashlib.md5(f"{i}:42".encode()).hexdigest() for i in ref["doc_id"]]
    ref = ref.sort_values(["__key", "doc_id"]).groupby("grp", sort=False).head(cap)
    assert sorted(got["doc_id"]) == sorted(ref["doc_id"])
    assert (got.groupby("grp").size() <= cap).all()
    assert set(got.columns) == {"doc_id", "grp", "payload"}


def test_quota_sample_small_groups_kept_whole():
    df = pd.DataFrame(
        {"doc_id": np.arange(10, dtype=np.int64), "grp": ["x"] * 3 + ["y"] * 7}
    )
    got = quota_sample(rd.from_pandas(df), "grp", 5, id_col="doc_id").to_pandas()
    assert (got["grp"] == "x").sum() == 3  # under cap: group intact
    assert (got["grp"] == "y").sum() == 5


def test_mix_sources_fractions_and_default():
    import hashlib

    from quanterra_pipeline_ray.functions.sampling import fraction_threshold_hex, mix_sources

    df = _df(3_000, groups=("a", "b", "c"))
    got = mix_sources(
        rd.from_pandas(df), {"a": 0.5, "b": 0.125}, group_col="grp"
    ).to_pandas()
    assert (got["grp"] != "c").all()  # default fraction 0 drops unlisted groups
    thr = {"a": fraction_threshold_hex(0.5), "b": fraction_threshold_hex(0.125)}
    exp = df[
        [
            g in thr and hashlib.md5(f"{i}:42".encode()).hexdigest() < thr[g]
            for i, g in zip(df["doc_id"], df["grp"])
        ]
    ]
    assert sorted(got["doc_id"]) == sorted(exp["doc_id"])
    frac_a = (got["grp"] == "a").sum() / (df["grp"] == "a").sum()
    frac_b = (got["grp"] == "b").sum() / (df["grp"] == "b").sum()
    assert 0.4 < frac_a < 0.6 and 0.06 < frac_b < 0.19


def test_weighted_sample_matches_reference_ranking():
    """A-ExpJ selection must equal the single-machine reference ranking
    (k smallest -ln(u)/w per group) regardless of block layout."""
    from quanterra_pipeline_ray.functions.sampling import weighted_sample

    df = _df(2_000)
    df["w"] = (df["payload"] % 97 + 1).astype(np.int64)
    k = 25
    got = weighted_sample(
        rd.from_pandas(df).repartition(7), "grp", k, weight_col="w", id_col="doc_id", seed=42
    ).to_pandas()

    ref = df.copy()
    h = np.array(
        [int(hashlib.md5(f"{i}:42".encode()).hexdigest()[:13], 16) for i in ref["doc_id"]],
        dtype=np.float64,
    )
    ref["__key"] = -np.log((h + 0.5) / float(1 << 52)) / ref["w"].to_numpy(dtype=np.float64)
    ref = ref.sort_values(["__key", "doc_id"]).groupby("grp", sort=False).head(k)
    assert sorted(got["doc_id"]) == sorted(ref["doc_id"])
    assert (got.groupby("grp").size() == k).all()
    assert set(got.columns) == {"doc_id", "grp", "payload", "w"}


def test_weighted_sample_biases_toward_heavy_rows():
    """Heavier rows must be picked far more often than light ones (the
    point of weighted sampling): give 10% of rows 50x weight and check
    they dominate the sample."""
    from quanterra_pipeline_ray.functions.sampling import weighted_sample

    n = 5_000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "grp": ["g"] * n,
            "w": np.where(np.arange(n) % 10 == 0, 500, 10).astype(np.int64),
        }
    )
    got = weighted_sample(rd.from_pandas(df), "grp", 200, weight_col="w", id_col="doc_id").to_pandas()
    heavy = (got["w"] == 500).sum()
    # heavy rows are 10% of the population but ~85% of the total weight;
    # expected heavy count ~ 168/200, test far outside uniform's ~20
    assert heavy > 120


def test_weighted_sample_rejects_nonpositive_weights():
    import pytest

    from quanterra_pipeline_ray.functions.sampling import weighted_sample

    df = pd.DataFrame({"doc_id": [1, 2], "grp": ["a", "a"], "w": [3, 0]})
    with pytest.raises(Exception):
        weighted_sample(rd.from_pandas(df), "grp", 1, weight_col="w", id_col="doc_id").to_pandas()


def test_split_assign_bands_and_stability():
    from quanterra_pipeline_ray.functions.sampling import _md5_keys, split_assign

    df = _df()
    fr = {"train": 0.90, "val": 0.05, "test": 0.05}
    got = split_assign(rd.from_pandas(df), fr, id_col="doc_id", seed=42).to_pandas()
    # reference predicate: cumulative hex bands on the md5 key
    keys = _md5_keys(df["doc_id"].to_numpy(), 42)
    want = np.where(keys < "e6666666", "train", np.where(keys < "f3333333", "val", "test"))
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert (got["split"].to_numpy() == want).all()
    # fractions approximately honored
    frac = got["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.90) < 0.03
    # append-stable: re-running over a corpus SUBSET assigns identical splits
    sub = df.iloc[::3]
    got2 = split_assign(rd.from_pandas(sub), fr, id_col="doc_id", seed=42).to_pandas()
    merged = got2.merge(got, on="doc_id", suffixes=("_sub", "_full"))
    assert (merged["split_sub"] == merged["split_full"]).all()


def test_split_assign_rejects_degenerate():
    import pytest

    from quanterra_pipeline_ray.functions.sampling import split_assign

    with pytest.raises(ValueError):
        split_assign(rd.from_pandas(_df(50)), {"train": 1.0})
    with pytest.raises(ValueError):
        split_assign(rd.from_pandas(_df(50)), {"a": 0.5, "b": 0.0, "c": 0.5})


def test_repeat_mix_counts_and_rep_idx():
    from quanterra_pipeline_ray.functions.sampling import _md5_keys, repeat_mix

    df = _df()
    got = repeat_mix(
        rd.from_pandas(df), {"a": 2.5, "b": 0.25, "c": 0.0}, group_col="grp",
        id_col="doc_id", seed=11,
    ).to_pandas()
    keys = _md5_keys(df["doc_id"].to_numpy(), 11)
    base = df["grp"].map({"a": 2, "b": 0, "c": 0}).to_numpy()
    frac_thr = df["grp"].map({"a": "80000000", "b": "40000000", "c": "00000000"}).to_numpy()
    want_k = base + (keys < frac_thr)
    # per-doc copy counts match the reference predicate
    counts = got.groupby("doc_id").size()
    for doc, k in zip(df["doc_id"], want_k):
        assert counts.get(doc, 0) == k
    # rep_idx is 0..k-1 per doc
    mx = got.groupby("doc_id")["rep_idx"].agg(["min", "max", "count"])
    assert (mx["min"] == 0).all()
    assert (mx["max"] == mx["count"] - 1).all()
    # factor 0.0 drops the group; unknown groups default to 1 copy
    assert not (got["grp"] == "c").any()
    got_d = repeat_mix(rd.from_pandas(df), {}, group_col="grp", id_col="doc_id").to_pandas()
    assert len(got_d) == len(df)


def test_repeat_mix_block_layout_invariant():
    from quanterra_pipeline_ray.functions.sampling import repeat_mix

    df = _df(600)
    a = repeat_mix(rd.from_pandas(df), {"a": 1.5}, group_col="grp").to_pandas()
    b = repeat_mix(rd.from_pandas(df).repartition(11), {"a": 1.5}, group_col="grp").to_pandas()
    key = ["doc_id", "rep_idx"]
    assert a.sort_values(key).reset_index(drop=True)[["doc_id", "rep_idx"]].equals(
        b.sort_values(key).reset_index(drop=True)[["doc_id", "rep_idx"]]
    )


def test_weighted_reservoir_order_independent_and_crash_safe(tmp_path):
    from quanterra_pipeline_ray.functions.sampling import WeightedReservoir, weighted_sample

    df = _df(900)
    df["w"] = df["payload"].to_numpy() + 1.0

    def run(order, path):
        res = WeightedReservoir(str(path), k=50, seed=7)
        out = None
        for b in order:
            batch = df[df["doc_id"] % 3 == b]
            out = res.update(rd.from_pandas(batch), weight_col="w")
        return out.sort_values("doc_id").reset_index(drop=True)

    a = run([0, 1, 2], tmp_path / "r1.parquet")
    b = run([2, 0, 1], tmp_path / "r2.parquet")
    pd.testing.assert_frame_equal(a, b)  # batch-order independent

    # equals the one-shot global sample: single-group weighted_sample
    one = (
        weighted_sample(rd.from_pandas(df.assign(g=0)), "g", k=50, weight_col="w",
                        id_col="doc_id", seed=7)
        .to_pandas()
        .sort_values("doc_id")["doc_id"]
        .to_list()
    )
    assert a["doc_id"].to_list() == one

    # crash-resume: re-updating with an already-folded batch is a no-op
    res = WeightedReservoir(str(tmp_path / "r1.parquet"), k=50, seed=7)
    again = res.update(rd.from_pandas(df[df["doc_id"] % 3 == 1]), weight_col="w")
    assert again.sort_values("doc_id")["doc_id"].to_list() == a["doc_id"].to_list()


def test_grouped_weighted_reservoir_equals_batch_sample(tmp_path):
    from quanterra_pipeline_ray.functions.sampling import (
        GroupedWeightedReservoir,
        weighted_sample,
    )

    df = _df(900)
    df["w"] = df["payload"].to_numpy() + 1.0
    res = GroupedWeightedReservoir(str(tmp_path / "gr.parquet"), "grp", k=15, seed=7)
    out = None
    for b in (2, 0, 1):  # arbitrary ingest order
        out = res.update(rd.from_pandas(df[df["doc_id"] % 3 == b]), weight_col="w")
    one = (
        weighted_sample(rd.from_pandas(df), "grp", k=15, weight_col="w",
                        id_col="doc_id", seed=7)
        .to_pandas()
    )
    assert sorted(out["doc_id"]) == sorted(one["doc_id"])
    # per-group cap honored
    assert (out.groupby("grp").size() <= 15).all()
