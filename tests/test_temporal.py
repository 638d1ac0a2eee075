"""Temporal operators: as-of/range joins, time travel, changelog, streaming."""

import numpy as np
import pandas as pd
import pyarrow as pa

from quanterra_pipeline_ray.state.manifest import TranscriptTable
from quanterra_pipeline_ray.synth import content_fingerprint, fragment_table, generate_transcripts


def _rd():
    import ray.data as rd

    return rd


# ------------------------------------------------------------- as-of / range
def test_asof_join_backward_semantics():
    from quanterra_pipeline_ray.pipelines.temporal import asof_join

    left = pd.DataFrame(
        {
            "item": np.array([1, 2, 3, 4], dtype=np.int64),
            "k": ["a", "a", "a", "b"],
            "ts": pd.to_datetime([10, 25, 5, 50], unit="s").astype("datetime64[us]"),
        }
    )
    right = pd.DataFrame(
        {
            "k": ["a", "a", "b"],
            "ts": pd.to_datetime([10, 20, 60], unit="s").astype("datetime64[us]"),
        }
    )
    out = (
        asof_join(_rd().from_pandas(left), _rd().from_pandas(right), on="ts", by="k")
        .to_pandas()
        .sort_values("item")
        .reset_index(drop=True)
    )
    # item 3 (ts=5 < first anchor) and item 4 (b's anchor is later) drop
    assert out["item"].tolist() == [1, 2]
    got = out["ts_right"].astype("int64").to_numpy() // 1_000_000
    assert got.tolist() == [10, 20]  # exact match allowed; latest <= ts
    assert out["item"].dtype == np.int64  # sentinel padding preserved dtypes


def test_range_join_window_bounds():
    from quanterra_pipeline_ray.pipelines.temporal import range_join

    anchors = pd.DataFrame(
        {"k": ["a"], "ts": pd.to_datetime([100], unit="s").astype("datetime64[us]")}
    )
    events = pd.DataFrame(
        {
            "k": ["a"] * 4,
            "ts": pd.to_datetime([99, 100, 3699, 3700], unit="s").astype("datetime64[us]"),
        }
    )
    out = range_join(
        _rd().from_pandas(anchors), _rd().from_pandas(events), on="ts", by="k",
        width_us=3_600_000_000,
    ).to_pandas()
    secs = sorted(out["ts"].astype("int64") // 1_000_000)
    assert secs == [100, 3699]  # [anchor, anchor+width): 99 early, 3700 at bound


def test_range_join_hot_key_memory_stays_match_bounded():
    """VERDICT r2 done-criterion: a hot key (10^3 anchors x 10^4 right rows)
    must NOT materialize the 10^7-row per-key product — peak kernel
    allocations stay O(|left| + |right| + matches)."""
    import tracemalloc

    from quanterra_pipeline_ray.pipelines.temporal import _range_join_bucket

    n_anchor, n_right = 1_000, 10_000
    # anchors spread over a long horizon; narrow window -> few matches each
    left = pd.DataFrame(
        {
            "k": "hot",
            "ts": np.arange(n_anchor, dtype=np.int64) * 1_000_000,
            "__side": np.int8(0),
        }
    )
    right = pd.DataFrame(
        {
            "k": "hot",
            "ts": np.arange(n_right, dtype=np.int64) * 100_000,
            "__side": np.int8(1),
        }
    )
    g = pd.concat([left, right], ignore_index=True)
    tracemalloc.start()
    out = _range_join_bucket(g, "k", "ts", "anchor_ts", width_us=500_000)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # every anchor lands on a right multiple of 1e5: window [a, a+5e5) holds
    # exactly 5 rows while the anchor is within the right horizon
    in_horizon = (np.arange(n_anchor) * 1_000_000) < n_right * 100_000
    assert len(out) == int(in_horizon.sum()) * 5
    # cartesian product would be 10^7 rows ~ 240MB; O(matches) is ~ 5k rows.
    # Allow generous slack for pandas internals: must stay far below product.
    assert peak < 30 * 1024 * 1024, f"peak {peak/1e6:.1f} MB suggests a cartesian blow-up"
    # spot-check window bounds on one anchor
    one = out[out["anchor_ts"] == 3_000_000]["ts"].tolist()
    assert sorted(one) == [3_000_000, 3_100_000, 3_200_000, 3_300_000, 3_400_000]


def test_range_join_per_key_fallback_matches_fast_path():
    """The int64-overflow fallback kernel must produce identical matches."""
    from quanterra_pipeline_ray.pipelines.temporal import (
        _range_join_bucket,
        _range_join_per_key,
    )

    rng = np.random.default_rng(11)
    n_l, n_r = 300, 2_000
    left = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c", "d"], n_l),
            "ts": rng.integers(0, 10**7, n_l),
            "__side": np.int8(0),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.choice(["a", "b", "c", "e"], n_r),
            "ts": rng.integers(0, 10**7, n_r),
            "__side": np.int8(1),
        }
    )
    g = pd.concat([left, right], ignore_index=True)
    fast = _range_join_bucket(g, "k", "ts", "anchor_ts", width_us=50_000)
    l = g[g["__side"] == 0][["k", "ts"]]
    r = g[g["__side"] == 1][["k", "ts"]]
    codes, _ = pd.factorize(pd.concat([l["k"], r["k"]], ignore_index=True))
    slow = _range_join_per_key(
        codes[: len(l)].astype(np.int64),
        codes[len(l) :].astype(np.int64),
        l["ts"].astype("int64").to_numpy(),
        r["ts"].astype("int64").to_numpy(),
        l, r, "k", "ts", "anchor_ts", 50_000,
    )
    key = ["k", "anchor_ts", "ts"]
    f = fast.sort_values(key).reset_index(drop=True)
    s = slow.sort_values(key).reset_index(drop=True)
    assert len(f) and f[key].equals(s[key])


# --------------------------------------------------------------- time travel
def test_timestamp_time_travel(tmp_path):
    from quanterra_pipeline_ray.stages.compaction import compact

    table = TranscriptTable.create(str(tmp_path / "t"))
    data = generate_transcripts(n_convs=10, seed=3, hot_convs=0)
    half = data.num_rows // 2
    table.append_table(data.slice(0, half), commit_ts=1000)
    table.append_table(data.slice(half), commit_ts=2000)
    compact(table, target_bytes=1 << 20)  # logical ts 2001

    early = table.snapshot_as_of(1500)
    assert early.commit_ts == 1000
    assert table.scan(early.snapshot_id).count() == half
    full = table.snapshot_as_of(2000)
    assert table.scan(full.snapshot_id).count() == data.num_rows
    # as-of after compaction sees identical content through new files
    import pytest

    with pytest.raises(ValueError):
        table.snapshot_as_of(-5)
    got = table.scan(as_of_ts=10**9)
    assert got.count() == data.num_rows


def test_commit_ts_logical_clock_is_monotonic(tmp_path):
    table = TranscriptTable.create(str(tmp_path / "t"))
    data = generate_transcripts(n_convs=4, seed=5, hot_convs=0)
    table.append_table(data.slice(0, 10))
    table.append_table(data.slice(10, 10))
    snaps = table.snapshots()
    ts = [s.commit_ts for s in snaps]
    assert ts == sorted(ts) and len(set(ts)) == len(ts)


# ----------------------------------------------------------------- changelog
def test_changelog_compaction_is_invisible(tmp_path):
    import os

    from quanterra_pipeline_ray.stages.changelog import changelog
    from quanterra_pipeline_ray.stages.compaction import compact

    root = str(tmp_path / "t")
    table = TranscriptTable.create(root)
    data = generate_transcripts(n_convs=12, seed=7, hot_convs=0)
    paths = fragment_table(data, os.path.join(root, "data", "frags"), 6)
    table.register_fragments(paths)
    base = table.current_snapshot_id()
    compact(table, target_bytes=1 << 20)
    out = changelog(table, base, table.current_snapshot_id())
    assert out.count() == 0  # bytes moved, rows didn't


def test_changelog_captures_merge_delta(tmp_path):
    import os

    from quanterra_pipeline_ray.stages.changelog import changelog
    from quanterra_pipeline_ray.stages.merge import merge_into

    root = str(tmp_path / "t")
    table = TranscriptTable.create(root)
    data = generate_transcripts(n_convs=12, seed=8, hot_convs=0)
    paths = fragment_table(data, os.path.join(root, "data", "frags"), 4)
    table.register_fragments(paths)
    base = table.current_snapshot_id()

    df = data.to_pandas()
    upd = df.iloc[:3].copy()
    upd["text"] = "X " + upd["text"]
    upd["__op"] = "upsert"
    merge_into(table, pa.Table.from_pandas(upd, preserve_index=False))
    out = changelog(table, base, table.current_snapshot_id()).to_pandas()
    ins = out[out["op"] == "insert"]
    dele = out[out["op"] == "delete"]
    assert len(ins) == 3 and len(dele) == 3  # 3 updates = 3 deletes + 3 inserts
    assert all(t.startswith("X ") for t in ins["text"])


# ----------------------------------------------------------------- streaming
def test_watermark_drops_late_events():
    from quanterra_pipeline_ray.stages.streaming import WatermarkWindower

    w = WatermarkWindower(window_us=10, lateness_us=2, key_col="k", ts_col="ts")
    b1 = pd.DataFrame({"k": ["a", "a"], "ts": pd.to_datetime([5, 22], unit="us").astype("datetime64[us]")})
    out1 = w.process(b1)
    # watermark = 22-2 = 20 -> window [0,10) finalized with 1 event
    assert out1["n_events"].tolist() == [1]
    assert int(out1["window_start"].astype("int64").iloc[0]) == 0
    # a late event at ts=7 (< watermark 20) is dropped
    out2 = w.process(pd.DataFrame({"k": ["a"], "ts": pd.to_datetime([7], unit="us").astype("datetime64[us]")}))
    assert len(out2) == 0 and w.late_dropped == 1
    # flush finalizes the open [20,30) window
    fin = w.flush()
    assert fin["n_events"].tolist() == [1]


def test_windowed_counts_matches_batch_aggregate():
    from quanterra_pipeline_ray.stages.streaming import windowed_counts

    rng = np.random.default_rng(4)
    n = 5000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, n),
            "ts": pd.to_datetime(rng.integers(0, 10**7, n), unit="s").astype("datetime64[us]"),
        }
    )
    out = windowed_counts(_rd().from_pandas(df), lateness_us=None).to_pandas()
    exp = (
        df.assign(w=df["ts"].dt.floor("h"))
        .groupby(["user_id", "w"], as_index=False)
        .size()
    )
    out = out.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    exp = exp.sort_values(["user_id", "w"]).reset_index(drop=True)
    assert out["n_events"].tolist() == exp["size"].tolist()
    assert (out["window_start"].to_numpy() == exp["w"].to_numpy()).all()


def test_incremental_counts_match_full_recompute(tmp_path):
    import os

    from quanterra_pipeline_ray.stages.compaction import compact
    from quanterra_pipeline_ray.stages.incremental import conv_counts, incremental_conv_counts
    from quanterra_pipeline_ray.stages.merge import merge_into

    root = str(tmp_path / "t")
    table = TranscriptTable.create(root)
    data = generate_transcripts(n_convs=15, seed=9, hot_convs=0)
    paths = fragment_table(data, os.path.join(root, "data", "frags"), 4)
    table.register_fragments(paths)
    base = table.current_snapshot_id()
    base_counts = conv_counts(table.scan(base)).materialize()

    df = data.to_pandas()
    # delete one whole conversation, update another, insert a new one
    victim = df["conv_id"].iloc[0]
    dele = df[df["conv_id"] == victim].copy()
    dele["__op"] = "delete"
    upd = df[df["conv_id"] == df["conv_id"].iloc[-1]].copy()
    upd["text"] = "U " + upd["text"]
    upd["__op"] = "upsert"
    new = upd.iloc[:2].copy()
    new["conv_id"] = "conv-fresh"
    new["__op"] = "upsert"
    src = pa.Table.from_pandas(pd.concat([dele, upd, new], ignore_index=True), preserve_index=False)
    compact(table, target_bytes=1 << 20)
    merge_into(table, src)

    inc = (
        incremental_conv_counts(table, base, table.current_snapshot_id(), base_counts)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    full = conv_counts(table.scan()).to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert inc["conv_id"].tolist() == full["conv_id"].tolist()
    assert inc["n_turns"].tolist() == full["n_turns"].tolist()
    assert victim not in set(inc["conv_id"])  # zero-count drops out
    assert "conv-fresh" in set(inc["conv_id"])


def test_incremental_sums_match_full_recompute(tmp_path):
    import os

    from quanterra_pipeline_ray.stages.compaction import compact
    from quanterra_pipeline_ray.stages.incremental import incremental_key_sums, key_sums
    from quanterra_pipeline_ray.stages.merge import merge_into

    root = str(tmp_path / "ts")
    table = TranscriptTable.create(root)
    data = generate_transcripts(n_convs=12, seed=17, hot_convs=0)
    table.register_fragments(fragment_table(data, os.path.join(root, "data", "frags"), 4))
    base = table.current_snapshot_id()
    base_view = key_sums(table.scan(base), "conv_id").materialize()

    df = data.to_pandas()
    victim = df["conv_id"].iloc[0]
    dele = df[df["conv_id"] == victim].copy()
    dele["__op"] = "delete"
    upd = df[df["conv_id"] == df["conv_id"].iloc[-1]].copy()
    upd["text"] = "LONGER UPDATED " + upd["text"]  # value diff must net exactly
    upd["__op"] = "upsert"
    src = pa.Table.from_pandas(pd.concat([dele, upd], ignore_index=True), preserve_index=False)
    compact(table, target_bytes=1 << 20)
    merge_into(table, src)

    inc = (
        incremental_key_sums(table, base, table.current_snapshot_id(), base_view)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    full = (
        key_sums(table.scan(), "conv_id")
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        inc.astype({"n_rows": "int64", "val_sum": "int64"}),
        full.astype({"n_rows": "int64", "val_sum": "int64"}),
    )
    assert victim not in set(inc["conv_id"])  # zero-count key left the view
