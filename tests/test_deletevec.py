"""Positional delete vectors: delete without rewriting data files."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from quanterra_pipeline_ray.stages.deletevec import delete_where_vector
from quanterra_pipeline_ray.state.manifest import TranscriptTable
from quanterra_pipeline_ray.synth import content_fingerprint, fragment_table, generate_transcripts


def _make(tmp_path, n_files=5, **gen):
    root = str(tmp_path / "t")
    table = TranscriptTable.create(root)
    data = generate_transcripts(
        **{"n_convs": 20, "seed": 23, "mean_turns": 8, "hot_convs": 0, **gen}
    )
    paths = fragment_table(data, os.path.join(root, "data", "frags"), n_files)
    table.register_fragments(paths)
    return table, data


def _data_files(root):
    d = os.path.join(root, "data")
    return sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(d)
        for f in fs
        if f.endswith(".parquet")
    )


def test_delete_vector_rewrites_zero_data_files(tmp_path):
    """VERDICT r2 done-criterion: a small delete writes only sidecars —
    the set of data files on disk is unchanged."""
    table, data = _make(tmp_path)
    before = _data_files(table.root)
    base_files = {f.path for f in table.files()}

    snap = delete_where_vector(table, lambda b: b["turn_idx"] % 11 == 7)

    assert _data_files(table.root) == before  # zero data files written/removed
    after = table.files(snap.snapshot_id)
    assert {f.path for f in after} == base_files  # same data paths
    assert any(f.delete_path for f in after)
    assert sum(f.delete_rows for f in after) > 0

    # readers subtract the mask: scan == read_all == the WHERE NOT filter
    exp = data.to_pandas()
    exp = exp[~(exp["turn_idx"] % 11 == 7)]
    got = table.read_all().to_pandas()
    assert len(got) == len(exp)
    assert content_fingerprint(table.read_all()) == content_fingerprint(
        pa.Table.from_pandas(exp.reset_index(drop=True), preserve_index=False)
    )
    assert table.scan(snap.snapshot_id).count() == len(exp)


def test_delete_vector_union_and_full_file_drop(tmp_path):
    """A second DELETE unions with the first's sidecar; deleting every row
    of a file drops its manifest entry entirely."""
    table, data = _make(tmp_path)
    df = data.to_pandas()
    delete_where_vector(table, lambda b: b["turn_idx"] % 7 == 3)
    delete_where_vector(table, lambda b: b["turn_idx"] % 7 == 5)
    exp = df[~((df["turn_idx"] % 7 == 3) | (df["turn_idx"] % 7 == 5))]
    assert table.scan().count() == len(exp)

    # delete everything: all files drop out, no data file was ever rewritten
    before = _data_files(table.root)
    snap = delete_where_vector(table, lambda b: b["turn_idx"] >= 0)
    assert table.files(snap.snapshot_id) == []
    assert table.scan(snap.snapshot_id).count() == 0
    assert _data_files(table.root) == before


def test_delete_vector_changelog_sees_only_deleted_rows(tmp_path):
    from quanterra_pipeline_ray.stages.changelog import changelog

    table, data = _make(tmp_path)
    base = table.current_snapshot_id()
    snap = delete_where_vector(table, lambda b: b["turn_idx"] % 13 == 2)
    out = changelog(table, base, snap.snapshot_id).to_pandas()
    df = data.to_pandas()
    exp_deleted = df[df["turn_idx"] % 13 == 2]
    assert (out["op"] == "delete").all()
    assert len(out) == len(exp_deleted)
    assert sorted(zip(out["conv_id"], out["turn_idx"])) == sorted(
        zip(exp_deleted["conv_id"], exp_deleted["turn_idx"])
    )


def test_delete_vector_then_merge_materializes(tmp_path):
    """MERGE applies the mask to touched files and its rewrites drop the
    sidecar reference (deletes materialized)."""
    from quanterra_pipeline_ray.stages.merge import merge_into

    table, data = _make(tmp_path)
    df = data.to_pandas()
    delete_where_vector(table, lambda b: b["turn_idx"] % 9 == 4)

    upd = df[df["turn_idx"] % 6 == 1].copy()
    upd["text"] = "M " + upd["text"]
    upd["__op"] = "upsert"
    merge_into(table, pa.Table.from_pandas(upd, preserve_index=False))

    kept = df[~(df["turn_idx"] % 9 == 4)].copy()
    mask = kept["turn_idx"] % 6 == 1
    kept.loc[mask, "text"] = "M " + kept.loc[mask, "text"]
    # note: upserts may resurrect keys the delete removed IF they match the
    # update predicate — (9k+4) ∩ (6k+1) rows come back with the new text
    resurrected = df[(df["turn_idx"] % 9 == 4) & (df["turn_idx"] % 6 == 1)].copy()
    resurrected["text"] = "M " + resurrected["text"]
    exp = pd.concat([kept, resurrected], ignore_index=True)
    got = table.read_all().to_pandas()
    assert len(got) == len(exp)
    assert content_fingerprint(table.read_all()) == content_fingerprint(
        pa.Table.from_pandas(exp, preserve_index=False)
    )
    # every touched file was rewritten without a sidecar
    assert all(not f.delete_path for f in table.files() if f.path.startswith("data/part-"))


def test_delete_vector_then_shuffle_merge_materializes(tmp_path):
    """Same contract through the SHUFFLE plan's direct exchange: map tasks
    apply the sidecar mask before bucketing."""
    from quanterra_pipeline_ray.stages.merge import merge_into

    table, data = _make(tmp_path)
    df = data.to_pandas()
    delete_where_vector(table, lambda b: b["turn_idx"] % 9 == 4)

    upd = df[df["turn_idx"] % 6 == 1].copy()
    upd["text"] = "M " + upd["text"]
    upd["__op"] = "upsert"
    snap = merge_into(
        table,
        pa.Table.from_pandas(upd, preserve_index=False),
        broadcast_threshold=0,
        exchange="direct",
    )
    assert snap.summary["plan"] == "shuffle"

    kept = df[~(df["turn_idx"] % 9 == 4)].copy()
    mask = kept["turn_idx"] % 6 == 1
    kept.loc[mask, "text"] = "M " + kept.loc[mask, "text"]
    resurrected = df[(df["turn_idx"] % 9 == 4) & (df["turn_idx"] % 6 == 1)].copy()
    resurrected["text"] = "M " + resurrected["text"]
    exp = pd.concat([kept, resurrected], ignore_index=True)
    assert content_fingerprint(table.read_all()) == content_fingerprint(
        pa.Table.from_pandas(exp, preserve_index=False)
    )


def test_delete_vector_compaction_materializes_and_expire_sweeps(tmp_path):
    from quanterra_pipeline_ray.stages.compaction import compact
    from quanterra_pipeline_ray.stages.expire import expire_snapshots

    table, data = _make(tmp_path)
    df = data.to_pandas()
    delete_where_vector(table, lambda b: b["role"] == "tool")
    exp = df[df["role"] != "tool"]

    snap = compact(table, target_bytes=1 << 20)
    files = table.files(snap.snapshot_id)
    assert all(f.delete_path is None for f in files)  # materialized
    assert sum(f.rows for f in files) == len(exp)
    assert table.scan().count() == len(exp)

    # expiry releases the sidecars once no retained snapshot references them
    res = expire_snapshots(table, keep_last=1)
    sidecars = [p for p in res["deleted_files"] if p.startswith("deletes/")]
    assert sidecars
    for p in sidecars:
        assert not os.path.exists(os.path.join(table.root, p))
    assert table.scan().count() == len(exp)


def test_delete_vector_pruned_scans_honor_mask(tmp_path):
    table, data = _make(tmp_path)
    df = data.to_pandas()
    delete_where_vector(table, lambda b: b["turn_idx"] % 5 == 0)
    live = df[~(df["turn_idx"] % 5 == 0)]

    conv = df["conv_id"].iloc[0]
    got = table.scan_convs([conv]).to_pandas()
    exp = live[live["conv_id"] == conv]
    assert sorted(got["turn_idx"]) == sorted(exp["turn_idx"])

    lo, hi = df["ts"].quantile(0.25), df["ts"].quantile(0.75)
    got_ts = table.scan_ts_range(lo, hi).to_pandas()
    exp_ts = live[(live["ts"] >= lo) & (live["ts"] < hi)]
    assert len(got_ts) == len(exp_ts)
