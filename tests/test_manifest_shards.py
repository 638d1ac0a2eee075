"""Sharded-manifest properties: structural sharing, O(change) commits,
shard coalescing, legacy migration, shard-level ts pruning, shared-shard
expiry.  These are the 100-TB metadata-scaling invariants — a commit must
never rewrite manifest metadata proportional to table size."""

import json
import os

import pytest

import quanterra_pipeline_ray.state.manifest as mf
from quanterra_pipeline_ray.state.manifest import TranscriptTable, write_data_file
from quanterra_pipeline_ray.synth import content_fingerprint, generate_transcripts


@pytest.fixture()
def small_shards(monkeypatch):
    """Shrink shard sizing so a handful of files exercises multi-shard
    layouts without writing thousands of parquet files."""
    monkeypatch.setattr(mf, "SHARD_TARGET_FILES", 4)
    monkeypatch.setattr(mf, "SHARD_COALESCE_MIN", 3)
    monkeypatch.setattr(mf, "SHARD_COALESCE_COUNT", 4)


def _mk_table(tmp_path, n_files=10, rows_per=8):
    root = str(tmp_path / "t")
    table = TranscriptTable.create(root)
    src = generate_transcripts(n_convs=n_files * 2, seed=7, mean_turns=rows_per)
    added = []
    step = max(1, src.num_rows // n_files)
    for i in range(n_files):
        chunk = src.slice(i * step, step)
        if chunk.num_rows:
            added.append(write_data_file(chunk, root))
    table.commit(added, operation="bulk")
    return table, src


def test_append_reuses_shards_structurally(tmp_path, small_shards):
    table, _ = _mk_table(tmp_path, n_files=9)
    s1 = table.current_snapshot_id()
    shards_before = set(table.manifest_paths(s1)[1:])
    assert len(shards_before) >= 2  # multi-shard layout under the tiny target
    extra = generate_transcripts(n_convs=3, seed=9, mean_turns=4)
    table.append_table(extra)
    s2 = table.current_snapshot_id()
    shards_after = table.manifest_paths(s2)[1:]
    # every pre-existing shard is reused BY REFERENCE; exactly one new shard
    assert shards_before < set(shards_after)
    assert len(set(shards_after) - shards_before) == 1
    # and the file set is the union
    assert len(table.files(s2)) == len(table.files(s1)) + 1


def test_removal_rewrites_only_touched_shard(tmp_path, small_shards):
    table, _ = _mk_table(tmp_path, n_files=9)
    s1 = table.current_snapshot_id()
    files = table.files(s1)
    victim = files[0].path
    shards_before = set(table.manifest_paths(s1)[1:])
    table.commit([], removed_paths=[victim], operation="delete")
    shards_after = set(table.manifest_paths()[1:])
    # at most one shard replaced (bloom false positives could touch more,
    # but identical content re-shards to the identical content address)
    assert len(shards_before - shards_after) == 1
    assert len(shards_after - shards_before) <= 1
    assert victim not in {f.path for f in table.files()}
    assert len(table.files()) == len(files) - 1


def test_unknown_removal_still_rejected(tmp_path, small_shards):
    table, _ = _mk_table(tmp_path, n_files=5)
    with pytest.raises(ValueError):
        table.commit([], removed_paths=["data/nope.parquet"], operation="x")


def test_shard_coalescing_bounds_shard_count(tmp_path, small_shards):
    root = str(tmp_path / "t")
    table = TranscriptTable.create(root)
    src = generate_transcripts(n_convs=40, seed=11, mean_turns=3)
    step = max(1, src.num_rows // 20)
    for i in range(20):
        length = step if i < 19 else src.num_rows - 19 * step
        chunk = src.slice(i * step, length)
        if chunk.num_rows:
            table.append_table(chunk)
    n_shards = len(table.manifest_paths()) - 1
    n_files = len(table.files())
    # without coalescing this would be one shard per append (~20)
    assert n_shards <= max(2, n_files // mf.SHARD_TARGET_FILES + mf.SHARD_COALESCE_COUNT)
    assert n_shards < 12
    assert content_fingerprint(table.read_all()) == content_fingerprint(src)


def test_metadata_only_commit_writes_no_new_shards(tmp_path, small_shards):
    from quanterra_pipeline_ray.stages.evolve import evolve_schema

    table, _ = _mk_table(tmp_path, n_files=9)
    before = set(table.manifest_paths()[1:])
    evolve_schema(table, [("rating", "float64", 0.0)])
    after = set(table.manifest_paths()[1:])
    assert before == after  # shards reused by reference, zero shard I/O


def test_legacy_single_doc_manifest_reads_and_migrates(tmp_path):
    table, src = _mk_table(tmp_path, n_files=3)
    sid = table.current_snapshot_id()
    # rewrite the current snapshot's manifest in the LEGACY single-doc format
    legacy_doc = {"files": [f.to_json() for f in table.files(sid)]}
    payload = json.dumps(legacy_doc, sort_keys=True).encode()
    legacy_rel = "manifests/m-legacyformat00000000.json"
    with open(os.path.join(table.root, legacy_rel), "wb") as fh:
        fh.write(payload)
    snap_path = os.path.join(table.root, "snapshots", f"s{sid:06d}.json")
    doc = json.loads(open(snap_path).read())
    doc["manifest"] = legacy_rel
    with open(snap_path, "w") as fh:
        fh.write(json.dumps(doc, sort_keys=True))

    fresh = TranscriptTable.load(table.root)
    legacy_files = fresh.files(sid)
    assert {f.path for f in legacy_files} == {f.path for f in table.files(sid)}
    # next commit migrates to the sharded layout transparently
    extra = generate_transcripts(n_convs=2, seed=13, mean_turns=3)
    fresh.append_table(extra)
    assert len(fresh.manifest_paths()) >= 2  # ml doc + >=1 shard
    assert len(fresh.files()) == len(legacy_files) + 1


def test_ts_range_prune_skips_whole_shards(tmp_path, small_shards):
    import pandas as pd

    table, src = _mk_table(tmp_path, n_files=12)
    ts = src.column("ts").to_pandas()
    lo, hi = ts.quantile(0.4), ts.quantile(0.45)
    pruned = table.prune_files_for_ts_range(lo, hi)
    assert 0 < len(pruned) < len(table.files())
    # exactness: pruned file set still covers every in-window row
    got = (
        table.scan_ts_range(lo, hi)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = (
        src.to_pandas()
        .query("ts >= @lo and ts < @hi")
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_expire_keeps_shards_shared_with_retained_snapshots(tmp_path, small_shards):
    from quanterra_pipeline_ray.stages.expire import expire_snapshots, sweep_orphans

    table, _ = _mk_table(tmp_path, n_files=9)
    extra = generate_transcripts(n_convs=2, seed=17, mean_turns=3)
    table.append_table(extra)  # s2 shares s1's shards
    table.append_table(generate_transcripts(n_convs=2, seed=19, mean_turns=3))
    fp_before = content_fingerprint(table.read_all())
    expire_snapshots(table, keep_last=1)
    # the retained snapshot must still resolve every shard + file
    fresh = TranscriptTable.load(table.root)
    assert content_fingerprint(fresh.read_all()) == fp_before
    for p in fresh.manifest_paths():
        assert os.path.exists(os.path.join(fresh.root, p))
    # orphan sweep (age guard disabled) leaves the live metadata alone
    sweep_orphans(fresh, min_age_s=0.0)
    assert content_fingerprint(fresh.read_all()) == fp_before


def test_rollback_restores_state_as_new_commit(tmp_path, small_shards):
    from quanterra_pipeline_ray.stages.evolve import evolve_schema

    table, src = _mk_table(tmp_path, n_files=9)
    target = table.current_snapshot_id()
    fp_target = content_fingerprint(table.read_all())
    # diverge: drop a file AND evolve the schema
    table.commit([], removed_paths=[table.files()[0].path], operation="delete")
    evolve_schema(table, [("extra", "int64", 7)])
    assert "extra" in table.schema_of().names
    snap = table.rollback(target)
    assert snap.snapshot_id > target  # history preserved, not rewritten
    assert content_fingerprint(table.read_all()) == fp_target
    assert "extra" not in table.schema_of().names  # metadata restored too
    # O(1) metadata: the rollback reuses the target's shards by reference
    assert set(table.manifest_paths()[1:]) == set(table.manifest_paths(target)[1:])


def test_rewrite_manifests_normalizes_shard_layout(tmp_path, small_shards):
    table, src = _mk_table(tmp_path, n_files=9)
    # fragment the shard layout: remove one file from each of two shards
    files = table.files()
    table.commit([], removed_paths=[files[0].path], operation="d1")
    table.commit([], removed_paths=[files[5].path], operation="d2")
    fp = content_fingerprint(table.read_all())
    snap = table.rewrite_manifests()
    n_files = len(table.files())
    n_shards = len(table.manifest_paths()) - 1
    assert n_shards == -(-n_files // mf.SHARD_TARGET_FILES)  # ceil division
    assert content_fingerprint(table.read_all()) == fp
    assert snap.operation == "rewrite_manifests"


def test_orphan_sweep_collects_unreferenced_manifests(tmp_path, small_shards):
    from quanterra_pipeline_ray.stages.expire import sweep_orphans

    table, _ = _mk_table(tmp_path, n_files=5)
    stray = os.path.join(table.root, "manifests", "m-deadbeef00000000dead.json")
    with open(stray, "wb") as fh:
        fh.write(b'{"files": []}')
    res = sweep_orphans(table, min_age_s=0.0)
    assert "manifests/m-deadbeef00000000dead.json" in res["deleted_orphans"]
    assert not os.path.exists(stray)
