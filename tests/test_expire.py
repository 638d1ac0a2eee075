import os

from quanterra_pipeline_ray.stages.compaction import compact
from quanterra_pipeline_ray.stages.expire import expire_snapshots
from quanterra_pipeline_ray.state.manifest import TranscriptTable
from quanterra_pipeline_ray.synth import content_fingerprint, generate_transcripts


def _table_with_history(tmp_path):
    root = str(tmp_path / "t")
    table = TranscriptTable.create(root)
    data = generate_transcripts(n_convs=15, seed=2, mean_turns=6, hot_convs=0)
    # three appends -> three snapshots, then compaction -> fourth
    table.append_table(data.slice(0, 30))
    table.append_table(data.slice(30, 30))
    table.append_table(data.slice(60, 30))
    compact(table, target_bytes=1 << 20)
    return table, min(90, data.num_rows)


def test_expire_keeps_recent_and_deletes_unreachable(tmp_path):
    table, n_rows = _table_with_history(tmp_path)
    all_snaps = [s.snapshot_id for s in table.snapshots()]
    assert len(all_snaps) == 5  # create + 3 appends + compact
    before_fp = content_fingerprint(table.read_all())

    result = expire_snapshots(table, keep_last=1)
    assert table.current_snapshot_id() in result["kept"]
    # current scan unaffected
    assert content_fingerprint(table.read_all()) == before_fp
    # expired snapshot jsons gone
    remaining = {s.snapshot_id for s in table.snapshots()}
    assert remaining == set(result["kept"])
    # files reachable from the kept snapshot still exist
    for p in table.file_paths():
        assert os.path.exists(p)
    # pre-compaction small files (only reachable from expired snapshots) deleted
    assert result["deleted_files"], "expected unreachable files to be swept"
    for p in result["deleted_files"]:
        assert not os.path.exists(table._p(p))


def test_expire_respects_pinned_snapshot(tmp_path):
    table, n_rows = _table_with_history(tmp_path)
    pinned = table.current_snapshot_id() - 1  # pre-compaction snapshot
    pinned_paths = table.file_paths(pinned)
    result = expire_snapshots(table, keep_last=1, keep_ids=[pinned])
    assert pinned in result["kept"]
    # pinned reader still resolves and reads its full file list
    for p in pinned_paths:
        assert os.path.exists(p)
    assert table.scan(pinned).count() == n_rows


def test_expire_dry_run_deletes_nothing(tmp_path):
    table, n_rows = _table_with_history(tmp_path)
    result = expire_snapshots(table, keep_last=1, dry_run=True)
    assert result["deleted_files"]
    for p in result["deleted_files"]:
        assert os.path.exists(table._p(p))
    assert len(table.snapshots()) == 5


def test_sweep_orphans_collects_crashed_commit_debris(tmp_path):
    from quanterra_pipeline_ray.state.manifest import write_data_file
    from quanterra_pipeline_ray.stages.expire import sweep_orphans
    from quanterra_pipeline_ray.state.checkpoint import Checkpoint

    table, n_rows = _table_with_history(tmp_path)
    before_fp = content_fingerprint(table.read_all())
    # simulate a crashed commit: a data file written but never committed
    orphan = write_data_file(generate_transcripts(n_convs=2, seed=9, hot_convs=0), table.root)
    # and one claimed by a live checkpoint record (must survive the sweep)
    claimed = write_data_file(generate_transcripts(n_convs=2, seed=10, hot_convs=0), table.root)
    Checkpoint(table.root, "op-in-flight").write(0, {"datafiles": [claimed.to_json()]})

    res = sweep_orphans(table, min_age_s=0.0)
    assert orphan.path in res["deleted_orphans"]
    assert not os.path.exists(table._p(orphan.path))
    assert claimed.path not in res["deleted_orphans"]
    assert os.path.exists(table._p(claimed.path))
    # committed data untouched
    assert content_fingerprint(table.read_all()) == before_fp


def test_sweep_orphans_age_guard(tmp_path):
    from quanterra_pipeline_ray.state.manifest import write_data_file
    from quanterra_pipeline_ray.stages.expire import sweep_orphans

    table, _ = _table_with_history(tmp_path)
    fresh = write_data_file(generate_transcripts(n_convs=1, seed=3, hot_convs=0), table.root)
    res = sweep_orphans(table, min_age_s=3600.0)
    assert fresh.path not in res["deleted_orphans"]
    assert os.path.exists(table._p(fresh.path))


def test_named_refs_protect_snapshots_from_expiry(tmp_path):
    import pytest

    table, n_rows = _table_with_history(tmp_path)
    pinned = table.current_snapshot_id() - 1  # pre-compaction snapshot
    table.set_ref("audited-v1", pinned)
    assert table.ref("audited-v1") == pinned
    assert table.refs() == {"audited-v1": pinned}

    result = expire_snapshots(table, keep_last=1)
    assert pinned in result["kept"]
    assert table.scan(ref="audited-v1").count() == n_rows  # still readable

    table.drop_ref("audited-v1")
    result2 = expire_snapshots(table, keep_last=1)
    assert pinned in result2["expired"]
    with pytest.raises(KeyError):
        table.ref("audited-v1")
    with pytest.raises(ValueError):
        table.set_ref("bad/name")
