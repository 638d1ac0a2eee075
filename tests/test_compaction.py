import os

from quanterra_pipeline_ray.state.checkpoint import Checkpoint
from quanterra_pipeline_ray.state.lineage import load_lineage
from quanterra_pipeline_ray.state.manifest import DataFile, TranscriptTable
from quanterra_pipeline_ray.stages.compaction import compact, plan_bins
from quanterra_pipeline_ray.synth import content_fingerprint, fragment_table, generate_transcripts


def _fragmented_table(tmp_path, n_files=12, **gen):
    root = str(tmp_path / "t")
    table = TranscriptTable.create(root)
    data = generate_transcripts(**{"n_convs": 30, "seed": 3, "mean_turns": 8, "hot_convs": 2, "hot_turns": 60, **gen})
    paths = fragment_table(data, os.path.join(root, "data", "frags"), n_files)
    table.register_fragments(paths)
    return table, data


def test_plan_bins_covers_all_and_respects_target():
    files = [DataFile(path=f"data/f{i}.parquet", rows=10, bytes=b, checksum=str(i)) for i, b in enumerate([50, 40, 30, 30, 20, 10, 100])]
    bins, carried = plan_bins(files, target_bytes=100, carry_forward_ratio=0.75)
    seen = {f.path for b in bins for f in b} | {f.path for f in carried}
    assert seen == {f.path for f in files}
    for b in bins:
        assert sum(f.bytes for f in b) <= 100 or len(b) == 1
    assert any(f.bytes == 100 for f in carried)  # big file skipped (carry forward)


def test_compact_scan_equality(tmp_path):
    table, data = _fragmented_table(tmp_path)
    before = content_fingerprint(table.read_all())
    assert before == content_fingerprint(data)
    n_before = len(table.files())
    snap = compact(table, target_bytes=1 << 20)
    assert len(table.files()) < n_before
    after = content_fingerprint(table.read_all())
    assert after == before  # per-turn text equality under (conv_id, turn_idx) ordering


def test_compact_snapshot_isolation(tmp_path):
    table, _ = _fragmented_table(tmp_path)
    pinned = table.current_snapshot_id()
    pinned_paths = set(table.file_paths(pinned))
    compact(table, target_bytes=1 << 20)
    # reader pinned to the old snapshot still resolves the exact same files
    assert set(table.file_paths(pinned)) == pinned_paths
    assert all(os.path.exists(p) for p in pinned_paths)  # nothing deleted by compaction
    assert table.scan(pinned).count() == table.scan().count()


def test_compact_emits_lineage(tmp_path):
    table, _ = _fragmented_table(tmp_path)
    snap = compact(table, target_bytes=1 << 20)
    recs = load_lineage(table.root, snap.snapshot_id)
    assert recs, "lineage records written"
    assert all(r["op"] == "compact" for r in recs)
    assert sum(r["rows_out"] for r in recs) == table.read_all().num_rows
    for r in recs:
        assert r["inputs"] and all("checksum" in i for i in r["inputs"])


def test_compact_resume_skips_completed(tmp_path, monkeypatch):
    table, _ = _fragmented_table(tmp_path, n_files=8)
    base = table.current_snapshot_id()
    files = table.files(base)
    from quanterra_pipeline_ray.stages import compaction as comp

    bins, _carried = plan_bins(files, target_bytes=1 << 20)
    assert len(bins) >= 1

    # simulate a crashed run: execute only bin 0 by hand, leave its checkpoint
    import json as _json

    import pyarrow.parquet as pq
    import pandas as pd

    op_id = f"compact-s{base}-t{1 << 20}"
    ckpt = Checkpoint(table.root, op_id)
    spec = {
        "bin_id": 0,
        "root": table.root,
        "paths": [f.path if f.path.startswith("/") else table._p(f.path) for f in bins[0]],
        "rel_paths": [f.path for f in bins[0]],
        "checksums": [f.checksum for f in bins[0]],
        "ckpt_dir": ckpt.dir,
    }
    comp._compact_bins_batch(pd.DataFrame({"spec": [_json.dumps(spec)]}))
    assert len(ckpt.completed()) == 1

    # resumed run must not re-execute bin 0: delete its input fragments so any
    # attempt to re-read them would fail loudly
    before = content_fingerprint(table.read_all())
    for p in spec["paths"]:
        os.remove(p)
    compact(table, target_bytes=1 << 20)
    assert content_fingerprint(table.read_all()) == before
    assert ckpt.completed() == {}  # cleared after commit


def test_compaction_sub_bin_split_matches_layout_stable(tmp_path):
    """When bins < cpus/2 the op splits each bin into byte-balanced sub-groups,
    each writing its OWN file (~target/k bytes): scan content must equal the
    layout-stable one-file-per-bin plan, the split must actually produce more
    files (the writer-quantization fix), and the split plan must be
    deterministic (content-addressed checksums equal across reruns)."""
    import os

    from quanterra_pipeline_ray.stages.compaction import CompactionOp, compact
    from quanterra_pipeline_ray.state.manifest import TranscriptTable
    from quanterra_pipeline_ray.synth import content_fingerprint, fragment_table, generate_transcripts

    data = generate_transcripts(n_convs=50, seed=13, hot_convs=0)
    sums = {}
    for variant in ("split", "stable", "split2"):
        root = str(tmp_path / variant)
        t = TranscriptTable.create(root)
        n_frags = 12
        t.register_fragments(fragment_table(data, os.path.join(root, "data", "frags"), n_frags))
        op = CompactionOp(1 << 30)
        assert len(op.plan(t, t.current_snapshot_id())) == 1  # one bin < cpus//2
        frag_sums = {f.checksum for f in t.files()}
        compact(t, target_bytes=1 << 30, sub_bin=(None if variant != "stable" else False))
        if variant == "stable":
            assert len(t.files()) == 1  # layout-stable callers keep 1 file/bin
        else:
            assert len(t.files()) >= 2  # quantization actually broken
            # every sub-group must MERGE >= 2 fragments — a singleton group
            # rewrites one sorted file into itself (same content hash) and
            # the small file survives, defeating the compaction
            assert len(t.files()) <= n_frags // 2
            assert not frag_sums & {f.checksum for f in t.files()}
        sums[variant] = sorted(f.checksum for f in t.files())
        assert content_fingerprint(t.read_all()) == content_fingerprint(data)
    assert sums["split"] == sums["split2"]  # deterministic grouping
    assert sums["split"] != sums["stable"]


def test_compact_resume_skips_completed_sub_bin(tmp_path):
    """A sub-bin checkpoint record (datafiles plural) written before a crash
    is honored on resume: the bin is not rewritten and commit() registers
    every sub-file."""
    import os

    from quanterra_pipeline_ray.stages.compaction import CompactionOp
    from quanterra_pipeline_ray.stages.protocol import run_op
    from quanterra_pipeline_ray.state.manifest import TranscriptTable
    from quanterra_pipeline_ray.synth import content_fingerprint, fragment_table, generate_transcripts

    data = generate_transcripts(n_convs=40, seed=21, hot_convs=0)
    root = str(tmp_path / "t")
    t = TranscriptTable.create(root)
    t.register_fragments(fragment_table(data, os.path.join(root, "data", "frags"), 10))

    # first run: plan + run ONLY (simulated crash before commit)
    op = CompactionOp(1 << 30)
    parts = op.plan(t, t.current_snapshot_id())
    first = op.run(t, parts)
    assert any("datafiles" in r for r in first)
    done_files = {d["path"] for r in first for d in r["datafiles"]}

    # resume: a fresh op must reuse the checkpointed records verbatim
    op2 = CompactionOp(1 << 30)
    parts2 = op2.plan(t, t.current_snapshot_id())
    second = op2.run(t, parts2)
    assert {d["path"] for r in second for d in r["datafiles"]} == done_files
    snap = op2.commit(t, second)
    assert {f.path for f in t.files(snap.snapshot_id)} == done_files
    assert content_fingerprint(t.read_all()) == content_fingerprint(data)
