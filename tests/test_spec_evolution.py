"""Partition-spec evolution: metadata-only layout changes + incremental
re-clustering (`stages/spec.py`, `cluster(only_stale=True)`).

Reference parity note: the reference pins its layout in code (deterministic
object keys, `src/models/data/eodhd_models.py:29-32`); evolving it there
means rewriting every object.  Here a layout change is one metadata commit
and the rewrite happens incrementally, file-by-staleness.
"""

import os

import pyarrow as pa
import pytest

from quanterra_pipeline_ray.stages.spec import (
    find_or_add_spec,
    partition_spec_of,
    set_partition_spec,
)
from quanterra_pipeline_ray.stages.zorder import cluster
from quanterra_pipeline_ray.state.manifest import DataFile, TranscriptTable
from quanterra_pipeline_ray.synth import content_fingerprint, fragment_table, generate_transcripts


def _make(tmp_path, n_convs=40, seed=5, name="t"):
    root = str(tmp_path / name)
    table = TranscriptTable.create(root)
    data = generate_transcripts(n_convs=n_convs, seed=seed, mean_turns=10, hot_convs=2, hot_turns=150)
    table.register_fragments(fragment_table(data, os.path.join(root, "data", "frags"), 10))
    return table, data


def test_set_partition_spec_is_metadata_only(tmp_path):
    table, data = _make(tmp_path)
    before_files = sorted(f.path for f in table.files())
    before = content_fingerprint(table.read_all())
    snap = set_partition_spec(table, curve="hilbert", ts_bucket_us=60_000_000, part_bits=3)
    assert snap.operation == "set-spec"
    assert sorted(f.path for f in table.files()) == before_files  # zero files moved
    assert content_fingerprint(table.read_all()) == before
    assert partition_spec_of(table) == {
        "spec_id": 0,
        "curve": "hilbert",
        "ts_bucket_us": 60_000_000,
        "part_bits": 3,
        "time_major": False,
    }


def test_cluster_resolves_declared_spec_and_tags_files(tmp_path):
    table, data = _make(tmp_path)
    set_partition_spec(table, curve="z", ts_bucket_us=60_000_000, part_bits=3)
    snap = cluster(table, target_rows=500)  # no layout args: resolve from spec
    assert snap.summary["part_bits"] == 3
    assert snap.summary["ts_bucket_us"] == 60_000_000
    sid = snap.summary["spec_id"]
    assert all(f.spec_id == sid for f in table.files())
    # origin is pinned in the registered spec for stable incremental bucketing
    assert snap.partition_specs[sid]["ts_origin_us"] is not None
    assert content_fingerprint(table.read_all()) == content_fingerprint(data)


def test_only_stale_recluster_touches_only_new_files(tmp_path):
    table, data = _make(tmp_path)
    set_partition_spec(table, part_bits=3, ts_bucket_us=3_600_000_000)
    cluster(table, target_rows=500)
    clustered = {f.path for f in table.files()}
    assert all(f.spec_id is not None for f in table.files())

    # fresh append: untagged fragments land next to current-spec files
    extra = generate_transcripts(n_convs=12, seed=99, mean_turns=8)
    table.register_fragments(fragment_table(extra, os.path.join(table.root, "data", "more"), 4))
    # incremental run rewrites ONLY the stale (appended) files
    snap = cluster(table, target_rows=500, only_stale=True)
    after = {f.path for f in table.files()}
    assert clustered <= after, "current-spec files were rewritten by an incremental run"
    assert all(f.spec_id is not None for f in table.files())
    merged = pa.concat_tables([data, extra])
    assert content_fingerprint(table.read_all()) == content_fingerprint(merged)
    # a second incremental run is a no-op commit-wise
    again = cluster(table, target_rows=500, only_stale=True)
    assert again.snapshot_id == snap.snapshot_id


def test_spec_change_marks_table_stale_and_migrates(tmp_path):
    table, data = _make(tmp_path)
    set_partition_spec(table, part_bits=2, ts_bucket_us=3_600_000_000)
    cluster(table, target_rows=500)
    old_files = {f.path for f in table.files()}
    old_sid = partition_spec_of(table)["spec_id"]
    # layout change: metadata-only, then incremental migration moves all
    set_partition_spec(table, part_bits=4, ts_bucket_us=60_000_000, time_major=True)
    assert {f.path for f in table.files()} == old_files  # still zero moved
    snap = cluster(table, target_rows=500, only_stale=True)
    new_sid = snap.summary["spec_id"]
    assert new_sid != old_sid
    assert all(f.spec_id == new_sid for f in table.files())
    assert not ({f.path for f in table.files()} & old_files)
    assert content_fingerprint(table.read_all()) == content_fingerprint(data)
    # both layouts remain in the append-only spec list
    assert len(snap.partition_specs) >= 2


def test_only_stale_requires_pinned_part_bits(tmp_path):
    table, _ = _make(tmp_path)
    with pytest.raises(ValueError, match="pinned part_bits"):
        cluster(table, target_rows=500, only_stale=True)


def test_find_or_add_spec_dedupes_layouts():
    specs, a = find_or_add_spec(None, {"curve": "z", "ts_bucket_us": 10, "part_bits": 2})
    specs, b = find_or_add_spec(specs, {"curve": "z", "ts_bucket_us": 10, "part_bits": 2})
    specs2, c = find_or_add_spec(specs, {"curve": "hilbert", "ts_bucket_us": 10, "part_bits": 2})
    assert a == b == 0 and c == 1 and len(specs2) == 2


def test_datafile_spec_id_roundtrip():
    f = DataFile(path="p", rows=1, bytes=2, checksum="c", spec_id=7)
    assert DataFile.from_json(f.to_json()).spec_id == 7
    assert DataFile.from_json({"path": "p", "rows": 1, "bytes": 2, "checksum": "c"}).spec_id is None
