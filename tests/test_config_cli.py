"""Config registry, CLI, observability, storage adapter."""

import json
import os

import pyarrow.parquet as pq

from quanterra_pipeline_ray.synth import generate_transcripts


def test_settings_registry_env_lookup():
    import pytest

    from quanterra_pipeline_ray.config import MaintenanceSettings, get_settings, REGISTRY

    dev, prod = get_settings("dev"), get_settings("prod")
    assert dev.target_file_bytes < prod.target_file_bytes
    assert REGISTRY.environments() == ["dev", "prod"]
    with pytest.raises(KeyError):
        get_settings("staging")
    override = dev.with_overrides(target_rows=7, part_bits=None)
    assert override.target_rows == 7 and override.env == "dev"


def test_cli_drives_maintenance(tmp_path):
    """create -> append -> compact -> merge -> status, all through main()."""
    from quanterra_pipeline_ray.cli import main
    from quanterra_pipeline_ray.state.manifest import TranscriptTable
    from quanterra_pipeline_ray.synth import content_fingerprint

    root = str(tmp_path / "t")
    data = generate_transcripts(n_convs=10, seed=2, hot_convs=0)
    src_path = str(tmp_path / "in.parquet")
    pq.write_table(data, src_path)

    assert main(["create", root]) == 0
    assert main(["append", root, "--parquet", src_path]) == 0
    assert main(["compact", root]) == 0
    assert main(["status", root]) == 0
    table = TranscriptTable.load(root)
    assert content_fingerprint(table.read_all()) == content_fingerprint(data)
    assert [s.operation for s in table.snapshots()] == ["create", "append", "compact"]


def test_stage_metrics_aggregation():
    from quanterra_pipeline_ray.observability import stage_metrics

    recs = [
        {"op": "compact", "rows_in": 10, "rows_out": 10, "duration_s": 0.5},
        {"op": "compact", "rows_in": 5, "rows_out": 5, "duration_s": 1.5},
        {"op": "merge", "rows_in": 3, "rows_out": 2, "duration_s": 0.1},
    ]
    m = stage_metrics(recs)
    assert m["compact"]["partitions"] == 2
    assert m["compact"]["rows_out"] == 15
    assert m["compact"]["max_duration_s"] == 1.5
    assert m["merge"]["rows_out"] == 2


def test_configure_logging_singleton():
    from quanterra_pipeline_ray.observability import configure_logging

    a = configure_logging()
    b = configure_logging(json_lines=True)  # second call is a no-op
    assert a is b and len(a.handlers) == 1


def test_storage_adapter_atomic_roundtrip(tmp_path):
    from quanterra_pipeline_ray.state.fs import StorageAdapter

    fs = StorageAdapter()
    d = str(tmp_path / "x" / "y")
    fs.makedirs(d)
    p = os.path.join(d, "f.json")
    fs.write_atomic(p, b'{"a": 1}')
    assert fs.exists(p) and fs.read_bytes(p) == b'{"a": 1}'
    assert fs.listdir(d) == ["f.json"]
    assert fs.walk_files(str(tmp_path / "x")) == [p]
    assert fs.mtime(p) > 0
    fs.remove(p)
    assert not fs.exists(p)
    assert fs.listdir(str(tmp_path / "missing")) == []


def test_dataset_stats_surface():
    import ray.data as rd

    from quanterra_pipeline_ray.observability import dataset_stats

    ds = rd.range(100).map_batches(lambda b: b, batch_format="pandas").materialize()
    s = dataset_stats(ds)
    assert "Operator" in s or "Stage" in s


def test_cli_evolve_changelog_scan_refs(tmp_path):
    """The round-2 CLI surface: evolve, changelog, time-travel scan."""
    from quanterra_pipeline_ray.cli import main
    from quanterra_pipeline_ray.state.manifest import TranscriptTable

    root = str(tmp_path / "t")
    data = generate_transcripts(n_convs=8, seed=3, hot_convs=0)
    src = str(tmp_path / "in.parquet")
    pq.write_table(data, src)
    assert main(["create", root]) == 0
    assert main(["append", root, "--parquet", src]) == 0
    base = TranscriptTable.load(root).current_snapshot_id()
    assert main(["evolve", root, "--add", "priority:int32:0", "origin:string:synth"]) == 0
    table = TranscriptTable.load(root)
    assert table.schema_of().names[-2:] == ["priority", "origin"]
    assert main(["changelog", root, "--from", str(base)]) == 0
    assert main(["scan", root]) == 0
    assert main(["compact", root]) == 0
    got = TranscriptTable.load(root).read_all()
    assert got.num_rows == data.num_rows
    assert got.column("priority").to_pylist() == [0] * data.num_rows


def test_cli_rollback_and_rewrite_manifests(tmp_path):
    from quanterra_pipeline_ray.cli import main
    from quanterra_pipeline_ray.state.manifest import TranscriptTable
    from quanterra_pipeline_ray.synth import content_fingerprint

    root = str(tmp_path / "t")
    data = generate_transcripts(n_convs=8, seed=3, hot_convs=0)
    src = str(tmp_path / "in.parquet")
    pq.write_table(data, src)
    assert main(["create", root]) == 0
    assert main(["append", root, "--parquet", src]) == 0
    table = TranscriptTable.load(root)
    target = table.current_snapshot_id()
    fp = content_fingerprint(table.read_all())
    extra = str(tmp_path / "extra.parquet")
    pq.write_table(generate_transcripts(n_convs=2, seed=9, hot_convs=0), extra)
    assert main(["append", root, "--parquet", extra]) == 0
    assert main(["rollback", root, "--to", str(target)]) == 0
    t2 = TranscriptTable.load(root)
    assert content_fingerprint(t2.read_all()) == fp
    assert main(["rewrite-manifests", root]) == 0
    assert content_fingerprint(TranscriptTable.load(root).read_all()) == fp


def test_cli_run_flow_and_update(tmp_path, capsys):
    """Round-3 operational surface: run-flow trigger+poll and self-update
    (reference `upload_transactions.py:53-72`, `tool_update.py:16-27`)."""
    import json as _json

    from quanterra_pipeline_ray.cli import main
    from quanterra_pipeline_ray.state.manifest import TranscriptTable

    root = str(tmp_path / "t")
    data = generate_transcripts(n_convs=8, seed=3, hot_convs=0)
    src = str(tmp_path / "in.parquet")
    pq.write_table(data, src)
    assert main(["create", root]) == 0
    assert main(["append", root, "--parquet", src]) == 0
    capsys.readouterr()
    assert main(["run-flow", root, "--flow", "compact", "--poll-interval", "0.05"]) == 0
    doc = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert doc["state"] == "COMPLETED" and doc["flow"] == "compact"
    assert TranscriptTable.load(root).read_all().num_rows == data.num_rows

    rel = tmp_path / "release"
    (rel / "versions").mkdir(parents=True)
    (rel / "latest_version.json").write_text(_json.dumps({"version": "3.1.4"}))
    (rel / "versions" / "quanterra_pipeline_ray-3.1.4.tar.gz").write_bytes(b"pkg")
    inst = str(tmp_path / "install")
    assert main(["update", "--release-root", str(rel), "--install-path", inst, "--yes"]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["status"] == "updated" and out["version"] == "3.1.4"


def test_cli_index_and_ingest_commands(tmp_path, capsys):
    import json

    import numpy as np
    import pandas as pd

    from quanterra_pipeline_ray.cli import main

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "alpha bravo charlie delta echo foxtrot golf hotel india juliet",
                "kilo lima mike november oscar papa quebec romeo sierra tango",
                "uniform victor whiskey xray yankee zulu one two three four",
                "five six seven eight nine ten eleven twelve thirteen fourteen",
                "fifteen sixteen seventeen eighteen nineteen twenty half more",
                "alpha bravo charlie delta echo foxtrot golf hotel india juliet",  # dup of 0
            ],
        }
    )
    corpus_path = str(tmp_path / "docs.parquet")
    docs.head(5).to_parquet(corpus_path)
    batch_path = str(tmp_path / "batch.parquet")
    docs.tail(1).to_parquet(batch_path)
    allp = str(tmp_path / "all.parquet")
    docs.to_parquet(allp)

    idx = str(tmp_path / "idx")
    assert main(["index-build", idx, "--corpus", corpus_path, "--n-buckets", "16"]) == 0
    meta = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert meta["n_docs"] == 5

    assert main(["index-probe", idx, "--batch", batch_path, "--corpus", allp]) == 0
    probe = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert probe["n_pairs"] == 1 and probe["sample"][0] == {"a": 0, "b": 5}

    store = str(tmp_path / "store")
    assert main(["ingest-dedup", store, "--batch", corpus_path]) == 0
    rep0 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep0["n_kept"] == 5
    assert main(["ingest-dedup", store, "--batch", batch_path]) == 0
    rep1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep1["n_kept"] == 0 and rep1["drops"] == [[5, 0]]

    # index compaction: layout-only (probe result identical), fewer files
    assert main(["index-compact", idx, "--min-files", "1"]) == 0
    comp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert comp["files_after"] <= comp["files_before"]
    assert main(["index-probe", idx, "--batch", batch_path, "--corpus", allp]) == 0
    probe2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert probe2 == probe


def test_cli_text_search(tmp_path, capsys):
    import json

    import numpy as np
    import pandas as pd

    from quanterra_pipeline_ray.cli import main
    from quanterra_pipeline_ray.state.manifest import TranscriptTable

    root = str(tmp_path / "t")
    TranscriptTable.create(root)
    df = pd.DataFrame(
        {
            "conv_id": ["c0", "c1", "c2"],
            "turn_idx": np.zeros(3, dtype=np.int32),
            "role": ["user"] * 3,
            "text": ["red apple pie", "red banana", "green apple"],
            "tool": [""] * 3,
            "ts": pd.to_datetime([0, 1, 2], unit="s").astype("datetime64[us]"),
        }
    )
    import pyarrow as pa

    TranscriptTable.load(root).append_table(pa.Table.from_pandas(df, preserve_index=False))

    assert main(["text-search", root, "--tokens", "red", "apple", "--mode", "and", "--build"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [r["text"] for r in out["rows"]] == ["red apple pie"]

    assert main(["text-search", root, "--tokens", "banana", "green", "--mode", "or"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sorted(r["text"] for r in out["rows"]) == ["green apple", "red banana"]


def test_cli_detached_submit_then_poll(tmp_path, capsys):
    """The reference's trigger-and-poll lifecycle against a DETACHED run
    (`upload_transactions.py:53-72`): run-flow --detach submits the flow
    into its own process (surviving the submitting CLI), flow-status reads
    the shared state doc from a separate invocation, and flow-wait polls
    it to COMPLETED — then the table shows the compaction really ran."""
    import json as _json

    from quanterra_pipeline_ray.cli import main
    from quanterra_pipeline_ray.state.manifest import TranscriptTable
    from quanterra_pipeline_ray.synth import content_fingerprint

    root = str(tmp_path / "t")
    data = generate_transcripts(n_convs=8, seed=5, hot_convs=0)
    src = str(tmp_path / "in.parquet")
    pq.write_table(data, src)
    assert main(["create", root]) == 0
    assert main(["append", root, "--parquet", src]) == 0
    capsys.readouterr()

    assert main(["run-flow", root, "--flow", "compact", "--detach"]) == 0
    sub = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    run_id = sub["run_id"]
    assert sub["state"] in ("PENDING", "RUNNING")

    # status is observable from a different CLI invocation immediately
    assert main(["flow-status", root, "--run-id", run_id]) == 0
    st = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["state"] in ("PENDING", "RUNNING", "COMPLETED")

    # poll to terminal (worker is a separate detached process)
    assert (
        main(["flow-wait", root, "--run-id", run_id, "--poll-interval", "0.2",
              "--timeout", "240"]) == 0
    )
    doc = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert doc["state"] == "COMPLETED" and doc["flow"] == "compact"

    table = TranscriptTable.load(root)
    assert content_fingerprint(table.read_all()) == content_fingerprint(data)
    assert table.snapshots()[-1].operation == "compact"
