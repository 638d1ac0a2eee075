"""Operational control plane (`flowctl.py`): self-update manifest flow
(reference `src/cli/tool_update.py:16-27`) and flow trigger/poll loop
(reference `src/cli/upload_transactions.py:53-72`)."""

import json
import os

import pytest

from quanterra_pipeline_ray.flowctl import (
    FlowRunFailed,
    FlowRunner,
    ToolUpdater,
    parse_version,
)


def _release(tmp_path, version="1.2.0"):
    rel = tmp_path / "release"
    (rel / "versions").mkdir(parents=True)
    (rel / "latest_version.json").write_text(json.dumps({"version": version}))
    (rel / "versions" / f"quanterra_pipeline_ray-{version}.tar.gz").write_bytes(
        b"fake-package-" + version.encode()
    )
    return str(rel)


def test_parse_version_ordering():
    assert parse_version("1.10.2") > parse_version("1.9.9")
    assert parse_version("0.0.0") < parse_version("0.0.1")
    assert parse_version("2.0") > parse_version("1.99.99")


def test_updater_performs_update_and_is_idempotent(tmp_path):
    rel = _release(tmp_path, "1.2.0")
    inst = str(tmp_path / "install")
    up = ToolUpdater(rel, inst)
    assert up.current_version() == "0.0.0"  # unknown install
    res = up.check_for_updates()
    assert res["status"] == "updated" and res["version"] == "1.2.0"
    assert up.current_version() == "1.2.0"
    link = os.path.join(inst, "current")
    assert os.path.islink(link)
    with open(link, "rb") as f:
        assert f.read() == b"fake-package-1.2.0"
    # already current: no second download
    assert up.check_for_updates()["status"] == "up-to-date"


def test_updater_respects_declined_confirmation_and_survives_errors(tmp_path):
    rel = _release(tmp_path, "9.0.0")
    up = ToolUpdater(rel, str(tmp_path / "install"))
    res = up.check_for_updates(confirm=lambda cur, new: False)
    assert res == {"status": "declined", "current": "0.0.0", "latest": "9.0.0"}
    # missing release root -> error status, not an exception (tool_update.py:25-27)
    bad = ToolUpdater(str(tmp_path / "nope"), str(tmp_path / "install"))
    assert bad.check_for_updates()["status"] == "error"


def test_updater_upgrades_across_versions(tmp_path):
    rel = _release(tmp_path, "1.2.0")
    inst = str(tmp_path / "install")
    ToolUpdater(rel, inst).check_for_updates()
    # release root publishes a newer version; same installer picks it up
    (tmp_path / "release" / "latest_version.json").write_text(json.dumps({"version": "1.10.0"}))
    (tmp_path / "release" / "versions" / "quanterra_pipeline_ray-1.10.0.tar.gz").write_bytes(
        b"fake-package-1.10.0"
    )
    res = ToolUpdater(rel, inst).check_for_updates()
    assert res["status"] == "updated" and res["version"] == "1.10.0"
    with open(os.path.join(inst, "current"), "rb") as f:
        assert f.read() == b"fake-package-1.10.0"


def test_flow_runner_trigger_poll_completed(tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    calls = []

    def ok_flow(r, factor=2):
        calls.append((r, factor))
        return {"answer": 21 * factor}

    runner = FlowRunner(root, {"ok": ok_flow})
    run_id = runner.trigger("ok", {"factor": 3})
    doc = runner.poll(run_id, interval_s=0.02, timeout_s=10)
    assert doc["state"] == "COMPLETED"
    assert doc["result"] == {"answer": 63}
    assert calls == [(root, 3)]
    # the state document is shared storage: a second runner sees the run
    other = FlowRunner(root, {})
    assert other.state(run_id)["state"] == "COMPLETED"
    assert run_id in other.runs()


def test_flow_runner_failed_state_raises_with_message(tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)

    def boom(r):
        raise ValueError("bad partition plan")

    runner = FlowRunner(root, {"boom": boom})
    with pytest.raises(FlowRunFailed, match="bad partition plan"):
        runner.run("boom", interval_s=0.02, timeout_s=10)


def test_flow_runner_unknown_flow(tmp_path):
    root = str(tmp_path / "t")
    os.makedirs(root)
    with pytest.raises(KeyError, match="unknown flow"):
        FlowRunner(root, {}).trigger("nope")


def test_default_flows_run_compact_end_to_end(tmp_path):
    from quanterra_pipeline_ray.flowctl import default_flows
    from quanterra_pipeline_ray.state.manifest import TranscriptTable
    from quanterra_pipeline_ray.synth import content_fingerprint, fragment_table, generate_transcripts

    root = str(tmp_path / "t")
    table = TranscriptTable.create(root)
    data = generate_transcripts(n_convs=20, seed=3, mean_turns=8)
    table.register_fragments(fragment_table(data, os.path.join(root, "data", "frags"), 6))
    runner = FlowRunner(root, default_flows())
    doc = runner.run("compact", {"target_bytes": 4 << 20}, interval_s=0.05, timeout_s=120)
    assert doc["state"] == "COMPLETED"
    assert content_fingerprint(TranscriptTable.load(root).read_all()) == content_fingerprint(data)
