"""Operational control plane: CLI self-update + flow trigger/poll.

Re-expresses the reference's two operator-facing loops over this engine's
storage seam (:mod:`.state.fs`), so they work against any
``pyarrow.fs``-backed release/table root:

* :class:`ToolUpdater` — the reference's ``CLIToolUpdater``
  (`src/cli/tool_update.py:16-27`): a version manifest
  (``latest_version.json``) lives in the release root, the installed
  version in ``version.txt``; ``check_for_updates`` compares semver,
  confirms, downloads the release blob and repoints a ``current`` symlink.
  The reference shells out to ``uv venv``/``uv pip``
  (`tool_update.py:56-70`) — no package manager exists in this sandbox, so
  installation here IS the download + version-file + symlink flip, which is
  also the part that must be atomic-ish and idempotent.
* :class:`FlowRunner` — the reference's trigger-then-poll deployment loop
  (`src/cli/upload_transactions.py:53-72`: ``run_deployment(...,
  poll_interval=5)`` then raise on a failed terminal state).  A flow run
  here is a named maintenance callable executed in a background thread; its
  state document (PENDING → RUNNING → COMPLETED/FAILED) is published to
  ``flows/<run_id>.json`` under the table root through the storage adapter,
  and :meth:`poll` watches that document exactly like the reference polls
  Prefect — including raising with the failure message on a failed state.
"""

from __future__ import annotations

import json
import os
import threading
import time
import uuid
from typing import Any, Callable

from .state.fs import LOCAL, StorageAdapter


def parse_version(v: str) -> tuple[int, ...]:
    """Semver-ish compare key ('1.10.2' > '1.9.9'); non-numeric parts -> 0."""
    parts = []
    for p in v.strip().split("."):
        digits = "".join(ch for ch in p if ch.isdigit())
        parts.append(int(digits) if digits else 0)
    return tuple(parts or [0])


class ToolUpdater:
    """Self-update against a release root (any StorageAdapter-backed FS).

    Layout (mirrors the reference bucket, `tool_update.py:29-56`)::

        <release_root>/latest_version.json          {"version": "1.2.0"}
        <release_root>/versions/<pkg>-<version>.tar.gz
        <install_path>/version.txt                  installed version
        <install_path>/<pkg>-<version>.tar.gz       downloaded release
        <install_path>/current                      symlink to the active blob
    """

    def __init__(
        self,
        release_root: str,
        install_path: str,
        package: str = "quanterra_pipeline_ray",
        fs: StorageAdapter | None = None,
    ):
        self.release_root = release_root
        self.install_path = install_path
        self.package = package
        self.fsa = fs or LOCAL

    def current_version(self) -> str:
        vf = os.path.join(self.install_path, "version.txt")
        if os.path.exists(vf):
            with open(vf) as f:
                return f.read().strip()
        return "0.0.0"  # `tool_update.py:41`: unknown install = 0.0.0

    def latest_version(self) -> str:
        doc = json.loads(
            self.fsa.read_bytes(os.path.join(self.release_root, "latest_version.json"))
        )
        return str(doc["version"])

    def check_for_updates(
        self, confirm: Callable[[str, str], bool] = lambda cur, new: True
    ) -> dict[str, Any]:
        """Compare versions, confirm, update.  Returns a status dict instead
        of printing (the CLI layer prints).  Never raises on a failed check
        (`tool_update.py:25-27` swallows to a message)."""
        try:
            cur, new = self.current_version(), self.latest_version()
            if parse_version(new) <= parse_version(cur):
                return {"status": "up-to-date", "version": cur}
            if not confirm(cur, new):
                return {"status": "declined", "current": cur, "latest": new}
            return self._perform_update(new)
        except Exception as exc:
            return {"status": "error", "error": str(exc)}

    def _perform_update(self, new_version: str) -> dict[str, Any]:
        os.makedirs(self.install_path, exist_ok=True)
        blob = f"{self.package}-{new_version}.tar.gz"
        payload = self.fsa.read_bytes(os.path.join(self.release_root, "versions", blob))
        local_pkg = os.path.join(self.install_path, blob)
        with open(local_pkg, "wb") as f:
            f.write(payload)
        with open(os.path.join(self.install_path, "version.txt"), "w") as f:
            f.write(new_version)
        # the reference symlinks the venv script into ~/.local/bin
        # (`tool_update.py:76-84`); the sandbox analog flips `current`
        link = os.path.join(self.install_path, "current")
        if os.path.islink(link) or os.path.exists(link):
            os.remove(link)
        os.symlink(local_pkg, link)
        return {"status": "updated", "version": new_version, "package": local_pkg}


class FlowRunFailed(RuntimeError):
    """Terminal FAILED state observed while polling (the reference's
    ``ClickException`` on ``deployment_run.state.is_failed()``)."""


class FlowRunner:
    """Named-flow trigger + status poll over a table root.

    ``flows`` maps deployment names to callables ``fn(root, **parameters)``;
    :meth:`trigger` starts one in a daemon thread and publishes its state
    document under ``<root>/flows/``, so any process (the submitting CLI, a
    second operator's ``status`` command) can poll the same run.
    """

    TERMINAL = ("COMPLETED", "FAILED")

    def __init__(
        self,
        root: str,
        flows: dict[str, Callable[..., Any]] | None = None,
        fs: StorageAdapter | None = None,
    ):
        self.root = root
        self.fsa = fs or LOCAL
        self.flows = dict(flows or {})
        self.fsa.makedirs(os.path.join(root, "flows"))

    # -- state document ----------------------------------------------------
    def _path(self, run_id: str) -> str:
        return os.path.join(self.root, "flows", f"{run_id}.json")

    def _publish(self, run_id: str, **doc: Any) -> None:
        self.fsa.write_atomic(self._path(run_id), json.dumps(doc, sort_keys=True).encode())

    def state(self, run_id: str) -> dict[str, Any]:
        return json.loads(self.fsa.read_bytes(self._path(run_id)))

    def runs(self) -> list[str]:
        names = self.fsa.listdir(os.path.join(self.root, "flows"))
        return sorted(os.path.basename(n)[:-5] for n in names if n.endswith(".json"))

    # -- trigger / poll ----------------------------------------------------
    def trigger(self, flow: str, parameters: dict[str, Any] | None = None) -> str:
        """Start ``flow`` in the background; returns its run id immediately.
        State transitions PENDING → RUNNING → COMPLETED/FAILED are published
        to the flow document as they happen."""
        if flow not in self.flows:
            raise KeyError(f"unknown flow {flow!r} (registered: {sorted(self.flows)})")
        run_id = f"{flow}-{uuid.uuid4().hex[:12]}"
        params = dict(parameters or {})
        self._publish(run_id, flow=flow, state="PENDING", parameters=params)

        def _run() -> None:
            self._publish(run_id, flow=flow, state="RUNNING", parameters=params)
            try:
                result = self.flows[flow](self.root, **params)
                summary = result if isinstance(result, (dict, list, str, int, float)) else str(result)
                self._publish(
                    run_id, flow=flow, state="COMPLETED", parameters=params, result=summary
                )
            except Exception as exc:
                self._publish(
                    run_id, flow=flow, state="FAILED", parameters=params, message=str(exc)
                )

        threading.Thread(target=_run, name=f"flow-{run_id}", daemon=True).start()
        return run_id

    def poll(
        self, run_id: str, interval_s: float = 5.0, timeout_s: float = 3600.0
    ) -> dict[str, Any]:
        """Block until the run reaches a terminal state (the reference's
        ``poll_interval=5`` loop); raise :class:`FlowRunFailed` on FAILED
        with the run's failure message, return the state doc on COMPLETED."""
        deadline = time.monotonic() + timeout_s
        while True:
            doc = self.state(run_id)
            if doc["state"] in self.TERMINAL:
                if doc["state"] == "FAILED":
                    raise FlowRunFailed(
                        f"Flow run {run_id} failed with message: {doc.get('message')}"
                    )
                return doc
            if time.monotonic() >= deadline:
                raise TimeoutError(f"flow run {run_id} still {doc['state']} after {timeout_s}s")
            time.sleep(interval_s)

    def run(self, flow: str, parameters: dict[str, Any] | None = None, interval_s: float = 0.2,
            timeout_s: float = 3600.0) -> dict[str, Any]:
        """Trigger + poll in one call (the CLI's synchronous path)."""
        return self.poll(self.trigger(flow, parameters), interval_s, timeout_s)

    def submit(self, flow: str, parameters: dict[str, Any] | None = None) -> str:
        """DETACHED submit: the flow runs in its own process (a new session,
        surviving this CLI's exit) and publishes state transitions to the
        shared flow document — the reference's ``run_deployment`` +
        remote-worker lifecycle (`upload_transactions.py:59-72`), with the
        flow doc standing in for the Prefect API.  Poll from ANY process
        via :meth:`poll` / ``qpr flow-wait``.  Returns the run id
        immediately."""
        import subprocess
        import sys

        if flow not in self.flows and flow not in default_flows():
            raise KeyError(f"unknown flow {flow!r}")
        run_id = f"{flow}-{uuid.uuid4().hex[:12]}"
        params = dict(parameters or {})
        self._publish(run_id, flow=flow, state="PENDING", parameters=params)
        log_path = os.path.join(self.root, "flows", f"{run_id}.log")
        argv = [
            sys.executable, "-m", "quanterra_pipeline_ray.cli",
            "flow-worker", self.root, "--flow", flow, "--run-id", run_id,
        ]
        for k, v in params.items():
            argv += ["--param", f"{k}={json.dumps(v)}"]
        with open(log_path, "ab") as log:
            subprocess.Popen(
                argv, stdout=log, stderr=log, start_new_session=True, cwd=os.getcwd()
            )
        return run_id

    def execute_published(self, flow: str, run_id: str, parameters: dict[str, Any]) -> dict[str, Any]:
        """Worker-side body of a submitted run: execute the flow in THIS
        process, publishing RUNNING → COMPLETED/FAILED to the shared doc."""
        self._publish(run_id, flow=flow, state="RUNNING", parameters=parameters)
        try:
            result = self.flows[flow](self.root, **parameters)
            summary = result if isinstance(result, (dict, list, str, int, float)) else str(result)
            self._publish(
                run_id, flow=flow, state="COMPLETED", parameters=parameters, result=summary
            )
        except Exception as exc:
            self._publish(
                run_id, flow=flow, state="FAILED", parameters=parameters, message=str(exc)
            )
        return self.state(run_id)


def default_flows() -> dict[str, Callable[..., Any]]:
    """Built-in deployments: the maintenance pipeline stages by name."""

    def _maintenance(root: str, **kw: Any) -> dict[str, Any]:
        from .pipelines.maintenance import run_maintenance
        from .state.manifest import TranscriptTable

        rep = run_maintenance(TranscriptTable.load(root), **kw)
        return {"rows": rep.rows, "timings_s": rep.timings_s}

    def _compact(root: str, **kw: Any) -> dict[str, Any]:
        from .stages.compaction import compact
        from .state.manifest import TranscriptTable

        snap = compact(TranscriptTable.load(root), **kw)
        return {"snapshot": snap.snapshot_id}

    def _expire(root: str, **kw: Any) -> dict[str, Any]:
        from .stages.expire import expire_snapshots
        from .state.manifest import TranscriptTable

        return expire_snapshots(TranscriptTable.load(root), **kw)

    return {"maintenance": _maintenance, "compact": _compact, "expire": _expire}
