"""Snapshot expiry: mark-and-sweep over the COW snapshot tree.

Generalizes the reference's log retention policy ("1 day" rotation, "1 week"
retention, reference `src/logging/config.py:31-36`) to table snapshots: keep
the most recent ``keep_last`` snapshots (plus any explicitly pinned ids),
delete expired snapshot/manifest JSONs, then delete data files unreachable
from every retained snapshot.  Expiry is the ONLY deleter in the engine —
compaction/cluster/merge never remove files, so readers pinned to a retained
snapshot always resolve a complete file list.

:func:`sweep_orphans` additionally collects data files that NO snapshot ever
referenced — the debris of a crashed commit (files written, manifest swap
never happened).  Files referenced by live checkpoint records are kept (an
in-flight resumable op will commit them), and an age guard protects files an
in-flight task wrote milliseconds ago.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable

from ..state.manifest import TranscriptTable


def expire_snapshots(
    table: TranscriptTable,
    keep_last: int = 2,
    keep_ids: Iterable[int] = (),
    dry_run: bool = False,
) -> dict:
    """Expire old snapshots; returns ``{kept, expired, deleted_files}``.

    The current snapshot is always kept, as are snapshots pinned by named
    refs (``table.set_ref``).  Only files under the table's own ``data/``
    directory are swept (externally registered fragments are the caller's
    to manage).
    """
    snaps = table.snapshots()
    current = table.current_snapshot_id()
    by_id = sorted(snaps, key=lambda s: s.snapshot_id)
    keep = {s.snapshot_id for s in by_id[-max(1, keep_last):]}
    keep.add(current)
    keep.update(int(i) for i in keep_ids)
    keep.update(table.refs().values())  # named refs pin their snapshots
    expired = [s for s in by_id if s.snapshot_id not in keep]

    def _paths_of(sid: int) -> set[str]:
        out: set[str] = set()
        for f in table.files(sid):
            out.add(f.path)
            if f.delete_path:  # positional-delete sidecars live and die
                out.add(f.delete_path)  # with the snapshots that reference them
        return out

    reachable: set[str] = set()
    for sid in keep:
        reachable.update(_paths_of(sid))

    candidates: set[str] = set()
    for s in expired:
        candidates.update(_paths_of(s.snapshot_id))
    to_delete = sorted(
        p
        for p in candidates - reachable
        if not os.path.isabs(p) and (p.startswith("data/") or p.startswith("deletes/"))
    )

    if not dry_run:
        for p in to_delete:
            table.fsa.remove(table._p(p))
        # manifest metadata is structurally shared: a shard (or whole list)
        # is deleted only when NO retained snapshot references it
        kept_meta: set[str] = set()
        for k in keep:
            kept_meta.update(table.manifest_paths(k))
        expired_meta: set[str] = set()
        for s in expired:
            expired_meta.update(table.manifest_paths(s.snapshot_id))
        for p in sorted(expired_meta - kept_meta):
            table.fsa.remove(table._p(p))
        for s in expired:
            table.fsa.remove(table._p("snapshots", f"s{s.snapshot_id:06d}.json"))
    return {
        "kept": sorted(keep & {s.snapshot_id for s in by_id}),
        "expired": [s.snapshot_id for s in expired],
        "deleted_files": to_delete,
    }


def _checkpointed_paths(table: TranscriptTable) -> set[str]:
    """Data-file paths referenced by any live checkpoint record (an
    incomplete resumable op owns these until it commits or is cleared)."""
    out: set[str] = set()
    ckpt_root = table._p("checkpoints")
    for op_id in table.fsa.listdir(ckpt_root):
        op_dir = os.path.join(ckpt_root, op_id)
        for name in table.fsa.listdir(op_dir):
            if not (name.startswith("p-") and name.endswith(".json")):
                continue
            try:
                rec = json.loads(table.fsa.read_bytes(os.path.join(op_dir, name)))
            except (json.JSONDecodeError, OSError):
                continue
            for df in rec.get("datafiles", []):
                out.add(df["path"])
            if "datafile" in rec:
                out.add(rec["datafile"]["path"])
    return out


def sweep_orphans(
    table: TranscriptTable,
    min_age_s: float = 3600.0,
    dry_run: bool = False,
) -> dict:
    """Delete data files no snapshot references and no checkpoint claims.

    Complements :func:`expire_snapshots` (which only deletes files that an
    *expired* snapshot referenced): a crashed commit leaves content-addressed
    files under ``data/`` that never entered any manifest — invisible to
    readers but leaking storage forever.  ``min_age_s`` guards files an
    in-flight writer produced moments ago (commit-lag safety margin).
    """
    reachable: set[str] = set()
    for s in table.snapshots():
        for f in table.files(s.snapshot_id):
            reachable.add(f.path)
            if f.delete_path:
                reachable.add(f.delete_path)
        reachable.update(table.manifest_paths(s.snapshot_id))
    reachable.update(_checkpointed_paths(table))

    now = time.time()
    orphans: list[str] = []
    for sub in ("data", "deletes", "manifests"):
        for abspath in table.fsa.walk_files(table._p(sub)):
            rel = os.path.relpath(abspath, table.root)
            if rel in reachable or abspath in reachable:
                continue
            if now - table.fsa.mtime(abspath) < min_age_s:
                continue
            orphans.append(rel)
    orphans.sort()
    if not dry_run:
        for rel in orphans:
            table.fsa.remove(table._p(rel))
    return {"deleted_orphans": orphans, "reachable": len(reachable)}
