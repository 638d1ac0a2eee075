"""Snapshot expiry: mark-and-sweep over the COW snapshot tree.

Generalizes the reference's log retention policy ("1 day" rotation, "1 week"
retention, reference `src/logging/config.py:31-36`) to table snapshots: keep
the most recent ``keep_last`` snapshots (plus any explicitly pinned ids),
delete expired snapshot/manifest JSONs, then delete data files unreachable
from every retained snapshot.  Expiry is the ONLY deleter in the engine —
compaction/cluster/merge never remove files, so readers pinned to a retained
snapshot always resolve a complete file list.
"""

from __future__ import annotations

import os
from typing import Iterable

from ..state.manifest import TranscriptTable


def expire_snapshots(
    table: TranscriptTable,
    keep_last: int = 2,
    keep_ids: Iterable[int] = (),
    dry_run: bool = False,
) -> dict:
    """Expire old snapshots; returns ``{kept, expired, deleted_files}``.

    The current snapshot is always kept.  Only files under the table's own
    ``data/`` directory are swept (externally registered fragments are the
    caller's to manage).
    """
    snaps = table.snapshots()
    current = table.current_snapshot_id()
    by_id = sorted(snaps, key=lambda s: s.snapshot_id)
    keep = {s.snapshot_id for s in by_id[-max(1, keep_last):]}
    keep.add(current)
    keep.update(int(i) for i in keep_ids)
    expired = [s for s in by_id if s.snapshot_id not in keep]

    reachable: set[str] = set()
    for sid in keep:
        reachable.update(f.path for f in table.files(sid))

    candidates: set[str] = set()
    for s in expired:
        candidates.update(f.path for f in table.files(s.snapshot_id))
    to_delete = sorted(
        p for p in candidates - reachable if not os.path.isabs(p) and p.startswith("data/")
    )

    if not dry_run:
        for p in to_delete:
            try:
                os.remove(table._p(p))
            except FileNotFoundError:
                pass
        for s in expired:
            manifest_still_used = any(
                table.snapshot(k).manifest == s.manifest for k in keep
            )
            if not manifest_still_used:
                try:
                    os.remove(table._p(s.manifest))
                except FileNotFoundError:
                    pass
            os.remove(table._p("snapshots", f"s{s.snapshot_id:06d}.json"))
    return {
        "kept": sorted(keep & {s.snapshot_id for s in by_id}),
        "expired": [s.snapshot_id for s in expired],
        "deleted_files": to_delete,
    }
