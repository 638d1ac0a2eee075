"""DELETE WHERE: predicate deletes through the MERGE machinery.

``delete_where`` scans the snapshot, keeps the rows matching the predicate
(a vectorized pandas mask), tags them ``__op='delete'``, and hands them to
:func:`..stages.merge.merge_into` — which already prunes untouched files by
stats/bloom, rewrites only the files containing matched keys, and commits
copy-on-write.  No new read path, no delete sidecars to honor everywhere:
the delete is physical at commit time, snapshot isolation keeps the old
rows readable from prior snapshots, and time travel / changelog see it as
an ordinary delta.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

from ..state.manifest import Snapshot, TranscriptTable
from .merge import merge_into


def delete_where(
    table: TranscriptTable,
    predicate: Callable[[pd.DataFrame], "pd.Series"],
    snapshot_id: int | None = None,
    target_rows: int = 200_000,
) -> Snapshot:
    """Delete all rows where ``predicate(batch)`` is True; returns the new
    snapshot.  ``predicate`` receives a pandas batch and returns a boolean
    mask (vectorized — never called per row)."""
    base = table.current_snapshot_id() if snapshot_id is None else snapshot_id

    def to_delete(b: pd.DataFrame) -> pd.DataFrame:
        hit = b[predicate(b).to_numpy()].copy()
        hit["__op"] = "delete"
        return hit

    source = table.scan(base).map_batches(to_delete, batch_format="pandas")
    return merge_into(table, source, target_rows=target_rows, snapshot_id=base)
