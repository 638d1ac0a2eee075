"""Extension surface: the MaintenanceOp protocol.

The reference's extension points are subclass hooks (new API client = subclass
``BaseAPIClient``, new data type = subclass the envelope model — reference
`src/clients/api/base_api_client.py:15-23`, `eodhd_models.py:47-60`) plus
Prefect ``@task``/``@flow`` decorators.  The new engine's equivalent is one
protocol every maintenance op follows:

    plan(table, snapshot)  -> list of partition specs (driver-side, pure)
    run(table, partitions) -> partition results (Ray Data execution)
    commit(table, results) -> Snapshot (COW manifest commit + lineage)

``compact`` / ``cluster`` / ``merge_into`` / ``expire_snapshots`` are the
built-ins; a user op implements this protocol (or just any
``map_batches``-compatible callable for per-row transforms) and gains
checkpointing and lineage by writing through the same primitives.
"""

from __future__ import annotations

from typing import Any, Protocol, runtime_checkable

from ..state.manifest import Snapshot, TranscriptTable


@runtime_checkable
class MaintenanceOp(Protocol):
    """Structural protocol for table-maintenance operations."""

    def plan(self, table: TranscriptTable, snapshot_id: int) -> list[dict[str, Any]]:
        """Pure driver-side partition planning from manifest entries."""
        ...

    def run(self, table: TranscriptTable, partitions: list[dict[str, Any]]) -> list[dict[str, Any]]:
        """Distributed execution; each result carries DataFile + lineage."""
        ...

    def commit(self, table: TranscriptTable, results: list[dict[str, Any]]) -> Snapshot:
        """Copy-on-write snapshot commit."""
        ...


def run_op(op: MaintenanceOp, table: TranscriptTable, snapshot_id: int | None = None) -> Snapshot:
    """Drive any MaintenanceOp through plan -> run -> commit."""
    base = table.current_snapshot_id() if snapshot_id is None else snapshot_id
    partitions = op.plan(table, base)
    results = op.run(table, partitions)
    return op.commit(table, results)
