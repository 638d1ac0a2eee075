"""Per-partition checkpoint manifest for resumable maintenance ops.

The reference has no explicit checkpointing — re-runs are safe only because
storage keys are deterministic overwrites (reference
`src/models/data/eodhd_models.py:29-32`).  Here resumability is explicit: each
maintenance partition (compaction bin, cluster range, merge bucket) writes an
atomic completion record containing its output :class:`..state.manifest.DataFile`
and lineage.  A killed driver re-plans the same op (the op id is a pure
function of base snapshot + parameters), skips partitions with completion
records, and replays only the rest.  Because data files are content-addressed,
replayed partitions converge on identical files.
"""

from __future__ import annotations

import json
import os
from typing import Any

from .fs import LOCAL, StorageAdapter


class Checkpoint:
    """Directory of atomic per-partition completion records."""

    def __init__(self, root: str, op_id: str, fs: StorageAdapter | None = None):
        self.dir = os.path.join(root, "checkpoints", op_id)
        self.fsa = fs or LOCAL
        self.fsa.makedirs(self.dir)

    def _path(self, partition_id: str | int) -> str:
        return os.path.join(self.dir, f"p-{partition_id}.json")

    def completed(self) -> dict[str, dict[str, Any]]:
        """partition_id -> record, for every completed partition."""
        out: dict[str, dict[str, Any]] = {}
        for name in self.fsa.listdir(self.dir):
            if not (name.startswith("p-") and name.endswith(".json")):
                continue
            try:
                rec = json.loads(self.fsa.read_bytes(os.path.join(self.dir, name)))
            except (json.JSONDecodeError, OSError):  # torn write: treat as incomplete
                continue
            out[name[2:-5]] = rec
        return out

    @staticmethod
    def write_record(
        dir_path: str,
        partition_id: str | int,
        record: dict[str, Any],
        fs: StorageAdapter = LOCAL,
    ) -> None:
        """Atomic completion record; callable from inside Ray tasks/actors."""
        fs.makedirs(dir_path)
        path = os.path.join(dir_path, f"p-{partition_id}.json")
        fs.write_atomic(path, json.dumps(record, sort_keys=True).encode())

    def write(self, partition_id: str | int, record: dict[str, Any]) -> None:
        self.write_record(self.dir, partition_id, record, self.fsa)

    def clear(self) -> None:
        """Remove all records (called after the op's snapshot commit)."""
        for name in self.fsa.listdir(self.dir):
            self.fsa.remove(os.path.join(self.dir, name))
