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


class Checkpoint:
    """Directory of atomic per-partition completion records."""

    def __init__(self, root: str, op_id: str):
        self.dir = os.path.join(root, "checkpoints", op_id)
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, partition_id: str | int) -> str:
        return os.path.join(self.dir, f"p-{partition_id}.json")

    def completed(self) -> dict[str, dict[str, Any]]:
        """partition_id -> record, for every completed partition."""
        out: dict[str, dict[str, Any]] = {}
        for name in os.listdir(self.dir):
            if not (name.startswith("p-") and name.endswith(".json")):
                continue
            try:
                with open(os.path.join(self.dir, name)) as f:
                    rec = json.load(f)
            except (json.JSONDecodeError, OSError):  # torn write: treat as incomplete
                continue
            out[name[2:-5]] = rec
        return out

    @staticmethod
    def write_record(dir_path: str, partition_id: str | int, record: dict[str, Any]) -> None:
        """Atomic completion record; callable from inside Ray tasks/actors."""
        os.makedirs(dir_path, exist_ok=True)
        path = os.path.join(dir_path, f"p-{partition_id}.json")
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(record, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def write(self, partition_id: str | int, record: dict[str, Any]) -> None:
        self.write_record(self.dir, partition_id, record)

    def clear(self) -> None:
        """Remove all records (called after the op's snapshot commit)."""
        import shutil

        shutil.rmtree(self.dir, ignore_errors=True)
        os.makedirs(self.dir, exist_ok=True)
