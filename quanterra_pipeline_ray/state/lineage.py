"""Per-partition lineage records.

Generalizes the reference's metadata-envelope provenance chains
(``_get_metadata`` accumulating ids/timestamps per stored object, reference
`src/models/data/eodhd_models.py:22-27,53-56,85-93`): every maintenance
partition emits one JSON record — op, inputs (path + checksum), output file,
row counts, min/max stats, duration — collected under
``lineage/s<NNNN>/`` for the snapshot the op committed.
"""

from __future__ import annotations

import json
import os
from typing import Any

from .fs import LOCAL, StorageAdapter


def lineage_record(
    op: str,
    partition_id: str | int,
    inputs: list[dict[str, Any]],
    outputs: list[dict[str, Any]],
    rows_in: int,
    rows_out: int,
    duration_s: float,
    extra: dict[str, Any] | None = None,
) -> dict[str, Any]:
    return {
        "op": op,
        "partition_id": str(partition_id),
        "inputs": inputs,
        "outputs": outputs,
        "rows_in": rows_in,
        "rows_out": rows_out,
        "duration_s": round(duration_s, 6),
        **(extra or {}),
    }


def store_lineage(
    root: str, snapshot_id: int, records: list[dict[str, Any]], fs: StorageAdapter = LOCAL
) -> str:
    """Write one lineage file per partition under ``lineage/s<NNNN>/``."""
    d = os.path.join(root, "lineage", f"s{snapshot_id:06d}")
    fs.makedirs(d)
    for rec in records:
        path = os.path.join(d, f"{rec['op']}-{rec['partition_id']}.json")
        fs.write_atomic(path, json.dumps(rec, sort_keys=True).encode())
    return d


def load_lineage(root: str, snapshot_id: int, fs: StorageAdapter = LOCAL) -> list[dict[str, Any]]:
    d = os.path.join(root, "lineage", f"s{snapshot_id:06d}")
    out = []
    for name in fs.listdir(d):
        if name.endswith(".json"):
            out.append(json.loads(fs.read_bytes(os.path.join(d, name))))
    return out


def throughput_turns_per_sec(records: list[dict[str, Any]]) -> float:
    """Aggregate maintenance throughput from lineage durations (rows out / max task time).

    Partitions run in parallel, so wall-time is approximated by the longest
    partition; callers with a real wall clock should prefer that.
    """
    if not records:
        return 0.0
    rows = sum(r.get("rows_out", 0) for r in records)
    wall = max((r.get("duration_s", 0.0) for r in records), default=0.0)
    return rows / wall if wall > 0 else 0.0
