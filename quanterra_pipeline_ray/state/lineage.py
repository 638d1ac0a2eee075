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


def store_lineage(root: str, snapshot_id: int, records: list[dict[str, Any]]) -> str:
    """Write one lineage file per partition under ``lineage/s<NNNN>/``."""
    d = os.path.join(root, "lineage", f"s{snapshot_id:06d}")
    os.makedirs(d, exist_ok=True)
    for rec in records:
        path = os.path.join(d, f"{rec['op']}-{rec['partition_id']}.json")
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(rec, f, sort_keys=True)
        os.replace(tmp, path)
    return d


def load_lineage(root: str, snapshot_id: int) -> list[dict[str, Any]]:
    d = os.path.join(root, "lineage", f"s{snapshot_id:06d}")
    if not os.path.isdir(d):
        return []
    out = []
    for name in sorted(os.listdir(d)):
        if name.endswith(".json"):
            with open(os.path.join(d, name)) as f:
                out.append(json.load(f))
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
