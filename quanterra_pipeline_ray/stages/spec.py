"""Partition-spec evolution: versioned cluster layouts, metadata-only.

The reference pins its storage layout once, in code (deterministic object
keys, reference ``src/models/data/eodhd_models.py:29-32``) — changing it
means rewriting every object.  Here the cluster layout (curve, time bucket,
fan-out, time-major) is table METADATA, evolved the Iceberg way:

* ``partition_specs`` on the snapshot is an append-only list of layouts;
  ``default_spec_id`` names the one new cluster runs target.
* :func:`set_partition_spec` commits a new default in a metadata-only
  snapshot — zero data files move.
* Every file written by ``cluster`` carries the ``spec_id`` it was laid
  out under; ``cluster(only_stale=True)`` rewrites exactly the files whose
  tag differs from the default (fresh appends, pre-evolution files), so
  adopting a new layout on a 100-TB table is incremental: each maintenance
  cycle converges more of the table instead of rewriting all of it at once.
* Readers never consult the spec — scans stay stats-pruned (file min/max),
  which is what makes mixed-spec snapshots safe mid-migration.
"""

from __future__ import annotations

from typing import Any

from ..state.manifest import Snapshot, TranscriptTable

ENGINE_DEFAULT_SPEC: dict[str, Any] = {
    "curve": "z",
    "ts_bucket_us": 3_600_000_000,  # 1 hour
    "part_bits": None,  # None = auto-size to data volume at cluster time
    "time_major": False,
}

_SPEC_KEYS = ("curve", "ts_bucket_us", "part_bits", "time_major")


def normalize_spec(spec: dict[str, Any]) -> dict[str, Any]:
    out = {k: spec.get(k, ENGINE_DEFAULT_SPEC[k]) for k in _SPEC_KEYS}
    if out["curve"] not in ("z", "hilbert"):
        raise ValueError(f"unknown curve {out['curve']!r}")
    out["ts_bucket_us"] = int(out["ts_bucket_us"])
    out["time_major"] = bool(out["time_major"])
    if out["part_bits"] is not None:
        out["part_bits"] = int(out["part_bits"])
    return out


def _same_layout(a: dict[str, Any], b: dict[str, Any]) -> bool:
    return all(a.get(k) == b.get(k) for k in _SPEC_KEYS)


def find_or_add_spec(
    specs: list | None, spec: dict[str, Any]
) -> tuple[list, int]:
    """Return ``(specs', spec_id)`` — reusing an identical layout's id so
    repeated cluster runs never grow the spec list."""
    spec = normalize_spec(spec)
    specs = [dict(s) for s in (specs or [])]
    for s in specs:
        if _same_layout(s, spec):
            return specs, int(s["spec_id"])
    sid = len(specs)
    specs.append({"spec_id": sid, **spec})
    return specs, sid


def partition_spec_of(
    table: TranscriptTable, snapshot_id: int | None = None
) -> dict[str, Any] | None:
    """The snapshot's default layout, or None if never declared/clustered."""
    snap = table.snapshot(snapshot_id)
    if snap.default_spec_id is None or not snap.partition_specs:
        return None
    return dict(snap.partition_specs[snap.default_spec_id])


def set_partition_spec(
    table: TranscriptTable,
    curve: str = "z",
    ts_bucket_us: int = 3_600_000_000,
    part_bits: int | None = None,
    time_major: bool = False,
) -> Snapshot:
    """Declare a new default cluster layout — metadata-only commit.

    No data moves: existing files keep their (now non-default) spec tags and
    remain fully scannable.  The next ``cluster(only_stale=True)`` run
    migrates them incrementally; pin ``part_bits`` here for stable
    incremental maintenance (auto-sizing tracks data volume, so an unpinned
    fan-out legitimately marks the table stale as it grows).
    """
    snap = table.snapshot()
    specs, sid = find_or_add_spec(
        snap.partition_specs,
        {
            "curve": curve,
            "ts_bucket_us": ts_bucket_us,
            "part_bits": part_bits,
            "time_major": time_major,
        },
    )
    return table.commit(
        added=[],
        operation="set-spec",
        summary={"spec_id": sid, **normalize_spec(specs[sid])},
        partition_specs=specs,
        default_spec_id=sid,
    )
