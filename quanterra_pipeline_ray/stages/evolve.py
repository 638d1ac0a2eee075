"""Additive schema evolution through the manifest.

Generalizes the reference's subclass-a-new-data-type extension hook (new
envelope model = new fields, reference `src/models/data/eodhd_models.py:47-60`)
to the columnar table: adding a column is a METADATA commit — no data file
is rewritten.  The new snapshot records the extended schema plus a read-time
default; scans pad the column for files written before the evolution, and
the next compaction/cluster rewrite materializes it physically
(write-on-next-touch, the standard lakehouse behavior).

Only additive evolution is supported (new nullable/defaulted columns).
Drops/renames would require rewriting readers' expectations and are out of
scope — reject loudly instead of corrupting.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from ..schema import SchemaValidationError, schema_from_json, schema_to_json
from ..state.manifest import Snapshot, TranscriptTable


def evolve_schema(
    table: TranscriptTable,
    add_columns: list[tuple[str, str, Any]],
    snapshot_id: int | None = None,
) -> Snapshot:
    """Add columns (name, type string, default) to the table's schema.

    Pure metadata commit: same file list, new schema + defaults recorded in
    the snapshot.  ``type`` must be one of the registry types in
    :mod:`..schema` (string, large_string, int32, int64, float64, bool,
    binary, timestamp[us]).
    """
    base = table.current_snapshot_id() if snapshot_id is None else snapshot_id
    cur_schema = table.schema_of(base)
    cur_defaults = table.defaults_of(base)

    fields = schema_to_json(cur_schema)
    existing = {n for n, _t in fields}
    new_defaults = dict(cur_defaults)
    for name, type_str, default in add_columns:
        if name in existing:
            raise SchemaValidationError(f"column {name!r} already exists")
        # validate the type string via the registry round-trip
        schema_from_json([[name, type_str]])
        fields.append([name, type_str])
        new_defaults[name] = default

    files = table.files(base)
    return table._commit_manifest(
        files,
        parent=base,
        operation="evolve_schema",
        summary={"added_columns": [c[0] for c in add_columns]},
        schema_fields=fields,
        defaults=new_defaults,
    )
