"""Schema evolution through the manifest: ADD, RENAME, DROP.

Generalizes the reference's subclass-a-new-data-type extension hook (new
envelope model = new fields, reference `src/models/data/eodhd_models.py:47-60`)
to the columnar table.  Every evolution is a METADATA commit — no data file
is rewritten:

* **ADD** — the snapshot records the extended schema plus a read-time
  default; scans pad the column for files written before the evolution, and
  the next compaction/cluster/MERGE rewrite materializes it physically
  (write-on-next-touch, the standard lakehouse behavior).
* **RENAME** — a name change is pure metadata.  The snapshot records the
  column's name lineage (``column_aliases[current] = [older names...]``, the
  name-lineage analog of Iceberg's field ids); readers map a file's old
  physical name to the current one, writers use the current name, and the
  next rewrite materializes it.
* **DROP** — the column leaves the schema; readers simply never project it
  from old files.  The dropped name and all its aliases are TOMBSTONED:
  re-adding any of them is rejected, because a name-mapped reader would
  otherwise resurrect the old files' data under the new column.

Engine-invariant columns (row key, sort keys, MERGE tiebreaks) cannot be
renamed or dropped — reject loudly instead of corrupting.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from ..schema import SchemaValidationError, schema_from_json, schema_to_json
from ..state.manifest import Snapshot, TranscriptTable

#: columns the engine itself depends on: (conv_id, turn_idx) is row identity
#: and the within-file sort key; ts/text are the MERGE duplicate tiebreak.
PROTECTED_COLUMNS = frozenset({"conv_id", "turn_idx", "ts", "text"})


def _all_known_names(fields: list, aliases: dict, dropped: list) -> set[str]:
    """Every name that is (or ever was) a live physical column name."""
    names = {n for n, _t in fields}
    for olds in aliases.values():
        names.update(olds)
    names.update(dropped)
    return names


def evolve_schema(
    table: TranscriptTable,
    add_columns: list[tuple[str, str, Any]],
    snapshot_id: int | None = None,
) -> Snapshot:
    """Add columns (name, type string, default) to the table's schema.

    Pure metadata commit: same file list, new schema + defaults recorded in
    the snapshot.  ``type`` must be one of the registry types in
    :mod:`..schema` (string, large_string, int32, int64, float64, bool,
    binary, timestamp[us]).  Names that ever existed (live, alias of a
    renamed column, or dropped) are rejected — old files still carry their
    data under those names.
    """
    base = table.current_snapshot_id() if snapshot_id is None else snapshot_id
    cur_schema = table.schema_of(base)
    cur_defaults = table.defaults_of(base)
    aliases = table.aliases_of(base)
    dropped = table.dropped_of(base)

    fields = schema_to_json(cur_schema)
    known = _all_known_names(fields, aliases, dropped)
    new_defaults = dict(cur_defaults)
    for name, type_str, default in add_columns:
        if name in known:
            raise SchemaValidationError(
                f"column {name!r} already exists (live, renamed-from, or dropped)"
            )
        # validate the type string via the registry round-trip
        schema_from_json([[name, type_str]])
        fields.append([name, type_str])
        new_defaults[name] = default
        known.add(name)

    return table._commit_manifest(
        parent=base,
        operation="evolve_schema",
        **table._reuse_commit_args(base),
        summary={"added_columns": [c[0] for c in add_columns]},
        schema_fields=fields,
        defaults=new_defaults,
        column_aliases=aliases,
        dropped_columns=dropped,
    )


def rename_column(
    table: TranscriptTable,
    old: str,
    new: str,
    snapshot_id: int | None = None,
) -> Snapshot:
    """Rename a column — metadata-only; old files are name-mapped at read."""
    base = table.current_snapshot_id() if snapshot_id is None else snapshot_id
    if old in PROTECTED_COLUMNS:
        raise SchemaValidationError(f"column {old!r} is engine-protected")
    fields = schema_to_json(table.schema_of(base))
    names = [n for n, _t in fields]
    if old not in names:
        raise SchemaValidationError(f"unknown column {old!r}")
    aliases = table.aliases_of(base)
    dropped = table.dropped_of(base)
    if new in _all_known_names(fields, aliases, dropped):
        raise SchemaValidationError(
            f"target name {new!r} already exists (live, renamed-from, or dropped)"
        )
    fields = [[new if n == old else n, t] for n, t in fields]
    # name lineage: the new name inherits the old name's full alias chain
    aliases[new] = aliases.pop(old, []) + [old]
    defaults = table.defaults_of(base)
    if old in defaults:
        defaults[new] = defaults.pop(old)
    return table._commit_manifest(
        parent=base,
        operation="rename_column",
        **table._reuse_commit_args(base),
        summary={"renamed": {old: new}},
        schema_fields=fields,
        defaults=defaults,
        column_aliases=aliases,
        dropped_columns=dropped,
    )


def drop_column(
    table: TranscriptTable,
    name: str,
    snapshot_id: int | None = None,
) -> Snapshot:
    """Drop a column — metadata-only; readers stop projecting it, and the
    name (plus its whole rename lineage) is tombstoned against re-adding."""
    base = table.current_snapshot_id() if snapshot_id is None else snapshot_id
    if name in PROTECTED_COLUMNS:
        raise SchemaValidationError(f"column {name!r} is engine-protected")
    fields = schema_to_json(table.schema_of(base))
    if name not in [n for n, _t in fields]:
        raise SchemaValidationError(f"unknown column {name!r}")
    aliases = table.aliases_of(base)
    dropped = table.dropped_of(base)
    fields = [[n, t] for n, t in fields if n != name]
    dropped = dropped + [name] + aliases.pop(name, [])
    defaults = table.defaults_of(base)
    defaults.pop(name, None)
    return table._commit_manifest(
        parent=base,
        operation="drop_column",
        **table._reuse_commit_args(base),
        summary={"dropped": name},
        schema_fields=fields,
        defaults=defaults,
        column_aliases=aliases,
        dropped_columns=dropped,
    )
