"""Canonical Arrow schema for the transcripts table.

The reference engine (`fplon/quanterra-pipeline`) is document-oriented: every
record is a JSON payload in a pydantic envelope (reference
`src/models/data/json_objects.py:11-13`, `eodhd_models.py:8-27`).  The new
engine is columnar end-to-end: one fixed Arrow schema, validated at the edge
the same way the reference validates required column sets before storing
(reference `src/models/data/hargreaves_lansdown_models.py:24-46`).

Row identity is ``(conv_id, turn_idx)``; the maintenance invariant is
per-turn ``text`` equality under stable ``(conv_id, turn_idx)`` ordering.
"""

from __future__ import annotations

import pyarrow as pa

# ``text`` is large_string so a single column chunk can exceed 2 GiB of
# offsets at 10^12-turn scale without splitting pathologically.
TRANSCRIPTS_SCHEMA: pa.Schema = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.large_string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

#: Columns whose min/max are tracked per data file in the manifest (used for
#: partition pruning by MERGE and for snapshot stats).
STATS_COLUMNS = ("conv_id", "turn_idx", "ts")

ROLES = ("user", "assistant", "system", "tool")


class SchemaValidationError(ValueError):
    """Raised when a batch does not conform to TRANSCRIPTS_SCHEMA.

    Mirrors the reference's fail-before-store semantics
    (``validate_data_structure`` raising on missing columns,
    reference `hargreaves_lansdown_models.py:24-46`).
    """


def ensure_schema(
    table: pa.Table,
    schema: pa.Schema = TRANSCRIPTS_SCHEMA,
    defaults: dict | None = None,
    aliases: dict | None = None,
) -> pa.Table:
    """Project + cast ``table`` to ``schema`` (column order included).

    Raises :class:`SchemaValidationError` if a required column is missing or a
    cast is impossible.  This is the Arrow analog of the reference's
    required-column-set check — a gate run in the first ``map_batches`` stage
    of every maintenance op.

    ``defaults``: columns listed here MAY be absent from ``table`` and are
    materialized with the given scalar — the read-side half of additive
    schema evolution (old files lack the new column; scans pad it).

    ``aliases``: ``{current_name: [older physical names, oldest first]}`` —
    the read-side half of RENAME evolution: a file written before the rename
    carries the column under a prior name; the newest alias present wins.
    Renames are metadata-only; the next rewrite materializes the new name.
    """
    defaults = defaults or {}
    for cur, olds in (aliases or {}).items():
        if cur in table.column_names:
            continue
        for old in reversed(olds):  # newest physical name wins
            if old in table.column_names:
                table = table.rename_columns(
                    [cur if n == old else n for n in table.column_names]
                )
                break
    missing = set(schema.names) - set(table.column_names) - set(defaults)
    if missing:
        raise SchemaValidationError(f"missing required columns: {sorted(missing)}")
    cols = []
    for field in schema:
        if field.name not in table.column_names:
            cols.append(pa.array([defaults[field.name]] * table.num_rows, type=field.type))
            continue
        col = table.column(field.name)
        if col.type != field.type:
            try:
                col = col.cast(field.type)
            except pa.ArrowInvalid as exc:  # pragma: no cover - defensive
                raise SchemaValidationError(
                    f"column {field.name!r}: cannot cast {col.type} -> {field.type}: {exc}"
                ) from None
        cols.append(col)
    return pa.Table.from_arrays(
        [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols],
        schema=schema,
    )


#: type registry for schema (de)serialization in snapshot JSON
_TYPES = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float64": pa.float64(),
    "bool": pa.bool_(),
    "binary": pa.binary(),
    "timestamp[us]": pa.timestamp("us"),
}


def schema_to_json(schema: pa.Schema) -> list[list[str]]:
    out = []
    for f in schema:
        tname = str(f.type)
        if tname not in _TYPES:
            raise SchemaValidationError(f"unsupported evolvable type: {tname}")
        out.append([f.name, tname])
    return out


def schema_from_json(fields: list[list[str]]) -> pa.Schema:
    return pa.schema([(n, _TYPES[t]) for n, t in fields])


def empty_table(schema: pa.Schema = TRANSCRIPTS_SCHEMA) -> pa.Table:
    return schema.empty_table()
