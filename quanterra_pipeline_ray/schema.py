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


def ensure_schema(table: pa.Table, schema: pa.Schema = TRANSCRIPTS_SCHEMA) -> pa.Table:
    """Project + cast ``table`` to ``schema`` (column order included).

    Raises :class:`SchemaValidationError` if a required column is missing or a
    cast is impossible.  This is the Arrow analog of the reference's
    required-column-set check — a gate run in the first ``map_batches`` stage
    of every maintenance op.
    """
    missing = set(schema.names) - set(table.column_names)
    if missing:
        raise SchemaValidationError(f"missing required columns: {sorted(missing)}")
    cols = []
    for field in schema:
        col = table.column(field.name)
        if col.type != field.type:
            try:
                col = col.cast(field.type)
            except pa.ArrowInvalid as exc:  # pragma: no cover - defensive
                raise SchemaValidationError(
                    f"column {field.name!r}: cannot cast {col.type} -> {field.type}: {exc}"
                ) from None
        cols.append(col)
    return pa.Table.from_arrays([c.combine_chunks() for c in cols], schema=schema)


def empty_table(schema: pa.Schema = TRANSCRIPTS_SCHEMA) -> pa.Table:
    return schema.empty_table()
