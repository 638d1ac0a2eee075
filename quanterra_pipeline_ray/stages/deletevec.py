"""Positional delete vectors: DELETE WHERE without rewriting data files.

:func:`..stages.delete.delete_where` is physical — it routes matched rows
through MERGE, which rewrites every touched file.  At 100 TB, deleting 0.01%
of rows that way rewrites entire files for a handful of tombstones.  This
module adds the Iceberg/Delta-style alternative: each data file may carry a
content-addressed **positional delete sidecar** (a parquet of row ordinals
under ``deletes/``), recorded on the manifest entry as
``DataFile.delete_path`` / ``delete_rows``.

Contract (mirrors the deletion-vector design of the open table formats):

* a DELETE commit replaces only MANIFEST ENTRIES — zero data bytes move;
* every reader subtracts the sidecar's positions: ``TranscriptTable.scan`` /
  ``read_all`` / pruned scans route through :func:`read_files`, the
  changelog treats ``(path, delete_path)`` as the file identity and reads
  each side through its own mask, and MERGE applies the mask to touched
  target files before resolving;
* any rewrite (compaction, clustering, MERGE) **materializes** the deletes —
  the rewritten output has no sidecar — so vectors never accumulate past
  the next maintenance pass;
* sidecars are content-addressed and immutable; a second DELETE on the same
  file writes the union of old and new positions as a NEW sidecar (old ones
  are swept with their snapshots by expiry).

Row ordinals are positions within the data file's on-disk row order, which
is stable under column projection (parquet preserves row order for any
column subset), so predicate scans may read only the columns they need.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..state.fs import LOCAL, StorageAdapter
from ..state.manifest import DataFile, Snapshot, TranscriptTable


# ------------------------------------------------------------------ sidecars
def write_delete_sidecar(
    root: str, positions: np.ndarray, fs: StorageAdapter = LOCAL
) -> str:
    """Write a content-addressed positional sidecar; returns its rel path."""
    t = pa.table({"pos": pa.array(np.sort(np.asarray(positions, dtype=np.int64)))})
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="zstd")
    payload = buf.getvalue()
    rel = f"deletes/del-{hashlib.sha256(payload).hexdigest()[:20]}.parquet"
    abspath = os.path.join(root, rel)
    if not fs.exists(abspath):
        fs.makedirs(os.path.join(root, "deletes"))
        fs.write_atomic(abspath, payload)
    return rel


def read_delete_positions(path: str, fs: StorageAdapter = LOCAL) -> np.ndarray:
    return (
        pq.read_table(io.BytesIO(fs.read_bytes(path)), columns=["pos"])
        .column("pos")
        .to_numpy()
        .astype(np.int64)
    )


def apply_deletes(t: pa.Table, positions: np.ndarray | None) -> pa.Table:
    """Drop the rows at ``positions`` (file ordinals) from ``t``."""
    if positions is None or not len(positions):
        return t
    keep = np.ones(t.num_rows, dtype=bool)
    keep[positions] = False
    return t.filter(pa.array(keep))


# ------------------------------------------------------------- masked reader
def read_files(
    table: TranscriptTable,
    files: list[DataFile],
    columns: list[str] | None = None,
    **read_kwargs,
):
    """Dataset over manifest entries, honoring positional-delete sidecars.

    Fast path: when NO entry carries a sidecar this is exactly
    ``ray.data.read_parquet`` (row-group-parallel).  With sidecars, each
    file becomes one Ray task that reads its columns and subtracts its
    mask — file-granular parallelism, the same control-dataset pattern as
    compaction (one 100-TB table = thousands of independent tasks).
    """
    import ray.data as rd

    paths = [f.path if os.path.isabs(f.path) else table._p(f.path) for f in files]
    if not table.fsa.is_local and "filesystem" not in read_kwargs:
        read_kwargs["filesystem"] = table.fsa.fs
    if not any(f.delete_path for f in files):
        return rd.read_parquet(paths, columns=columns, **read_kwargs)

    fsa = table.fsa
    items = [
        {
            "spec": json.dumps(
                {
                    "path": p,
                    "delete": table._p(f.delete_path) if f.delete_path else None,
                }
            )
        }
        for p, f in zip(paths, files)
    ]

    def read_one(batch: pd.DataFrame) -> pa.Table:
        tables = []
        for spec_json in batch["spec"]:
            spec = json.loads(spec_json)
            t = pq.read_table(spec["path"], columns=columns, filesystem=fsa.fs)
            if spec["delete"]:
                t = apply_deletes(t, read_delete_positions(spec["delete"], fsa))
            tables.append(t)
        return pa.concat_tables(tables)

    ds = rd.from_items(items, override_num_blocks=len(items))
    return ds.map_batches(read_one, batch_size=None, batch_format="pandas")


def mapped_read(
    table: TranscriptTable,
    files: list[DataFile],
    want: list[str],
    out_schema: pa.Schema,
    defaults: dict,
    aliases: dict,
    **read_kwargs,
):
    """Per-file schema-mapped read: the fully general snapshot reader.

    Handles, per file, everything metadata-only evolution can leave behind:
    positional-delete masks, RENAMEd columns (footer-projected read of the
    file's physical name, mapped to the current name), DROPped columns
    (never projected), and ADDed columns (padded from defaults).  One Ray
    task per file — used only when the snapshot actually needs mapping; the
    plain path stays ``read_parquet``.
    """
    import ray.data as rd

    fsa = table.fsa
    items = [
        {
            "spec": json.dumps(
                {
                    "path": f.path if os.path.isabs(f.path) else table._p(f.path),
                    "delete": table._p(f.delete_path) if f.delete_path else None,
                }
            )
        }
        for f in files
    ]

    def read_one(batch: pd.DataFrame) -> pa.Table:
        from ..schema import ensure_schema

        tables = []
        for spec_json in batch["spec"]:
            spec = json.loads(spec_json)
            pf = pq.ParquetFile(spec["path"], filesystem=fsa.fs)  # footer only
            present = set(pf.schema_arrow.names)
            cols, rename = [], {}
            for c in want:
                if c in present:
                    cols.append(c)
                    continue
                for old in reversed(aliases.get(c, [])):  # newest name wins
                    if old in present:
                        cols.append(old)
                        rename[old] = c
                        break
            t = pq.read_table(spec["path"], columns=cols, filesystem=fsa.fs)
            if spec["delete"]:
                t = apply_deletes(t, read_delete_positions(spec["delete"], fsa))
            if rename:
                t = t.rename_columns([rename.get(n, n) for n in t.column_names])
            tables.append(ensure_schema(t, out_schema, defaults=defaults))
        return pa.concat_tables(tables)

    ds = rd.from_items(items, override_num_blocks=len(items))
    return ds.map_batches(read_one, batch_size=None, batch_format="pandas")


# -------------------------------------------------------------------- DELETE
def delete_where_vector(
    table: TranscriptTable,
    predicate: Callable[[pd.DataFrame], "pd.Series"],
    snapshot_id: int | None = None,
    columns: list[str] | None = None,
) -> Snapshot:
    """Predicate DELETE that rewrites ZERO data files.

    One stateless Ray task per manifest entry: read the predicate's columns
    (``columns`` prunes the scan — ordinals are projection-stable), union the
    matched row ordinals with the file's existing sidecar, and write a new
    content-addressed sidecar.  The commit swaps only manifest entries:
    untouched files carry forward verbatim, fully-deleted files drop out of
    the manifest, and ``data/`` gains no bytes.  Readers see the delete
    immediately (every scan path subtracts sidecars); the next
    compaction/cluster/MERGE rewrite materializes it physically.
    """
    base = table.current_snapshot_id() if snapshot_id is None else snapshot_id
    files = table.files(base)
    if not files:
        return table.snapshot(base)
    fsa = table.fsa
    root = table.root
    items = [
        {
            "spec": json.dumps(
                {
                    "path": f.path if os.path.isabs(f.path) else table._p(f.path),
                    "delete": table._p(f.delete_path) if f.delete_path else None,
                    "entry": f.to_json(),
                }
            )
        }
        for f in files
    ]

    def scan_file(batch: pd.DataFrame) -> pd.DataFrame:
        records = []
        for spec_json in batch["spec"]:
            spec = json.loads(spec_json)
            entry = DataFile.from_json(spec["entry"])
            t = pq.read_table(spec["path"], columns=columns, filesystem=fsa.fs)
            mask = predicate(t.to_pandas()).to_numpy(dtype=bool)
            existing = (
                read_delete_positions(spec["delete"], fsa)
                if spec["delete"]
                else np.empty(0, dtype=np.int64)
            )
            if len(existing):
                mask[existing] = True  # union with prior deletes
            positions = np.flatnonzero(mask)
            if np.array_equal(positions, np.sort(existing)):
                continue  # nothing new in this file
            if len(positions) == entry.rows:
                records.append(json.dumps({"op": "drop", "path": entry.path}))
                continue
            rel = write_delete_sidecar(root, positions, fsa)
            upd = DataFile(
                path=entry.path,
                rows=entry.rows,
                bytes=entry.bytes,
                checksum=entry.checksum,
                stats=entry.stats,
                delete_path=rel,
                delete_rows=int(len(positions)),
            )
            records.append(json.dumps({"op": "update", "entry": upd.to_json()}))
        return pd.DataFrame({"record": records}) if records else pd.DataFrame(
            {"record": pd.Series([], dtype=object)}
        )

    import ray.data as rd

    out = (
        rd.from_items(items, override_num_blocks=len(items))
        .map_batches(scan_file, batch_size=None, batch_format="pandas")
        .take_all()
    )
    records = [json.loads(r["record"]) for r in out]
    if not records:
        return table.snapshot(base)
    added = [DataFile.from_json(r["entry"]) for r in records if r["op"] == "update"]
    removed = [
        r["entry"]["path"] if r["op"] == "update" else r["path"] for r in records
    ]
    new_tombstones = sum(a.delete_rows for a in added)
    return table.commit(
        added,
        removed_paths=removed,
        operation="delete",
        summary={
            "plan": "delete-vector",
            "files_touched": len(records),
            "files_dropped": sum(1 for r in records if r["op"] == "drop"),
            "tombstones": new_tombstones,
        },
        base_snapshot_id=base,
    )
