"""Small-file compaction: bin-pack fragments into target-size files.

Generalizes the reference's blob copy-with-recompression, including its
"skip if already compressed" fast path (reference
`src/clients/google_cloud_storage_client.py:122-163`): files already near the
target size are carried forward into the new snapshot without a rewrite.

Plan: driver bin-packs manifest entries first-fit-decreasing on file bytes.
Execute: a control ``Dataset`` with one bin per block; each bin is a stateless
Ray Data task that streams its input fragments through Arrow and writes ONE
content-addressed output file, a checkpoint record, and a lineage record.
No shuffle — embarrassingly parallel, the headline scaling op.  At 100 TB the
driver holds only manifest entries (O(file count)), never data.
"""

from __future__ import annotations

import json
import time
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import TRANSCRIPTS_SCHEMA, ensure_schema, schema_from_json, schema_to_json
from ..state.checkpoint import Checkpoint
from ..state.lineage import lineage_record, store_lineage
from ..state.manifest import DataFile, Snapshot, TranscriptTable, write_data_file

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def plan_bins(
    files: list[DataFile],
    target_bytes: int = DEFAULT_TARGET_BYTES,
    carry_forward_ratio: float = 0.75,
) -> tuple[list[list[DataFile]], list[DataFile]]:
    """First-fit-decreasing bin packing on file bytes.

    Returns ``(bins, carried)``: ``bins`` are groups to rewrite; ``carried``
    are files already >= ``carry_forward_ratio * target_bytes`` that pass into
    the new snapshot untouched (the "already compressed → skip" semantic).
    """
    carried = [f for f in files if f.bytes >= carry_forward_ratio * target_bytes]
    todo = sorted(
        (f for f in files if f.bytes < carry_forward_ratio * target_bytes),
        key=lambda f: f.bytes,
        reverse=True,
    )
    bins: list[list[DataFile]] = []
    sizes: list[int] = []
    for f in todo:
        for i, s in enumerate(sizes):
            if s + f.bytes <= target_bytes:
                bins[i].append(f)
                sizes[i] += f.bytes
                break
        else:
            bins.append([f])
            sizes.append(f.bytes)
    # a singleton bin is a rewrite of one small file into itself: only useful
    # if it merges with nothing — carry it forward instead of burning IO,
    # unless it is the only content (so tests over tiny tables still compact).
    if len(bins) > 1:
        keep = [b for b in bins if len(b) > 1]
        singles = [b[0] for b in bins if len(b) == 1]
        # a singleton bin merges with nothing — carrying it forward beats a
        # pointless rewrite, whether or not other bins remain
        carried.extend(singles)
        bins = keep
    return bins, carried


def _read_bin_fragments(spec: dict, fsa, lo: int = 0, hi: int | None = None) -> pa.Table:
    """Read + schema-map fragments ``[lo, hi)`` of a bin spec into one table
    (delete masks applied, renames mapped, added columns padded)."""
    schema = (
        schema_from_json(spec["schema"]) if spec.get("schema") else TRANSCRIPTS_SCHEMA
    )
    defaults = spec.get("defaults") or {}
    aliases = spec.get("aliases") or {}
    deletes = spec.get("deletes") or [None] * len(spec["paths"])
    tables = []
    for p, dpath in list(zip(spec["paths"], deletes))[lo:hi]:
        t = pq.read_table(p, filesystem=fsa.fs)
        if dpath:  # materialize positional deletes into the rewrite
            from .deletevec import apply_deletes, read_delete_positions

            t = apply_deletes(t, read_delete_positions(dpath, fsa))
        # ensure_schema also materializes renames (aliases) and drops
        tables.append(ensure_schema(t, schema, defaults=defaults, aliases=aliases))
    return pa.concat_tables(tables)


def _write_bin(spec: dict, merged: pa.Table, fsa, t0: float) -> dict:
    """Sort + write one bin's output file, checkpoint + lineage record."""
    schema = (
        schema_from_json(spec["schema"]) if spec.get("schema") else TRANSCRIPTS_SCHEMA
    )
    # sorts by (conv_id, turn_idx) within file; also MATERIALIZES any
    # evolved columns into the rewritten file (write-on-next-touch)
    out = write_data_file(merged, spec["root"], schema=schema, fs=fsa)
    lin = lineage_record(
        op="compact",
        partition_id=spec["bin_id"],
        inputs=[{"path": p, "checksum": c} for p, c in zip(spec["paths"], spec["checksums"])],
        outputs=[{"path": out.path, "checksum": out.checksum}],
        rows_in=merged.num_rows,
        rows_out=out.rows,
        duration_s=time.monotonic() - t0,
    )
    record = {"datafile": out.to_json(), "lineage": lin, "removed": spec["rel_paths"]}
    Checkpoint.write_record(spec["ckpt_dir"], spec["bin_id"], record, fs=fsa)
    return record


def _compact_bins_batch(batch, fsa=None) -> "Any":
    """Stateless per-bin task: read fragments -> one sorted output file each.

    Receives a (usually single-row) pandas batch of JSON bin specs.  ``fsa``
    is the table's :class:`..state.fs.StorageAdapter` (closure-captured by
    ``CompactionOp.run`` and pickled to the task), so compaction works
    against non-local table roots (object stores / subtree filesystems).
    """
    import pandas as pd

    from ..state.fs import LOCAL

    fsa = fsa or LOCAL
    records = []
    for spec_json in batch["spec"]:
        spec = json.loads(spec_json)
        t0 = time.monotonic()
        merged = _read_bin_fragments(spec, fsa)
        record = _write_bin(spec, merged, fsa, t0)
        records.append(json.dumps(record))
    return pd.DataFrame({"record": records})


class CompactionOp:
    """Small-file compaction as a :class:`..stages.protocol.MaintenanceOp`.

    ``plan`` is pure driver-side bin packing over manifest entries; ``run``
    executes the bins as stateless Ray Data tasks (skipping checkpointed
    ones); ``commit`` performs the copy-on-write snapshot swap.  The op holds
    its parameters and per-run planning state, mirroring how the reference
    binds config into a flow instance (reference
    `src/orchestration/pipelines/ingest/eodhd_pipeline.py:30-47`).
    """

    def __init__(
        self,
        target_bytes: int = DEFAULT_TARGET_BYTES,
        carry_forward_ratio: float = 0.75,
    ):
        self.target_bytes = target_bytes
        self.carry_forward_ratio = carry_forward_ratio
        self._base: int | None = None
        self._ckpt: Checkpoint | None = None
        self._n_bins = 0
        self._n_carried = 0

    def plan(self, table: TranscriptTable, snapshot_id: int) -> list[dict[str, Any]]:
        files = table.files(snapshot_id)
        bins, carried = plan_bins(files, self.target_bytes, self.carry_forward_ratio)
        self._base = snapshot_id
        self._n_bins, self._n_carried = len(bins), len(carried)
        self._ckpt = Checkpoint(
            table.root, f"compact-s{snapshot_id}-t{self.target_bytes}", fs=table.fsa
        )
        schema_json = schema_to_json(table.schema_of(snapshot_id))
        defaults = table.defaults_of(snapshot_id)
        return [
            {
                "bin_id": i,
                "root": table.root,
                "paths": [f.path if f.path.startswith("/") else table._p(f.path) for f in b],
                "rel_paths": [f.path for f in b],
                "checksums": [f.checksum for f in b],
                "deletes": [
                    table._p(f.delete_path) if f.delete_path else None for f in b
                ],
                "ckpt_dir": self._ckpt.dir,
                "schema": schema_json,
                "defaults": defaults,
                "aliases": table.aliases_of(snapshot_id),
            }
            for i, b in enumerate(bins)
        ]

    def run(self, table: TranscriptTable, partitions: list[dict[str, Any]]) -> list[dict[str, Any]]:
        import ray
        import ray.data as rd

        done = self._ckpt.completed()
        results: list[dict[str, Any]] = []
        todo: list[dict[str, Any]] = []
        for spec in partitions:
            if str(spec["bin_id"]) in done:
                results.append(done[str(spec["bin_id"])])
            else:
                todo.append(spec)
        if not todo:
            return results
        fsa = table.fsa
        cpus = int(ray.cluster_resources().get("CPU", 4))
        if len(todo) < cpus // 2 and any(len(s["paths"]) > 1 for s in todo):
            # Under-decomposed plan (bins < half the cluster — e.g. a small
            # table with large target files): one-task-per-bin would idle
            # most CPUs for the whole stage.  Split each bin into parallel
            # fragment-read subtasks feeding one write task.  Only taken when
            # CPUs would otherwise sit idle — the split ships each bin's
            # decoded rows through the object store once, which a saturated
            # cluster (the 100-TB case: bins >> CPUs) should not pay.
            sub = max(2, (2 * cpus) // max(1, len(todo)))

            def read_part(spec_json: str, lo: int, hi: int) -> pa.Table:
                return _read_bin_fragments(json.loads(spec_json), fsa, lo, hi)

            def write_task(spec_json: str, t0: float, *tables: pa.Table) -> str:
                spec = json.loads(spec_json)
                return json.dumps(_write_bin(spec, pa.concat_tables(tables), fsa, t0))

            read_fn = ray.remote(read_part)
            write_fn = ray.remote(write_task)
            pending = []
            for spec in todo:
                t0 = time.monotonic()
                sj = json.dumps(spec)
                n = len(spec["paths"])
                k = min(sub, n)
                edges = [round(i * n / k) for i in range(k + 1)]
                refs = [
                    read_fn.remote(sj, lo, hi)
                    for lo, hi in zip(edges, edges[1:])
                    if hi > lo
                ]
                pending.append(write_fn.remote(sj, t0, *refs))
            results.extend(json.loads(r) for r in ray.get(pending))
            return results

        items = [{"spec": json.dumps(spec)} for spec in todo]

        def run_bin(batch):
            return _compact_bins_batch(batch, fsa)

        ds = rd.from_items(items, override_num_blocks=len(items))
        out = ds.map_batches(
            run_bin, batch_size=None, batch_format="pandas"
        ).take_all()
        results.extend(json.loads(r["record"]) for r in out)
        return results

    def commit(self, table: TranscriptTable, results: list[dict[str, Any]]) -> Snapshot:
        added = [DataFile.from_json(r["datafile"]) for r in results]
        removed = [p for r in results for p in r["removed"]]
        # dedup: two bins can never share inputs, but a resumed run may double-list
        removed = list(dict.fromkeys(removed))
        snap = table.commit(
            added,
            removed_paths=removed,
            operation="compact",
            summary={
                "target_bytes": self.target_bytes,
                "bins": self._n_bins,
                "carried": self._n_carried,
            },
            base_snapshot_id=self._base,
        )
        store_lineage(table.root, snap.snapshot_id, [r["lineage"] for r in results], fs=table.fsa)
        self._ckpt.clear()
        return snap


def compact(
    table: TranscriptTable,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    carry_forward_ratio: float = 0.75,
    snapshot_id: int | None = None,
) -> Snapshot:
    """Compact the current (or given) snapshot; returns the new snapshot.

    Resumable: the op id is a pure function of (base snapshot, target size),
    so a rerun after a crash skips bins whose checkpoint records exist and
    replays only the rest; content-addressed outputs make replays idempotent.
    Drives :class:`CompactionOp` through the generic
    :func:`..stages.protocol.run_op` plan→run→commit loop.
    """
    from .protocol import run_op

    return run_op(CompactionOp(target_bytes, carry_forward_ratio), table, snapshot_id)
