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
        sub_bin: bool | None = None,
    ):
        self.target_bytes = target_bytes
        self.carry_forward_ratio = carry_forward_ratio
        #: sub-bin parallel writes when cpus >> bins: None = auto (split when
        #: bins < cpus/2), False = layout-stable one file per bin, True =
        #: always split multi-fragment bins.  Splitting writes k files of
        #: ~target/k bytes per bin — identical scan content, different file
        #: layout — so callers that pin layout (e.g. cross-round bench
        #: comparisons of file counts) pass False.
        self.sub_bin = sub_bin
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
                "bytes": [f.bytes for f in b],
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
        auto_split = len(todo) < cpus // 2 if self.sub_bin is None else self.sub_bin
        if auto_split and any(len(s["paths"]) > 1 for s in todo):
            # Under-decomposed plan (bins < half the cluster — e.g. a small
            # table with large target files): one-task-per-bin would idle
            # most CPUs through the read AND the sort+encode of the write
            # wave (the measured writer-quantization floor: 14 bins = 14
            # writers no matter the cpu count).  Split each bin into k
            # byte-balanced fragment sub-groups; every sub-group is a full
            # read->sort->encode->write task producing its OWN
            # content-addressed file of ~target/k bytes.  Scan content is
            # identical (every file stays internally sorted; the table's
            # ordering invariant is per-file); only the file layout changes.
            # A saturated cluster (the 100-TB case: bins >> CPUs) never
            # takes this branch — there the one-file-per-bin definition IS
            # the right quantization.
            sub = max(2, -(-2 * cpus // max(1, len(todo))))  # ceil

            def write_part(spec_json: str, lo_hi: tuple, t0: float) -> str:
                spec = json.loads(spec_json)
                idxs = list(lo_hi)
                part = {**spec, "paths": [spec["paths"][i] for i in idxs],
                        "checksums": [spec["checksums"][i] for i in idxs],
                        "deletes": [(spec.get("deletes") or [None] * len(spec["paths"]))[i] for i in idxs]}
                merged = _read_bin_fragments(part, fsa)
                schema = (
                    schema_from_json(spec["schema"]) if spec.get("schema") else TRANSCRIPTS_SCHEMA
                )
                out = write_data_file(merged, spec["root"], schema=schema, fs=fsa)
                return json.dumps({"datafile": out.to_json(), "rows_in": merged.num_rows})

            write_fn = ray.remote(write_part)
            pending: list[tuple[dict, float, list]] = []
            for spec in todo:
                t0 = time.monotonic()
                sj = json.dumps(spec)
                sizes = spec.get("bytes") or [1] * len(spec["paths"])
                # every sub-group must MERGE (>= 2 fragments): a singleton
                # group re-encodes one sorted file into itself (same content
                # hash -> the "rewrite" is a no-op and the small file
                # survives), defeating the compaction
                k = max(1, min(sub, len(spec["paths"]) // 2))
                # byte-balanced grouping: biggest fragment to lightest group
                groups: list[list[int]] = [[] for _ in range(k)]
                loads = [0] * k
                for i in sorted(range(len(sizes)), key=lambda i: -sizes[i]):
                    j = loads.index(min(loads))
                    groups[j].append(i)
                    loads[j] += sizes[i]
                refs = [write_fn.remote(sj, tuple(g), t0) for g in groups if g]
                pending.append((spec, t0, refs))
            for spec, t0, refs in pending:
                parts = [json.loads(r) for r in ray.get(refs)]
                outs = [DataFile.from_json(p["datafile"]) for p in parts]
                lin = lineage_record(
                    op="compact",
                    partition_id=spec["bin_id"],
                    inputs=[
                        {"path": p, "checksum": c}
                        for p, c in zip(spec["paths"], spec["checksums"])
                    ],
                    outputs=[{"path": o.path, "checksum": o.checksum} for o in outs],
                    rows_in=sum(p["rows_in"] for p in parts),
                    rows_out=sum(o.rows for o in outs),
                    duration_s=time.monotonic() - t0,
                )
                record = {
                    "datafiles": [o.to_json() for o in outs],
                    "lineage": lin,
                    "removed": spec["rel_paths"],
                }
                Checkpoint.write_record(spec["ckpt_dir"], spec["bin_id"], record, fs=fsa)
                results.append(record)
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
        added = [
            DataFile.from_json(d)
            for r in results
            for d in (r["datafiles"] if "datafiles" in r else [r["datafile"]])
        ]
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
    sub_bin: bool | None = None,
) -> Snapshot:
    """Compact the current (or given) snapshot; returns the new snapshot.

    Resumable: the op id is a pure function of (base snapshot, target size),
    so a rerun after a crash skips bins whose checkpoint records exist and
    replays only the rest; content-addressed outputs make replays idempotent.
    Drives :class:`CompactionOp` through the generic
    :func:`..stages.protocol.run_op` plan→run→commit loop.
    """
    from .protocol import run_op

    return run_op(
        CompactionOp(target_bytes, carry_forward_ratio, sub_bin=sub_bin), table, snapshot_id
    )
