"""Copy-on-write manifest / snapshot tree for a transcripts table.

The reference engine's storage contract is: deterministic object keys derived
from the payload (reference `src/models/data/eodhd_models.py:29-32`), a
metadata envelope stored next to the data (`eodhd_models.py:15-27`), and
idempotent last-writer-wins overwrites.  The new engine makes that contract
explicit as a tiny lakehouse layout:

```
<root>/
  data/        part-<sha256[:20]>.parquet        content-addressed data files
  manifests/   m-<sha256[:20]>.json              immutable file-entry SHARDS
  manifests/   ml-<sha256[:20]>.json             manifest list (shard pointers)
  snapshots/   s<NNNN>.json                      snapshot -> manifest-list pointer
  checkpoints/ <op_id>/p-<partition>.json        per-partition completion records
  lineage/     s<NNNN>/*.json                    per-partition lineage records
  _latest                                        advisory cache of the current id
```

Manifests are SHARDED with structural sharing (the Iceberg
manifest-list/manifest split): a snapshot points at a manifest LIST whose
entries reference immutable, content-addressed shards of ~512 file entries
each, carrying shard-level aggregates (rows/bytes, ts range, a bloom over
file paths).  Commits rewrite only the shards they touch — an append writes
ONE new shard and reuses every existing shard by reference, so commit
metadata I/O is O(changed files), not O(table).  At 100 TB (~10^5-10^6 data
files) this is the difference between a multi-hundred-MB manifest rewrite
per commit and a few-KB one.  The path bloom routes removals to their
shards without reading the others; the ts aggregates let time-window scans
skip whole shards before any per-file pruning.  Small shards left behind by
frequent appends are coalesced opportunistically at commit time, bounding
shard count.  Legacy single-doc manifests (``{"files": [...]}``) remain
readable; the first sharded commit migrates the layout.

Every maintenance op commits copy-on-write: it writes new data files and a
new manifest, then CAS-creates ``snapshots/s<parent+1>.json`` — that create
IS the commit point (first writer wins; losers re-parent and retry, see
:class:`CommitConflict`), and ``_latest`` is only an advisory cache
refreshed afterwards.  Old snapshots keep their
file lists, so a reader pinned to snapshot N never observes compacted files
(snapshot isolation).  A crashed commit leaves only unreferenced files —
invisible to readers, collected later by :mod:`..stages.expire`.

Content-addressed data-file names make replays idempotent, the Ray-native
version of the reference's deterministic-overwrite idempotency
(`eodhd_models.py:29-32` + `google_cloud_storage_client.py:74`).
"""

from __future__ import annotations

import hashlib
import io
import json
import os
from dataclasses import asdict, dataclass, field
from typing import Any, Iterable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..schema import STATS_COLUMNS, TRANSCRIPTS_SCHEMA, ensure_schema
from .fs import LOCAL, StorageAdapter

_LATEST = "_latest"
_MISS = object()  # cache-miss sentinel (None is a valid cached value)


class CommitConflict(Exception):
    """Another committer landed a snapshot with the same parent first.

    Raised by :meth:`TranscriptTable._commit_manifest` when the CAS create of
    ``snapshots/s<parent+1>.json`` loses the race.  :meth:`TranscriptTable.commit`
    catches it, re-reads the (new) current snapshot, recomputes the file set
    against it and retries — so concurrent appends both land, on distinct
    ids, with neither lineage lost.  Callers that PINNED a base snapshot see
    the conflict surfaced instead (their plan may be stale)."""


@dataclass(frozen=True)
class DataFile:
    """Manifest entry for one parquet data file (path relative to table root).

    ``delete_path`` / ``delete_rows``: optional positional-delete sidecar
    (parquet of row ordinals under ``deletes/``, see ``stages/deletevec``).
    A file's LIVE rows are ``rows - delete_rows``; readers subtract the
    sidecar's positions, and any rewrite (compaction, cluster, MERGE)
    materializes the deletes and drops the sidecar reference.
    """

    path: str
    rows: int
    bytes: int
    checksum: str  # sha256 of the file bytes
    stats: dict[str, list[Any]] = field(default_factory=dict)  # col -> [min, max]
    delete_path: str | None = None
    delete_rows: int = 0
    #: partition-spec evolution: id of the cluster layout this file was
    #: written under (index into the snapshot's ``partition_specs``).  None =
    #: unclustered (raw append / merge output); ``cluster(only_stale=True)``
    #: rewrites exactly the files whose tag differs from the current default.
    spec_id: int | None = None

    def to_json(self) -> dict[str, Any]:
        return asdict(self)

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> "DataFile":
        return cls(
            path=d["path"],
            rows=int(d["rows"]),
            bytes=int(d["bytes"]),
            checksum=d["checksum"],
            stats=d.get("stats", {}),
            delete_path=d.get("delete_path"),
            delete_rows=int(d.get("delete_rows", 0)),
            spec_id=d.get("spec_id"),
        )


@dataclass(frozen=True)
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    manifest: str  # manifests/<name>.json, relative to root
    operation: str
    summary: dict[str, Any]
    #: commit timestamp for time travel.  A LOGICAL clock by default
    #: (parent's + 1) so replays and tests are deterministic; pass a real
    #: epoch-us value through ``commit(..., commit_ts=...)`` for wall-clock
    #: time travel.  Never read from the system clock inside the library.
    commit_ts: int = 0
    #: schema evolution: the snapshot's logical schema as
    #: ``[[name, type], ...]`` (None = the engine's base transcripts
    #: schema) plus read-time defaults for columns added after a file was
    #: written.  Maintenance commits inherit the parent's schema; only
    #: the :mod:`..stages.evolve` operators change it.
    schema_fields: list | None = None
    defaults: dict | None = None
    #: RENAME evolution: ``{current_name: [prior physical names, oldest
    #: first]}`` — readers map a file's old physical name to the current one
    #: (the name-lineage analog of Iceberg field ids).  DROP evolution:
    #: tombstoned names (current + all their aliases) that may never be
    #: re-added, so a re-added name can't resurrect old files' data.
    column_aliases: dict | None = None
    dropped_columns: list | None = None
    #: partition-spec evolution (the layout analog of schema evolution):
    #: ``partition_specs`` is an append-only list of cluster layouts
    #: ``{"spec_id", "curve", "ts_bucket_us", "part_bits", "time_major"}``;
    #: ``default_spec_id`` names the layout new cluster runs target.  Data
    #: files carry the ``spec_id`` they were written under, so changing the
    #: layout is a metadata-only commit and re-clustering is incremental
    #: (only files written under another spec move).  See ``stages/spec.py``.
    partition_specs: list | None = None
    default_spec_id: int | None = None

    def to_json(self) -> dict[str, Any]:
        return asdict(self)

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> "Snapshot":
        return cls(
            snapshot_id=int(d["snapshot_id"]),
            parent_id=d.get("parent_id"),
            manifest=d["manifest"],
            operation=d.get("operation", ""),
            summary=d.get("summary", {}),
            commit_ts=int(d.get("commit_ts", d.get("snapshot_id", 0))),
            schema_fields=d.get("schema_fields"),
            defaults=d.get("defaults"),
            column_aliases=d.get("column_aliases"),
            dropped_columns=d.get("dropped_columns"),
            partition_specs=d.get("partition_specs"),
            default_spec_id=d.get("default_spec_id"),
        )


#: target file entries per manifest shard when building/coalescing shards
SHARD_TARGET_FILES = 512
#: shards smaller than this are coalesce candidates…
SHARD_COALESCE_MIN = 64
#: …and get merged once at least this many of them have accumulated
SHARD_COALESCE_COUNT = 8


@dataclass(frozen=True)
class ManifestShard:
    """Manifest-list entry: one immutable shard of file entries + aggregates.

    ``ts_min``/``ts_max`` (ISO strings) are the shard-wide ``ts`` stat range
    when EVERY member file has ts stats (else None — conservatively
    unprunable).  ``path_bloom`` is a bloom over member file paths used to
    route removals to the shards that hold them.
    """

    path: str
    num_files: int
    rows: int
    bytes: int
    ts_min: str | None = None
    ts_max: str | None = None
    path_bloom: str | None = None

    def to_json(self) -> dict[str, Any]:
        return asdict(self)

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> "ManifestShard":
        return cls(
            path=d["path"],
            num_files=int(d["num_files"]),
            rows=int(d["rows"]),
            bytes=int(d["bytes"]),
            ts_min=d.get("ts_min"),
            ts_max=d.get("ts_max"),
            path_bloom=d.get("path_bloom"),
        )


def _atomic_write(path: str, payload: bytes, fs: StorageAdapter = LOCAL) -> None:
    """Torn-file-safe publish, via the storage adapter (see state/fs.py)."""
    fs.write_atomic(path, payload)


def _scalar_to_json(v: Any) -> Any:
    """Arrow scalar -> JSON-storable (timestamps become ISO strings)."""
    import datetime

    if isinstance(v, pa.Scalar):
        v = v.as_py()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return v


def table_stats(table: pa.Table, columns: Iterable[str] = STATS_COLUMNS) -> dict[str, list[Any]]:
    stats: dict[str, list[Any]] = {}
    for col in columns:
        if col not in table.column_names or table.num_rows == 0:
            continue
        mm = pc.min_max(table.column(col))
        stats[col] = [_scalar_to_json(mm["min"]), _scalar_to_json(mm["max"])]
    return stats


def write_data_file(
    table: pa.Table,
    root: str,
    schema: pa.Schema = TRANSCRIPTS_SCHEMA,
    sort_within: bool = True,
    compression: str = "zstd",
    extra_stats: dict[str, list[Any]] | None = None,
    fs: StorageAdapter = LOCAL,
) -> DataFile:
    """Serialize ``table`` to a content-addressed parquet file under ``root``/data.

    Safe to call from any Ray task/actor: the name is the sha256 of the file
    bytes, so concurrent or replayed writers of identical content converge on
    one file (idempotent, like the reference's deterministic overwrite paths).
    Rows are sorted by ``(conv_id, turn_idx)`` within the file so every data
    file independently satisfies the stable-ordering invariant.
    """
    table = ensure_schema(table, schema)
    if sort_within and table.num_rows > 1 and {"conv_id", "turn_idx"} <= set(table.column_names):
        # compact multi-chunk inputs (compaction bins, merge-resolver
        # concats) before sort_by: the sort's gather on a multi-chunk string
        # column is Arrow's slow per-index-chunk-resolution path — measured
        # 0.90 s vs 0.13 s combine + 0.56 s sort on a 72-chunk / 211 MB bin
        table = table.combine_chunks().sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    buf = io.BytesIO()
    pq.write_table(table, buf, compression=compression)
    payload = buf.getvalue()
    sha = hashlib.sha256(payload).hexdigest()
    rel = f"data/part-{sha[:20]}.parquet"
    abspath = os.path.join(root, rel)
    if not fs.exists(abspath):
        _atomic_write(abspath, payload, fs)
    stats = table_stats(table)
    if "conv_id" in table.column_names and table.num_rows:
        from ..stages.skew import key_hash64
        from .bloom import bloom_build, kmv_build

        h = key_hash64(table.column("conv_id"))
        # KMV distinct-count sketch: union-mergeable, so per-file sketches
        # roll up to a table-level NDV estimate with zero re-scan
        stats["conv_kmv"] = kmv_build(h)
        if table.num_rows <= 32768:
            # membership bloom for point-lookup / MERGE pruning; attempted
            # only for small files (row-count guard keeps the distinct-scan
            # off the hot write path of big clustered/merged outputs, whose
            # conv counts would exceed the bloom budget anyway) and kept
            # only when the distinct count keeps the filter small
            uniq = np.unique(h)
            if len(uniq) <= 4096:
                stats["conv_bloom"] = bloom_build(uniq)
    if extra_stats:
        stats.update(extra_stats)
    return DataFile(
        path=rel, rows=table.num_rows, bytes=len(payload), checksum=sha, stats=stats
    )


class TranscriptTable:
    """Driver-side handle to one table root; all mutation goes through commits."""

    def __init__(
        self,
        root: str,
        schema: pa.Schema = TRANSCRIPTS_SCHEMA,
        fs: StorageAdapter | None = None,
    ):
        self.root = os.path.abspath(root) if (fs is None or fs.is_local) else root
        self.schema = schema
        self.fsa = fs or LOCAL
        # shards and manifest lists are immutable + content-addressed, so
        # in-process caching by path is always safe (bounded, FIFO-evicted)
        self._shard_cache: dict[str, list[DataFile]] = {}
        self._ml_cache: dict[str, list[ManifestShard] | None] = {}

    # -- layout ------------------------------------------------------------
    def _p(self, *parts: str) -> str:
        return os.path.join(self.root, *parts)

    @classmethod
    def create(
        cls,
        root: str,
        schema: pa.Schema = TRANSCRIPTS_SCHEMA,
        fs: StorageAdapter | None = None,
    ) -> "TranscriptTable":
        t = cls(root, schema, fs)
        for d in ("data", "manifests", "snapshots", "checkpoints", "lineage"):
            t.fsa.makedirs(t._p(d))
        if not t.fsa.exists(t._p(_LATEST)):
            t._commit_manifest([], parent=None, operation="create", summary={})
        return t

    @classmethod
    def load(cls, root: str, fs: StorageAdapter | None = None) -> "TranscriptTable":
        t = cls(root, fs=fs)
        if not t.fsa.exists(t._p(_LATEST)):
            raise FileNotFoundError(f"not a table root (no {_LATEST}): {root}")
        return t

    # -- snapshots ---------------------------------------------------------
    def current_snapshot_id(self) -> int:
        """Highest committed snapshot id.

        Authoritative source is the ``snapshots/`` listing (the CAS-created
        snapshot file IS the commit point); ``_latest`` is an advisory cache
        kept for fast existence checks — under concurrent committers its
        last-writer-wins update may briefly lag, so it is never trusted when
        a listing is available."""
        names = self.fsa.listdir(self._p("snapshots"))
        ids = [int(n[1:-5]) for n in names if n.startswith("s") and n.endswith(".json")]
        if ids:
            return max(ids)
        return int(self.fsa.read_bytes(self._p(_LATEST)).decode().strip())

    def snapshot(self, snapshot_id: int | None = None) -> Snapshot:
        sid = self.current_snapshot_id() if snapshot_id is None else snapshot_id
        return Snapshot.from_json(
            json.loads(self.fsa.read_bytes(self._p("snapshots", f"s{sid:06d}.json")))
        )

    def snapshots(self) -> list[Snapshot]:
        out = []
        for name in self.fsa.listdir(self._p("snapshots")):
            if name.startswith("s") and name.endswith(".json"):
                out.append(
                    Snapshot.from_json(json.loads(self.fsa.read_bytes(self._p("snapshots", name))))
                )
        return out

    def files(self, snapshot_id: int | None = None) -> list[DataFile]:
        snap = self.snapshot(snapshot_id)
        shards = self._manifest_shards(snap)
        if shards is None:  # legacy single-doc manifest
            entries = json.loads(self.fsa.read_bytes(self._p(snap.manifest)))["files"]
            return [DataFile.from_json(e) for e in entries]
        lists = self._read_shards([sm.path for sm in shards])
        out = [e for entries in lists for e in entries]
        out.sort(key=lambda f: f.path)
        return out

    # -- manifest shards ----------------------------------------------------
    def _manifest_shards(self, snap: Snapshot) -> list[ManifestShard] | None:
        """Parsed manifest list of ``snap`` (None for legacy single-doc)."""
        cached = self._ml_cache.get(snap.manifest, _MISS)
        if cached is not _MISS:
            return cached
        doc = json.loads(self.fsa.read_bytes(self._p(snap.manifest)))
        shards = (
            [ManifestShard.from_json(s) for s in doc["shards"]]
            if "shards" in doc
            else None
        )
        if len(self._ml_cache) > 64:
            self._ml_cache.pop(next(iter(self._ml_cache)))
        self._ml_cache[snap.manifest] = shards
        return shards

    def _read_shard(self, path: str) -> list[DataFile]:
        cached = self._shard_cache.get(path)
        if cached is not None:
            return cached
        entries = json.loads(self.fsa.read_bytes(self._p(path)))["files"]
        out = [DataFile.from_json(e) for e in entries]
        self._cache_shard(path, out)
        return out

    def _read_shards(self, paths: list[str]) -> list[list[DataFile]]:
        """Read many shards, in parallel threads when there are enough to
        matter (shard reads are independent metadata I/O — on an object
        store this is the difference between one round-trip and hundreds
        in sequence)."""
        misses = [p for p in paths if p not in self._shard_cache]
        if len(misses) > 4:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=min(16, len(misses))) as ex:
                list(ex.map(self._read_shard, misses))
        return [self._read_shard(p) for p in paths]

    def _cache_shard(self, path: str, entries: list[DataFile]) -> None:
        if len(self._shard_cache) > 256:
            self._shard_cache.pop(next(iter(self._shard_cache)))
        self._shard_cache[path] = entries

    def _write_shard(self, files: list[DataFile]) -> ManifestShard:
        """Write one immutable, content-addressed shard; returns its
        manifest-list entry with shard-level aggregates."""
        import pandas as pd

        files = sorted(files, key=lambda f: f.path)
        doc = {"files": [f.to_json() for f in files]}
        payload = json.dumps(doc, sort_keys=True).encode()
        rel = f"manifests/m-{hashlib.sha256(payload).hexdigest()[:20]}.json"
        if not self.fsa.exists(self._p(rel)):
            _atomic_write(self._p(rel), payload, self.fsa)
        ts_min = ts_max = None
        ts_stats = [f.stats.get("ts") for f in files]
        if files and all(s is not None for s in ts_stats):
            ts_min = min((s[0] for s in ts_stats), key=pd.Timestamp)
            ts_max = max((s[1] for s in ts_stats), key=pd.Timestamp)
        bloom = None
        if files:
            from ..stages.skew import key_hash64
            from .bloom import bloom_build

            bloom = bloom_build(key_hash64(pa.array([f.path for f in files])))
        self._cache_shard(rel, files)
        return ManifestShard(
            path=rel,
            num_files=len(files),
            rows=sum(f.rows for f in files),
            bytes=sum(f.bytes for f in files),
            ts_min=ts_min,
            ts_max=ts_max,
            path_bloom=bloom,
        )

    def _build_shards(self, files: list[DataFile]) -> list[ManifestShard]:
        files = sorted(files, key=lambda f: f.path)
        return [
            self._write_shard(files[i : i + SHARD_TARGET_FILES])
            for i in range(0, len(files), SHARD_TARGET_FILES)
        ]

    def _coalesce_shards(self, shards: list[ManifestShard]) -> list[ManifestShard]:
        """Merge accumulated small shards (append debris) so shard count
        stays O(files / SHARD_TARGET_FILES)."""
        small = [sm for sm in shards if sm.num_files < SHARD_COALESCE_MIN]
        if len(small) < SHARD_COALESCE_COUNT:
            return shards
        big = [sm for sm in shards if sm.num_files >= SHARD_COALESCE_MIN]
        entries = [e for lst in self._read_shards([sm.path for sm in small]) for e in lst]
        return big + self._build_shards(entries)

    def _apply_shard_edits(
        self,
        shards: list[ManifestShard],
        added: list[DataFile],
        removed: set[str],
    ) -> list[ManifestShard]:
        """Structural-sharing edit: rewrite only shards holding a removed
        path (routed by the shard path blooms); append one shard of added
        entries; reuse everything else by reference."""
        out: list[ManifestShard] = []
        found: set[str] = set()
        rm_hashes = None
        if removed:
            from ..stages.skew import key_hash64
            from .bloom import bloom_any

            rm_hashes = key_hash64(pa.array(sorted(removed)))
        for sm in shards:
            if removed and (
                sm.path_bloom is None or bloom_any(sm.path_bloom, rm_hashes)
            ):
                entries = self._read_shard(sm.path)
                hit = {e.path for e in entries} & removed
                if hit:
                    found |= hit
                    keep = [e for e in entries if e.path not in removed]
                    if keep:
                        out.append(self._write_shard(keep))
                    continue
            out.append(sm)
        unknown = removed - found
        if unknown:
            raise ValueError(
                f"commit removes files not in snapshot: {sorted(unknown)[:5]}"
            )
        if added:
            out.extend(self._build_shards(list(added)))
        return self._coalesce_shards(out)

    def _reuse_commit_args(self, base: int) -> dict:
        """``files``/``shards`` kwargs for a metadata-only commit that
        reuses the base snapshot's file set unchanged — zero manifest-shard
        I/O for sharded tables (schema/spec evolution commits are O(1))."""
        shards = self._manifest_shards(self.snapshot(base))
        if shards is not None:
            return {"files": None, "shards": shards}
        return {"files": self.files(base), "shards": None}

    def manifest_paths(self, snapshot_id: int | None = None) -> list[str]:
        """All metadata paths (manifest list + shards) a snapshot references
        — expiry deletes a shard only when no retained snapshot lists it."""
        snap = self.snapshot(snapshot_id)
        shards = self._manifest_shards(snap)
        if shards is None:
            return [snap.manifest]
        return [snap.manifest] + [sm.path for sm in shards]

    # -- commit ------------------------------------------------------------
    def _commit_manifest(
        self,
        files: list[DataFile] | None,
        parent: int | None,
        operation: str,
        summary: dict[str, Any],
        commit_ts: int | None = None,
        schema_fields: list | None = None,
        defaults: dict | None = None,
        column_aliases: dict | None = None,
        dropped_columns: list | None = None,
        partition_specs: list | None = None,
        default_spec_id: int | None = None,
        shards: list[ManifestShard] | None = None,
        inherit_meta: bool = True,
    ) -> Snapshot:
        """Publish a manifest list + snapshot.  Pass ``shards`` (structural
        sharing — metadata-only and incremental commits reuse the parent's
        shards by reference) or ``files`` (full list, sharded fresh).
        ``inherit_meta=False`` stores the schema/layout arguments VERBATIM
        (None = engine defaults) instead of inheriting the parent's — used
        by rollback, whose restore target may predate an evolution."""
        if shards is None:
            shards = self._build_shards(list(files or []))
        manifest_doc = {"shards": [sm.to_json() for sm in shards]}
        payload = json.dumps(manifest_doc, sort_keys=True).encode()
        mname = f"manifests/ml-{hashlib.sha256(payload).hexdigest()[:20]}.json"
        if not self.fsa.exists(self._p(mname)):
            _atomic_write(self._p(mname), payload, self.fsa)

        sid = 0 if parent is None else parent + 1
        parent_snap = None if parent is None else self.snapshot(parent)
        if commit_ts is None:
            # logical clock: strictly increasing, deterministic under replay
            commit_ts = 0 if parent_snap is None else parent_snap.commit_ts + 1
        if inherit_meta and schema_fields is None and parent_snap is not None:
            # maintenance commits inherit the parent's evolved schema
            schema_fields = parent_snap.schema_fields
            if defaults is None:
                defaults = parent_snap.defaults
            if column_aliases is None:
                column_aliases = parent_snap.column_aliases
            if dropped_columns is None:
                dropped_columns = parent_snap.dropped_columns
        if inherit_meta and parent_snap is not None:
            # layout metadata inherits independently of schema metadata
            if partition_specs is None:
                partition_specs = parent_snap.partition_specs
            if default_spec_id is None:
                default_spec_id = parent_snap.default_spec_id
        snap = Snapshot(
            snapshot_id=sid,
            parent_id=parent,
            manifest=mname,
            operation=operation,
            commit_ts=int(commit_ts),
            schema_fields=schema_fields,
            defaults=defaults,
            column_aliases=column_aliases,
            dropped_columns=dropped_columns,
            partition_specs=partition_specs,
            default_spec_id=default_spec_id,
            summary={
                **summary,
                "total_rows": sum(sm.rows for sm in shards),
                "total_bytes": sum(sm.bytes for sm in shards),
                "num_files": sum(sm.num_files for sm in shards),
            },
        )
        # THE commit point: CAS-create of the snapshot file.  Exactly one
        # committer per (parent -> child) id wins; losers re-parent and retry
        # in commit() so no interleaved commit's file changes are lost.
        created = self.fsa.write_if_absent(
            self._p("snapshots", f"s{sid:06d}.json"),
            json.dumps(snap.to_json(), sort_keys=True).encode(),
        )
        if not created:
            raise CommitConflict(
                f"snapshot s{sid} already committed by another writer (parent s{parent})"
            )
        # advisory cache only — current_snapshot_id() trusts the listing
        _atomic_write(self._p(_LATEST), str(sid).encode(), self.fsa)
        return snap

    def commit(
        self,
        added: Iterable[DataFile],
        removed_paths: Iterable[str] = (),
        operation: str = "append",
        summary: dict[str, Any] | None = None,
        base_snapshot_id: int | None = None,
        commit_ts: int | None = None,
        max_retries: int = 16,
        partition_specs: list | None = None,
        default_spec_id: int | None = None,
    ) -> Snapshot:
        """Copy-on-write commit: ``new = (base - removed) + added``.

        Multi-writer safe when the base floats (``base_snapshot_id=None``):
        losing the snapshot-id CAS re-reads the new current snapshot,
        recomputes ``(current - removed) + added`` against it and retries, so
        concurrent committers serialize without losing either's changes.  A
        retry raises ``ValueError`` if a removed file vanished meanwhile (the
        caller's plan is stale and must be recomputed).  With a PINNED base
        the :class:`CommitConflict` is surfaced instead.
        """
        added = list(added)
        removed = set(removed_paths)
        for attempt in range(max_retries + 1):
            base = self.current_snapshot_id() if base_snapshot_id is None else base_snapshot_id
            base_shards = self._manifest_shards(self.snapshot(base))
            if base_shards is not None:
                # structural sharing: touch only shards holding removed
                # paths, append one shard of added entries — O(change), not
                # O(table).  Raises ValueError on unknown removed paths.
                new_shards = self._apply_shard_edits(base_shards, added, removed)
            else:
                # legacy single-doc manifest: full rebuild (one-time migration)
                current = {f.path: f for f in self.files(base)}
                unknown = removed - set(current)
                if unknown:
                    raise ValueError(
                        f"commit removes files not in snapshot s{base}: {sorted(unknown)[:5]}"
                    )
                kept = [f for p, f in current.items() if p not in removed]
                new_shards = self._build_shards(kept + added)
            try:
                return self._commit_manifest(
                    None,
                    shards=new_shards,
                    parent=base,
                    operation=operation,
                    summary={
                        **(summary or {}),
                        "added_files": len(added),
                        "removed_files": len(removed),
                    },
                    commit_ts=commit_ts,
                    partition_specs=partition_specs,
                    default_spec_id=default_spec_id,
                )
            except CommitConflict:
                if base_snapshot_id is not None or attempt == max_retries:
                    raise
        raise AssertionError("unreachable")

    # -- schema evolution --------------------------------------------------
    def schema_of(self, snapshot_id: int | None = None) -> pa.Schema:
        """The snapshot's logical schema (base schema when never evolved)."""
        from ..schema import schema_from_json

        snap = self.snapshot(snapshot_id)
        if snap.schema_fields is None:
            return self.schema
        return schema_from_json(snap.schema_fields)

    def defaults_of(self, snapshot_id: int | None = None) -> dict:
        snap = self.snapshot(snapshot_id)
        return dict(snap.defaults or {})

    def aliases_of(self, snapshot_id: int | None = None) -> dict:
        """``{current_name: [prior physical names]}`` for renamed columns."""
        snap = self.snapshot(snapshot_id)
        return {k: list(v) for k, v in (snap.column_aliases or {}).items()}

    def dropped_of(self, snapshot_id: int | None = None) -> list:
        snap = self.snapshot(snapshot_id)
        return list(snap.dropped_columns or [])

    # -- metadata tables -----------------------------------------------------
    def files_table(self, snapshot_id: int | None = None):
        """Manifest entries as a Dataset (Iceberg's ``table.files`` analog):
        path, rows, bytes, checksum, stat ranges — queryable like data."""
        import pandas as pd
        import ray.data as rd

        rows = []
        for f in self.files(snapshot_id):
            rows.append(
                {
                    "path": f.path,
                    "rows": f.rows,
                    "bytes": f.bytes,
                    "checksum": f.checksum,
                    "conv_id_min": (f.stats.get("conv_id") or [None, None])[0],
                    "conv_id_max": (f.stats.get("conv_id") or [None, None])[1],
                    "ts_min": (f.stats.get("ts") or [None, None])[0],
                    "ts_max": (f.stats.get("ts") or [None, None])[1],
                    "has_bloom": "conv_bloom" in f.stats,
                    "delete_rows": f.delete_rows,
                }
            )
        return rd.from_pandas(pd.DataFrame(rows))

    def history(self):
        """Snapshot history as a Dataset (id, parent, operation, commit_ts,
        rows/bytes/files summary) — the ``table.history`` metadata table."""
        import pandas as pd
        import ray.data as rd

        rows = [
            {
                "snapshot_id": s.snapshot_id,
                "parent_id": s.parent_id,
                "operation": s.operation,
                "commit_ts": s.commit_ts,
                "total_rows": s.summary.get("total_rows", 0),
                "total_bytes": s.summary.get("total_bytes", 0),
                "num_files": s.summary.get("num_files", 0),
            }
            for s in self.snapshots()
        ]
        return rd.from_pandas(pd.DataFrame(rows))

    # -- table statistics ----------------------------------------------------
    def estimate_distinct_convs(self, snapshot_id: int | None = None) -> int:
        """Approximate distinct-conversation count from per-file KMV
        sketches (union-merge, no data scan; exact when the table holds
        fewer distinct keys than the sketch size)."""
        from .bloom import kmv_estimate, kmv_merge

        blobs = [f.stats.get("conv_kmv") for f in self.files(snapshot_id)]
        merged = kmv_merge([b for b in blobs if b])
        return int(round(kmv_estimate(merged)))

    def prune_files_for_ts_range(
        self, ts_from, ts_to, snapshot_id: int | None = None
    ) -> list[DataFile]:
        """Manifest entries whose ``ts`` [min,max] stats intersect
        ``[ts_from, ts_to)`` — the payoff of time-bucketed Z-ordering: a
        time-window scan touches only the files whose curve range covers
        the window.  Files without ts stats are conservatively included."""
        import pandas as pd

        lo = pd.Timestamp(ts_from)
        hi = pd.Timestamp(ts_to)
        shards = self._manifest_shards(self.snapshot(snapshot_id))
        if shards is not None:
            # shard-level skip first: a whole shard whose ts aggregate
            # misses the window is never even read (shards without ts
            # aggregates are conservatively included)
            live = [
                sm
                for sm in shards
                if sm.ts_min is None
                or sm.ts_max is None
                or (pd.Timestamp(sm.ts_max) >= lo and pd.Timestamp(sm.ts_min) < hi)
            ]
            candidates = [
                e for lst in self._read_shards([sm.path for sm in live]) for e in lst
            ]
            candidates.sort(key=lambda f: f.path)
        else:
            candidates = self.files(snapshot_id)
        out = []
        for f in candidates:
            stats = f.stats.get("ts")
            if stats is None:
                out.append(f)
                continue
            fmin, fmax = pd.Timestamp(stats[0]), pd.Timestamp(stats[1])
            if fmax >= lo and fmin < hi:
                out.append(f)
        return out

    def scan_ts_range(self, ts_from, ts_to, snapshot_id: int | None = None, **kw):
        """Stats-pruned scan of a time window (exact Arrow filter applied
        over the surviving files)."""
        import pandas as pd
        import pyarrow.compute as _pc
        import ray.data as rd

        files = self.prune_files_for_ts_range(ts_from, ts_to, snapshot_id)
        if not files:
            return rd.from_arrow(self.schema_of(snapshot_id).empty_table())
        lo = pa.scalar(pd.Timestamp(ts_from).to_pydatetime(), type=pa.timestamp("us"))
        hi = pa.scalar(pd.Timestamp(ts_to).to_pydatetime(), type=pa.timestamp("us"))

        def keep(t: pa.Table) -> pa.Table:
            ts = t.column("ts")
            return t.filter(
                _pc.and_(_pc.greater_equal(ts, lo), _pc.less(ts, hi))
            )

        from ..stages.deletevec import read_files

        return read_files(self, files, **kw).map_batches(keep, batch_format="pyarrow")

    # -- point-lookup pruning ----------------------------------------------
    def prune_files_for_convs(
        self, conv_ids: Iterable[str], snapshot_id: int | None = None
    ) -> list[DataFile]:
        """Manifest entries that MAY contain any of the conversations,
        decided from stats alone (lexical/hash ranges + bloom membership) —
        a point lookup touches ~one file instead of the whole table."""
        from ..stages.merge import prune_touched_files
        import numpy as np

        return prune_touched_files(
            self.files(snapshot_id), np.asarray(list(conv_ids), dtype=object)
        )

    def scan_convs(self, conv_ids: Iterable[str], snapshot_id: int | None = None, **kw):
        """Pruned scan of specific conversations (stats-pruned file list,
        then an exact Arrow filter over the survivors)."""
        import pyarrow.compute as _pc
        import ray.data as rd

        conv_list = sorted(set(conv_ids))
        files = self.prune_files_for_convs(conv_list, snapshot_id)
        if not files:
            return rd.from_arrow(self.schema.empty_table())
        wanted = pa.array(conv_list, type=pa.string())

        def keep(t: pa.Table) -> pa.Table:
            return t.filter(_pc.is_in(t.column("conv_id").cast(pa.string()), value_set=wanted))

        from ..stages.deletevec import read_files

        return read_files(self, files, **kw).map_batches(keep, batch_format="pyarrow")

    # -- rollback / manifest maintenance -----------------------------------
    def rollback(self, to_snapshot_id: int, max_retries: int = 16) -> Snapshot:
        """Restore the table to a prior snapshot's state — data AND metadata
        (schema, column lineage, partition specs) — as a NEW commit, so
        history is never rewritten (Iceberg ``rollback`` semantics, CoW
        style).  O(1) metadata: the new snapshot reuses the target's
        manifest shards by reference; no data file moves."""
        target = self.snapshot(to_snapshot_id)  # must exist
        reuse = self._reuse_commit_args(to_snapshot_id)
        for attempt in range(max_retries + 1):
            base = self.current_snapshot_id()
            try:
                return self._commit_manifest(
                    parent=base,
                    operation="rollback",
                    summary={"rolled_back_to": to_snapshot_id},
                    schema_fields=target.schema_fields,
                    defaults=target.defaults,
                    column_aliases=target.column_aliases,
                    dropped_columns=target.dropped_columns,
                    partition_specs=target.partition_specs,
                    default_spec_id=target.default_spec_id,
                    inherit_meta=False,
                    **reuse,
                )
            except CommitConflict:
                if attempt == max_retries:
                    raise

    def rewrite_manifests(self, max_retries: int = 16) -> Snapshot:
        """Re-shard the current manifest to the target shard size — a
        metadata-only commit that normalizes shard layout after many
        incremental edits (the manifest analog of data-file compaction).
        Data files are untouched; content-addressing dedupes any shard
        whose membership didn't change."""
        for attempt in range(max_retries + 1):
            base = self.current_snapshot_id()
            shards = self._build_shards(self.files(base))
            try:
                return self._commit_manifest(
                    None,
                    shards=shards,
                    parent=base,
                    operation="rewrite_manifests",
                    summary={"num_shards": len(shards)},
                )
            except CommitConflict:
                if attempt == max_retries:
                    raise

    # -- named refs (tags) -------------------------------------------------
    def set_ref(self, name: str, snapshot_id: int | None = None) -> int:
        """Pin a snapshot under a name (Iceberg tag/branch head analog).

        Refs live under ``refs/<name>`` and protect their snapshot from
        expiry; readers resolve them once at pin time like any snapshot.
        """
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"invalid ref name {name!r}")
        sid = self.current_snapshot_id() if snapshot_id is None else snapshot_id
        self.snapshot(sid)  # must exist
        self.fsa.makedirs(self._p("refs"))
        _atomic_write(self._p("refs", name), str(sid).encode(), self.fsa)
        return sid

    def ref(self, name: str) -> int:
        path = self._p("refs", name)
        if not self.fsa.exists(path):
            raise KeyError(f"unknown ref {name!r}")
        return int(self.fsa.read_bytes(path).decode().strip())

    def refs(self) -> dict[str, int]:
        return {n: self.ref(n) for n in self.fsa.listdir(self._p("refs"))}

    def drop_ref(self, name: str) -> None:
        self.fsa.remove(self._p("refs", name))

    # -- time travel -------------------------------------------------------
    def snapshot_as_of(self, ts: int) -> Snapshot:
        """Latest snapshot with ``commit_ts <= ts`` (timestamp time travel).

        ``commit_ts`` is the logical/epoch clock recorded at commit; readers
        resolve the snapshot once at pin time, so the returned snapshot's
        file list is stable regardless of later commits.
        """
        eligible = [s for s in self.snapshots() if s.commit_ts <= ts]
        if not eligible:
            raise ValueError(f"no snapshot committed at or before ts={ts}")
        return max(eligible, key=lambda s: (s.commit_ts, s.snapshot_id))

    def append_table(
        self, table: pa.Table, operation: str = "append", commit_ts: int | None = None
    ) -> Snapshot:
        """Driver-side convenience append of one in-memory Arrow table."""
        df = write_data_file(table, self.root, self.schema, fs=self.fsa)
        return self.commit([df], operation=operation, commit_ts=commit_ts)

    def register_fragments(self, paths: Iterable[str], operation: str = "register") -> Snapshot:
        """Adopt pre-existing parquet fragments (e.g. synthetic input files).

        Files outside ``root`` are referenced by absolute path; stats and
        checksums are computed from the file bytes.
        """
        entries = []
        for p in paths:
            raw = self.fsa.read_bytes(p)
            t = pq.read_table(io.BytesIO(raw))
            rel = os.path.relpath(p, self.root) if p.startswith(self.root) else p
            entries.append(
                DataFile(
                    path=rel,
                    rows=t.num_rows,
                    bytes=len(raw),
                    checksum=hashlib.sha256(raw).hexdigest(),
                    stats=table_stats(t),
                )
            )
        return self.commit(entries, operation=operation)

    # -- scan --------------------------------------------------------------
    def file_paths(self, snapshot_id: int | None = None) -> list[str]:
        return [
            f.path if os.path.isabs(f.path) else self._p(f.path)
            for f in self.files(snapshot_id)
        ]

    def scan(
        self,
        snapshot_id: int | None = None,
        columns: list[str] | None = None,
        as_of_ts: int | None = None,
        ref: str | None = None,
        **read_kwargs: Any,
    ):
        """``ray.data.Dataset`` over exactly the snapshot's manifest file list.

        Readers resolve the file list ONCE at pin time — the backbone of
        snapshot isolation: compaction committing a newer snapshot never
        changes what this dataset reads.  ``as_of_ts`` pins to the latest
        snapshot committed at or before that timestamp instead of an id.
        """
        import ray.data as rd

        if sum(x is not None for x in (snapshot_id, as_of_ts, ref)) > 1:
            raise ValueError("pass at most one of snapshot_id / as_of_ts / ref")
        if ref is not None:
            snapshot_id = self.ref(ref)
        if as_of_ts is not None:
            snapshot_id = self.snapshot_as_of(as_of_ts).snapshot_id
        snap_schema = self.schema_of(snapshot_id)
        defaults = self.defaults_of(snapshot_id)
        aliases = self.aliases_of(snapshot_id)
        dropped = self.dropped_of(snapshot_id)
        files = self.files(snapshot_id)
        if not files:
            return rd.from_arrow(snap_schema.empty_table())
        from ..stages.deletevec import mapped_read, read_files

        want = list(columns) if columns is not None else list(snap_schema.names)
        out_schema = pa.schema([snap_schema.field(n) for n in want])
        pad = {k: v for k, v in defaults.items() if k in want}
        if aliases or dropped or any(f.delete_path for f in files):
            # fully general per-file reader: delete masks, renamed columns
            # mapped from their physical names, dropped columns never
            # projected, added columns padded
            return mapped_read(self, files, want, out_schema, pad, aliases, **read_kwargs)
        evolved = [n for n in snap_schema.names if n in defaults]
        if evolved and (columns is None or any(c in defaults for c in columns)):
            # ADD-only evolution: old files lack evolved columns — read the
            # physical ones row-group-parallel, pad the rest per batch
            # (write-time materialization happens at the next rewrite)
            physical = [c for c in want if c not in defaults]
            ds = read_files(self, files, columns=physical or None, **read_kwargs)

            def pad_batch(t: pa.Table) -> pa.Table:
                return ensure_schema(t, out_schema, defaults=pad)

            return ds.map_batches(pad_batch, batch_format="pyarrow")
        return read_files(self, files, columns=columns, **read_kwargs)

    def read_all(self, snapshot_id: int | None = None) -> pa.Table:
        """Driver-side full read (tests / small tables only)."""
        from ..stages.deletevec import apply_deletes, read_delete_positions

        snap_schema = self.schema_of(snapshot_id)
        defaults = self.defaults_of(snapshot_id)
        aliases = self.aliases_of(snapshot_id)
        files = self.files(snapshot_id)
        if not files:
            return snap_schema.empty_table()
        tables = []
        for f in files:
            p = f.path if os.path.isabs(f.path) else self._p(f.path)
            t = pq.read_table(io.BytesIO(self.fsa.read_bytes(p)))
            if f.delete_path:
                t = apply_deletes(
                    t, read_delete_positions(self._p(f.delete_path), self.fsa)
                )
            tables.append(ensure_schema(t, snap_schema, defaults=defaults, aliases=aliases))
        return pa.concat_tables(tables)
