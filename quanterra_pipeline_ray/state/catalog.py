"""Catalog: multi-table namespace with atomic cross-table transactions.

The reference pipeline updates several datasets per flow run (prices,
fundamentals, macro — reference `src/orchestration/pipelines/ingest/
eodhd_pipeline.py:18-70`) with no cross-dataset atomicity: a crash between
two stores leaves them inconsistent.  Here that gap is closed the lakehouse
way (the catalog-level commit of Iceberg/Nessie): a catalog pins every
member table to a snapshot id, and the pin map itself is versioned through
the same CAS-create commit primitive the tables use:

```
<root>/
  tables/<name>/            ordinary TranscriptTable roots
  versions/v<NNNN>.json     {"tables": {name: snapshot_id}, "parent": ...}
  _latest                   advisory cache of the current version
```

* Readers that resolve snapshots through :meth:`Catalog.pins` /
  :meth:`Catalog.scan` see one consistent version across ALL tables.
* A :class:`Transaction` runs ordinary table ops (append / MERGE / DELETE /
  evolve — each commits table-level snapshots as usual), then publishes one
  new catalog version pinning every touched table's final snapshot.  The
  version CAS is the commit point: catalog readers observe all of the
  transaction's tables move together, or none.
* A crashed transaction leaves only table-level snapshots no catalog
  version references — invisible to catalog readers, swept by snapshot
  expiry like any orphan.
* Conflicts: losing the version CAS re-reads the latest version; if a
  concurrent transaction moved any of OUR touched tables, a
  :class:`TransactionConflict` surfaces (the caller re-runs the
  transaction); otherwise the untouched tables' newer pins are merged in
  and the CAS retried — disjoint transactions serialize without blocking
  each other.

Driver-side state is O(tables), never data — the multi-node story is the
same as the table commit's: any committer may run anywhere; the CAS
primitive (`state/fs.py write_if_absent`) is the only coordination point.
"""

from __future__ import annotations

import json
import os
from typing import Any, Iterable

from .fs import LOCAL, StorageAdapter
from .manifest import TranscriptTable, _atomic_write

_LATEST = "_latest"


class TransactionConflict(Exception):
    """A concurrent transaction moved one of this transaction's tables."""


class Catalog:
    def __init__(self, root: str, fs: StorageAdapter | None = None):
        self.root = root
        self.fsa = fs or LOCAL
        self._tables: dict[str, TranscriptTable] = {}

    def _p(self, *parts: str) -> str:
        return os.path.join(self.root, *parts)

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(cls, root: str, fs: StorageAdapter | None = None) -> "Catalog":
        cat = cls(root, fs)
        for d in ("tables", "versions"):
            cat.fsa.makedirs(cat._p(d))
        cat._commit_version({}, parent=None, summary={"op": "create"})
        return cat

    @classmethod
    def load(cls, root: str, fs: StorageAdapter | None = None) -> "Catalog":
        return cls(root, fs)

    # ------------------------------------------------------------- versions
    def current_version(self) -> int:
        """Authoritative: the ``versions/`` listing (the CAS-created version
        file IS the commit point); ``_latest`` is advisory only."""
        names = [
            os.path.basename(p)
            for p in self.fsa.listdir(self._p("versions"))
            if os.path.basename(p).startswith("v")
        ]
        if not names:
            raise FileNotFoundError(f"no catalog versions under {self.root}")
        return max(int(n[1:].split(".")[0]) for n in names)

    def version_doc(self, version: int | None = None) -> dict[str, Any]:
        v = self.current_version() if version is None else version
        return json.loads(self.fsa.read_bytes(self._p("versions", f"v{v:06d}.json")))

    def pins(self, version: int | None = None) -> dict[str, int]:
        """``{table_name: snapshot_id}`` at a catalog version — one
        consistent cross-table view."""
        return dict(self.version_doc(version)["tables"])

    def history(self) -> list[dict[str, Any]]:
        return [self.version_doc(v) for v in range(self.current_version() + 1)]

    def _commit_version(
        self, pins: dict[str, int], parent: int | None, summary: dict[str, Any]
    ) -> int:
        vid = 0 if parent is None else parent + 1
        doc = {"version": vid, "parent": parent, "tables": dict(sorted(pins.items())), "summary": summary}
        created = self.fsa.write_if_absent(
            self._p("versions", f"v{vid:06d}.json"),
            json.dumps(doc, sort_keys=True).encode(),
        )
        if not created:
            raise TransactionConflict(f"catalog version v{vid} already committed")
        _atomic_write(self._p(_LATEST), str(vid).encode(), self.fsa)
        return vid

    # --------------------------------------------------------------- tables
    def table_names(self, version: int | None = None) -> list[str]:
        return sorted(self.pins(version))

    def table(self, name: str) -> TranscriptTable:
        if name not in self._tables:
            self._tables[name] = TranscriptTable(self._p("tables", name), fs=self.fsa)
        return self._tables[name]

    def create_table(self, name: str) -> TranscriptTable:
        if name in self.pins():
            raise ValueError(f"table {name!r} already exists")
        t = TranscriptTable.create(self._p("tables", name), fs=self.fsa)
        self._tables[name] = t
        for _ in range(16):
            parent = self.current_version()
            pins = self.pins(parent)
            pins[name] = t.current_snapshot_id()
            try:
                self._commit_version(pins, parent, {"op": "create_table", "table": name})
                return t
            except TransactionConflict:
                if name in self.pins():
                    raise ValueError(f"table {name!r} already exists") from None
        raise TransactionConflict(f"could not register table {name!r}")

    def scan(self, name: str, version: int | None = None, **kw):
        """Scan a table AT the catalog version's pin (cross-table-consistent)."""
        return self.table(name).scan(snapshot_id=self.pins(version)[name], **kw)

    def read_all(self, name: str, version: int | None = None):
        return self.table(name).read_all(snapshot_id=self.pins(version)[name])

    def transaction(self) -> "Transaction":
        return Transaction(self)


class Transaction:
    """Cross-table atomic commit: run table ops, then publish one version.

    Usage::

        txn = catalog.transaction()
        merge_into(txn.table("a"), updates)        # ordinary table ops
        delete_where_vector(txn.table("b"), pred)
        txn.commit()                               # all-or-nothing publish

    ``txn.table(name)`` records the table's base pin on first touch; commit
    publishes every touched table's CURRENT snapshot.  Catalog readers never
    observe a partially-applied transaction — table-level snapshots written
    before a crash are unreferenced by any version and cost only storage
    until expiry."""

    def __init__(self, catalog: Catalog):
        self.catalog = catalog
        self.base_version = catalog.current_version()
        self._base_pins = catalog.pins(self.base_version)
        self._touched: dict[str, int] = {}  # name -> base snapshot id
        self._done = False

    def table(self, name: str) -> TranscriptTable:
        t = self.catalog.table(name)
        if name not in self._touched:
            if name not in self._base_pins:
                raise KeyError(f"unknown table {name!r} at catalog v{self.base_version}")
            self._touched[name] = self._base_pins[name]
        return t

    def commit(self, summary: dict[str, Any] | None = None, max_retries: int = 16) -> int:
        if self._done:
            raise RuntimeError("transaction already committed")
        new_pins = {
            name: self.catalog.table(name).current_snapshot_id() for name in self._touched
        }
        for _ in range(max_retries + 1):
            parent = self.catalog.current_version()
            pins = self.catalog.pins(parent)
            stale = {
                n: pins.get(n)
                for n in self._touched
                if pins.get(n) != self._base_pins.get(n)
            }
            if stale:
                raise TransactionConflict(
                    f"tables moved since v{self.base_version}: {stale} — re-run the transaction"
                )
            pins.update(new_pins)
            try:
                vid = self.catalog._commit_version(
                    pins,
                    parent,
                    {"op": "transaction", "touched": sorted(self._touched), **(summary or {})},
                )
                self._done = True
                return vid
            except TransactionConflict:
                continue  # disjoint txn landed: merge its pins and retry
        raise TransactionConflict("catalog version CAS kept losing; giving up")
