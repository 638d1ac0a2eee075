"""Continuous ingest with dedup AND maintained views — one lineage.

The full curation loop (VERDICT r3 #7) as a single flow per arriving batch:

  probe (persisted Jaccard index) -> greedy survivor selection ->
  APPEND survivors (one snapshot commit) -> extend the index ->
  changelog-driven view refresh (:mod:`..stages.incremental`).

Store layout under ``store_root``:

* ``table/``            — :class:`..state.manifest.TranscriptTable` holding the
  accepted corpus; exactly ONE append commit per ingest batch (the commit is
  the flow's unit of lineage — ``lineage/s{N}/`` records the batch's files).
* ``jindex/``           — prefix-posting Jaccard index over accepted docs.
* ``view/s{N}/``        — the maintained per-key count view, one directory
  per snapshot it is valid at (old dirs are kept until the next refresh
  lands, so a reader never observes a half-written view).
* ``flow_state.json``   — ``{"indexed_snapshot": N, "view_snapshot": N}``.

Crash-resume contract: the TABLE commit is the source of truth; index and
view each record the snapshot they are valid at.  Every call starts with a
CATCH-UP step — if the table is ahead (a previous run crashed after the
append but before the derived-state updates), the changelog between the
recorded and current snapshots is replayed forward BEFORE the new batch is
probed.  Catch-up is idempotent: re-extending the same rows only duplicates
postings/df-deltas, which the probe's pair-dedup and any-prefix
completeness tolerate by construction, and the view refresh recomputes from
the last durably-recorded base.  Same single-ingester contract as
:mod:`.incremental_ingest` (batch N+1's probe must see batch N's
survivors); the table's commits themselves stay CAS-protected.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.jaccard_index import (
    set_index_ref,
    build_jaccard_index,
    extend_jaccard_index,
    probe_jaccard_index,
)
from ..stages.incremental import incremental_key_counts
from ..state.manifest import TranscriptTable
from .incremental_ingest import _survivors

_TABLE = "table"
_INDEX = "jindex"
_VIEW = "view"
_STATE = "flow_state.json"


def _state_path(store_root: str) -> str:
    return os.path.join(store_root, _STATE)


def _read_state(store_root: str) -> dict:
    p = _state_path(store_root)
    if not os.path.exists(p):
        return {"indexed_snapshot": 0, "view_snapshot": 0}
    with open(p) as f:
        return json.load(f)


def _write_state(store_root: str, state: dict) -> None:
    tmp = _state_path(store_root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _state_path(store_root))


def _pa_schema(ds) -> pa.Schema:
    """Arrow schema of a Dataset (from one real batch — ``Dataset.schema()``
    reports python types for pandas-block datasets)."""
    for b in ds.iter_batches(batch_size=1, batch_format="pyarrow"):
        schema = b.schema
        # normalize large_string -> string so downstream writers/oracles agree
        fields = [
            pa.field(f.name, pa.string()) if f.type == pa.large_string() else f
            for f in schema
        ]
        return pa.schema(fields)
    raise ValueError("cannot infer schema from an empty batch")


def _view_dir(store_root: str, snapshot_id: int) -> str:
    return os.path.join(store_root, _VIEW, f"s{snapshot_id:06d}")


def read_view(store_root: str, view_key: str, count_col: str = "n_docs"):
    """The maintained view at the snapshot it was last refreshed to."""
    import ray.data as rd

    state = _read_state(store_root)
    vdir = _view_dir(store_root, state["view_snapshot"])
    if not os.path.isdir(vdir):
        return rd.from_arrow(
            pa.table({view_key: pa.array([], pa.string()), count_col: pa.array([], pa.int64())})
        )
    return rd.read_parquet(vdir)


def _refresh_view(
    table: TranscriptTable, store_root: str, state: dict, view_key: str, count_col: str
) -> None:
    """Bring the view from ``state['view_snapshot']`` to the table's current
    snapshot by applying only the changelog delta; durable once the new view
    directory is fully written and the state file swapped."""
    cur = table.current_snapshot_id()
    base_snap = state["view_snapshot"]
    if base_snap == cur:
        return
    base = read_view(store_root, view_key, count_col)
    new_view = incremental_key_counts(
        table, base_snap, cur, base, key_col=view_key, count_col=count_col
    ).materialize()
    vdir = _view_dir(store_root, cur)
    if new_view.count():
        new_view.write_parquet(vdir)
    else:
        os.makedirs(vdir, exist_ok=True)
    state["view_snapshot"] = cur
    _write_state(store_root, state)


def _catch_up_index(
    table: TranscriptTable, store_root: str, state: dict, id_col: str, text_col: str
) -> None:
    """Replay changelog inserts into the index after a crash between the
    append commit and the extend (idempotent; see module docstring)."""
    from ..stages.changelog import changelog

    cur = table.current_snapshot_id()
    if state["indexed_snapshot"] == cur:
        return
    index_dir = os.path.join(store_root, _INDEX)
    delta = changelog(table, state["indexed_snapshot"], cur)

    def inserts(b: pd.DataFrame) -> pd.DataFrame:
        return b[b["op"] == "insert"][[id_col, text_col]]

    rows = delta.map_batches(inserts, batch_format="pandas").materialize()
    if rows.count():
        extend_jaccard_index(rows, index_dir, id_col=id_col, text_col=text_col)
    set_index_ref(index_dir, f"s{cur}")
    state["indexed_snapshot"] = cur
    _write_state(store_root, state)


def ingest_with_views(
    store_root: str,
    batch_ds,
    *,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    view_key: str = "lang",
    count_col: str = "n_docs",
    shingle_k: int = 5,
    n_buckets: int = 256,
) -> dict:
    """Run one ingest batch through the composed flow; returns stats.

    First call creates the store (table with the batch's schema, empty
    index, empty view).  Subsequent calls catch up any derived state the
    previous run failed to land, then probe -> append -> extend -> refresh.
    """
    import ray.data as rd

    from ..stages.append import append_dataset

    os.makedirs(store_root, exist_ok=True)
    table_root = os.path.join(store_root, _TABLE)
    index_dir = os.path.join(store_root, _INDEX)
    batch_ds = batch_ds.materialize()

    from ..schema import schema_from_json, schema_to_json

    if not os.path.exists(os.path.join(table_root, "_latest")):
        schema = _pa_schema(batch_ds)
        table = TranscriptTable.create(table_root, schema=schema)
        build_jaccard_index(
            rd.from_arrow(
                pa.table({id_col: pa.array([], pa.int64()), text_col: pa.array([], pa.string())})
            ),
            index_dir,
            id_col=id_col,
            text_col=text_col,
            shingle_k=shingle_k,
            n_buckets=n_buckets,
        )
        set_index_ref(index_dir, f"s{table.current_snapshot_id()}")
        state = {
            "indexed_snapshot": table.current_snapshot_id(),
            "view_snapshot": table.current_snapshot_id(),
            # the store's base schema travels in the flow state so a fresh
            # process reopens the table with the right logical schema
            # (schema_fields on snapshots only exist once evolved)
            "schema": schema_to_json(schema),
        }
        _write_state(store_root, state)
    else:
        state = _read_state(store_root)
        table = TranscriptTable(table_root, schema=schema_from_json(state["schema"]))

    # ---- catch-up: land whatever a crashed run left behind
    _catch_up_index(table, store_root, state, id_col, text_col)
    _refresh_view(table, store_root, state, view_key, count_col)
    pre_snap = table.current_snapshot_id()

    # ---- probe the batch against accepted history + itself
    cols = [id_col, text_col]
    # normalize the SMALL side (the incoming batch, bounded) to the scan's
    # Arrow schema so the union is Arrow-native — never an identity pass
    # over the table-sized scan side
    tgt = pa.schema([table.schema.field(c) for c in cols])

    def to_scan_schema(b: pa.Table) -> pa.Table:
        return b.select(cols).cast(tgt)

    batch_arrow = batch_ds.select_columns(cols).map_batches(
        to_scan_schema, batch_format="pyarrow"
    )
    corpus = table.scan(columns=cols).union(batch_arrow)
    pairs = probe_jaccard_index(
        batch_ds, index_dir, corpus, threshold=threshold, id_col=id_col, text_col=text_col
    ).to_pandas()
    batch_ids = (
        batch_ds.map_batches(lambda b: pd.DataFrame({"i": b[id_col]}), batch_format="pandas")
        .to_pandas()["i"]
        .to_numpy()
    )
    kept_ids, drops = _survivors(batch_ids, pairs)
    kept_ref = np.array(sorted(kept_ids), dtype=np.int64)

    def keep_only(b: pd.DataFrame) -> pd.DataFrame:
        return b[np.isin(b[id_col].to_numpy(), kept_ref)]

    survivors = batch_ds.map_batches(keep_only, batch_format="pandas").materialize()
    n_kept = survivors.count()

    # ---- the ONE commit of the flow
    if n_kept:
        snap = append_dataset(table, survivors)
        # ---- derived state (crash anywhere below -> next call catches up)
        extend_jaccard_index(
            survivors.select_columns(cols), index_dir, id_col=id_col, text_col=text_col
        )
        # pin this snapshot's index state: a reader at table snapshot s(N)
        # probes the index version named s{N} (compaction keeps its files)
        set_index_ref(index_dir, f"s{snap.snapshot_id}")
        state["indexed_snapshot"] = snap.snapshot_id
        _write_state(store_root, state)
        # index maintenance rides the ingest cadence: merge a bucket's
        # accumulated extend fragments once it holds >= 8 files (no-op
        # scan otherwise; crash-safe — see compact_jaccard_index)
        from ..functions.jaccard_index import compact_jaccard_index

        compact_jaccard_index(index_dir, min_files_per_bucket=8)
    _refresh_view(table, store_root, state, view_key, count_col)

    return {
        "snapshot": table.current_snapshot_id(),
        "pre_snapshot": pre_snap,
        "n_batch": int(len(batch_ids)),
        "n_kept": int(n_kept),
        "n_dropped": int(len(batch_ids) - n_kept),
        "drops": drops,
    }


def verify_index_coverage(store_root: str, id_col: str = "doc_id") -> dict:
    """Consistency check between the TABLE's doc set and the INDEX's doc
    set — the invariant the flow maintains (every accepted doc indexed,
    nothing indexed that the table doesn't hold).  Keys-only plan (the
    anti-join machinery's shape): both sides map-side dedup to distinct
    ids, one bucketed exchange computes the symmetric difference, and only
    COUNTS plus a bounded sample return to the driver.  Run it after
    catch-up (a crash between append and extend legitimately leaves
    missing docs until the next flow call heals them)."""
    import ray.data as rd

    from ..functions.jaccard_index import _existing_buckets, _partition_paths, _POSTINGS

    state = _read_state(store_root)
    from ..schema import schema_from_json

    table = TranscriptTable(
        os.path.join(store_root, _TABLE), schema=schema_from_json(state["schema"])
    )
    index_dir = os.path.join(store_root, _INDEX)
    paths = _partition_paths(index_dir, _POSTINGS, _existing_buckets(index_dir, _POSTINGS))

    def keys_of(col, side):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            k = pd.unique(b[col])
            return pd.DataFrame(
                {"k": k, "side": np.full(len(k), side, dtype=np.int8)}
            )

        return f

    table_ids = table.scan(columns=[id_col]).map_batches(
        keys_of(id_col, 0), batch_format="pandas"
    )
    both = table_ids
    if paths:
        import ray.data

        idx_ids = ray.data.read_parquet(paths, columns=["doc"]).map_batches(
            keys_of("doc", 1), batch_format="pandas"
        )
        both = both.union(idx_ids)

    def add_bkt(b: pd.DataFrame) -> pd.DataFrame:
        if "k" not in b.columns:
            return pd.DataFrame(
                {"k": pd.Series(dtype=np.int64), "side": pd.Series(dtype=np.int8),
                 "__bkt": pd.Series(dtype=np.int64)}
            )
        h = pd.util.hash_pandas_object(b["k"], index=False).to_numpy(dtype=np.uint64)
        b = b.copy()
        b["__bkt"] = (h % 64).astype(np.int64)
        return b

    def sym_diff(g: pd.DataFrame) -> pd.DataFrame:
        if "k" not in g.columns:
            return pd.DataFrame({"k": pd.Series(dtype=np.int64), "where": pd.Series(dtype=object)})
        t = set(g.loc[g["side"] == 0, "k"])
        i = set(g.loc[g["side"] == 1, "k"])
        rows = [(k, "missing_from_index") for k in t - i] + [
            (k, "extra_in_index") for k in i - t
        ]
        return pd.DataFrame(rows, columns=["k", "where"])

    diff = (
        both.map_batches(add_bkt, batch_format="pandas")
        .groupby("__bkt")
        .map_groups(sym_diff, batch_format="pandas")
        .to_pandas()
    )
    if "where" not in diff.columns:
        diff = pd.DataFrame({"k": [], "where": []})
    missing = diff[diff["where"] == "missing_from_index"]["k"]
    extra = diff[diff["where"] == "extra_in_index"]["k"]
    return {
        "consistent": len(diff) == 0,
        "missing_from_index": int(len(missing)),
        "extra_in_index": int(len(extra)),
        "sample_missing": sorted(int(x) for x in missing.head(10)),
        "sample_extra": sorted(int(x) for x in extra.head(10)),
    }


def expire_views(store_root: str, keep: int = 2) -> dict:
    """GC old view snapshots: every refresh writes a NEW ``view/s{N}``
    directory (readers never observe a half-written view), so a long-lived
    store accumulates them.  Keep the ``keep`` newest; the CURRENT view
    (``state['view_snapshot']``) is always retained regardless.  The same
    mark-and-sweep contract as snapshot expiry: delete only what no reader
    can reach through the state file."""
    import shutil

    state = _read_state(store_root)
    vroot = os.path.join(store_root, _VIEW)
    if not os.path.isdir(vroot):
        return {"removed": 0, "kept": 0}
    dirs = sorted(d for d in os.listdir(vroot) if d.startswith("s"))
    current = f"s{state['view_snapshot']:06d}"
    keep_set = set(dirs[-keep:]) | {current}
    removed = 0
    for d in dirs:
        if d not in keep_set:
            shutil.rmtree(os.path.join(vroot, d), ignore_errors=True)
            removed += 1
    return {"removed": removed, "kept": len(keep_set & set(dirs))}
