"""MERGE INTO (upsert / delete) for the transcripts table.

Makes explicit the reference's only merge semantic — last-writer-wins
overwrite at a deterministic storage key (reference
`src/models/data/eodhd_models.py:29-32` + blob overwrite at
`src/clients/google_cloud_storage_client.py:74`) and its or-fallback source
precedence (`eodhd_pipeline.py:54-63`) — as a keyed MERGE on
``(conv_id, turn_idx)``:

* source row with matching key replaces the target row (source wins),
* source row with new key is inserted,
* source row with ``__op == 'delete'`` removes the target row,
* duplicate source keys resolve deterministically (max ``(ts, text)`` wins) —
  a pure function of the group, so checkpoint replays commute.

Partition pruning: only data files whose ``conv_id`` [min, max] stats
intersect the source key set are rewritten; all other files carry into the
new snapshot untouched.

Two physical plans, selected by source size:

* **hash-shuffle** (general, both sides large): both sides are tagged
  ``__src``/``__del``, hash-bucketed on ``conv_id`` (``__bucket = hash %
  B``), and resolved per bucket by a vectorized Arrow kernel — the
  groupby-on-conv_id anti/semi join.  Bucket count B bounds per-group
  memory; hot conversations share a bucket only with ~1/B of the table.
  The exchange itself is the deterministic two-stage map-reduce
  (:func:`_merge_direct_exchange`, default) — Ray Data's sort exchange is
  kept as ``exchange='sort'`` for comparison and produces bit-identical
  output.
* **broadcast** (source below threshold): source is ``ray.put`` once; each
  touched file is an independent task that resolves its own rows against the
  broadcast source (semi/anti join, NO shuffle); unmatched source keys are
  written by the driver as insert files.
"""

from __future__ import annotations

import json
import time
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ..schema import TRANSCRIPTS_SCHEMA, ensure_schema, schema_from_json, schema_to_json
from ..state.checkpoint import Checkpoint
from ..state.lineage import lineage_record, store_lineage
from ..state.manifest import DataFile, Snapshot, TranscriptTable, write_data_file
from .skew import key_hash64

KEY = ["conv_id", "turn_idx"]
OP_COL = "__op"


def _normalize_source(
    source: pa.Table,
    schema: pa.Schema = TRANSCRIPTS_SCHEMA,
    defaults: dict | None = None,
) -> pa.Table:
    """Cast source to schema + optional __op column (default 'upsert')."""
    ops = (
        source.column(OP_COL).cast(pa.string())
        if OP_COL in source.column_names
        else pa.array(["upsert"] * source.num_rows, type=pa.string())
    )
    body = ensure_schema(
        source.drop_columns([OP_COL]) if OP_COL in source.column_names else source,
        schema,
        defaults=defaults,
    )
    return body.append_column(OP_COL, ops)


def _composite_key(t: pa.Table) -> pa.Array:
    """Vectorized composite (conv_id, turn_idx) key as a single binary column
    (Arrow C++ kernel; '\\x1f' cannot appear in a decimal turn_idx)."""
    import pyarrow.compute as pc

    return pc.binary_join_element_wise(
        t.column("conv_id").cast(pa.string()),
        pc.cast(t.column("turn_idx"), pa.string()),
        "\x1f",
    ).combine_chunks()


def _dedupe_source(src: pd.DataFrame) -> pd.DataFrame:
    """Deterministic tiebreak for duplicate source keys: max (ts, text) wins."""
    if src.duplicated(KEY).any():
        src = src.sort_values(KEY + ["ts", "text"], kind="mergesort").drop_duplicates(
            KEY, keep="last"
        )
    return src


def _dedupe_source_table(t: pa.Table) -> pa.Table:
    """Arrow-native :func:`_dedupe_source` for the broadcast path's
    driver-side source.

    The pandas version costs a full to_pandas -> from_pandas round trip of
    the whole source (two copies + string boxing of the text column) even
    when no key is duplicated — pure driver-serial time.  Here duplicate
    candidates are found on a uint64 key hash (no conversion at all), and
    only that (typically tiny or empty) subset is converted for the exact
    max-(ts, text)-wins tiebreak.  Hash collisions only ever ADD rows to the
    candidate subset; the tiebreak itself compares real key values.
    """
    from .skew import _splitmix64

    h = key_hash64(t.column("conv_id"))
    ti = (
        t.column("turn_idx").cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
    )
    proxy = _splitmix64(h ^ (ti * np.uint64(0x9E3779B97F4A7C15)))
    dup = pd.Series(proxy).duplicated(keep=False).to_numpy()
    if not dup.any():
        return t
    idx = np.flatnonzero(dup)
    sub = t.take(pa.array(idx)).to_pandas()
    sub["__orig"] = idx
    sub = sub.sort_values(KEY + ["ts", "text"], kind="mergesort").drop_duplicates(
        KEY, keep="last"
    )
    keep = np.ones(t.num_rows, dtype=bool)
    keep[idx] = False
    keep[sub["__orig"].to_numpy()] = True
    return t.filter(pa.array(keep))


def _resolve(tgt: pd.DataFrame, src: pd.DataFrame) -> pd.DataFrame:
    """Pure vectorized MERGE resolution: returns the merged rows (pandas)."""
    src = _dedupe_source(src)
    if len(tgt):
        flags = tgt[KEY].merge(src[KEY], on=KEY, how="left", indicator=True)["_merge"].to_numpy()
        tgt = tgt[flags == "left_only"]
    ins = src[src[OP_COL] != "delete"].drop(columns=[OP_COL])
    out = pd.concat([tgt, ins], ignore_index=True)
    return out.sort_values(KEY, kind="mergesort")


def _source_token(source: "pa.Table | Any") -> str:
    """Order-independent content hash of the source's key/ts/op columns.

    Folded into checkpoint op_ids so that two merges against the same base
    snapshot with DIFFERENT sources never share checkpoint records (the
    resumability contract in :mod:`..state.checkpoint` requires the op id to
    be a pure function of base snapshot + source content + parameters).
    Computed distributedly for Dataset sources; the driver sees one uint64
    per block (wrap-add is commutative, so block order doesn't matter).
    """
    from .skew import _splitmix64, key_hash64

    def batch_token(t: pa.Table) -> pa.Table:
        h = key_hash64(t.column("conv_id"))
        ti = t.column("turn_idx").cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
        ts = t.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64)
        row = h ^ (ti * np.uint64(0x9E3779B97F4A7C15)) ^ _splitmix64(ts)
        if OP_COL in t.column_names:
            row ^= key_hash64(t.column(OP_COL).cast(pa.string()))
        tok = int(_splitmix64(row).sum(dtype=np.uint64))
        return pa.table({"tok": pa.array([tok], type=pa.uint64())})

    if isinstance(source, pa.Table):
        # driver-side Table: hash the raw Arrow buffers of the key/ts/op
        # columns directly (C-speed, no per-row work).  Order-dependent is
        # fine here — the Table's row order is part of its identity.
        import hashlib

        h = hashlib.sha256()
        cols = ["conv_id", "turn_idx", "ts"] + ([OP_COL] if OP_COL in source.column_names else [])
        for name in cols:
            col = source.column(name)
            chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
            for c in chunks:
                for buf in c.buffers():
                    if buf is not None:
                        h.update(buf)
        return h.hexdigest()[:16]
    toks = (
        source.map_batches(batch_token, batch_format="pyarrow")
        .to_pandas()["tok"]
        .to_numpy(dtype=np.uint64)
    )
    return f"{np.uint64(toks.sum(dtype=np.uint64)):016x}"


def prune_touched_files(files: list[DataFile], source_conv_ids: np.ndarray) -> list[DataFile]:
    """Files whose key stats admit at least one source conversation.

    Three tests, cheapest-first, whichever stats a file carries:
    * ``conv_hash32`` [min,max] — written by the Z-order/Hilbert writer;
      hash-clustered files span the full lexical conv_id range, so only the
      hash range prunes there;
    * ``conv_id`` lexical [min,max] — everything else;
    * ``conv_bloom`` membership filter (when present) — refines a passing
      range test to ~per-conversation precision (false positives only, so
      pruning stays sound).
    Files with no stats are assumed touched.
    """
    from ..state.bloom import bloom_any
    from .skew import key_hash64
    from .zorder import conv_hash32

    keys = np.sort(np.asarray(source_conv_ids, dtype=object))
    hashes = np.sort(conv_hash32(keys)) if len(keys) else np.array([], dtype=np.uint64)
    h64 = key_hash64(keys) if len(keys) else np.array([], dtype=np.uint64)
    touched = []
    for f in files:
        in_range = None
        hstats = f.stats.get("conv_hash32")
        if hstats is not None:
            lo = np.searchsorted(hashes, np.uint64(hstats[0]), side="left")
            hi = np.searchsorted(hashes, np.uint64(hstats[1]), side="right")
            in_range = lo < hi
        else:
            stats = f.stats.get("conv_id")
            if stats is not None:
                lo = np.searchsorted(keys, stats[0], side="left")
                hi = np.searchsorted(keys, stats[1], side="right")
                in_range = lo < hi
        if in_range is None:
            touched.append(f)  # no stats -> must assume touched
            continue
        if not in_range:
            continue
        bloom = f.stats.get("conv_bloom")
        if bloom is not None and not bloom_any(bloom, h64):
            continue
        touched.append(f)
    return touched


# ---------------------------------------------------------------- shuffle plan
def _resolve_arrow(
    tgt: pa.Table, src: pa.Table, del_col: str = "__del", schema: pa.Schema = TRANSCRIPTS_SCHEMA
) -> pa.Table:
    """Arrow-native MERGE resolution.

    Only the composite KEY column (plus ts for tiebreaks) ever touches
    pandas — the wide ``text`` column stays in Arrow, which is what keeps the
    shuffle plan from being pandas-conversion-bound at scale.
    Semantics identical to :func:`_resolve`: source wins on key match,
    duplicate source keys resolve to max ``(ts, text)``, deletes drop rows.
    """
    import pyarrow.compute as pc

    skey = pd.Series(_composite_key(src).to_pandas()) if src.num_rows else pd.Series([], dtype=object)
    if src.num_rows and skey.duplicated().any():
        ts = src.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = pd.DataFrame({"k": skey, "ts": ts}).reset_index()
        dup_keys = set(skey[skey.duplicated(keep=False)])
        # text tiebreak only for rows whose (key, ts) still ties — rare
        in_dup = order["k"].isin(dup_keys)
        text_tb = pd.Series("", index=order.index, dtype=object)
        if in_dup.any():
            text_tb[in_dup] = (
                src.column("text").take(pa.array(order.index[in_dup].to_numpy())).to_pylist()
            )
        order["txt"] = text_tb
        keep_idx = (
            order.sort_values(["k", "ts", "txt"], kind="mergesort")
            .drop_duplicates("k", keep="last")["index"]
            .to_numpy()
        )
        keep_idx.sort()
        src = src.take(pa.array(keep_idx))
        skey = skey.iloc[keep_idx].reset_index(drop=True)
    if tgt.num_rows and src.num_rows:
        tkey = _composite_key(tgt)
        drop = pc.is_in(tkey, value_set=pa.array(skey.to_numpy(), type=pa.binary()).cast(tkey.type))
        tgt = tgt.filter(pc.invert(drop))
    if src.num_rows:
        ins = src.filter(pc.equal(src.column(del_col), 0)).drop_columns([del_col])
        from ..schema import ensure_schema as _ensure

        parts = [t for t in (tgt, _ensure(ins, schema)) if t.num_rows] or [tgt]
        return pa.concat_tables(parts) if len(parts) > 1 else parts[0]
    return tgt


def _make_bucket_resolver(
    root: str, target_rows: int, ckpt_dir: str, base_snapshot: int, schema_json: list | None = None
):
    def resolve_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"record": pa.array([], type=pa.string())})
        import pyarrow.compute as pc

        schema = schema_from_json(schema_json) if schema_json else TRANSCRIPTS_SCHEMA
        t0 = time.monotonic()
        bucket = int(group.column("__bucket")[0].as_py())
        src_mask = pc.equal(group.column("__src"), 1)
        tgt = group.filter(pc.invert(src_mask)).drop_columns(["__src", "__bucket", "__del"])
        src = group.filter(src_mask).drop_columns(["__src", "__bucket"])
        merged = _resolve_arrow(tgt, src, schema=schema)
        outs = []
        for off in range(0, max(merged.num_rows, 1), target_rows):
            chunk = merged.slice(off, target_rows)
            if chunk.num_rows:
                outs.append(write_data_file(chunk, root, schema=schema))
        lin = lineage_record(
            op="merge",
            partition_id=bucket,
            inputs=[{"snapshot": base_snapshot}],
            outputs=[{"path": o.path, "checksum": o.checksum} for o in outs],
            rows_in=group.num_rows,
            rows_out=sum(o.rows for o in outs),
            duration_s=time.monotonic() - t0,
        )
        record = {"datafiles": [o.to_json() for o in outs], "lineage": lin}
        Checkpoint.write_record(ckpt_dir, bucket, record)
        return pa.table({"record": pa.array([json.dumps(record)], type=pa.string())})

    return resolve_bucket


class _BucketTagger:
    """Adds __bucket = hash(conv_id) % B (vectorized, deterministic)."""

    def __init__(self, num_buckets: int):
        self.b = np.uint64(num_buckets)

    def __call__(self, t: pa.Table) -> pa.Table:
        bucket = (key_hash64(t.column("conv_id")) % self.b).astype(np.int64)
        return t.append_column("__bucket", pa.array(bucket, type=pa.int64()))


# -------------------------------------------------------------- broadcast plan
def _make_merge_file_task(source_ref):
    """Per-file task factory; the broadcast source's ObjectRef is captured in
    the closure so Ray ships ownership metadata with it (`ray.put` once on the
    driver, `ray.get` zero-copy in every task — no per-task reshipping)."""

    def _merge_file_task(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as pc
        import ray

        # zero-copy read of the broadcast source (Arrow, deduped driver-side);
        # the composite key array is computed once per task, not per file
        src_table: pa.Table = ray.get(source_ref)
        skey = _composite_key(src_table)
        records = []
        for spec_json in batch["spec"]:
            spec = json.loads(spec_json)
            t0 = time.monotonic()
            schema = (
                schema_from_json(spec["schema"]) if spec.get("schema") else TRANSCRIPTS_SCHEMA
            )
            defaults = spec.get("defaults") or {}
            tgt = pq.read_table(spec["path"])
            if spec.get("delete"):  # positional-delete sidecar: the rewrite
                # materializes it (output file carries no sidecar)
                from .deletevec import apply_deletes, read_delete_positions

                tgt = apply_deletes(tgt, read_delete_positions(spec["delete"]))
            tgt = ensure_schema(
                tgt, schema, defaults=defaults, aliases=spec.get("aliases") or {}
            )
            tkey = _composite_key(tgt)
            # semi-join: source keys present in THIS file (their update lands here)
            src_hit = pc.is_in(skey, value_set=tkey)
            hits = src_table.filter(src_hit)
            if hits.num_rows:
                hkey = skey.filter(src_hit)
                kept = tgt.filter(pc.invert(pc.is_in(tkey, value_set=hkey)))
                ins = hits.filter(pc.not_equal(hits.column(OP_COL), "delete")).drop_columns(
                    [OP_COL]
                )
                merged = pa.concat_tables([kept, ensure_schema(ins, schema)])
            else:
                merged = tgt
            out = write_data_file(merged, spec["root"], schema=schema)
            matched = {
                "conv_id": hits.column("conv_id").to_pylist(),
                "turn_idx": hits.column("turn_idx").to_pylist(),
            }
            lin = lineage_record(
                op="merge",
                partition_id=spec["file_id"],
                inputs=[{"path": spec["path"], "checksum": spec["checksum"]}],
                outputs=[{"path": out.path, "checksum": out.checksum}],
                rows_in=len(tgt),
                rows_out=out.rows,
                duration_s=time.monotonic() - t0,
            )
            record = {
                "datafiles": [out.to_json()],
                "lineage": lin,
                "matched": matched,
                "removed": [spec["rel_path"]],
            }
            Checkpoint.write_record(spec["ckpt_dir"], spec["file_id"], record)
            records.append(json.dumps(record))
        return pd.DataFrame({"record": records})

    return _merge_file_task


# ----------------------------------------------------------------------- entry
def merge_into(
    table: TranscriptTable,
    source: pa.Table | Any,
    target_rows: int = 200_000,
    num_buckets: int | None = None,
    broadcast_threshold: int = 200_000,
    snapshot_id: int | None = None,
    exchange: str = "direct",
) -> Snapshot:
    """MERGE ``source`` into the table; returns the new snapshot.

    ``source``: Arrow table or Ray Dataset with the transcripts schema plus an
    optional ``__op`` column ('upsert' | 'delete').  Resumable per partition
    (bucket or touched file) via checkpoint records.
    """
    base = table.current_snapshot_id() if snapshot_id is None else snapshot_id
    files = table.files(base)

    if isinstance(source, pa.Table):
        n_src = source.num_rows
        src_convs = pa.compute.unique(source.column("conv_id")).to_numpy(zero_copy_only=False)
    else:  # Ray Dataset: count + distinct keys computed distributedly; only the
        # distinct conv_id list (bounded by touched conversations) reaches the driver
        n_src = source.count()
        # Dataset.unique may return a set (0-d under np.asarray) — normalize
        src_convs = np.asarray(sorted(source.unique("conv_id")), dtype=object)
    touched = prune_touched_files(files, src_convs)
    src_token = _source_token(source)

    # broadcast beats the shuffle whenever the source fits worker memory:
    # the whole plan degenerates to independent per-file rewrite tasks (no
    # all-to-all).  Row threshold OR byte cap (in-memory Arrow size).
    src_bytes = source.nbytes if isinstance(source, pa.Table) else None
    use_broadcast = broadcast_threshold > 0 and (
        n_src <= broadcast_threshold
        or (src_bytes is not None and src_bytes <= 256 * 1024 * 1024)
    )
    snap_schema = table.schema_of(base)
    snap_defaults = table.defaults_of(base)
    if use_broadcast:
        if not isinstance(source, pa.Table):
            batches = list(source.iter_batches(batch_format="pyarrow", batch_size=65536))
            source = (
                pa.concat_tables(batches) if batches else snap_schema.empty_table()
            )
        snap, lineage = _merge_broadcast(
            table,
            _normalize_source(source, snap_schema, snap_defaults),
            touched,
            base,
            target_rows,
            src_token,
        )
    else:
        snap, lineage = _merge_shuffle(
            table, source, touched, base, target_rows, num_buckets, src_token, exchange
        )
    store_lineage(table.root, snap.snapshot_id, lineage)
    return snap


def _merge_broadcast(
    table: TranscriptTable,
    source: pa.Table,
    touched: list[DataFile],
    base: int,
    target_rows: int,
    src_token: str = "",
) -> tuple[Snapshot, list[dict]]:
    import ray
    import ray.data as rd

    op_id = f"merge-bcast-s{base}-{src_token}"
    ckpt = Checkpoint(table.root, op_id)
    done = ckpt.completed()

    # dedupe once driver-side so every task can trust key uniqueness
    # (Arrow-native: no text-column conversion unless keys actually collide)
    source = _dedupe_source_table(source)
    source_ref = ray.put(source)
    items = []
    results: list[dict[str, Any]] = []
    for i, f in enumerate(touched):
        if str(i) in done:
            results.append(done[str(i)])
            continue
        items.append(
            {
                "spec": json.dumps(
                    {
                        "file_id": i,
                        "root": table.root,
                        "path": f.path if f.path.startswith("/") else table._p(f.path),
                        "rel_path": f.path,
                        "checksum": f.checksum,
                        "delete": table._p(f.delete_path) if f.delete_path else None,
                        "ckpt_dir": ckpt.dir,
                        "schema": schema_to_json(table.schema_of(base)),
                        "defaults": table.defaults_of(base),
                        "aliases": table.aliases_of(base),
                    }
                )
            }
        )
    if items:
        ds = rd.from_items(items, override_num_blocks=len(items))
        out = ds.map_batches(
            _make_merge_file_task(source_ref), batch_size=None, batch_format="pandas"
        ).take_all()
        results.extend(json.loads(r["record"]) for r in out)

    # anti-join: source keys matched by no file are inserts (vectorized
    # pandas merge — never per-row tuple materialization)
    matched = pd.DataFrame(
        {
            "conv_id": np.concatenate(
                [np.asarray(r["matched"]["conv_id"], dtype=object) for r in results]
            )
            if results
            else np.array([], dtype=object),
            "turn_idx": np.concatenate(
                [np.asarray(r["matched"]["turn_idx"], dtype=np.int64) for r in results]
            )
            if results
            else np.array([], dtype=np.int64),
        }
    ).drop_duplicates()
    import pyarrow.compute as pc

    # keys-only frame: the text column never enters pandas
    src_keys = pd.DataFrame(
        {
            "conv_id": source.column("conv_id").to_pandas(),
            "turn_idx": source.column("turn_idx").to_pandas().astype(np.int64),
        }
    )
    flags = src_keys.merge(matched, on=KEY, how="left", indicator=True)["_merge"].to_numpy()
    is_new = flags == "left_only"
    not_delete = pc.not_equal(source.column(OP_COL), "delete").to_numpy(zero_copy_only=False)
    inserts_t = source.filter(pa.array(is_new & not_delete)).drop_columns([OP_COL])

    added = [DataFile.from_json(d) for r in results for d in r["datafiles"]]
    lineage = [r["lineage"] for r in results]
    if inserts_t.num_rows:
        for off in range(0, inserts_t.num_rows, target_rows):
            chunk = inserts_t.slice(off, target_rows)
            df = write_data_file(chunk, table.root)
            added.append(df)
            lineage.append(
                lineage_record(
                    op="merge",
                    partition_id=f"inserts-{off}",
                    inputs=[],
                    outputs=[{"path": df.path, "checksum": df.checksum}],
                    rows_in=int(chunk.num_rows),
                    rows_out=df.rows,
                    duration_s=0.0,
                )
            )
    snap = table.commit(
        added,
        removed_paths=[f.path for f in touched],
        operation="merge",
        summary={"plan": "broadcast", "source_rows": source.num_rows, "touched": len(touched)},
        base_snapshot_id=base,
    )
    ckpt.clear()
    return snap, lineage


def _merge_direct_exchange(
    table: TranscriptTable,
    source: "pa.Table | Any",
    touched: list[DataFile],
    base: int,
    target_rows: int,
    num_buckets: int,
    ckpt: Checkpoint,
    done_buckets: set[int],
) -> list[dict]:
    """Deterministic two-stage map-reduce exchange for the shuffle MERGE —
    the same plan that replaced Ray Data's sort exchange in the cluster
    stage (``stages/zorder.py:_direct_exchange``), for the same measured
    reason: ``groupby('__bucket')`` is a SORT exchange (boundary sampling,
    per-block sorts, sorted-run merge, driver-coordinated reduce waves)
    whose machinery a hash-bucketed merge does not need.  On a 35 M-turn /
    ~10 GB-in-memory merge the sort exchange ran 367 s of wall for ~150 s
    of task CPU (stats-profiled; most of the wall is exchange idle), and
    the single-block ``from_arrow`` source serialized the map side.

    Map tasks: read a ~64 MiB chunk of touched files (or a slice of the
    source), tag ``__del``/``__src``, hash-bucket by ``conv_id``, and return
    ``P`` per-bucket slices via ``num_returns=P``.  Reduce tasks: one per
    bucket — concat the slices from every map task and run the SAME
    ``_make_bucket_resolver`` kernel the sort path uses (bit-identical
    output files).  Resume drops completed buckets' slices map-side.
    Multi-node: slices scatter through the object store; each reducer pulls
    only its bucket (all-to-all, no driver-side row data).
    """
    import ray

    P = int(num_buckets)
    fsa = table.fsa
    root, ckpt_dir = table.root, ckpt.dir
    schema = table.schema_of(base)
    schema_json = schema_to_json(schema)
    defaults = table.defaults_of(base)
    aliases = table.aliases_of(base)
    skip = frozenset(int(b) for b in done_buckets)

    def _partition(t: pa.Table) -> tuple:
        """Append __bucket and split into P compact per-bucket slices."""
        bucket = (key_hash64(t.column("conv_id")) % np.uint64(P)).astype(np.int64)
        t = t.append_column("__bucket", pa.array(bucket, type=pa.int64()))
        order = np.argsort(bucket, kind="stable")
        bounds = np.searchsorted(bucket[order], np.arange(P + 1))
        out = []
        for p in range(P):
            s, e = int(bounds[p]), int(bounds[p + 1])
            if e == s or p in skip:
                out.append(None)
            else:
                # take (not slice): compact buffers — each return object
                # carries exactly its bucket's bytes into the store
                out.append(t.take(pa.array(order[s:e])))
        return tuple(out) if P > 1 else out[0]

    def map_files(chunk_specs: list[dict]):
        from .deletevec import apply_deletes, read_delete_positions

        sch = schema_from_json(schema_json)
        tables = []
        for spec in chunk_specs:
            t = pq.read_table(spec["path"], filesystem=fsa.fs)
            if spec["delete"]:
                t = apply_deletes(t, read_delete_positions(spec["delete"], fsa))
            t = ensure_schema(t, sch, defaults=defaults, aliases=aliases)
            tables.append(t)
        big = pa.concat_tables(tables).combine_chunks()
        n = big.num_rows
        big = big.append_column("__del", pa.array(np.zeros(n, dtype=np.int8)))
        big = big.append_column("__src", pa.array(np.zeros(n, dtype=np.int8)))
        return _partition(big)

    def map_source(chunk: pa.Table):
        import pyarrow.compute as pc

        t = _normalize_source(chunk, schema_from_json(schema_json), defaults)
        dele = pc.cast(pc.equal(t.column(OP_COL), "delete"), pa.int8())
        t = t.drop_columns([OP_COL]).append_column("__del", dele)
        t = t.append_column("__src", pa.array(np.ones(t.num_rows, dtype=np.int8)))
        return _partition(t.combine_chunks())

    resolver = _make_bucket_resolver(root, target_rows, ckpt_dir, base, schema_json)

    def reduce_bucket(*slices):
        live = [s for s in slices if s is not None and s.num_rows]
        if not live:
            return None
        rec = resolver(pa.concat_tables(live))
        return rec.column("record")[0].as_py() if rec.num_rows else None

    # ~64 MiB greedy size-balanced file chunks, at least 2 per CPU
    cpus = int(ray.cluster_resources().get("CPU", 4))
    specs = [
        {
            "path": f.path if f.path.startswith("/") else table._p(f.path),
            "delete": table._p(f.delete_path) if f.delete_path else None,
            "bytes": f.bytes,
        }
        for f in touched
    ]
    total_bytes = sum(s["bytes"] for s in specs)
    n_chunks = max(1, int(min(len(specs), max(2 * cpus, total_bytes // (64 << 20)))))
    bins: list[list[dict]] = [[] for _ in range(n_chunks)]
    sizes = np.zeros(n_chunks, dtype=np.int64)
    for s in sorted(specs, key=lambda x: -x["bytes"]):
        i = int(np.argmin(sizes))
        bins[i].append(s)
        sizes[i] += s["bytes"]
    bins = [b for b in bins if b]

    # source chunks: ~64 MiB zero-copy slices (Table) or the Dataset's own
    # blocks (already distributed; refs passed as task args, zero-copy)
    if isinstance(source, pa.Table):
        n_sc = max(1, int(source.nbytes // (64 << 20)) + 1)
        step = -(-source.num_rows // n_sc)
        src_chunks = [
            source.slice(off, step) for off in range(0, source.num_rows, step)
        ]
    else:
        src_chunks = list(source.to_arrow_refs())

    map_files_fn = ray.remote(num_returns=P)(map_files)
    map_src_fn = ray.remote(num_returns=P)(map_source)
    reduce_fn = ray.remote(reduce_bucket)
    map_out = [map_files_fn.remote(b) for b in bins] + [
        map_src_fn.remote(c) for c in src_chunks
    ]
    if P == 1:
        map_out = [[r] for r in map_out]
    pending = [
        reduce_fn.remote(*[m[p] for m in map_out]) for p in range(P) if p not in skip
    ]
    return [json.loads(r) for r in ray.get(pending) if r]


def _merge_shuffle(
    table: TranscriptTable,
    source: "pa.Table | Any",
    touched: list[DataFile],
    base: int,
    target_rows: int,
    num_buckets: int | None,
    src_token: str = "",
    exchange: str = "direct",
) -> tuple[Snapshot, list[dict]]:
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    n_src = source.num_rows if isinstance(source, pa.Table) else source.count()
    touched_rows = sum(f.rows for f in touched)
    if num_buckets is None:
        num_buckets = int(np.clip((touched_rows + n_src) // target_rows + 1, 4, 1024))

    op_id = f"merge-shuf-s{base}-b{num_buckets}-{src_token}"
    ckpt = Checkpoint(table.root, op_id)
    done = ckpt.completed()
    results: list[dict[str, Any]] = list(done.values())

    if exchange == "direct":
        results += _merge_direct_exchange(
            table,
            source,
            touched,
            base,
            target_rows,
            num_buckets,
            ckpt,
            {int(k) for k in done},
        )
        added = [DataFile.from_json(d) for r in results for d in r["datafiles"]]
        snap = table.commit(
            added,
            removed_paths=[f.path for f in touched],
            operation="merge",
            summary={"plan": "shuffle", "source_rows": n_src, "buckets": num_buckets},
            base_snapshot_id=base,
        )
        lineage = [r["lineage"] for r in results]
        ckpt.clear()
        return snap, lineage
    if exchange != "sort":
        raise ValueError(f"unknown exchange {exchange!r} (expected 'direct' or 'sort')")

    done_buckets = pa.array([int(k) for k in done], type=pa.int64())

    paths = [f.path if f.path.startswith("/") else table._p(f.path) for f in touched]
    snap_schema = table.schema_of(base)
    snap_defaults = table.defaults_of(base)
    snap_aliases = table.aliases_of(base)

    def tag_target(t: pa.Table) -> pa.Table:
        t = ensure_schema(t, snap_schema, defaults=snap_defaults, aliases=snap_aliases)
        t = t.append_column("__del", pa.array(np.zeros(t.num_rows, dtype=np.int8)))
        return t.append_column("__src", pa.array(np.zeros(t.num_rows, dtype=np.int8)))

    def tag_source(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = _normalize_source(t, snap_schema, snap_defaults)
        dele = pc.cast(pc.equal(t.column(OP_COL), "delete"), pa.int8())
        t = t.drop_columns([OP_COL]).append_column("__del", dele)
        return t.append_column("__src", pa.array(np.ones(t.num_rows, dtype=np.int8)))

    if isinstance(source, pa.Table):
        source_ds = rd.from_arrow(tag_source(source))
    else:
        source_ds = source.map_batches(tag_source, batch_format="pyarrow")
    cpus = int(ray.cluster_resources().get("CPU", 4))
    nblocks = int(max(cpus, sum(f.bytes for f in touched) // (64 << 20)))
    parts = []
    if paths:
        if any(f.delete_path for f in touched):
            from .deletevec import read_files

            target_reader = read_files(table, touched)
        else:
            target_reader = rd.read_parquet(paths, override_num_blocks=nblocks)
        parts.append(target_reader.map_batches(tag_target, batch_format="pyarrow"))
    parts.append(source_ds)
    ds = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

    from ..util import pool_size

    tagger_pool = pool_size(max(2, cpus // 2))
    ds = ds.map_batches(
        _BucketTagger, fn_constructor_kwargs={"num_buckets": num_buckets},
        batch_format="pyarrow", concurrency=tagger_pool,
    )
    if len(done_buckets):

        def drop_done(t: pa.Table) -> pa.Table:
            return t.filter(pc.invert(pc.is_in(t.column("__bucket"), value_set=done_buckets)))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    out = ds.groupby("__bucket").map_groups(
        _make_bucket_resolver(
            table.root, target_rows, ckpt.dir, base, schema_to_json(snap_schema)
        ),
        batch_format="pyarrow",
    )
    for row in out.take_all():
        results.append(json.loads(row["record"]))

    added = [DataFile.from_json(d) for r in results for d in r["datafiles"]]
    snap = table.commit(
        added,
        removed_paths=[f.path for f in touched],
        operation="merge",
        summary={"plan": "shuffle", "source_rows": n_src, "buckets": num_buckets},
        base_snapshot_id=base,
    )
    lineage = [r["lineage"] for r in results]
    ckpt.clear()
    return snap, lineage
