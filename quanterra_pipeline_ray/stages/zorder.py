"""Z-order clustering of the transcripts table.

Generalizes the reference's deterministic composite storage keys
``(date, exchange, code)`` as a physical-locality scheme (reference
`src/models/data/eodhd_models.py:95-97`): rows are laid out along a Morton
(Z-order) curve over ``(hash64(conv_id) >> 32, ts_bucket)`` so scans that
filter by conversation OR by time window both touch few files.

Execution plan (one shuffle):

1. ``map_batches(ZKeyEncoder, batch_format="pyarrow")`` — stateful actor pool
   computes the interleaved-bit key ``z`` and a deterministic partition id
   ``zpart = z >> (64 - bits)`` per row, vectorized in numpy.
2. Partitions already completed in the checkpoint are filtered out BEFORE the
   shuffle, so a resumed run moves only incomplete partitions' rows.
3. ``groupby("zpart").map_groups`` — per-partition sort by ``z`` and chunked
   write into target-size, content-addressed files (per-partition row caps
   bound memory under hot-conversation skew).
4. Driver commits a copy-on-write snapshot replacing the base file set.

Determinism: the conv hash is pandas' fixed-key siphash
(``pd.util.hash_pandas_object``), so replays and checkpoint resumes produce
byte-identical partitions and converge on identical content-addressed files.
"""

from __future__ import annotations

import json
import time
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.checkpoint import Checkpoint
from ..state.lineage import lineage_record, store_lineage
from ..state.manifest import DataFile, Snapshot, TranscriptTable, write_data_file

_EVEN = np.uint64(0x5555555555555555)


def _spread_bits(x: np.ndarray) -> np.ndarray:
    """Spread the low 32 bits of each uint64 into the even bit positions."""
    x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & _EVEN
    return x


def interleave_bits(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Morton-interleave two 32-bit arrays: bits of ``a`` at odd positions
    (more significant), ``b`` at even positions."""
    return (_spread_bits(a) << np.uint64(1)) | _spread_bits(b)


def hilbert_d(x: np.ndarray, y: np.ndarray, bits: int = 16) -> np.ndarray:
    """Vectorized Hilbert-curve distance of 2-D points (``bits`` per axis).

    Standard xy→d transform (rotate/reflect per quadrant), iterated from the
    top bit down with numpy boolean arrays — no Python loop over rows.
    Hilbert preserves locality strictly better than Morton at the cost of a
    few more vector ops per level.
    """
    x = x.astype(np.uint64) & np.uint64((1 << bits) - 1)
    y = y.astype(np.uint64) & np.uint64((1 << bits) - 1)
    x = x.copy()
    y = y.copy()
    d = np.zeros_like(x, dtype=np.uint64)
    s = np.uint64(1) << np.uint64(bits - 1)
    one = np.uint64(1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant
        flip = (ry == 0) & (rx == 1)
        x_f = s - one - x
        y_f = s - one - y
        x = np.where(flip, x_f, x)
        y = np.where(flip, y_f, y)
        swap = ry == 0
        x2 = np.where(swap, y, x)
        y2 = np.where(swap, x, y)
        x, y = x2, y2
        s >>= one
    return d


def conv_hash32(conv_id) -> np.ndarray:
    """Deterministic vectorized 32-bit hash of conv_id (arrow-native)."""
    from ..stages.skew import key_hash64

    return (key_hash64(conv_id) >> np.uint64(32)).astype(np.uint64)


class ZKeyEncoder:
    """Actor-pool stage: adds ``z`` (uint64 Morton key) and ``zpart`` columns.

    State (timestamp origin, bucket width, partition bit count) is built once
    per actor in ``__init__`` — the Ray-native version of the reference's
    per-process singleton clients (`google_cloud_storage_client.py:14-38`).
    """

    def __init__(
        self,
        ts_origin_us: int,
        bucket_us: int,
        part_bits: int,
        curve: str = "z",
        hot_convs: frozenset | None = None,
        salt_buckets: int = 64,
        time_major: bool = False,
    ):
        if curve not in ("z", "hilbert"):
            raise ValueError(f"unknown curve {curve!r}")
        # time_major puts the ts bucket in the HIGH interleave positions:
        # within a partition, files then cover narrow contiguous time
        # slices, so ts-window scans prune sharply (conversation locality
        # degrades correspondingly — pick per workload)
        self.time_major = time_major
        self.ts_origin = np.int64(ts_origin_us)
        self.bucket_us = np.int64(max(1, bucket_us))
        self.part_shift = np.uint64(32 - part_bits)
        self.num_parts = np.uint64(1 << part_bits)
        self.curve = curve
        # salted repartition for hot conversations: all turns of a conv share
        # a hash, so one huge conversation would pin a whole reducer; hot
        # convs instead spread across partitions by coarse ts range, keeping
        # each salted slice time-contiguous (state built once per actor)
        self.hot = frozenset(hot_convs or ())
        self.salt_div = np.uint64(max(1, salt_buckets))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        a = conv_hash32(batch.column("conv_id"))
        bucket = np.maximum(ts - self.ts_origin, 0) // self.bucket_us
        b = (bucket.astype(np.uint64)) & np.uint64(0xFFFFFFFF)
        if self.curve == "hilbert":
            # 16 bits per axis (top hash bits / bucket low bits) -> 32-bit d;
            # hash bits drive the partitioning either way
            z = hilbert_d(a >> np.uint64(16), b, bits=16) << np.uint64(32) | (
                interleave_bits(a & np.uint64(0xFFFF), b >> np.uint64(16))
                & np.uint64(0xFFFFFFFF)
            )
        elif self.time_major:
            # plain concatenation, NOT interleave: the ts bucket must
            # dominate the sort for files to cover contiguous time slices
            # (an interleave lets the 32-bit hash's high bits outrank the
            # ~10-bit bucket)
            z = (b << np.uint64(32)) | (a & np.uint64(0xFFFFFFFF))
        else:
            z = interleave_bits(a, b)
        # Partition on the top bits of the (uniform) conv hash, NOT of z: the
        # ts-bucket's high bits are ~always zero, so z's top bits collapse to
        # 2 values and would funnel the whole shuffle through 2 reducers.
        # Since bucket < 2^(31-part_bits) in practice, fixing the top hash
        # bits still yields (near-)disjoint z ranges per partition.
        zpart = (a >> self.part_shift).astype(np.uint64)
        if self.hot:
            from .skew import salt_hot_zparts

            zpart = salt_hot_zparts(
                zpart, batch.column("conv_id"), b, self.hot, self.num_parts, self.salt_div
            )
        return batch.append_column("z", pa.array(z, type=pa.uint64())).append_column(
            "zpart", pa.array(zpart, type=pa.uint64())
        )


def _ipc_encode(t: pa.Table, codec: str) -> bytes:
    """Arrow-IPC-serialize a table with buffer compression — the wire format
    of the compressed exchange (measured in ``tools/exchange_sim.py``)."""
    import io

    import pyarrow.ipc as ipc

    buf = io.BytesIO()
    with ipc.new_stream(buf, t.schema, options=ipc.IpcWriteOptions(compression=codec)) as w:
        w.write_table(t)
    return buf.getvalue()


def _ipc_decode(payload: bytes) -> pa.Table:
    import io

    import pyarrow.ipc as ipc

    return ipc.open_stream(io.BytesIO(payload)).read_all()


def _make_run_writer(
    root: str,
    target_rows: int,
    ckpt_dir: str,
    base_snapshot: int,
    schema_json: list | None = None,
):
    """Per-zpart group fn: sort by z, write target-size files, checkpoint."""

    def write_run(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"record": pa.array([], type=pa.string())})
        t0 = time.monotonic()
        part_id = int(group.column("zpart")[0].as_py())
        # the group arrives as N concatenated slices (N chunks): compact
        # before sort_by so the gather stays on Arrow's single-chunk path
        group = group.combine_chunks().sort_by(
            [("z", "ascending"), ("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
        from ..schema import TRANSCRIPTS_SCHEMA, schema_from_json

        schema = schema_from_json(schema_json) if schema_json else TRANSCRIPTS_SCHEMA
        body = group.drop_columns(["z", "zpart"])
        outs = []
        for off in range(0, body.num_rows, target_rows):
            chunk = body.slice(off, target_rows)
            # conv-HASH range stats: after hash-based clustering, files span
            # the full lexical conv_id range, so MERGE pruning must test
            # source conv hashes against the file's hash range instead
            h = conv_hash32(chunk.column("conv_id"))
            outs.append(
                write_data_file(
                    chunk,
                    root,
                    schema=schema,
                    sort_within=False,
                    extra_stats={"conv_hash32": [int(h.min()), int(h.max())]},
                )
            )
        lin = lineage_record(
            op="zorder",
            partition_id=part_id,
            inputs=[{"snapshot": base_snapshot}],
            outputs=[{"path": o.path, "checksum": o.checksum} for o in outs],
            rows_in=group.num_rows,
            rows_out=sum(o.rows for o in outs),
            duration_s=time.monotonic() - t0,
        )
        record = {"datafiles": [o.to_json() for o in outs], "lineage": lin}
        Checkpoint.write_record(ckpt_dir, part_id, record)
        return pa.table({"record": pa.array([json.dumps(record)], type=pa.string())})

    return write_run


def _direct_exchange(
    table: TranscriptTable,
    files,
    base: int,
    encoder_kwargs: dict,
    part_bits: int,
    target_rows: int,
    ckpt: Checkpoint,
    done_parts: set[int],
    schema_json: list,
    wire_compression: str | None = None,
) -> list[dict]:
    """Deterministic direct map-reduce exchange for the cluster shuffle.

    Ray Data's ``groupby`` is a SORT exchange: it samples key boundaries,
    sorts every block by key, range-partitions, and merges sorted runs on
    the reduce side — machinery for a global order the cluster stage does
    not need (``zpart`` is already a uniform deterministic partition id, and
    the writer re-sorts within its partition anyway).  Ray 2.49's native
    HASH_SHUFFLE strategy hangs (see CLAUDE.md), so this is the one place
    the engine drops to raw Ray tasks: the classic two-stage shuffle from
    the Ray docs — map tasks read a chunk of manifest files, encode
    ``z``/``zpart``, and return ``P`` per-partition slices via
    ``num_returns=P``; one reduce task per partition concatenates its
    slices, sorts by ``z`` and writes.  Versus the sort exchange this
    removes the boundary-sampling pass, the map-side re-blocking copy and
    the sorted-run merge — two to three fewer full-width passes over a
    text-dominated (≈82% of bytes) payload on a memory-bandwidth-bound
    exchange.  Multi-node: map outputs scatter into the object store and
    each reducer pulls only its partition's slices (all-to-all, no
    driver-side data).  Resume: completed partitions' reduces are skipped
    and their slices dropped map-side, so reruns move only incomplete
    partitions' bytes.
    """
    import ray

    from ..schema import ensure_schema, schema_from_json

    P = 1 << part_bits
    fsa = table.fsa
    root = table.root
    ckpt_dir = ckpt.dir
    defaults = table.defaults_of(base)
    aliases = table.aliases_of(base)
    specs = [
        {
            "path": f.path if f.path.startswith("/") else table._p(f.path),
            "delete": table._p(f.delete_path) if f.delete_path else None,
            "bytes": f.bytes,
        }
        for f in files
    ]
    # greedy size-balanced chunks, ~64 MiB each, at least 2 per CPU
    cpus = int(ray.cluster_resources().get("CPU", 4))
    total_bytes = sum(s["bytes"] for s in specs)
    n_chunks = int(min(len(specs), max(2 * cpus, total_bytes // (64 << 20))))
    n_chunks = max(1, n_chunks)
    bins: list[list[dict]] = [[] for _ in range(n_chunks)]
    sizes = np.zeros(n_chunks, dtype=np.int64)
    for s in sorted(specs, key=lambda x: -x["bytes"]):
        i = int(np.argmin(sizes))
        bins[i].append(s)
        sizes[i] += s["bytes"]
    bins = [b for b in bins if b]
    skip = frozenset(done_parts)

    def map_chunk(chunk_specs: list[dict]):
        import pyarrow.parquet as pq

        from .deletevec import apply_deletes, read_delete_positions

        schema = schema_from_json(schema_json)
        enc = ZKeyEncoder(**encoder_kwargs)
        encoded, zparts = [], []
        for spec in chunk_specs:
            t = pq.read_table(spec["path"], filesystem=fsa.fs)
            if spec["delete"]:
                t = apply_deletes(t, read_delete_positions(spec["delete"], fsa))
            t = ensure_schema(
                t, schema, defaults=defaults, aliases=aliases
            ).combine_chunks()
            t = enc(t)
            encoded.append(t)
            zparts.append(t.column("zpart").to_numpy())
        # combine_chunks after concat: pa.Table.take with random indices on
        # a MULTI-chunk string column falls off Arrow's fast path (per-index
        # chunk resolution) — measured 39 s for the 128 per-partition takes
        # on a 2-file / 427 MB chunk vs 0.8 s after one compacting copy.
        # Single-file chunks never hit this (already one chunk), which is
        # why only low-CPU levels (bigger chunks) showed it.
        big = pa.concat_tables(encoded).combine_chunks()
        zp = np.concatenate(zparts)
        order = np.argsort(zp, kind="stable")
        bounds = np.searchsorted(zp[order], np.arange(P + 1))
        empty = big.schema.empty_table()
        out = []
        for p in range(P):
            s, e = int(bounds[p]), int(bounds[p + 1])
            if e == s or p in skip:
                out.append(None if wire_compression else empty)
            else:
                # take (not slice): compact buffers, so each return object
                # carries exactly its partition's bytes into the store
                part_t = big.take(pa.array(order[s:e]))
                out.append(
                    _ipc_encode(part_t, wire_compression)
                    if wire_compression
                    else part_t
                )
        return tuple(out) if P > 1 else out[0]

    writer = _make_run_writer(root, target_rows, ckpt_dir, base, schema_json)

    def reduce_part(*slices):
        if wire_compression:
            slices = [_ipc_decode(s) for s in slices if s is not None]
        live = [s for s in slices if s.num_rows]
        if not live:
            return None
        group = pa.concat_tables(live)
        rec = writer(group)
        return rec.column("record")[0].as_py() if rec.num_rows else None

    map_fn = ray.remote(num_returns=P)(map_chunk)
    reduce_fn = ray.remote(reduce_part)
    map_out = [map_fn.remote(b) for b in bins]
    if P == 1:
        map_out = [[r] for r in map_out]
    pending = [
        reduce_fn.remote(*[m[p] for m in map_out])
        for p in range(P)
        if p not in skip
    ]
    return [json.loads(r) for r in ray.get(pending) if r]


def cluster(
    table: TranscriptTable,
    ts_bucket_us: int | None = None,  # default 1 hour (or the declared spec's)
    target_rows: int = 200_000,
    part_bits: int | None = None,
    snapshot_id: int | None = None,
    encoder_concurrency: Any = None,
    curve: str | None = None,
    hot_conv_threshold_rows: int | None = None,
    time_major: bool | None = None,
    exchange: str = "direct",
    wire_compression: str | None = None,
    only_stale: bool = False,
) -> Snapshot:
    """Z-order-cluster the snapshot; returns the new snapshot.

    ``part_bits`` controls shuffle fan-out (2^bits deterministic partitions);
    by default it is sized so a partition holds ~2 target files.  Resumable:
    completed partitions are filtered out before the shuffle on rerun.

    ``exchange``: ``"direct"`` (default) runs the deterministic map-reduce
    exchange (:func:`_direct_exchange`) — measured faster at every
    parallelism level AND better-scaling than ``"sort"`` (Ray Data's sort
    exchange, kept for comparison): 8.7s → 4.0s cluster-stage wall at 32
    cpus on 11.7M turns, 8→32 stage scaling 0.28 → 0.50.  Both produce
    byte-identical content-addressed files.

    Layout parameters left as ``None`` resolve from the table's declared
    partition spec (``stages/spec.py:set_partition_spec``), falling back to
    the engine defaults; explicit arguments always win.  The layout actually
    written is registered in the snapshot's ``partition_specs`` and every
    output file is tagged with its ``spec_id``.  ``only_stale=True`` turns
    the run into INCREMENTAL re-clustering: only files whose tag differs
    from the effective layout (fresh appends, compaction/merge output,
    pre-evolution files) are rewritten — the metadata-only spec change plus
    repeated ``only_stale`` runs migrate a 100-TB table one maintenance
    cycle at a time.  Incremental mode requires a pinned ``part_bits``
    (declared or explicit): auto-sizing tracks data volume, so an unpinned
    fan-out could re-stale the whole table every run.

    ``wire_compression`` (direct exchange only): ``None`` / ``"lz4"`` /
    ``"zstd"`` — IPC-compress each per-partition slice map-side so the
    exchange ships compressed bytes.  Single-node plasma is memcpy, so None
    is right here; on a network-bound cluster the measured crossover
    (``tools/exchange_sim.py``, text-heavy rows) is: below ~1 Gbps/flow
    zstd wins (6.3× vs raw wire bytes, 5.8× wall at 0.5 Gbps), around
    ~2.5 Gbps/flow lz4 wins, at ≥5 Gbps/flow raw wins.  Rule of thumb: an
    exchange whose per-task share of the NIC is under ~2 Gbps should set
    ``"zstd"``; parquet-blob packing (round 2's "packed" exchange) was
    retired — it is dominated by IPC-zstd at every bandwidth.
    """
    from .spec import ENGINE_DEFAULT_SPEC, find_or_add_spec, partition_spec_of

    base = table.current_snapshot_id() if snapshot_id is None else snapshot_id
    snap = table.snapshot(base)
    declared = partition_spec_of(table, base)

    def _pick(arg, key):
        if arg is not None:
            return arg
        if declared is not None and declared.get(key) is not None:
            return declared[key]
        return ENGINE_DEFAULT_SPEC[key]

    ts_bucket_us = int(_pick(ts_bucket_us, "ts_bucket_us"))
    curve = _pick(curve, "curve")
    time_major = bool(_pick(time_major, "time_major"))
    if part_bits is None and declared is not None and declared.get("part_bits") is not None:
        part_bits = int(declared["part_bits"])
    if only_stale and part_bits is None:
        raise ValueError(
            "cluster(only_stale=True) needs a pinned part_bits (explicit or via "
            "set_partition_spec) — auto-sized fan-out re-stales the table as it grows"
        )

    files = table.files(base)
    if not files:
        return table.snapshot(base)
    total_rows = sum(f.rows for f in files)
    if part_bits is None:
        import ray

        # ~2 partitions per CPU so the reduce stage saturates the cluster,
        # but never partitions smaller than ~target_rows/4 rows
        cpus = int(ray.cluster_resources().get("CPU", 4))
        want = max(2 * cpus, total_rows // max(1, target_rows))
        cap = max(1, total_rows // max(1, target_rows // 4))
        part_bits = int(np.clip(np.ceil(np.log2(max(2, min(want, cap)))), 1, 12))

    # the concrete layout this run writes: registered at commit, tagged on
    # every output file (find_or_add reuses an existing identical layout's id)
    specs, eff_spec_id = find_or_add_spec(
        snap.partition_specs,
        {
            "curve": curve,
            "ts_bucket_us": ts_bucket_us,
            "part_bits": part_bits,
            "time_major": time_major,
        },
    )
    if only_stale:
        files = [f for f in files if f.spec_id != eff_spec_id]
        if not files:
            return snap
        total_rows = sum(f.rows for f in files)

    # ts origin from manifest stats (min over files) keeps buckets small
    # ints.  Once a layout is registered its origin is PINNED in the spec
    # entry so incremental runs bucket identically to the files already
    # written under it (mixed origins would fragment the time axis).
    if specs[eff_spec_id].get("ts_origin_us") is not None:
        ts_origin_us = int(specs[eff_spec_id]["ts_origin_us"])
    else:
        ts_mins = [f.stats["ts"][0] for f in files if "ts" in f.stats]
        ts_origin_us = int(pd.Timestamp(min(ts_mins)).value // 1000) if ts_mins else 0
        specs[eff_spec_id]["ts_origin_us"] = ts_origin_us

    op_id = (
        f"zorder-s{base}-b{ts_bucket_us}-p{part_bits}-{curve}"
        f"{'-tm' if time_major else ''}{'-inc' if only_stale else ''}"
    )
    ckpt = Checkpoint(table.root, op_id)
    done = ckpt.completed()
    done_parts = set(int(k) for k in done)

    results: list[dict[str, Any]] = list(done.values())

    import ray

    from ..util import pool_size

    cpus = int(ray.cluster_resources().get("CPU", 4))
    if encoder_concurrency is None:
        # actor pool sized to the cluster minus headroom for read/shuffle stages
        encoder_concurrency = pool_size(max(2, cpus // 2))
    hot: frozenset = frozenset()
    if hot_conv_threshold_rows:
        from .skew import find_hot_keys

        hot = frozenset(
            find_hot_keys(
                table.scan(base, columns=["conv_id"]),
                key="conv_id",
                threshold_rows=hot_conv_threshold_rows,
            )
        )
    encoder_kwargs = dict(
        ts_origin_us=ts_origin_us,
        bucket_us=ts_bucket_us,
        part_bits=part_bits,
        curve=curve,
        hot_convs=hot,
        time_major=time_major,
    )
    from ..schema import schema_to_json

    schema_json = schema_to_json(table.schema_of(base))
    if exchange == "direct":
        results += _direct_exchange(
            table,
            files,
            base,
            encoder_kwargs,
            part_bits,
            target_rows,
            ckpt,
            done_parts,
            schema_json,
            wire_compression=wire_compression,
        )
        return _commit_cluster(
            table, files, base, results, part_bits, ts_bucket_us, target_rows, ckpt,
            specs, eff_spec_id,
        )
    if exchange != "sort":
        raise ValueError(f"unknown exchange {exchange!r} (expected 'direct' or 'sort')")
    # ~64 MiB blocks (lower-bounded by one block per CPU): tiny blocks make
    # the sort shuffle overhead-bound, giant blocks starve parallelism
    total_bytes = sum(f.bytes for f in files)
    nblocks = int(max(cpus, total_bytes // (64 << 20)))
    ds = table.scan(base, override_num_blocks=nblocks)
    enc = ds.map_batches(
        ZKeyEncoder,
        fn_constructor_kwargs=encoder_kwargs,
        batch_format="pyarrow",
        concurrency=encoder_concurrency,
    )
    if done_parts:
        done_arr = pa.array(list(done_parts), type=pa.uint64())

        def drop_done(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return t.filter(pc.invert(pc.is_in(t.column("zpart"), value_set=done_arr)))

        enc = enc.map_batches(drop_done, batch_format="pyarrow")

    out = enc.groupby("zpart").map_groups(
        _make_run_writer(table.root, target_rows, ckpt.dir, base, schema_json),
        batch_format="pyarrow",
    )
    for row in out.take_all():
        results.append(json.loads(row["record"]))
    return _commit_cluster(
        table, files, base, results, part_bits, ts_bucket_us, target_rows, ckpt,
        specs, eff_spec_id,
    )


def _commit_cluster(
    table: TranscriptTable,
    files,
    base: int,
    results: list[dict],
    part_bits: int,
    ts_bucket_us: int,
    target_rows: int,
    ckpt: Checkpoint,
    specs: list | None = None,
    spec_id: int | None = None,
) -> Snapshot:
    import dataclasses

    added = [
        dataclasses.replace(DataFile.from_json(d), spec_id=spec_id)
        for r in results
        for d in r["datafiles"]
    ]
    snap = table.commit(
        added,
        removed_paths=[f.path for f in files],
        operation="zorder",
        summary={
            "part_bits": part_bits,
            "ts_bucket_us": ts_bucket_us,
            "target_rows": target_rows,
            "spec_id": spec_id,
        },
        base_snapshot_id=base,
        # the layout just written becomes the registered default: later
        # only_stale runs converge toward it (set_partition_spec overrides)
        partition_specs=specs,
        default_spec_id=spec_id,
    )
    store_lineage(table.root, snap.snapshot_id, [r["lineage"] for r in results])
    ckpt.clear()
    return snap
