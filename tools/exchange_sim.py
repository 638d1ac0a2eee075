#!/usr/bin/env python
"""Two-process TCP simulation of the cluster exchange: packed vs raw.

The packed exchange (``cluster(exchange="packed")``) ships zstd-parquet
blobs instead of raw Arrow rows.  Measured single-node it LOSES (codec CPU >
plasma memcpy, see BASELINE.md) — but the claim it exists for is a
NETWORK-bound multi-node exchange, which the sandbox cannot host.  This tool
validates that claim the honest way available here: a real two-process TCP
transfer over loopback with a sender-side token-bucket bandwidth throttle,
timing the full pipeline (encode -> socket -> decode) per wire format:

* ``raw``   — uncompressed Arrow IPC stream (what the plasma object
              transfer ships, sans protocol overhead)
* ``ipc-zstd`` — Arrow IPC with zstd buffer compression (middle ground:
              no parquet encoding, still compressed on the wire)
* ``packed`` — zstd parquet blobs, exactly `_EncodeAndPack`'s payload

For each simulated NIC bandwidth the winner is whichever format's pipeline
(max of codec rate and wire rate, overlapped) finishes first.  The
crossover bandwidth — below which packed/ipc-zstd beat raw — is the
deployment rule recorded in BASELINE.md.

Usage: python tools/exchange_sim.py [--rows N] [--gbps "1,2.5,5,10,0"]
(0 = unthrottled loopback).  Single sender/receiver pair per run: rates are
per-flow; a real exchange runs many flows, all sharing the NIC.
"""

from __future__ import annotations

import argparse
import io
import json
import multiprocessing as mp
import os
import socket
import struct
import sys
import time

import pyarrow as pa
import pyarrow.ipc as ipc
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _slices(rows: int, parts: int) -> list[pa.Table]:
    """Deterministic per-partition slices of a transcripts batch (the same
    shape the cluster exchange ships)."""
    import numpy as np

    from quanterra_pipeline_ray.stages.skew import key_hash64
    from quanterra_pipeline_ray.synth import generate_transcripts

    t = generate_transcripts(n_convs=max(1, rows // 16), seed=42, mean_turns=16)
    t = t.slice(0, rows)
    part = (key_hash64(t.column("conv_id")) >> np.uint64(64 - 6)) % np.uint64(parts)
    order = np.argsort(part, kind="stable")
    sp = part[order]
    bounds = np.searchsorted(sp, np.arange(parts + 1))
    st = t.take(pa.array(order))
    return [
        st.slice(int(bounds[p]), int(bounds[p + 1] - bounds[p])).combine_chunks()
        for p in range(parts)
        if bounds[p + 1] > bounds[p]
    ]


def _encode(t: pa.Table, fmt: str) -> bytes:
    buf = io.BytesIO()
    if fmt == "packed":
        pq.write_table(t, buf, compression="zstd")
    else:
        comp = {"ipc-zstd": "zstd", "ipc-lz4": "lz4"}.get(fmt)
        opts = ipc.IpcWriteOptions(compression=comp)
        with ipc.new_stream(buf, t.schema, options=opts) as w:
            w.write_table(t)
    return buf.getvalue()


def _decode(payload: bytes, fmt: str) -> pa.Table:
    if fmt == "packed":
        return pq.read_table(io.BytesIO(payload))
    return ipc.open_stream(io.BytesIO(payload)).read_all()


def _receiver(port_q, done_q, fmt: str):
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port_q.put(srv.getsockname()[1])
    conn, _ = srv.accept()
    f = conn.makefile("rb")
    rows = 0
    while True:
        hdr = f.read(8)
        if len(hdr) < 8:
            break
        (n,) = struct.unpack("<q", hdr)
        if n < 0:
            break
        rows += _decode(f.read(n), fmt).num_rows
    done_q.put(rows)
    conn.close()
    srv.close()


def _run_one(slices: list[pa.Table], fmt: str, gbps: float) -> dict:
    ctx = mp.get_context("spawn")
    port_q, done_q = ctx.Queue(), ctx.Queue()
    rcv = ctx.Process(target=_receiver, args=(port_q, done_q, fmt))
    rcv.start()
    port = port_q.get()
    sock = socket.create_connection(("127.0.0.1", port))
    rate = gbps * 1e9 / 8 if gbps > 0 else None  # bytes/sec on the wire
    t0 = time.monotonic()
    wire_bytes = 0
    for t in slices:
        payload = _encode(t, fmt)
        sock.sendall(struct.pack("<q", len(payload)))
        sock.sendall(payload)
        wire_bytes += len(payload) + 8
        if rate:
            # token bucket: never ahead of the simulated NIC
            ahead = wire_bytes / rate - (time.monotonic() - t0)
            if ahead > 0:
                time.sleep(ahead)
    sock.sendall(struct.pack("<q", -1))
    rows = done_q.get()  # receiver finished every decode
    wall = time.monotonic() - t0
    sock.close()
    rcv.join()
    assert rows == sum(t.num_rows for t in slices)
    return {"fmt": fmt, "gbps": gbps, "wall_s": round(wall, 3),
            "wire_mb": round(wire_bytes / 1e6, 1), "rows": rows}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--parts", type=int, default=64)
    ap.add_argument("--gbps", default="0.5,1,2.5,5,10,0")
    args = ap.parse_args()
    slices = _slices(args.rows, args.parts)
    raw_mb = sum(t.nbytes for t in slices) / 1e6
    print(f"# {sum(t.num_rows for t in slices)} rows, {raw_mb:.0f} MB raw, "
          f"{len(slices)} slices", file=sys.stderr)
    out = []
    for g in [float(x) for x in args.gbps.split(",")]:
        for fmt in ("raw", "ipc-lz4", "ipc-zstd", "packed"):
            r = _run_one(slices, fmt, g)
            out.append(r)
            print(json.dumps(r), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
