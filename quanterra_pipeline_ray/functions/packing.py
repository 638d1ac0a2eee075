"""Distributed prefix sum (scan) and fixed-budget sequence packing.

A pretraining-data pipeline packs documents into fixed token-budget
sequences: each doc gets ``seq_id = floor(tokens_before / capacity)`` under a
deterministic global order.  The primitive underneath is a *global prefix
sum* — a classic two-phase scan (Blelloch, "Prefix Sums and Their
Applications", CMU-CS-90-190):

1. range-bucket the order key (contiguous key ranges -> contiguous buckets);
   per-bucket partial sums via one keyed ``groupby`` — the only exchange;
2. the driver prefix-sums the ``n_buckets`` partials (an O(buckets) scalar
   loop, never row data) and broadcasts the per-bucket offsets;
3. each bucket sorts its own rows, local-cumsums, and adds its offset.

Ray Data has no scan operator; expressing it as groupby + tiny driver reduce
+ a second bucketed pass keeps every row-touching step distributed and the
driver's state O(n_buckets).  ``n_buckets`` defaults to
``max(64, bytes // 64 MiB)`` (one bucket ≈ one comfortable map_groups task
at any corpus size — the same rule as :func:`..ordering.derive_n_buckets`);
buckets stream independently and the scalar prefix is microseconds at any
scale.  Phase 1 is a per-block combiner (each block emits ≤ n_buckets
partial-sum rows), so the only row-moving exchange is phase 3.

The order key must be a non-negative int64 (doc ids, timestamps); ranges are
split evenly over ``[0, max]``, so heavily-skewed key spaces should pass an
explicit ``n_buckets`` sized to the hot range (same salting advice as the
other bucketed operators).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def global_cumsum(
    ds,
    val_col: str,
    order_col: str,
    *,
    out_col: str = "cumsum_before",
    inclusive: bool = False,
    n_buckets: int | None = None,
):
    """Add ``out_col`` = the global running sum of ``val_col`` under
    ascending ``order_col`` order (exclusive by default: the sum of all
    STRICTLY-preceding rows; ``inclusive=True`` includes the row itself).

    Two-phase distributed scan — see module docstring.  ``order_col`` values
    must be unique non-negative int64 (ties would make "preceding" ambiguous).
    ``n_buckets`` affects only the exchange layout, never the output;
    default scales with input size.
    """
    # materialize the input ONCE: max(), the partials pass, and the scan
    # pass all consume it — without this the upstream pipeline (e.g. a
    # token-count map) would re-execute per consumer
    ds = ds.materialize()
    if n_buckets is None:
        from .ordering import derive_n_buckets

        n_buckets = derive_n_buckets(ds.size_bytes(), floor=64)
    hi = ds.max(order_col)
    if hi is None:
        return ds
    span = int(hi) + 1
    width = max(1, -(-span // n_buckets))  # ceil

    def add_bkt(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["__bkt"] = (b[order_col].to_numpy(dtype=np.int64) // width).astype(np.int64)
        return b

    bucketed = ds.map_batches(add_bkt, batch_format="pandas")

    # phase 1: per-bucket partial sums via a per-block COMBINER (each block
    # emits <= n_buckets tiny rows) + a small groupby reduce — no row data
    # moves in this phase
    def block_partials(b: pd.DataFrame) -> pd.DataFrame:
        p = b.groupby("__bkt")[val_col].sum().reset_index(name="s")
        p["s"] = p["s"].astype(np.int64)
        return p

    partials = (
        bucketed.map_batches(block_partials, batch_format="pandas")
        .groupby("__bkt")
        .sum("s")
        .to_pandas()
        .rename(columns={"sum(s)": "s"})
    )
    # phase 2: driver scalar prefix over n_buckets values
    partials = partials.sort_values("__bkt")
    offsets = dict(
        zip(
            partials["__bkt"].astype(int),
            np.concatenate([[0], np.cumsum(partials["s"].to_numpy())[:-1]]).astype(np.int64),
        )
    )

    # phase 3: per-bucket local cumsum + broadcast offset
    def local_scan_group(g: pd.DataFrame) -> pd.DataFrame:
        bkt = int(g["__bkt"].iloc[0])
        g = g.sort_values(order_col, kind="mergesort")
        v = g[val_col].to_numpy(dtype=np.int64)
        c = v.cumsum()
        before = c if inclusive else c - v
        out = g.drop(columns="__bkt").copy()
        out[out_col] = (before + offsets.get(bkt, 0)).astype(np.int64)
        return out

    return bucketed.groupby("__bkt").map_groups(local_scan_group, batch_format="pandas")


def pack_sequences(
    ds,
    *,
    token_col: str,
    order_col: str,
    capacity: int,
    seq_col: str = "seq_id",
    n_buckets: int | None = None,
):
    """Assign each doc to a fixed-budget sequence:
    ``seq_id = floor(tokens_before / capacity)`` under ascending
    ``order_col`` — the deterministic streaming-packing rule (documents are
    laid head-to-tail in key order and cut every ``capacity`` tokens; a doc
    whose START crosses a boundary opens the next sequence).  Equivalent to
    SQL ``FLOOR((SUM(tokens) OVER (ORDER BY key) - tokens) / capacity)``, so
    it is oracle-checkable, and unlike greedy bin-packing it is
    order-stable: appending docs never re-packs earlier sequences (the
    incremental-ingest property).
    """
    scanned = global_cumsum(
        ds, token_col, order_col, out_col="__tok_before", n_buckets=n_buckets
    )

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b[seq_col] = (b["__tok_before"].to_numpy(dtype=np.int64) // capacity).astype(np.int64)
        return b.drop(columns="__tok_before")

    return scanned.map_batches(assign, batch_format="pandas")
