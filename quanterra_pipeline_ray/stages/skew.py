"""Skew handling for hot conversations.

The reference's only skew tool is a bounded semaphore plus a prod config that
simply disables the biggest fan-out ("TODO memory and time limit issues",
reference `src/models/config/pipeline_settings.py:79-84`).  Here skew is
handled structurally:

* :func:`salted_partition` — deterministic partition id ``hash(conv_id) % P``
  with hot keys salted into ``n_salts`` sub-partitions, so one huge
  conversation cannot pin a whole shuffle partition.
* :func:`cap_partition_rows` — per-partition row-count cap applied before a
  cluster sort: oversized partitions spill their overflow into sibling salted
  partitions deterministically (row-ordinal based, no randomness).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def key_hash64(keys) -> np.ndarray:
    """Deterministic 64-bit hash of a key column, vectorized.

    Accepts Arrow arrays/chunked arrays (hashed natively, zero object
    conversion — the hot path) or any sequence.  Polars' hash with a fixed
    seed is deterministic across processes for a given polars version, which
    is all replay idempotency needs within one run."""
    import polars as pl

    if isinstance(keys, pa.ChunkedArray):
        s = pl.from_arrow(keys)
    elif isinstance(keys, pa.Array):
        s = pl.from_arrow(pa.chunked_array([keys]))
    else:
        s = pl.Series(np.asarray(keys, dtype=object))
    return s.hash(seed=0).to_numpy().astype(np.uint64)


def salted_partition(
    keys: pd.Series | np.ndarray,
    num_partitions: int,
    hot_keys: set[str] | None = None,
    n_salts: int = 8,
    salt_ordinal: np.ndarray | None = None,
) -> np.ndarray:
    """Partition ids in ``[0, num_partitions)``; hot keys spread over salts.

    ``salt_ordinal`` (e.g. ``turn_idx``) makes the salt deterministic per row;
    without it, rows of a hot key round-robin by position within the batch.
    """
    h = key_hash64(keys)
    part = (h % np.uint64(num_partitions)).astype(np.int64)
    if hot_keys:
        keys_arr = np.asarray(keys, dtype=object)
        mask = np.isin(keys_arr, list(hot_keys))
        if mask.any():
            if salt_ordinal is None:
                salt = np.arange(len(keys_arr)) % n_salts
            else:
                salt = np.asarray(salt_ordinal) % n_salts
            part[mask] = (
                (h[mask] + key_hash64(salt[mask].astype(str))) % np.uint64(num_partitions)
            ).astype(np.int64)
    return part


def find_hot_keys(ds, key: str = "conv_id", threshold_rows: int = 1_000_000) -> set[str]:
    """Keys whose row count exceeds the threshold (distributed count, small result)."""
    from ray.data.aggregate import Count

    counts = ds.groupby(key).aggregate(Count(alias_name="n"))
    hot = counts.filter(lambda r: r["n"] >= threshold_rows).take_all()
    return {r[key] for r in hot}


def cap_partition_rows(table: pa.Table, part_col: str, cap: int, num_partitions: int) -> pa.Table:
    """Rewrite partition ids so no partition (within this batch) exceeds ``cap``.

    Overflow rows move to ``(part + k) % num_partitions`` by overflow ordinal —
    deterministic given the batch's row order."""
    part = table.column(part_col).to_numpy(zero_copy_only=False).copy()
    out = part.copy()
    for p in np.unique(part):
        idx = np.nonzero(part == p)[0]
        if len(idx) > cap:
            overflow = idx[cap:]
            bumps = 1 + (np.arange(len(overflow)) // cap)
            out[overflow] = (p + bumps) % num_partitions
    return table.set_column(
        table.schema.get_field_index(part_col), part_col, pa.array(out, type=table.schema.field(part_col).type)
    )
