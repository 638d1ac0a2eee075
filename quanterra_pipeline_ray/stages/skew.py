"""Skew handling for hot conversations.

The reference's only skew tool is a bounded semaphore plus a prod config that
simply disables the biggest fan-out ("TODO memory and time limit issues",
reference `src/models/config/pipeline_settings.py:79-84`).  Here skew is
handled structurally:

* :func:`key_hash64` — the version-stable key hash every shuffle partitions
  on (uniform high bits, safe to persist into manifest stats).
* :func:`find_hot_keys` — distributed detection of oversized keys.
* :func:`salt_hot_zparts` — deterministic salting of hot keys across cluster
  partitions by coarse time range (used by the Z-order encoder), so one huge
  conversation cannot pin a whole shuffle partition while each salted slice
  stays time-contiguous.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


_FNV_PRIME = np.uint64(0x100000001B3)


def _splitmix64(h: np.ndarray) -> np.ndarray:
    """Avalanche finalizer: uniform high bits even for short/similar keys."""
    h = h + np.uint64(0x9E3779B97F4A7C15)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


def key_hash64(keys) -> np.ndarray:
    """Deterministic, VERSION-STABLE 64-bit hash of a key column, vectorized.

    Polynomial hash over utf-8 bytes (``sum(byte_i * P^(len-1-i)) mod 2^64``)
    followed by a splitmix64 finalizer — pure numpy on the Arrow string
    buffers, no per-row Python.  Implemented in-repo (not polars/pandas
    ``hash``) because these hashes are PERSISTED into manifest stats
    (``conv_hash32`` file ranges used by MERGE pruning); a library-version
    bump must never silently change them.
    """
    if isinstance(keys, pa.ChunkedArray):
        combined = keys.combine_chunks()
        arr = (
            combined.chunk(0)
            if isinstance(combined, pa.ChunkedArray) and combined.num_chunks
            else (pa.array([], type=keys.type) if isinstance(combined, pa.ChunkedArray) else combined)
        )
    elif isinstance(keys, pa.Array):
        arr = keys
    else:
        arr = pa.array(np.asarray(keys, dtype=object).astype(str), type=pa.string())
    if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.string())
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    arr = arr.fill_null("")
    # buffers: [validity, offsets, data]
    off_width = 8 if pa.types.is_large_string(arr.type) else 4
    offsets = np.frombuffer(
        arr.buffers()[1], dtype=np.int64 if off_width == 8 else np.int32,
        count=n + 1, offset=arr.offset * off_width,
    ).astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offsets[0] : offsets[-1]]
    starts = offsets[:-1] - offsets[0]
    lens = np.diff(offsets)
    total = int(lens.sum())
    out = np.zeros(n, dtype=np.uint64)
    if total:
        max_len = int(lens.max())
        if max_len <= 64:
            # fast path (short keys): right-align bytes into an (n, max_len)
            # zero-padded matrix (leading zeros contribute 0 to the
            # polynomial, so the hash is identical to the unpadded form),
            # then Horner by column — max_len vector ops, no gathers.
            mat = np.zeros((n, max_len), dtype=np.uint8)
            pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
            flat = np.repeat(np.arange(n, dtype=np.int64) * max_len + (max_len - lens), lens) + pos
            mat.ravel()[flat] = data
            for j in range(max_len):
                out = out * _FNV_PRIME + mat[:, j]
        else:
            powers = np.empty(max_len, dtype=np.uint64)
            powers[0] = np.uint64(1)
            if max_len > 1:
                np.cumprod(np.full(max_len - 1, _FNV_PRIME, dtype=np.uint64), out=powers[1:])
            pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
            exp = np.repeat(lens, lens) - 1 - pos
            terms = data.astype(np.uint64) * powers[exp]
            nonempty = lens > 0
            out[nonempty] = np.add.reduceat(terms, starts[nonempty])
    return _splitmix64(out ^ lens.astype(np.uint64))


def find_hot_keys(ds, key: str = "conv_id", threshold_rows: int = 1_000_000) -> set[str]:
    """Keys whose row count exceeds the threshold (distributed count, small result)."""
    from ray.data.aggregate import Count

    counts = ds.groupby(key).aggregate(Count(alias_name="n"))
    hot = counts.filter(lambda r: r["n"] >= threshold_rows).take_all()
    return {r[key] for r in hot}


def salt_hot_zparts(
    zpart: np.ndarray,
    conv_ids: pa.Array | pa.ChunkedArray,
    ts_bucket: np.ndarray,
    hot_convs: frozenset,
    num_parts: np.uint64,
    salt_div: np.uint64,
) -> np.ndarray:
    """Spread rows of hot conversations across cluster partitions.

    The salt is the row's coarse ts range (``ts_bucket // salt_div``), so each
    salted slice of a hot conversation stays time-contiguous — locality within
    a slice survives, but no single reducer owns the whole conversation.
    Arrow-native membership test (`pc.is_in`), no Python row loop.
    """
    import pyarrow.compute as pc

    if not hot_convs:
        return zpart
    mask = pc.is_in(
        conv_ids, value_set=pa.array(sorted(hot_convs)).cast(conv_ids.type)
    ).to_numpy(zero_copy_only=False)
    if mask.any():
        zpart = zpart.copy()
        salt = (ts_bucket[mask] // salt_div).astype(np.uint64)
        zpart[mask] = (zpart[mask] + salt) % num_parts
    return zpart
