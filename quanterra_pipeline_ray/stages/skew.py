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
        # The hash is a polynomial over little-endian uint64 WORDS of the
        # key's utf-8 bytes, front-zero-padded to a word multiple (leading
        # zero words contribute 0, so padding never aliases keys; the length
        # XOR below separates different lengths).  Word granularity means
        # len/8 multiply-adds per key instead of one per byte.
        max_len = int(lens.max())
        m8 = (max_len + 7) & ~7
        if int(lens.min()) == max_len and max_len % 8 == 0:
            # uniform word-multiple keys (e.g. fixed-format conv ids): the
            # byte buffer IS the matrix — no scatter at all
            words = data.copy().reshape(n, max_len).view("<u8")
            for j in range(max_len // 8):
                out = out * _FNV_PRIME + words[:, j]
            return _splitmix64(out ^ lens.astype(np.uint64))
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
        if max_len <= 64:
            # short keys: one (n, M) matrix, Horner over word columns —
            # M/8 vector ops, no index gathers.
            mat = np.zeros((n, m8), dtype=np.uint8)
            flat = np.repeat(np.arange(n, dtype=np.int64) * m8 + (m8 - lens), lens) + pos
            mat.ravel()[flat] = data
            words = mat.view("<u8")
            for j in range(m8 // 8):
                out = out * _FNV_PRIME + words[:, j]
        else:
            # long keys: per-key padded word runs + powers gather + reduceat
            # (identical word polynomial, just not column-wise)
            plens = ((lens + 7) & ~7).astype(np.int64)
            pstarts = np.concatenate([[0], np.cumsum(plens)[:-1]])
            flat = np.repeat(pstarts + (plens - lens), lens) + pos
            buf = np.zeros(int(plens.sum()), dtype=np.uint8)
            buf[flat] = data
            words = buf.view("<u8")
            wlens = plens // 8
            wstarts = pstarts // 8
            nwords = int(wlens.sum())
            wpos = np.arange(nwords, dtype=np.int64) - np.repeat(wstarts, wlens)
            wexp = np.repeat(wlens, wlens) - 1 - wpos
            powers = np.empty(int(wlens.max()), dtype=np.uint64)
            powers[0] = np.uint64(1)
            if len(powers) > 1:
                np.cumprod(np.full(len(powers) - 1, _FNV_PRIME, dtype=np.uint64), out=powers[1:])
            terms = words * powers[wexp]
            nonempty = wlens > 0
            out[nonempty] = np.add.reduceat(terms, wstarts[nonempty])
    return _splitmix64(out ^ lens.astype(np.uint64))


def find_hot_keys(ds, key: str = "conv_id", threshold_rows: int = 1_000_000) -> set[str]:
    """Keys whose row count exceeds the threshold (distributed count, small result)."""
    from ray.data.aggregate import Count

    counts = ds.groupby(key).aggregate(Count(alias_name="n"))
    hot = counts.filter(expr=f"n >= {int(threshold_rows)}").take_all()
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
