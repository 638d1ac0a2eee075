"""Per-file bloom filters for conversation membership.

Range stats answer "could this file contain keys in [lo, hi]"; a bloom
filter answers "could this file contain THIS key" — the difference between
touching every hash-range file and touching ~one file for a point lookup.
Stored base64 in the manifest entry's stats, sized at ~8 bits/key (k=4,
false-positive ≈ 2.4%), and only for files whose distinct-key count keeps
the filter small (manifests must stay lean at 100 TB — a saturated bloom is
dead weight, so oversized files simply omit it and fall back to ranges).

All operations are vectorized over uint64 key-hash arrays; bit positions
come from splitmix64 rehashes of the stable :func:`..stages.skew.key_hash64`.
"""

from __future__ import annotations

import base64

import numpy as np

_DEF_K = 4


def _positions(hashes: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via k splitmix64 rehash rounds (vectorized)."""
    from ..stages.skew import _splitmix64

    h = np.asarray(hashes, dtype=np.uint64)
    out = np.empty((len(h), k), dtype=np.int64)
    cur = h
    for i in range(k):
        cur = _splitmix64(cur ^ np.uint64(0x9E3779B97F4A7C15 * (i + 1) & 0xFFFFFFFFFFFFFFFF))
        out[:, i] = (cur % np.uint64(n_bits)).astype(np.int64)
    return out


def bloom_build(hashes: np.ndarray, bits_per_key: int = 8, k: int = _DEF_K) -> str:
    """Base64 bloom filter over uint64 key hashes (power-of-two sized)."""
    n = max(1, len(hashes))
    n_bits = 1 << int(np.ceil(np.log2(max(64, bits_per_key * n))))
    bitset = np.zeros(n_bits // 8, dtype=np.uint8)
    pos = _positions(hashes, n_bits, k).ravel()
    np.bitwise_or.at(bitset, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return base64.b64encode(bitset.tobytes()).decode()


def bloom_any(blob: str, hashes: np.ndarray, k: int = _DEF_K) -> bool:
    """True if ANY of the query hashes may be in the filter."""
    bitset = np.frombuffer(base64.b64decode(blob), dtype=np.uint8)
    n_bits = len(bitset) * 8
    if n_bits == 0 or len(hashes) == 0:
        return False
    pos = _positions(hashes, n_bits, k)
    hit = (bitset[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bool(hit.all(axis=1).any())


# ------------------------------------------------------------- KMV sketches
def kmv_build(hashes: np.ndarray, k: int = 256) -> str:
    """K-minimum-values sketch over uint64 key hashes (base64 of the k
    smallest values).  Union-mergeable, so per-file sketches roll up into a
    table-level distinct-count estimate without any re-scan."""
    h = np.unique(np.asarray(hashes, dtype=np.uint64))
    kth = h[: min(k, len(h))]
    return base64.b64encode(kth.astype("<u8").tobytes()).decode()


def kmv_merge(blobs: "list[str]", k: int = 256) -> np.ndarray:
    vals = [np.frombuffer(base64.b64decode(b), dtype="<u8") for b in blobs if b]
    if not vals:
        return np.empty(0, dtype=np.uint64)
    merged = np.unique(np.concatenate(vals))
    return merged[: min(k, len(merged))]


def kmv_estimate(sketch: np.ndarray, k: int = 256) -> float:
    """NDV estimate: (k-1) / (kth-min normalized to [0,1)); exact below k."""
    n = len(sketch)
    if n < k:
        return float(n)
    kth = float(sketch[k - 1]) / float(1 << 64)
    return (k - 1) / kth if kth > 0 else float(n)
