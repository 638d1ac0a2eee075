"""Deterministic global shuffle order for training-data layout.

A dataloader wants the corpus in a reproducible pseudo-random order; the
standard trick is *sort by a seeded hash of the id* — deterministic, seed-
switchable, and append-stable in expectation (new docs interleave uniformly).
``shuffle_order`` assigns every row its global rank ``pos`` under ascending
``(md5(id || ':' || seed), id)`` WITHOUT a global sort exchange:

1. per-row key + hex-prefix bucket — because the bucket is a MONOTONIC
   function of a prefix of the sort key, bucket order == key order, so
   global rank = bucket offset + rank within bucket;
2. per-bucket counts via a tiny combiner groupby (exchange bytes:
   O(blocks × n_buckets) count rows, never row data); the driver
   prefix-sums ``n_buckets`` scalars into offsets;
3. one real exchange: ``groupby(bucket).map_groups`` sorts each bucket
   locally and adds its offset.

This is the same O(buckets)-driver two-phase scan as
:mod:`.packing` (Blelloch CMU-CS-90-190), specialised to ranking.  The
bucket count scales with the data (default ``max(256, bytes // 64 MiB)``)
so one bucket ≈ one comfortable map_groups task at ANY corpus size — at
100 TB that is ~1.6 M buckets of ~64 MiB each, and the driver's prefix sum
is still a trivial scalar loop.  The md5 keys are uniform, so buckets are
balanced by construction; the one exchange moves each row exactly once —
strictly cheaper than ``Dataset.sort`` (range sampling + sort exchange) and
exactly reproducible in SQL (``ROW_NUMBER() OVER (ORDER BY md5key, id)``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .sampling import _md5_keys

_TARGET_BUCKET_BYTES = 64 << 20


def hex_prefix_ints(keys: np.ndarray, width: int) -> np.ndarray:
    """Vectorized ``int(k[:width], 16)`` over an array of lowercase hex
    strings (no per-row Python int parsing).  ``width`` ≤ 15 keeps the
    result in int64."""
    if width > 15:
        raise ValueError(f"width must be <= 15 for int64 safety, got {width}")
    # dtype='S{width}' truncates each string to its first `width` ASCII
    # bytes — exactly the hex prefix — in one C-level pass.
    raw = np.frombuffer(
        np.asarray(keys, dtype=f"S{width}").tobytes(), dtype=np.uint8
    ).reshape(-1, width)
    nib = np.where(raw >= ord("a"), raw - (ord("a") - 10), raw - ord("0")).astype(
        np.int64
    )
    out = np.zeros(len(keys), dtype=np.int64)
    for j in range(width):
        out = out * 16 + nib[:, j]
    return out


def derive_n_buckets(size_bytes: int | None, floor: int = 256) -> int:
    """Bucket count for a two-phase scan: one bucket per ~64 MiB of input,
    never fewer than ``floor`` (keeps small inputs parallel)."""
    if not size_bytes:
        return floor
    return max(floor, int(size_bytes) // _TARGET_BUCKET_BYTES)


def bucket_of_keys(keys: np.ndarray, n_buckets: int) -> np.ndarray:
    """Order-preserving bucket id in ``[0, n_buckets)`` from hex sort keys:
    ``floor(prefix_int * n_buckets / 16**width)`` — monotonic in the key,
    so bucket order == key order (the invariant the scan relies on)."""
    width = 1
    while (16**width) < n_buckets and width < 15:
        width += 1
    pref = hex_prefix_ints(keys, width)
    return (pref * n_buckets) // (16**width)


def shuffle_order(
    ds,
    id_col: str = "doc_id",
    seed: int = 42,
    out_col: str = "pos",
    n_buckets: int | None = None,
):
    """Add ``out_col`` = the row's global rank (0-based int64) under
    ascending ``(md5(id || ':' || seed), id)`` — a deterministic global
    shuffle.  Ids must be unique (ranks would be ambiguous otherwise).

    ``n_buckets`` controls only the exchange layout, never the output
    (rank is global); default scales with input size so each bucket is a
    bounded-size map_groups task.
    """
    # materialize ONCE: the counts pass and the rank pass both consume it
    ds = ds.materialize()
    if n_buckets is None:
        n_buckets = derive_n_buckets(ds.size_bytes())
    nb = int(n_buckets)

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        keys = _md5_keys(b[id_col].to_numpy(), seed)
        b["__key"] = keys
        b["__bkt"] = bucket_of_keys(keys, nb)
        return b

    kds = ds.map_batches(keyed, batch_format="pandas").materialize()

    def partial_counts(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("__bkt").size().reset_index(name="n")

    counts = (
        kds.map_batches(partial_counts, batch_format="pandas")
        .groupby("__bkt")
        .sum("n")
        .to_pandas()
    )
    counts = counts.sort_values("__bkt")
    offsets: dict[int, int] = {}
    run = 0
    for bkt, n in zip(counts["__bkt"], counts["sum(n)"]):
        offsets[int(bkt)] = run
        run += int(n)

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__key", id_col], kind="mergesort").copy()
        g[out_col] = offsets[int(g["__bkt"].iloc[0])] + np.arange(
            len(g), dtype=np.int64
        )
        return g.drop(columns=["__key", "__bkt"])

    return kds.groupby("__bkt").map_groups(rank, batch_format="pandas")
