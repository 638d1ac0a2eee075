"""Deterministic global shuffle order for training-data layout.

A dataloader wants the corpus in a reproducible pseudo-random order; the
standard trick is *sort by a seeded hash of the id* — deterministic, seed-
switchable, and append-stable in expectation (new docs interleave uniformly).
``shuffle_order`` assigns every row its global rank ``pos`` under ascending
``(md5(id || ':' || seed), id)`` WITHOUT a global sort exchange:

1. per-row key + one-hex-byte bucket (``int(key[:2], 16)``) — because the
   bucket is a PREFIX of the sort key, bucket order == key order, so global
   rank = bucket offset + rank within bucket;
2. per-bucket counts via a tiny combiner groupby (exchange bytes:
   O(blocks × 256) count rows, never row data); the driver prefix-sums 256
   scalars into offsets;
3. one real exchange: ``groupby(bucket).map_groups`` sorts each bucket
   locally and adds its offset.

This is the same O(buckets)-driver two-phase scan as
:mod:`.packing` (Blelloch CMU-CS-90-190), specialised to ranking.  At
100 TB the md5 keys are uniform, so 256 buckets are balanced by
construction; the one exchange moves each row exactly once — strictly
cheaper than ``Dataset.sort`` (range sampling + sort exchange) and exactly
reproducible in SQL (``ROW_NUMBER() OVER (ORDER BY md5key, id)``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .sampling import _md5_keys


def shuffle_order(
    ds,
    id_col: str = "doc_id",
    seed: int = 42,
    out_col: str = "pos",
):
    """Add ``out_col`` = the row's global rank (0-based int64) under
    ascending ``(md5(id || ':' || seed), id)`` — a deterministic global
    shuffle.  Ids must be unique (ranks would be ambiguous otherwise)."""

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        keys = _md5_keys(b[id_col].to_numpy(), seed)
        b["__key"] = keys
        b["__bkt"] = np.array([int(k[:2], 16) for k in keys], dtype=np.int64)
        return b

    # materialize ONCE: the counts pass and the rank pass both consume it
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
