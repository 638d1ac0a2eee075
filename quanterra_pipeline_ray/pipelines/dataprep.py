"""Pretraining-data prep flow: gate → dedup → rebalance → pack.

Companion flagship to :mod:`.curation` covering the OTHER half of a
training-data nightly: after curation decides *which* docs are good, this
flow decides *what the training mix looks like* and lays the survivors out
as fixed-budget sequences — the exact shape a dataloader consumes:

    read -> quality gate (vectorized str kernels)
         -> exact dedup (min-id survivor per distinct text; 64-bucket
            fingerprint groupby)
         -> per-source quota (deterministic md5 draw, pre-shuffle top-cap
            combiner — the pretraining-mix rebalance)
         -> sequence packing (distributed prefix-sum scan, docs cut every
            ``capacity`` tokens in doc_id order)

Every stage is an independently oracle-verified operator, and the whole
composition remains SQL-expressible — the driver checks the four-stage
chain end-to-end against one chained-CTE oracle (``dataprep_flow``), the
same bar the curation flow meets.  One Ray lineage, no corpus-sized driver
state: dedup ships fingerprint groups, the quota ships O(groups × cap) per
block, packing's driver state is O(n_buckets) partial sums.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.packing import pack_sequences
from ..functions.sampling import quota_sample


def prep_documents(
    ds,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    min_quality: float = 0.8,
    min_tokens: int = 20,
    quota_cap: int = 120,
    capacity: int = 2048,
    seed: int = 42,
):
    """Run the gate → exact-dedup → quota → pack chain; returns a Dataset
    ``(id, group, n_tokens, seq_id)``."""

    def gate(b: pd.DataFrame) -> pd.DataFrame:
        s = b[text_col].astype(str)
        n_chars = s.str.len().to_numpy(dtype=np.int64)
        tok_chars = (n_chars - s.str.count(r"\s").to_numpy(dtype=np.int64))
        n_tokens = s.str.count(r"\S+").to_numpy(dtype=np.int64)
        keep = (tok_chars / np.maximum(n_chars, 1) >= min_quality) & (n_tokens >= min_tokens)
        out = b[[id_col, group_col, text_col]].copy()
        out["n_tokens"] = n_tokens
        return out[keep]

    gated = ds.map_batches(gate, batch_format="pandas")

    # exact dedup: min-id survivor per distinct text (the same fingerprint
    # bucketing as functions.dedup.exact_dedup, inlined to carry extra cols)
    def add_fp(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(b[text_col].astype(str), index=False).to_numpy(
            dtype=np.uint64
        )
        b = b.copy()
        b["__bkt"] = (h % 64).astype(np.int64)
        return b

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="mergesort")
        return g.drop_duplicates(subset=[text_col], keep="first").drop(columns="__bkt")

    deduped = (
        gated.map_batches(add_fp, batch_format="pandas")
        .groupby("__bkt")
        .map_groups(keep_min, batch_format="pandas")
    )

    balanced = quota_sample(deduped, group_col, quota_cap, id_col=id_col, seed=seed)
    packed = pack_sequences(
        balanced.map_batches(
            lambda b: b[[id_col, group_col, "n_tokens"]], batch_format="pandas"
        ),
        token_col="n_tokens",
        order_col=id_col,
        capacity=capacity,
    )
    return packed


def write_prepped(ds, out_dir: str, partition_col: str = "group"):
    """Partition-spec-aware output: one hive directory per mix group, so a
    dataloader (or a resumed run) reads ONLY the groups it needs — the
    resumable-output contract (never one giant file; failed runs skip
    finished partitions; downstream reads prune at the directory level)."""
    ds.write_parquet(out_dir, partition_cols=[partition_col])
    return out_dir


def read_prepped(out_dir: str, groups: list[str] | None = None, partition_col: str = "group"):
    """Pruned read-back: with ``groups``, only those hive directories are
    opened (directory-level pruning — the other partitions' bytes never
    leave storage)."""
    import glob
    import os

    import ray.data as rd

    if groups is None:
        return rd.read_parquet(out_dir)
    paths = []
    for g in groups:
        paths.extend(sorted(glob.glob(os.path.join(out_dir, f"{partition_col}={g}", "*.parquet"))))
    return rd.read_parquet(paths)
