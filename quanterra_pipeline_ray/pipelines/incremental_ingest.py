"""Continuous-ingest dedup: the persisted-index lifecycle as one flow.

The 100-TB curation loop is not "dedup the corpus once"; it is "every
arriving batch must be vetted against everything already accepted, then
become part of that history".  This module composes the pieces built for
that story:

1. **probe** — the batch is checked against the persisted prefix-posting
   Jaccard index (:mod:`..functions.jaccard_index`): every exact n-gram
   ``J >= threshold`` pair touching the batch, new-vs-history AND
   new-vs-new, at O(batch + matching partitions) cost;
2. **select survivors** — accepted-history docs always win; within the
   batch, the deterministic greedy rule (ascending id: a doc is dropped iff
   it pairs with an accepted earlier doc).  The greedy runs on the
   driver over the PAIR LIST only (candidate-bounded metadata, never row
   data) because each decision depends on the previous ones — the one
   inherently sequential step, O(pairs);
3. **append + extend** — survivors are appended to the corpus store (one
   parquet batch file per ingest, resumable layout) and indexed, so the
   NEXT batch's probe sees them.  Extend is append-only (new posting files
   + df deltas): no rewrite of history at any batch.

Everything upstream of the greedy step is the distributed machinery already
oracle-verified (`jaccard_incremental_docs`); the flow's own tests assert
the sequential-greedy semantics against a brute-force reference.

Concurrency contract: ONE ingester per store.  This is semantic, not an
implementation shortcut — batch N+1's probe must observe batch N's
survivors (the accepted-history-wins rule orders batches), so concurrent
ingest has no meaningful answer; a deployment wanting parallel intake
shards the stream by a stable key into independent stores (cross-shard
dups are then handled by a periodic batch join, the standard
lambda-architecture split).  The transcript TABLE's commits, by contrast,
are CAS-protected multi-writer (see ``state/manifest.py``).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from ..functions.jaccard_index import (
    build_jaccard_index,
    extend_jaccard_index,
    probe_jaccard_index,
)

_CORPUS = "corpus"
_INDEX = "jindex"
_STATE = "ingest_state.json"


def _survivors(batch_ids: np.ndarray, pairs: pd.DataFrame) -> tuple[set, list]:
    """Greedy ascending-id survivor selection over the probe's pair list.

    History docs (ids not in ``batch_ids``) are always accepted; a batch doc
    is dropped iff it pairs with an accepted doc of smaller processing rank
    (history first, then batch ids ascending).  Returns
    ``(kept_batch_ids, drops)`` where drops are ``(dropped_id, kept_id)``.
    """
    batch_set = set(int(i) for i in batch_ids)
    if "a" not in pairs.columns:  # schema-less empty frame
        return batch_set, []
    # adjacency over the candidate pairs only
    adj: dict[int, list[int]] = {}
    for a, b in zip(pairs["a"].astype(int), pairs["b"].astype(int)):
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    kept: set = set()
    drops: list = []
    for d in sorted(batch_set):
        blocker = None
        for n in adj.get(d, ()):  # bounded by the doc's pair degree
            if n not in batch_set or (n in kept and n < d):
                blocker = n
                break
        if blocker is None:
            kept.add(d)
        else:
            drops.append((d, int(blocker)))
    return kept, drops


def ingest_with_dedup(
    batch_ds,
    store_dir: str,
    *,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    n_buckets: int = 256,
) -> dict:
    """Vets one ingest batch against the store's accepted history, appends
    the survivors, and indexes them.  First call creates the store.
    Returns ``{"batch_no", "n_batch", "n_kept", "n_dropped", "drops"}``.
    """
    import ray.data

    corpus_dir = os.path.join(store_dir, _CORPUS)
    index_dir = os.path.join(store_dir, _INDEX)
    state_path = os.path.join(store_dir, _STATE)
    os.makedirs(corpus_dir, exist_ok=True)
    state = (
        json.load(open(state_path)) if os.path.exists(state_path) else {"batches": 0, "docs": 0}
    )
    batch_ds = batch_ds.materialize()
    batch_ids = (
        batch_ds.map_batches(
            lambda b: pd.DataFrame({"i": b[id_col]}), batch_format="pandas"
        )
        .to_pandas()["i"]
        .to_numpy()
    )

    if state["batches"] == 0:
        # bootstrap: the batch dedups against itself only
        empty = ray.data.from_pandas(
            pd.DataFrame({id_col: pd.Series(dtype="int64"), text_col: pd.Series(dtype="object")})
        )
        build_jaccard_index(
            empty, index_dir, id_col=id_col, text_col=text_col,
            shingle_k=shingle_k, n_buckets=n_buckets,
        )
        pairs = probe_jaccard_index(
            batch_ds, index_dir, batch_ds, threshold=threshold,
            id_col=id_col, text_col=text_col,
        ).to_pandas()
    else:
        corpus_ds = ray.data.read_parquet(corpus_dir, columns=[id_col, text_col])
        pairs = probe_jaccard_index(
            batch_ds, index_dir, corpus_ds.union(batch_ds), threshold=threshold,
            id_col=id_col, text_col=text_col,
        ).to_pandas()

    kept_ids, drops = _survivors(batch_ids, pairs)
    kept_ref = np.array(sorted(kept_ids), dtype=np.int64)

    def keep_only(b: pd.DataFrame) -> pd.DataFrame:
        return b[np.isin(b[id_col].to_numpy(), kept_ref)][[id_col, text_col]]

    survivors = batch_ds.map_batches(keep_only, batch_format="pandas").materialize()
    n_kept = survivors.count()
    if n_kept:
        survivors.write_parquet(os.path.join(corpus_dir, f"batch-{state['batches']:05d}"))
        extend_jaccard_index(survivors, index_dir, id_col=id_col, text_col=text_col)

    state["batches"] += 1
    state["docs"] += int(n_kept)
    tmp = state_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, state_path)
    return {
        "batch_no": state["batches"] - 1,
        "n_batch": int(len(batch_ids)),
        "n_kept": int(n_kept),
        "n_dropped": int(len(batch_ids) - n_kept),
        "drops": drops,
    }
