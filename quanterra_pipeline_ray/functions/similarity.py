"""Similarity search over an embedding column (``list<float>``).

* :func:`brute_force_topk` — exact cosine top-k: the (small) query matrix is
  normalized once on the driver and shipped to each actor at construction;
  every batch does one numpy matmul, emits its local top-k, and a final
  per-query reduce keeps the global top-k.  This is the correctness baseline
  and is embarrassingly parallel over the corpus.
* :func:`ivf_topk` — scale path: IVF-style inverted lists.  Coarse centroids
  are a deterministic seeded sample; vectors are assigned to their nearest
  centroid in a ``map_batches`` stage (broadcast centroid matrix); a query
  searches only its ``nprobe`` nearest lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


from ..util import pool_size as _pool_size


def _stack(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.clip(n, 1e-12, None)


class CosineScorer:
    """Actor stage: emits per-batch local top-k (query_id, id, score) rows.

    The normalized query matrix is a constructor argument — shipped once per
    actor, not once per batch."""

    def __init__(self, queries: np.ndarray, k: int, id_col: str, vec_col: str):
        self.q = _normalize(np.asarray(queries, dtype=np.float64))
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        v = _normalize(_stack(batch[self.vec_col]))
        ids = batch[self.id_col].to_numpy()
        scores = self.q @ v.T  # (n_queries, batch)
        k = min(self.k, scores.shape[1])
        top = np.argpartition(-scores, k - 1, axis=1)[:, :k]
        rows = []
        for qi in range(scores.shape[0]):
            sel = top[qi]
            rows.append(
                pd.DataFrame(
                    {"query_id": qi, self.id_col: ids[sel], "score": scores[qi, sel]}
                )
            )
        return pd.concat(rows, ignore_index=True)


def _global_topk(local, k: int, id_col: str) -> pd.DataFrame:
    def reduce_group(g: pd.DataFrame) -> pd.DataFrame:
        # deterministic ordering: score desc, id asc as tiebreak
        g = g.sort_values(["score", id_col], ascending=[False, True], kind="mergesort")
        return g.head(k)

    out = local.groupby("query_id").map_groups(reduce_group, batch_format="pandas").to_pandas()
    return out.sort_values(["query_id", "score", id_col], ascending=[True, False, True]).reset_index(
        drop=True
    )


def brute_force_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 4,
) -> pd.DataFrame:
    """Exact cosine top-k of each query row against the corpus."""
    local = ds.map_batches(
        CosineScorer,
        fn_constructor_kwargs=dict(queries=queries, k=k, id_col=id_col, vec_col=vec_col),
        batch_format="pandas",
        concurrency=_pool_size(concurrency),
    )
    return _global_topk(local, k, id_col)


class _CentroidAssigner:
    def __init__(self, centroids: np.ndarray, vec_col: str):
        self.c = _normalize(np.asarray(centroids, dtype=np.float64))
        self.vec_col = vec_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        v = _normalize(_stack(batch[self.vec_col]))
        batch["__list"] = np.argmax(v @ self.c.T, axis=1).astype(np.int64)
        return batch


def ivf_topk(
    ds,
    queries: np.ndarray,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    concurrency: int = 4,
) -> pd.DataFrame:
    """Approximate cosine top-k via IVF inverted lists.

    Centroids = deterministic seeded corpus sample (cheap, good enough for a
    coarse quantizer); recall grows with ``nprobe``.  The scan stage prunes
    every batch to rows whose list is probed by ANY query, then scores — at
    scale the list assignment is precomputed once and reused across queries.
    """
    # deterministic coarse sample: first blocks (read order is deterministic)
    sample = ds.limit(n_lists * 8).to_pandas()
    sample_vecs = _stack(sample[vec_col])
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample_vecs), size=min(n_lists, len(sample_vecs)), replace=False)
    centroids = _normalize(sample_vecs[idx])

    q = _normalize(np.asarray(queries, dtype=np.float64))
    probe_lists = np.argsort(-(q @ centroids.T), axis=1)[:, : min(nprobe, len(centroids))]
    probed = np.unique(probe_lists)

    assigned = ds.map_batches(
        _CentroidAssigner,
        fn_constructor_kwargs=dict(centroids=centroids, vec_col=vec_col),
        batch_format="pandas",
        concurrency=_pool_size(concurrency, pools_in_pipeline=2),
    )
    pruned = assigned.map_batches(
        lambda b: b[b["__list"].isin(probed)], batch_format="pandas"
    )

    class _ProbeScorer(CosineScorer):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return pd.DataFrame({"query_id": [], self.id_col: [], "score": []})
            v = _normalize(_stack(batch[self.vec_col]))
            ids = batch[self.id_col].to_numpy()
            lists = batch["__list"].to_numpy()
            rows = []
            for qi in range(self.q.shape[0]):
                mask = np.isin(lists, probe_lists[qi])
                if not mask.any():
                    continue
                s = self.q[qi] @ v[mask].T
                kk = min(self.k, s.size)
                sel = np.argpartition(-s, kk - 1)[:kk]
                rows.append(
                    pd.DataFrame(
                        {"query_id": qi, self.id_col: ids[mask][sel], "score": s[sel]}
                    )
                )
            if not rows:
                return pd.DataFrame({"query_id": [], self.id_col: [], "score": []})
            return pd.concat(rows, ignore_index=True)

    local = pruned.map_batches(
        _ProbeScorer,
        fn_constructor_kwargs=dict(queries=queries, k=k, id_col=id_col, vec_col=vec_col),
        batch_format="pandas",
        concurrency=_pool_size(concurrency, pools_in_pipeline=2),
    )
    return _global_topk(local, k, id_col)


def embedding_near_dup_pairs(
    ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 4,
) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).

    Broadcast full normalized matrix (small corpus) or per-batch × corpus
    blocked matmul; each batch emits only its above-threshold pairs."""
    import ray

    full = ds.map_batches(lambda b: b[[id_col, vec_col]], batch_format="pandas").to_pandas()
    ids_all = full[id_col].to_numpy()
    mat = _normalize(_stack(full[vec_col]))
    mat_ref = ray.put((ids_all, mat))

    def pairs_batch(batch: pd.DataFrame) -> pd.DataFrame:
        ids_a, m = ray.get(mat_ref)
        v = _normalize(_stack(batch[vec_col]))
        my_ids = batch[id_col].to_numpy()
        s = v @ m.T
        ii, jj = np.nonzero(s >= threshold)
        a, b = my_ids[ii], ids_a[jj]
        keep = a < b
        return pd.DataFrame({"a": a[keep], "b": b[keep], "cosine": s[ii, jj][keep]})

    out = ds.map_batches(pairs_batch, batch_format="pandas").to_pandas()
    return out.drop_duplicates(subset=["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)
