"""Similarity search over an embedding column (``list<float>``).

* :func:`brute_force_topk` — exact cosine top-k: the (small) query matrix is
  normalized once on the driver and shipped to each actor at construction;
  every batch does one numpy matmul, emits its local top-k, and a final
  per-query reduce keeps the global top-k.  This is the correctness baseline
  and is embarrassingly parallel over the corpus.
* :func:`ivf_topk` — scale path: IVF-style inverted lists.  Coarse centroids
  are a SEEDED DISTRIBUTED sample (hash-order top-n, unbiased w.r.t. block
  order); vectors are assigned to their nearest centroid in a
  ``map_batches`` stage (broadcast centroid matrix); a query searches only
  its ``nprobe`` nearest lists.  With ``nprobe == n_lists`` the search is
  provably exact (every list probed) while still exercising the IVF
  machinery — the driver-checkable configuration.
* :func:`ivf_assign` — materializes the list assignment as a column so a
  table maintained at scale computes it ONCE and reuses it across queries
  (the assignment is a maintenance artifact, not a per-query cost).
* :func:`embedding_near_dup_pairs` — cosine near-dup pairs blocked by IVF
  list: pairs are emitted only within a list (plus ``assign_probes`` nearest
  lists for recall), one vectorized matmul per list — never an O(N²)
  all-pairs, never a driver-side corpus materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import pool_size as _pool_size


def _stack(col) -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column: ONE concatenate over
    the cell arrays (a single C call) instead of a per-row np.asarray loop —
    embedding cells arrive from Arrow as equal-length numpy arrays."""
    vals = col.to_numpy() if hasattr(col, "to_numpy") else np.asarray(col, dtype=object)
    n = len(vals)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    flat = np.concatenate(vals)
    return flat.astype(np.float64, copy=False).reshape(n, -1)


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
    """Driver-side final reduce: the local top-k stream is BOUNDED at
    ``n_queries * k`` rows per corpus block (never corpus data), so one
    pandas pass beats a sort exchange whose fixed cost dwarfs the reduce.
    Deterministic ordering: score desc, id asc as tiebreak."""
    out = local.to_pandas()
    out = out.sort_values(["score", id_col], ascending=[False, True], kind="mergesort")
    out = out.groupby("query_id", sort=False).head(k)
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


def seeded_sample_vectors(
    ds,
    n: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Deterministic UNBIASED distributed sample of ``n`` vectors.

    Every row gets a seeded hash of its id; each block emits its local ``n``
    smallest-hash rows, and the driver reduces to the global ``n`` smallest —
    a uniform sample independent of block order/count (unlike ``ds.limit``,
    which takes the first blocks and is biased by layout).
    """
    from ..stages.skew import _splitmix64

    def local_min(b: pd.DataFrame) -> pd.DataFrame:
        h = _splitmix64(
            b[id_col].to_numpy().astype(np.uint64)
            ^ np.uint64((seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        )
        take = np.argsort(h, kind="stable")[:n]
        return pd.DataFrame(
            {
                "__h": h[take],
                id_col: b[id_col].to_numpy()[take],
                vec_col: b[vec_col].to_numpy()[take],
            }
        )

    cand = ds.map_batches(local_min, batch_format="pandas").to_pandas()
    cand = cand.sort_values(["__h", id_col], kind="mergesort").head(n)
    return _stack(cand[vec_col])


class _CentroidAssigner:
    """Adds ``__list`` (nearest-centroid id); with ``probes > 1`` emits one
    row per probed list (multi-assign, used by near-dup blocking so border
    vectors appear in their runner-up lists too)."""

    def __init__(self, centroids: np.ndarray, vec_col: str, probes: int = 1):
        self.c = _normalize(np.asarray(centroids, dtype=np.float64))
        self.vec_col = vec_col
        self.probes = min(probes, len(self.c))

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        v = _normalize(_stack(batch[self.vec_col]))
        s = v @ self.c.T
        if self.probes == 1:
            batch["__list"] = np.argmax(s, axis=1).astype(np.int64)
            return batch
        top = np.argsort(-s, kind="stable", axis=1)[:, : self.probes]
        reps = [batch.assign(__list=top[:, j].astype(np.int64)) for j in range(self.probes)]
        return pd.concat(reps, ignore_index=True)


def ivf_assign(
    ds,
    centroids: np.ndarray | None = None,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    concurrency: int = 4,
    probes: int = 1,
):
    """Assign each vector to its nearest coarse centroid (``__list`` column).

    Returns ``(assigned_ds, centroids)``.  At scale, run once as a
    maintenance step, persist the ``__list`` column, and reuse across
    queries; centroids default to a seeded distributed sample.
    """
    if centroids is None:
        sample = seeded_sample_vectors(ds, n_lists, id_col, vec_col, seed)
        centroids = _normalize(sample)
    assigned = ds.map_batches(
        _CentroidAssigner,
        fn_constructor_kwargs=dict(centroids=centroids, vec_col=vec_col, probes=probes),
        batch_format="pandas",
        concurrency=_pool_size(concurrency, pools_in_pipeline=2),
    )
    return assigned, centroids


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
    assigned=None,
    centroids: np.ndarray | None = None,
) -> pd.DataFrame:
    """Approximate cosine top-k via IVF inverted lists.

    Recall grows with ``nprobe``; ``nprobe == n_lists`` probes every list and
    is exactly :func:`brute_force_topk` (the driver-checkable configuration).
    Pass a persisted ``assigned`` dataset (from :func:`ivf_assign`) to skip
    re-assignment — the scale path.
    """
    if assigned is None or centroids is None:
        assigned, centroids = ivf_assign(
            ds, centroids, n_lists, id_col, vec_col, seed, concurrency
        )

    q = _normalize(np.asarray(queries, dtype=np.float64))
    probe_lists = np.argsort(-(q @ centroids.T), kind="stable", axis=1)[
        :, : min(nprobe, len(centroids))
    ]
    probed = np.unique(probe_lists)

    pruned = assigned.map_batches(
        lambda b: b[b["__list"].isin(probed)], batch_format="pandas"
    )

    def _empty_scores(id_col: str) -> pd.DataFrame:
        # typed empty: an empty pandas block with object dtypes would make
        # Ray warn about schema drift across blocks
        return pd.DataFrame(
            {
                "query_id": pd.Series(dtype=np.int64),
                id_col: pd.Series(dtype=np.int64),
                "score": pd.Series(dtype=np.float64),
            }
        )

    class _ProbeScorer(CosineScorer):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return _empty_scores(self.id_col)
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
                return _empty_scores(self.id_col)
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
    n_lists: int = 16,
    assign_probes: int = 2,
    seed: int = 42,
    concurrency: int = 4,
) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).

    IVF-blocked: vectors are multi-assigned to their ``assign_probes``
    nearest lists (border vectors land in their runner-up lists too, so a
    near-identical pair is co-listed unless it straddles > ``assign_probes``
    centroids — measure-zero for thresholds near 1); each list computes one
    vectorized all-pairs matmul over ITS members only.  No corpus-level
    materialization anywhere; output is candidate-bounded.

    Partitioning assumption (documented per the custom-operator contract):
    a list's members fit one task's memory — at 100 TB choose
    ``n_lists ≈ N / (rows-per-task)`` and salt oversized lists.
    """
    assigned, _ = ivf_assign(
        ds, None, n_lists, id_col, vec_col, seed, concurrency, probes=assign_probes
    )

    def pairs_in_list(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col])
        if len(g) < 2:
            return pd.DataFrame(
                {
                    "a": pd.Series(dtype=np.int64),
                    "b": pd.Series(dtype=np.int64),
                    "cosine": pd.Series(dtype=np.float64),
                }
            )
        ids = g[id_col].to_numpy()
        m = _normalize(_stack(g[vec_col]))
        s = m @ m.T
        ii, jj = np.nonzero(s >= threshold)
        a, b = ids[ii], ids[jj]
        keep = a < b
        return pd.DataFrame({"a": a[keep], "b": b[keep], "cosine": s[ii, jj][keep]})

    out = (
        assigned.groupby("__list")
        .map_groups(pairs_in_list, batch_format="pandas")
        .to_pandas()
    )
    # multi-assign can emit the same pair from two lists -> distinct
    return out.drop_duplicates(subset=["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)
