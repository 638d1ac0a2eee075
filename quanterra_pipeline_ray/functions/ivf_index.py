"""Persisted IVF index over an embedding column: the incremental ANN story.

:func:`..functions.similarity.ivf_topk` re-samples centroids and re-assigns
the whole corpus per call.  At 100 TB the coarse quantizer is a *maintained
artifact*: centroids are chosen once (seeded distributed sample), every
vector is routed to its nearest centroid's hive partition on ingest, and a
query reads ONLY its ``nprobe`` nearest lists' partitions — search cost is
O(queries x probed partitions), independent of corpus size.  This mirrors
:mod:`.jaccard_index` (same build/extend/probe lifecycle, same
partition-pruned reads), with the coarse quantizer playing the role of the
shingle hash.

Layout under ``index_dir``:

* ``vectors/lst=*/``    — ``(vec_id, embedding)`` hive-partitioned by the
  FROZEN nearest-centroid assignment; append-only (extend writes new files,
  never rewrites).
* ``centroids.parquet`` — ``(list_id, centroid)``; tiny, driver-loadable.
* ``meta.json``         — ``n_lists`` / dim / counters.

Because centroids are frozen at build time, assignment is a pure function of
the vector — readers recompute it with one small matmul instead of storing a
list column per row, so partition files stay schema-identical to the source
and ties stay deterministic (``argmax``).

Exactness: with ``nprobe == n_lists`` every partition is probed and search
equals brute-force cosine top-k (the oracle-checkable configuration);
smaller ``nprobe`` trades recall for reads, the standard IVF contract.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd

from .dedup import _dedupe_pairs
from .similarity import (
    CosineScorer,
    _global_topk,
    _normalize,
    _stack,
    seeded_sample_vectors,
)
from ..util import pool_size as _pool_size

_META = "meta.json"
_VECTORS = "vectors"
_CENTROIDS = "centroids.parquet"


def _load_centroids(index_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """(normalized centroid matrix, list_id per ROW).  List ids are
    contiguous at build time but grow GAPS after a rebalance (hot ids are
    replaced by fresh child ids), so every argmax/argsort over the matrix
    must be mapped through the id vector — a raw row position is NOT a
    list id."""
    c = pd.read_parquet(os.path.join(index_dir, _CENTROIDS)).sort_values("list_id")
    return _normalize(_stack(c["centroid"])), c["list_id"].to_numpy(dtype=np.int64)


def _assign_and_write(
    ds, index_dir: str, centroids: np.ndarray, list_ids: np.ndarray, id_col: str, vec_col: str
) -> int:
    """Route each vector to its nearest centroid's hive partition (append)."""
    c_norm = _normalize(centroids)
    ids = np.asarray(list_ids, dtype=np.int64)

    # plain function, not an actor class: routing holds no per-actor state
    # (the small centroid matrix rides the closure), and a task pool skips
    # the actor-pool startup latency on every build/extend call
    def route(b: pd.DataFrame) -> pd.DataFrame:
        v = _normalize(_stack(b[vec_col]))
        out = b[[id_col, vec_col]].copy()
        out["lst"] = ids[np.argmax(v @ c_norm.T, axis=1)]
        return out

    routed = ds.map_batches(route, batch_format="pandas").materialize()
    routed.write_parquet(os.path.join(index_dir, _VECTORS), partition_cols=["lst"])
    return routed.count()


def build_ivf_index(
    ds,
    index_dir: str,
    *,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> dict:
    """Create a persisted IVF index: seeded distributed centroid sample,
    then route-and-write every vector; returns the meta dict."""
    os.makedirs(index_dir, exist_ok=True)
    centroids = _normalize(seeded_sample_vectors(ds, n_lists, id_col, vec_col, seed))
    pd.DataFrame(
        {
            "list_id": np.arange(len(centroids), dtype=np.int64),
            "centroid": [row.tolist() for row in centroids],
        }
    ).to_parquet(os.path.join(index_dir, _CENTROIDS))
    n = _assign_and_write(
        ds, index_dir, centroids, np.arange(len(centroids), dtype=np.int64), id_col, vec_col
    )
    meta = {
        "version": 1,
        "n_lists": int(len(centroids)),
        "dim": int(centroids.shape[1]),
        "id_col": id_col,
        "vec_col": vec_col,
        "n_vectors": n,
    }
    with open(os.path.join(index_dir, _META), "w") as f:
        json.dump(meta, f)
    return meta


def read_ivf_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _META)) as f:
        return json.load(f)


def extend_ivf_index(ds, index_dir: str) -> dict:
    """Append a new vector batch under the FROZEN centroids — O(batch)
    routing + new partition files; existing files are never touched."""
    meta = read_ivf_meta(index_dir)
    centroids, list_ids = _load_centroids(index_dir)
    n = _assign_and_write(ds, index_dir, centroids, list_ids, meta["id_col"], meta["vec_col"])
    meta["n_vectors"] += n
    with open(os.path.join(index_dir, _META), "w") as f:
        json.dump(meta, f)
    return meta


def list_sizes(index_dir: str) -> pd.Series:
    """Rows per list from parquet FOOTERS of the hive dirs — O(files) driver
    metadata, never vector data.  The skew diagnostic for rebalance."""
    import pyarrow.parquet as pq

    sizes: dict[int, int] = {}
    for d in glob.glob(os.path.join(index_dir, _VECTORS, "lst=*")):
        lst = int(os.path.basename(d).split("=", 1)[1])
        n = 0
        for f in glob.glob(os.path.join(d, "*.parquet")):
            n += pq.read_metadata(f).num_rows
        sizes[lst] = n
    return pd.Series(sizes, dtype=np.int64).sort_index()


def rebalance_ivf_index(
    index_dir: str,
    *,
    max_ratio: float = 4.0,
    seed: int = 7,
) -> dict:
    """Split HOT lists (> ``max_ratio`` x the mean list size) so a drifting
    embedding distribution cannot degrade the index to a few giant lists.

    Each hot list's centroid is REPLACED by ``ceil(size/mean)`` child
    centroids (a seeded sample of that list's own vectors); only the hot
    lists' partitions are rewritten — the split re-routes their vectors
    under the FULL new centroid set, so split vectors land exactly in their
    argmax partition.  O(hot lists) data touched, never the corpus.

    Crash ordering (the centroid table is the commit point):

    1. child partition files are written (new list ids — invisible until
       the table names them);
    2. ``centroids.parquet`` + meta are swapped in (atomic rename);
    3. the replaced hot dirs are deleted (cleanup; a crash before this
       leaves dirs whose ids are absent from the table — never probed,
       swept at the start of the next rebalance).

    Recall contract after a split: vectors in UNSPLIT lists stay in their
    write-time partition; a boundary vector whose argmax moved to a new
    child is still found whenever its stored list is probed, and
    ``nprobe == n_lists`` remains provably exact (every partition read).
    This is the standard IVF split trade; a full re-route is a rebuild.
    """
    import shutil as _shutil

    import ray.data

    meta = read_ivf_meta(index_dir)
    id_col, vec_col = meta["id_col"], meta["vec_col"]

    # sweep orphans from a previous crash-between-steps (ids not in table)
    known = set(
        int(x)
        for x in pd.read_parquet(os.path.join(index_dir, _CENTROIDS))["list_id"]
    )
    for d in glob.glob(os.path.join(index_dir, _VECTORS, "lst=*")):
        if int(os.path.basename(d).split("=", 1)[1]) not in known:
            _shutil.rmtree(d)

    sizes = list_sizes(index_dir)
    total = int(sizes.sum())
    if not len(sizes) or total == 0:
        return meta
    mean = total / len(sizes)
    hot = [int(l) for l, n in sizes.items() if n > max_ratio * mean]
    if not hot:
        meta["last_rebalance"] = {"hot": [], "split": 0}
        with open(os.path.join(index_dir, _META), "w") as f:
            json.dump(meta, f)
        return meta

    cent = pd.read_parquet(os.path.join(index_dir, _CENTROIDS))
    next_id = int(cent["list_id"].max()) + 1
    new_rows = [cent[~cent["list_id"].isin(hot)]]
    child_ids: dict[int, list[int]] = {}
    for lst in hot:
        k = max(2, int(np.ceil(sizes[lst] / mean)))
        part = ray.data.read_parquet(_partition_files(index_dir, [lst]), columns=[id_col, vec_col])
        kids = _normalize(seeded_sample_vectors(part, k, id_col, vec_col, seed + lst))
        ids = list(range(next_id, next_id + len(kids)))
        next_id += len(kids)
        child_ids[lst] = ids
        new_rows.append(
            pd.DataFrame(
                {"list_id": np.array(ids, dtype=np.int64), "centroid": [r.tolist() for r in kids]}
            )
        )
    new_cent = pd.concat(new_rows, ignore_index=True).sort_values("list_id")
    full = _normalize(_stack(new_cent["centroid"]))
    id_of_row = new_cent["list_id"].to_numpy(dtype=np.int64)

    # 1. re-route ONLY the hot lists' vectors under the FULL new set
    def route(b: pd.DataFrame) -> pd.DataFrame:
        v = _normalize(_stack(b[vec_col]))
        out = b[[id_col, vec_col]].copy()
        out["lst"] = id_of_row[np.argmax(v @ full.T, axis=1)]
        return out

    for lst in hot:
        part = ray.data.read_parquet(_partition_files(index_dir, [lst]), columns=[id_col, vec_col])
        part.map_batches(route, batch_format="pandas").write_parquet(
            os.path.join(index_dir, _VECTORS), partition_cols=["lst"]
        )

    # 2. commit point: the centroid table names the children, drops the hot ids
    tmp = os.path.join(index_dir, _CENTROIDS + ".tmp")
    new_cent.reset_index(drop=True).to_parquet(tmp)
    os.replace(tmp, os.path.join(index_dir, _CENTROIDS))
    meta["n_lists"] = int(len(new_cent))
    meta["centroid_version"] = int(meta.get("centroid_version", 1)) + 1
    meta["last_rebalance"] = {"hot": hot, "split": {str(h): child_ids[h] for h in hot}}
    with open(os.path.join(index_dir, _META), "w") as f:
        json.dump(meta, f)

    # 3. cleanup the replaced dirs
    for lst in hot:
        d = os.path.join(index_dir, _VECTORS, f"lst={lst}")
        if os.path.isdir(d):
            _shutil.rmtree(d)
    return meta


def _partition_files(index_dir: str, lists) -> list[str]:
    """Data files of the probed hive partitions — the pruned read set."""
    files = []
    for lst in sorted(set(int(x) for x in lists)):
        files.extend(
            sorted(glob.glob(os.path.join(index_dir, _VECTORS, f"lst={lst}", "*.parquet")))
        )
    return files


def search_ivf_index(
    queries: np.ndarray,
    index_dir: str,
    *,
    k: int = 10,
    nprobe: int = 4,
) -> pd.DataFrame:
    """Cosine top-k of each query against the index, reading ONLY the
    ``nprobe`` nearest lists' partitions per query (union across queries).
    ``nprobe == n_lists`` is provably exact.  Row list membership is
    recomputed from the frozen centroids (pure function, see module doc) for
    the per-query probe mask."""
    import ray.data

    meta = read_ivf_meta(index_dir)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    centroids, list_ids = _load_centroids(index_dir)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    # rows -> list ids: positions and ids diverge after a rebalance
    probe_lists = list_ids[
        np.argsort(-(q @ centroids.T), kind="stable", axis=1)[
            :, : min(nprobe, len(centroids))
        ]
    ]
    probed = np.unique(probe_lists)
    files = _partition_files(index_dir, probed)
    # probe lineage (parity with the jaccard index's probe stats): how much
    # of the index the pruned read actually touched
    stats = {
        "lists_total": int(len(list_ids)),
        "lists_read": int(len(probed)),
        "files_read": int(len(files)),
    }
    tmp = os.path.join(index_dir, "_probe_stats.json.tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, os.path.join(index_dir, "_probe_stats.json"))
    if not files:
        return pd.DataFrame({"query_id": [], id_col: [], "score": []})

    class _ProbeScorer(CosineScorer):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return pd.DataFrame({"query_id": [], self.id_col: [], "score": []})
            v = _normalize(_stack(batch[self.vec_col]))
            ids = batch[self.id_col].to_numpy()
            lists = list_ids[np.argmax(v @ centroids.T, axis=1)]
            rows = []
            for qi in range(self.q.shape[0]):
                mask = np.isin(lists, probe_lists[qi])
                if not mask.any():
                    continue
                s = self.q[qi] @ v[mask].T
                kk = min(self.k, s.size)
                sel = np.argpartition(-s, kk - 1)[:kk]
                rows.append(
                    pd.DataFrame({"query_id": qi, self.id_col: ids[mask][sel], "score": s[sel]})
                )
            if not rows:
                return pd.DataFrame({"query_id": [], self.id_col: [], "score": []})
            return pd.concat(rows, ignore_index=True)

    local = ray.data.read_parquet(files, columns=[id_col, vec_col]).map_batches(
        _ProbeScorer,
        fn_constructor_kwargs=dict(queries=queries, k=k, id_col=id_col, vec_col=vec_col),
        batch_format="pandas",
        concurrency=_pool_size(4),
    )
    return _global_topk(local, k, id_col)


def probe_ivf_near_dups(
    new_ds,
    index_dir: str,
    *,
    threshold: float = 0.95,
    probes: int = 2,
    n_buckets_pairs: int = 64,
):
    """Cosine near-dup pairs touching the new batch (new-vs-indexed and
    new-vs-new): each new vector is multi-assigned to its ``probes`` nearest
    lists; only those lists' partitions are read; each list computes one
    matmul of its new members against all its members.  Candidate recall
    follows the same IVF-blocking contract as
    :func:`..functions.similarity.embedding_near_dup_pairs` (a pair is found
    unless it straddles more than ``probes`` centroids)."""
    import ray.data

    meta = read_ivf_meta(index_dir)
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    centroids, list_ids = _load_centroids(index_dir)

    def route_new(b: pd.DataFrame) -> pd.DataFrame:
        v = _normalize(_stack(b[vec_col]))
        top = list_ids[
            np.argsort(-(v @ centroids.T), kind="stable", axis=1)[:, : min(probes, len(centroids))]
        ]
        reps = []
        for j in range(top.shape[1]):
            r = b[[id_col, vec_col]].copy()
            r["lst"] = top[:, j].astype(np.int64)
            r["side"] = np.int8(0)
            reps.append(r)
        return pd.concat(reps, ignore_index=True)

    new_routed = new_ds.map_batches(route_new, batch_format="pandas").materialize()
    if new_routed.count() == 0:
        return ray.data.from_pandas(
            pd.DataFrame(
                {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"), "cosine": pd.Series(dtype="float64")}
            )
        )
    probed = (
        new_routed.map_batches(
            lambda b: pd.DataFrame({"lst": pd.unique(b["lst"])}), batch_format="pandas"
        )
        .to_pandas()["lst"]
        .unique()
    )
    files = _partition_files(index_dir, probed)

    def tag_indexed(b: pd.DataFrame) -> pd.DataFrame:
        v = _normalize(_stack(b[vec_col]))
        out = b[[id_col, vec_col]].copy()
        out["lst"] = list_ids[np.argmax(v @ centroids.T, axis=1)]
        out["side"] = np.int8(1)
        return out[out["lst"].isin(probed)]

    both = new_routed
    if files:
        idx = ray.data.read_parquet(files, columns=[id_col, vec_col]).map_batches(
            tag_indexed, batch_format="pandas"
        )
        both = both.union(idx)

    def pairs_in_list(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("side", kind="stable").drop_duplicates(subset=[id_col])
        news = g[g["side"] == 0]
        if not len(news) or len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "cosine": []})
        ids = g[id_col].to_numpy()
        m = _normalize(_stack(g[vec_col]))
        nm = _normalize(_stack(news[vec_col]))
        nids = news[id_col].to_numpy()
        s = nm @ m.T  # (new, all-in-list)
        ii, jj = np.nonzero(s >= threshold)
        a, b = nids[ii], ids[jj]
        keep = a != b
        a, b, c = a[keep], b[keep], s[ii, jj][keep]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a": lo, "b": hi, "cosine": c}).drop_duplicates(subset=["a", "b"])

    cand = both.groupby("lst").map_groups(pairs_in_list, batch_format="pandas")
    return _dedupe_pairs(cand, n_buckets_pairs)
