"""Persisted MinHash-LSH band index: sketch-based incremental near-dup.

Third member of the incremental-dedup triad (exact prefix-posting:
:mod:`.jaccard_index`; embedding IVF: :mod:`.ivf_index`).  Where the exact
index stores one posting per *shingle* (O(doc length) rows), the LSH index
stores ``bands`` rows per doc (16 by default, 20 bytes each) — constant
per-doc metadata, the right trade at 100 TB when probe cost matters more
than deterministic candidate completeness.  Candidate recall is the
standard LSH banding guarantee (a J=0.8 pair collides in ≥1 of 16
4-row bands with p ≈ 1 - (1-0.8^4)^16 ≈ 0.9998; the driver test corpus
plants dups at J ≥ 0.92 where the miss probability is ~2e-9), and every
candidate is exact-verified by char-k-gram Jaccard, so false positives
never survive.

Layout under ``index_dir``:

* ``bands/bkt=*/`` — ``(band int32, bh uint64, doc int64)``,
  hive-partitioned by ``bkt = bh % n_buckets``; append-only.
* ``meta.json``    — signature params (num_hashes / bands / shingle_k /
  seed — FROZEN at build so probe signatures collide with indexed ones),
  ``n_buckets``, counters.

Probe = signature the batch, read only the partitions its band hashes land
in, self-join on ``(band, bh)`` against (index ∪ batch) rows, exact-verify.
Same lifecycle and pruning story as the other two indexes.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from .dedup import (
    MinHasher,
    _band_rows,
    _dedupe_pairs,
    _verify_pairs_dispatch,
)

_META = "meta.json"
_BANDS = "bands"


def _band_rows_fn(meta: dict, id_col: str, text_col: str):
    hasher = MinHasher(
        text_col=text_col,
        num_hashes=int(meta["num_hashes"]),
        shingle_k=int(meta["shingle_k"]),
        seed=int(meta["seed"]),
    )
    bands = int(meta["bands"])
    rpb = int(meta["num_hashes"]) // bands
    nb = int(meta["n_buckets"])

    def rows(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):  # np.stack rejects empty batches
            return pd.DataFrame(
                {
                    "band": pd.Series(dtype="int32"),
                    "bh": pd.Series(dtype="uint64"),
                    "doc": pd.Series(dtype="int64"),
                    "bkt": pd.Series(dtype="int64"),
                }
            )
        sigs = np.stack([hasher.signature(t) for t in b[text_col]])
        br = _band_rows(
            pd.DataFrame({id_col: b[id_col].to_numpy(), "__sig": list(sigs)}),
            id_col,
            bands,
            rpb,
        )
        out = pd.DataFrame(
            {
                "band": br["band"].to_numpy(dtype=np.int32),
                "bh": br["band_hash"].to_numpy(dtype=np.uint64),
                "doc": br[id_col].to_numpy(dtype=np.int64),
            }
        )
        out["bkt"] = (out["bh"].to_numpy(dtype=np.uint64) % nb).astype(np.int64)
        return out

    return rows


def _append_bands(ds, index_dir: str, meta: dict, id_col: str, text_col: str) -> int:
    rows = ds.map_batches(_band_rows_fn(meta, id_col, text_col), batch_format="pandas").materialize()
    n = rows.count()
    if n:
        # one file per (block x bucket): coalesce so a probe's pruned read
        # opens O(extends) files per bucket, not O(blocks x extends)
        rows = rows.repartition(max(1, -(-n // 4_000_000)))
        rows.write_parquet(os.path.join(index_dir, _BANDS), partition_cols=["bkt"])
    return n // int(meta["bands"]) if meta["bands"] else 0


def build_minhash_index(
    ds,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 1234,
    n_buckets: int = 256,
) -> dict:
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    os.makedirs(index_dir, exist_ok=True)
    meta = {
        "version": 1,
        "num_hashes": num_hashes,
        "bands": bands,
        "shingle_k": shingle_k,
        "seed": seed,
        "n_buckets": n_buckets,
        "n_docs": 0,
    }
    meta["n_docs"] = _append_bands(ds, index_dir, meta, id_col, text_col)
    if meta["n_docs"] * bands > 4_000_000:  # multi-block build: merge fragments
        compact_minhash_index(index_dir)
    with open(os.path.join(index_dir, _META), "w") as f:
        json.dump(meta, f)
    return meta


def read_minhash_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _META)) as f:
        return json.load(f)


def extend_minhash_index(
    ds, index_dir: str, *, id_col: str = "doc_id", text_col: str = "text"
) -> dict:
    """Append a batch's band rows under the FROZEN signature params."""
    meta = read_minhash_meta(index_dir)
    meta["n_docs"] += _append_bands(ds, index_dir, meta, id_col, text_col)
    with open(os.path.join(index_dir, _META), "w") as f:
        json.dump(meta, f)
    # same fragment-accumulation story as the jaccard extends
    compact_minhash_index(index_dir, min_files_per_bucket=8)
    return meta


def _partition_files(index_dir: str, buckets) -> list[str]:
    import glob

    files = []
    for bkt in sorted(set(int(x) for x in buckets)):
        files.extend(
            sorted(glob.glob(os.path.join(index_dir, _BANDS, f"bkt={bkt}", "*.parquet")))
        )
    return files


def probe_minhash_index(
    new_ds,
    index_dir: str,
    corpus_ds,
    *,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets_pairs: int = 64,
):
    """Near-dup pairs ``(a, b)`` (exact-verified ``J >= threshold``) touching
    the batch — new-vs-indexed and new-vs-new.  Only the partitions the
    batch's band hashes land in are read."""
    import ray.data

    meta = read_minhash_meta(index_dir)
    nb = int(meta["n_buckets"])
    new_rows = (
        new_ds.map_batches(_band_rows_fn(meta, id_col, text_col), batch_format="pandas")
        .materialize()
    )
    if new_rows.count() == 0:
        from .jaccard_index import _empty_pairs

        return _empty_pairs()
    bkts = (
        new_rows.map_batches(
            lambda b: pd.DataFrame({"bkt": pd.unique(b["bkt"])}), batch_format="pandas"
        )
        .to_pandas()["bkt"]
        .unique()
    )
    files = _partition_files(index_dir, bkts)

    def tag(side: int):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            out = b[["band", "bh", "doc"]].copy()
            out["bkt"] = (out["bh"].to_numpy(dtype=np.uint64) % nb).astype(np.int64)
            out["side"] = np.int8(side)
            return out

        return f

    both = new_rows.map_batches(tag(0), batch_format="pandas")
    full = new_rows.map_batches(tag(1), batch_format="pandas")
    if files:
        idx = ray.data.read_parquet(files, columns=["band", "bh", "doc"]).map_batches(
            tag(1), batch_format="pandas"
        )
        full = full.union(idx)
    both = both.union(full)

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        probe = g[g["side"] == 0][["band", "bh", "doc"]].drop_duplicates()
        cand = g[g["side"] == 1][["band", "bh", "doc"]].drop_duplicates()
        if not len(probe) or not len(cand):
            return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
        m = probe.merge(cand, on=["band", "bh"])
        m = m[m["doc_x"] != m["doc_y"]]
        if not len(m):
            return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
        a = np.minimum(m["doc_x"].to_numpy(), m["doc_y"].to_numpy()).astype(np.int64)
        b = np.maximum(m["doc_x"].to_numpy(), m["doc_y"].to_numpy()).astype(np.int64)
        return pd.DataFrame({"a": a, "b": b}).drop_duplicates()

    cand = both.groupby("bkt").map_groups(emit_pairs, batch_format="pandas")
    pairs = _dedupe_pairs(cand, n_buckets_pairs).materialize()
    if pairs.count() == 0:
        from .jaccard_index import _empty_pairs

        return _empty_pairs()
    return _verify_pairs_dispatch(
        pairs, corpus_ds, id_col, text_col, threshold, int(meta["shingle_k"]), n_buckets_pairs
    )


def compact_minhash_index(index_dir: str, min_files_per_bucket: int = 2) -> dict:
    """Merge each bucket's band-row fragment files into one (distinct
    ``(band, bh, doc)``) — same index-compaction contract as
    :func:`..jaccard_index.compact_jaccard_index`: the merged file lands
    before fragments are deleted, and a crash leaving both is correct
    because the candidate join consumes band rows distinct."""
    import glob
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    bdir = os.path.join(index_dir, _BANDS)
    items = []
    for d in sorted(glob.glob(os.path.join(bdir, "bkt=*"))):
        if len(glob.glob(os.path.join(d, "*.parquet"))) >= min_files_per_bucket:
            items.append({"dir": d})
    if not items:
        return {"buckets_compacted": 0}

    def compact_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        n = 0
        for d in batch["dir"]:
            files = sorted(glob.glob(os.path.join(d, "*.parquet")))
            if len(files) < min_files_per_bucket:
                continue
            df = pq.read_table(files).to_pandas().drop_duplicates(["band", "bh", "doc"])
            out = os.path.join(d, f"compact-{uuid.uuid4().hex}.parquet")
            pq.write_table(pa.Table.from_pandas(df, preserve_index=False), out)
            for f in files:
                os.remove(f)
            n += 1
        return pd.DataFrame({"n": np.array([n], dtype=np.int64)})

    total = (
        rd.from_items(items, override_num_blocks=max(1, min(len(items), 64)))
        .map_batches(compact_bucket, batch_format="pandas", batch_size=None)
        .to_pandas()["n"]
        .sum()
    )
    return {"buckets_compacted": int(total)}
