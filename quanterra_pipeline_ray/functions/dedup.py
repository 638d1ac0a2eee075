"""Deduplication operators for training-data pipelines.

Five families, each expressed Ray-Data-first:

* **exact** — md5 fingerprint column (vectorized ``map_batches``) → hash
  groupby → keep the lowest-id row per group.
* **MinHash + LSH** — char-shingle rolling hashes → 64 minhash permutations
  per doc (numpy, no Python loop over shingles) → band rows → groupby on
  ``(band, band_hash)`` → candidate pairs → exact shingle-Jaccard verify →
  union-find connected components (driver-side; candidate set is
  band-collision-bounded, documented assumption).
* **SimHash** — 64-bit sign-aggregated token-hash fingerprint; near-dup =
  Hamming distance ≤ k, found by banding the 64 bits into 4×16-bit keys
  (pigeonhole: distance ≤ 3 guarantees one identical band).
* **n-gram Jaccard** — exact pairwise verification kernel (shared with the
  MinHash path) for candidate sets.
* **embedding cosine** — see :mod:`.similarity` (near-dup = pairs above a
  cosine threshold).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import pool_size
from .text import Fingerprinter

_MERSENNE = np.uint64((1 << 61) - 1)


# ---------------------------------------------------------------- exact dedup
def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep exactly one row (minimum ``id_col``) per distinct ``text_col``.

    Hash-partitioned: fingerprint computed per batch, then a groupby shuffle —
    identical texts always co-locate.  Coarse-bucketing (fixed number of
    hash-range buckets, one vectorized pandas dedup per bucket) keeps the Ray
    group count bounded instead of one Python call per distinct text.
    """
    n_buckets = 64

    def add_keys(b: pd.DataFrame) -> pd.DataFrame:
        b = Fingerprinter(text_col=text_col, out_col="__fp")(b)
        b["__bkt"] = (
            pd.util.hash_pandas_object(b["__fp"], index=False).to_numpy(dtype=np.uint64)
            % n_buckets
        ).astype(np.int64)
        return b

    def dedupe_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__fp", id_col], kind="mergesort").drop_duplicates("__fp", keep="first")
        return g.drop(columns=["__fp", "__bkt"])

    fp = ds.map_batches(add_keys, batch_format="pandas")
    return fp.groupby("__bkt").map_groups(dedupe_bucket, batch_format="pandas")


# ------------------------------------------------------------------- minhash
def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-char-shingle hashes of a document (shared rolling-hash
    kernel, see :func:`..functions.text.rolling_window_hashes`)."""
    from .text import rolling_window_hashes

    return np.unique(rolling_window_hashes(text, k))


class MinHasher:
    """Per-batch minhash signatures: ``num_hashes`` permutations
    ``(a*h + b) mod p`` over the doc's shingle-hash set, numpy end-to-end.

    Permutation constants are seeded once per actor (deterministic)."""

    def __init__(
        self,
        text_col: str = "text",
        num_hashes: int = 64,
        shingle_k: int = 5,
        seed: int = 1234,
    ):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, int(_MERSENNE), size=num_hashes, dtype=np.uint64)
        self.b = rng.integers(0, int(_MERSENNE), size=num_hashes, dtype=np.uint64)
        self.text_col = text_col
        self.k = shingle_k
        self.num_hashes = num_hashes

    def signature(self, text: str) -> np.ndarray:
        h = _shingle_hashes(text, self.k) % _MERSENNE
        # (num_hashes, n_shingles) permuted values -> row-min
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch[self.text_col]])
        batch["__sig"] = list(sigs.astype(np.uint64))
        return batch


def _band_rows(batch: pd.DataFrame, id_col: str, bands: int, rows_per_band: int) -> pd.DataFrame:
    """Explode each signature into (band, band_hash, id) rows."""
    sigs = np.stack(batch["__sig"].to_numpy())
    n = len(batch)
    sig3 = sigs[:, : bands * rows_per_band].reshape(n, bands, rows_per_band)
    # band hash: polynomial combine of the band's minhashes
    mult = np.power(np.uint64(1099511628211), np.arange(rows_per_band, dtype=np.uint64), dtype=np.uint64)
    bh = (sig3 * mult).sum(axis=2, dtype=np.uint64)
    ids = np.repeat(batch[id_col].to_numpy(), bands)
    return pd.DataFrame(
        {
            "band": np.tile(np.arange(bands, dtype=np.int32), n),
            "band_hash": bh.reshape(-1),
            id_col: ids,
        }
    )


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact char-k-gram Jaccard similarity (verification kernel)."""
    sa, sb = _shingle_hashes(a, k), _shingle_hashes(b, k)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 1.0


class _UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        while p != self.parent[p]:
            self.parent[p] = self.parent[self.parent[p]]
            p = self.parent[p]
        self.parent[x] = p
        return p

    def union(self, x, y):
        rx, ry = self.find(x), self.find(y)
        if rx != ry:
            # deterministic: smaller label becomes the root
            lo, hi = (rx, ry) if rx <= ry else (ry, rx)
            self.parent[hi] = lo


def minhash_lsh_dedup(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    concurrency: int = 4,
) -> pa.Table:
    """Near-duplicate groups via MinHash-LSH.

    Returns an Arrow table ``(id_col, dup_group)`` where ``dup_group`` is the
    minimum member id of the connected component.  Candidate pairs (and only
    they) are verified with exact shingle Jaccard; texts of candidate docs are
    fetched with a broadcast id-set filter, so the full corpus never leaves
    the cluster — only band-collision candidates reach the driver.
    """
    rows_per_band = num_hashes // bands
    n_buckets = 64

    class MinHashBandStage(MinHasher):
        """Fused stage: signature + banding in one pass, emitting compact
        numeric (band, band_hash, id, bucket) rows — no object-dtype
        signature arrays ever enter the object store."""

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            sigs = np.stack([self.signature(t) for t in batch[self.text_col]])
            b = _band_rows(
                pd.DataFrame({id_col: batch[id_col].to_numpy(), "__sig": list(sigs)}),
                id_col,
                bands,
                rows_per_band,
            )
            b["__bkt"] = (b["band_hash"].to_numpy(dtype=np.uint64) % n_buckets).astype(
                np.int64
            )
            return b

    band_ds = ds.map_batches(
        MinHashBandStage,
        fn_constructor_kwargs=dict(
            text_col=text_col, num_hashes=num_hashes, shingle_k=shingle_k
        ),
        batch_format="pandas",
        concurrency=pool_size(concurrency),
    )

    # coarse-bucketed pair extraction: bounded Ray group count; fine-grained
    # (band, band_hash) grouping happens vectorized via a pandas self-merge

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["band", "band_hash", id_col]].drop_duplicates()
        m = g.merge(g, on=["band", "band_hash"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        return (
            m[[f"{id_col}_x", f"{id_col}_y"]]
            .rename(columns={f"{id_col}_x": "a", f"{id_col}_y": "b"})
            .drop_duplicates()
        )

    pairs = (
        band_ds.groupby("__bkt")
        .map_groups(emit_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )

    if len(pairs):
        import ray
        import ray.data as rd

        cand_ids = set(pairs["a"]).union(pairs["b"])
        texts = (
            ds.map_batches(
                lambda b: b[b[id_col].isin(cand_ids)][[id_col, text_col]],
                batch_format="pandas",
            )
            .to_pandas()
            .set_index(id_col)[text_col]
            .to_dict()
        )
        # distributed, shingle-cached exact verification (candidate sets can
        # be large when the corpus shares vocabulary — never a driver loop)
        texts_ref = ray.put(texts)

        class VerifyJaccard:
            def __init__(self):
                self.texts = ray.get(texts_ref)
                self.cache: dict = {}

            def _sh(self, i):
                s = self.cache.get(i)
                if s is None:
                    s = _shingle_hashes(self.texts[i], shingle_k)
                    self.cache[i] = s
                return s

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                keep = np.empty(len(b), dtype=bool)
                for pos, (x, y) in enumerate(zip(b["a"], b["b"])):
                    sa, sb = self._sh(x), self._sh(y)
                    inter = np.intersect1d(sa, sb, assume_unique=True).size
                    union = sa.size + sb.size - inter
                    keep[pos] = (inter / union if union else 1.0) >= threshold
                return b[keep]

        # pool must leave CPUs free for upstream tasks (an actor pool that
        # reserves every CPU starves the input stage and live-locks)
        cpus = int(ray.cluster_resources().get("CPU", 4))
        verify_conc = pool_size(max(concurrency, cpus // 2))
        chunks = [
            c.reset_index(drop=True)
            for c in np.array_split(pairs.reset_index(drop=True), verify_conc * 4)
            if len(c)
        ]
        pairs = (
            rd.from_pandas(chunks)
            .map_batches(VerifyJaccard, batch_format="pandas", concurrency=verify_conc)
            .to_pandas()
        )

    uf = _UnionFind()
    all_ids = ds.map_batches(lambda b: b[[id_col]], batch_format="pandas").to_pandas()[id_col]
    for i in all_ids:
        uf.find(i)
    for a, b in zip(pairs["a"], pairs["b"]):
        uf.union(a, b)
    groups = pd.DataFrame({id_col: all_ids, "dup_group": [uf.find(i) for i in all_ids]})
    return pa.Table.from_pandas(groups.sort_values(id_col), preserve_index=False)


# ------------------------------------------------------------------- simhash
class SimHasher:
    """64-bit SimHash per document, vectorized via token explode + np.add.at."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        tokens = batch[self.text_col].astype(str).str.lower().str.split()
        exploded = tokens.explode()
        doc_idx = exploded.index.to_numpy()
        tok_hash = pd.util.hash_pandas_object(
            exploded.fillna(""), index=False
        ).to_numpy(dtype=np.uint64)
        bits = ((tok_hash[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        ) * 2 - 1
        acc = np.zeros((len(batch), 64), dtype=np.int64)
        pos = pd.factorize(doc_idx)[0]
        np.add.at(acc, pos, bits)
        sig = (acc > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=np.uint64))
        batch["simhash"] = sig
        return batch


def simhash_dedup(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    concurrency: int = 4,
) -> pa.Table:
    """Near-dup pairs by SimHash banding: 4×16-bit bands guarantee recall for
    Hamming distance ≤ 3; candidates verified by exact popcount."""
    sigs = ds.map_batches(
        SimHasher, fn_constructor_kwargs={"text_col": text_col},
        batch_format="pandas", concurrency=pool_size(concurrency),
    )

    n_buckets = 64

    def band_rows(b: pd.DataFrame) -> pd.DataFrame:
        sig = b["simhash"].to_numpy(dtype=np.uint64)
        out = []
        for band in range(4):
            key = (sig >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            out.append(
                pd.DataFrame(
                    {"band": band, "key": key, id_col: b[id_col].to_numpy(), "sig": sig}
                )
            )
        df = pd.concat(out, ignore_index=True)
        df["__bkt"] = (df["key"].to_numpy(dtype=np.uint64) % n_buckets).astype(np.int64)
        return df

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # fine grouping on (band, key) via vectorized self-merge; popcount verify
        g = g[["band", "key", id_col, "sig"]].drop_duplicates(subset=["band", "key", id_col])
        m = g.merge(g, on=["band", "key"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        if not len(m):
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        x = m["sig_x"].to_numpy(dtype=np.uint64) ^ m["sig_y"].to_numpy(dtype=np.uint64)
        ham = np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
        keep = ham <= max_hamming
        return pd.DataFrame(
            {
                "a": m[f"{id_col}_x"].to_numpy()[keep],
                "b": m[f"{id_col}_y"].to_numpy()[keep],
                "hamming": ham[keep],
            }
        )

    pairs = (
        sigs.map_batches(band_rows, batch_format="pandas")
        .groupby("__bkt")
        .map_groups(emit_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(subset=["a", "b"])
        .sort_values(["a", "b"])
    )
    return pa.Table.from_pandas(pairs.reset_index(drop=True), preserve_index=False)
