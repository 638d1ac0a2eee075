"""Deduplication operators for training-data pipelines.

Five families, each expressed Ray-Data-first:

* **exact** — md5 fingerprint column (vectorized ``map_batches``) → hash
  groupby → keep the lowest-id row per group.
* **MinHash + LSH** — char-shingle rolling hashes → 64 minhash permutations
  per doc (numpy, no Python loop over shingles) → band rows → groupby on
  ``(band, band_hash)`` → candidate pairs → exact shingle-Jaccard verify
  (bucketed shuffle join of candidate texts onto pair sides — texts never
  touch the driver) → DISTRIBUTED connected components (min-label
  propagation with pointer doubling over the pairs dataset).
* **SimHash** — 64-bit sign-aggregated token-hash fingerprint; near-dup =
  Hamming distance ≤ k, found by banding the 64 bits into 4×16-bit keys
  (pigeonhole: distance ≤ 3 guarantees one identical band); plus an
  exact-duplicate variant that uses the same banding as the blocking
  structure and verifies candidates by text equality.
* **n-gram Jaccard** — exact char-k-gram verification kernel, byte-identical
  to a SQL engine enumerating distinct ``substr(text, i, k)`` grams (the
  driver's DuckDB oracle does exactly that).
* **embedding cosine** — see :mod:`.similarity` (near-dup = pairs above a
  cosine threshold, blocked by IVF list).

Scale notes: every shuffle below is over candidate-bounded data (band
collisions), never the corpus; the only corpus-wide passes are streaming
``map_batches``.  The driver holds candidate *ids* (broadcast once) and the
final component map (nodes that belong to some duplicate group) — both are
O(candidates), documented assumptions of LSH dedup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..util import pool_size
from .text import Fingerprinter

_MERSENNE = np.uint64((1 << 61) - 1)
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


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


# ------------------------------------------------------------------- shingles
def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-char-shingle hashes of a document (shared rolling-hash
    kernel, see :func:`..functions.text.rolling_window_hashes`)."""
    from .text import rolling_window_hashes

    return np.unique(rolling_window_hashes(text, k))


def _concat_ranges(counts: np.ndarray) -> np.ndarray:
    """Vectorized ``concatenate([arange(c) for c in counts])``."""
    total = int(counts.sum())
    idx = np.arange(total, dtype=np.int64)
    offs = np.repeat(np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    return idx - offs


def _batched_shingle_hashes(texts, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Distinct k-char shingle hashes for EVERY doc of a batch in one
    vectorized pass: one buffer concat, ONE sliding-window hash sweep and
    one global lexsort replace the per-doc Python dispatch loop.

    Returns ``(sh, starts)`` — concatenated per-doc distinct hashes (sorted
    within each doc) and int64 offsets of length ``len(texts)+1`` such that
    doc ``i`` owns ``sh[starts[i]:starts[i+1]]``.  Bit-identical per doc to
    ``np.unique(rolling_window_hashes(t, k))`` (same base/padding), asserted
    by test."""
    n = len(texts)
    if n == 0:
        return np.array([], dtype=np.uint64), np.zeros(1, dtype=np.int64)
    bufs = []
    for t in texts:  # utf-8 encode is the only per-doc step left
        d = str(t).encode("utf-8")
        bufs.append(d if len(d) >= k else d + b"\x20" * (k - len(d)))
    data = np.frombuffer(b"".join(bufs), dtype=np.uint8)
    lens = np.array([len(b) for b in bufs], dtype=np.int64)
    nwin = lens - k + 1
    doc_start = np.concatenate([[0], np.cumsum(lens)[:-1]])
    base = np.uint64(1000003)
    powers = np.power(base, np.arange(k, dtype=np.uint64), dtype=np.uint64)[::-1]
    windows = np.lib.stride_tricks.sliding_window_view(data, k).astype(np.uint64)
    allh = (windows * powers).sum(axis=1, dtype=np.uint64)
    # keep only windows that start AND end inside one doc
    keep = np.repeat(doc_start, nwin) + _concat_ranges(nwin)
    h = allh[keep]
    doc = np.repeat(np.arange(n, dtype=np.int64), nwin)
    order = np.lexsort((h, doc))
    hs, ds_ = h[order], doc[order]
    mask = np.ones(len(hs), dtype=bool)
    mask[1:] = (hs[1:] != hs[:-1]) | (ds_[1:] != ds_[:-1])
    hs, ds_ = hs[mask], ds_[mask]
    counts = np.bincount(ds_, minlength=n)
    starts = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return hs, starts


def batched_postings(ids: np.ndarray, texts, k: int) -> pd.DataFrame:
    """``(sh, doc, size)`` posting rows for a whole batch via the batched
    shingle kernel — the shared map kernel of the AllPairs join and the
    persisted Jaccard index."""
    sh, starts = _batched_shingle_hashes(texts, k)
    counts = np.diff(starts)
    return pd.DataFrame(
        {
            "sh": sh,
            "doc": np.repeat(np.asarray(ids, dtype=np.int64), counts),
            "size": np.repeat(counts.astype(np.int64), counts),
        }
    )


def exact_shingles(text: str, k: int) -> np.ndarray:
    """Distinct k-BYTE shingles of a document.

    Exact (no hashing): equals the distinct-``substr(text, i, k)`` gram set a
    SQL engine computes, for ASCII/1-byte text.  Short docs are space-padded
    to one window (mirrors :func:`rolling_window_hashes`).

    For ``k <= 8`` the window bytes pack BIJECTIVELY into uint64 (the gram
    IS the integer — zero collisions), so the per-doc unique and every
    downstream factorize/sort run on integers instead of fixed-width byte
    strings (~3× faster sorts, same exact semantics)."""
    data = np.frombuffer(str(text).encode("utf-8"), dtype=np.uint8)
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)), constant_values=32)
    windows = np.lib.stride_tricks.sliding_window_view(data, k)
    if k <= 8:
        packed = np.zeros(len(windows), dtype=np.uint64)
        for j in range(k):
            packed = (packed << np.uint64(8)) | windows[:, j].astype(np.uint64)
        return np.unique(packed)
    return np.unique(np.ascontiguousarray(windows).view(f"S{k}").ravel())


def ngram_jaccard(a: str, b: str, k: int = 5) -> float:
    """Exact char-k-gram Jaccard similarity (verification kernel)."""
    sa, sb = exact_shingles(a, k), exact_shingles(b, k)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 1.0


# ------------------------------------------------------------------- minhash
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
        # batched kernel: one shingle sweep for the whole batch, then the
        # permutation mins per doc via segmented reduce — bit-identical to
        # the per-doc signature() (same shingle sets, same arithmetic)
        sh, starts = _batched_shingle_hashes(list(batch[self.text_col]), self.k)
        n = len(batch)
        sigs = np.empty((n, self.num_hashes), dtype=np.uint64)
        # chunk docs so the (num_hashes x shingles) matrix stays ~32 MB
        max_sh = max(1, (1 << 22) // self.num_hashes)
        lo = 0
        while lo < n:
            hi = lo
            while hi < n and (starts[hi + 1] - starts[lo]) <= max_sh:
                hi += 1
            hi = max(hi, lo + 1)  # a single huge doc still goes through
            h = sh[starts[lo] : starts[hi]] % _MERSENNE
            vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
            seg = (starts[lo : hi + 1] - starts[lo]).astype(np.int64)
            sigs[lo:hi] = np.minimum.reduceat(vals, seg[:-1], axis=1).T
            lo = hi
        batch["__sig"] = list(sigs)
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


# -------------------------------------------------- distributed pair plumbing
def _dedupe_pairs(pairs_ds, n_buckets: int = 64):
    """Distributed distinct over (a, b) pairs (bucketed, bounded group count)."""

    def add_bkt(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(b["a"], index=False).to_numpy(dtype=np.uint64)
        h ^= pd.util.hash_pandas_object(b["b"], index=False).to_numpy(dtype=np.uint64)
        b["__bkt"] = (h % n_buckets).astype(np.int64)
        return b

    def drop_dup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(subset=["a", "b"]).drop(columns="__bkt")

    return pairs_ds.map_batches(add_bkt, batch_format="pandas").groupby("__bkt").map_groups(
        drop_dup, batch_format="pandas"
    )


#: pair-count bound for the driver-side verify fast path (same contract as
#: the connected-components driver union-find below 200k pairs: PAIR LISTS
#: and the texts of pair-involved docs are duplicate-bounded, never corpus-
#: sized, so collecting them is O(candidates) regardless of corpus scale)
#: (raised 20k -> 200k once the verify kernel vectorized: the driver path's
#: per-pair cost is now one AND+popcount row, so the crossover vs the two
#: sort exchanges of the distributed verify moved up an order of magnitude)
_DRIVER_VERIFY_PAIR_CAP = 200_000

_POPCNT8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint16)

#: dense-bitset budget for the vectorized verify: n_docs × words must fit
#: (16M uint64 words = 128 MB).  Beyond it — huge vocabulary or doc count in
#: one verify group — the kernel falls back to per-pair sorted intersects.
_BITSET_WORD_BUDGET = 1 << 24


def _exact_jaccard_mask(
    a: np.ndarray, b: np.ndarray, shingles: dict, threshold: float
) -> np.ndarray:
    """Vectorized exact-Jaccard keep mask for a candidate pair list.

    ``shingles`` maps doc id -> its distinct shingle array
    (:func:`exact_shingles`).  The predicate is the bit-exact SQL form
    ``inter >= threshold * (|A| + |B| - inter)``.  Plan: factorize the
    involved docs' shingle union to dense codes, pack each doc into a
    bitset row, then every pair is one AND + popcount — all numpy, no
    per-pair Python in the common case.  Candidate explosions (low-entropy
    corpora where prefix filtering is weak) hit exactly this kernel, so its
    constant factor is what bounds the probe's wall clock.
    """
    n = len(a)
    if n == 0:
        return np.zeros(0, dtype=bool)
    ids = np.unique(np.concatenate([a, b]))
    ids = np.array([j for j in ids if j in shingles], dtype=np.int64)
    row_of = {int(j): i for i, j in enumerate(ids)}
    ra = np.array([row_of.get(int(x), -1) for x in a], dtype=np.int64)
    rb = np.array([row_of.get(int(x), -1) for x in b], dtype=np.int64)
    ok = (ra >= 0) & (rb >= 0)  # pairs whose side text was missing drop out
    mask = np.zeros(n, dtype=bool)
    if not ok.any():
        return mask
    arrs = [shingles[int(j)] for j in ids]
    sizes = np.array([s.size for s in arrs], dtype=np.int64)
    counts = sizes
    codes = np.unique(np.concatenate(arrs), return_inverse=True)[1]
    v = int(codes.max()) + 1 if codes.size else 0
    words = (v + 63) >> 6
    if words and len(ids) * words <= _BITSET_WORD_BUDGET:
        rows = np.repeat(np.arange(len(ids)), counts)
        bits = np.ones(1, dtype=np.uint64) << (codes.astype(np.uint64) & np.uint64(63))
        bmat = np.zeros((len(ids), words), dtype=np.uint64)
        np.bitwise_or.at(bmat, (rows, codes >> 6), bits)
        ia, ib = ra[ok], rb[ok]
        inter = np.empty(ia.size, dtype=np.int64)
        step = max(1, _BITSET_WORD_BUDGET // max(words, 1) // 8)
        for lo in range(0, ia.size, step):
            x = bmat[ia[lo : lo + step]] & bmat[ib[lo : lo + step]]
            inter[lo : lo + step] = (
                _POPCNT8[x.view(np.uint8)].reshape(x.shape[0], -1).sum(axis=1)
            )
        union = sizes[ia] + sizes[ib] - inter
        mask[ok] = inter >= threshold * union
        return mask
    # over-budget (rare-shingle corpus: the union vocabulary is huge across
    # many docs, so a dense bitset can't fit): grouped duplicate-count
    # kernel.  Concatenate each pair's two (unique, sorted-by-factorize)
    # code arrays under a pair-segment id; after ONE lexsort per slice,
    # the intersection size is the number of adjacent equal (segment,
    # code) entries — fully vectorized, memory bounded by slicing the
    # pair list at ~16M elements (measured: 1000-doc Zipf probe verify
    # 15 s of per-pair intersects → 2.6 s; see BASELINE round 5).
    doc_off = np.cumsum(counts) - counts  # per-doc start inside `codes`
    where = np.nonzero(ok)[0]
    la = sizes[ra[where]]
    lb = sizes[rb[where]]
    per_pair = la + lb
    bounds = np.cumsum(per_pair)
    slice_elems = 1 << 24

    def _gather(rows: np.ndarray) -> np.ndarray:
        """codes of the given doc rows, concatenated — pure fancy indexing,
        no per-array Python (a 250k-array np.concatenate costs seconds)."""
        ln = sizes[rows]
        tot = int(ln.sum())
        intra = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(ln) - ln, ln)
        return codes[np.repeat(doc_off[rows], ln) + intra]

    start = 0
    while start < where.size:
        base = bounds[start - 1] if start else 0
        stop = int(np.searchsorted(bounds, base + slice_elems)) + 1
        stop = min(max(stop, start + 1), where.size)
        idxs = where[start:stop]
        nseg = stop - start
        seg_ids = np.arange(nseg, dtype=np.int64)
        seg = np.concatenate(
            [np.repeat(seg_ids, la[start:stop]), np.repeat(seg_ids, lb[start:stop])]
        )
        vals = np.concatenate([_gather(ra[idxs]), _gather(rb[idxs])])
        # one flat int64 sort beats a two-key lexsort; seg*v + code is
        # collision-free and fits int64 for any realistic slice
        key = seg * np.int64(v) + vals
        key.sort()
        dup = key[1:] == key[:-1]
        inter = np.bincount((key[1:][dup] // v).astype(np.int64), minlength=nseg)
        union = per_pair[start:stop] - inter
        mask[idxs] = inter >= threshold * union
        start = stop
    return mask


def _verify_pairs_small(
    pairs_df: pd.DataFrame, corpus_ds, id_col: str, text_col: str, threshold: float, shingle_k: int
):
    """Driver fast path for a SMALL candidate set: one broadcast-filtered map
    pulls only the pair-involved docs' texts, then the exact verify predicate
    (identical to :func:`_verify_pairs`'s bucket kernel) runs locally — skips
    two sort exchanges whose fixed cost dwarfs 20k pairs of work."""
    import pyarrow as pa
    import ray
    import ray.data

    pairs_df = pairs_df.drop_duplicates(subset=["a", "b"])
    cand_ids = np.unique(np.concatenate([pairs_df["a"].to_numpy(), pairs_df["b"].to_numpy()]))
    ids_ref = ray.put(cand_ids)

    def filt(b: pd.DataFrame) -> pd.DataFrame:
        keep = b[np.isin(b[id_col].to_numpy(), ray.get(ids_ref))]
        return pd.DataFrame(
            {"jid": keep[id_col].to_numpy(), "text": keep[text_col].astype(str).to_numpy()}
        )

    texts = corpus_ds.map_batches(filt, batch_format="pandas").to_pandas().drop_duplicates("jid")
    shingles = {
        int(j): exact_shingles(t, shingle_k) for j, t in zip(texts["jid"], texts["text"])
    }
    a = pairs_df["a"].to_numpy(dtype=np.int64)
    b = pairs_df["b"].to_numpy(dtype=np.int64)
    keep = _exact_jaccard_mask(a, b, shingles, threshold)
    return ray.data.from_arrow(
        pa.table({"a": pa.array(a[keep], pa.int64()), "b": pa.array(b[keep], pa.int64())})
    )


#: byte budget for broadcasting the involved docs' shingle arrays in the
#: distributed verify: under it, the exchange carries ONLY (a, b) pairs
#: (16 B each) and every bucket task reads the one shared shingle blob from
#: the object store; over it, fall back to the text-attach exchange.
_BCAST_SHINGLE_BYTE_CAP = 512 << 20


def _verify_pairs_broadcast(
    pairs_ds, corpus_ds, id_col: str, text_col: str, threshold: float, shingle_k: int,
    n_buckets: int = 64,
):
    """Distributed exact-Jaccard verify that ships pairs, not texts.

    ``_attach_side_texts`` + ``_verify_pairs`` moves every pair's TWO texts
    through a bucketed exchange — O(pairs × doc_bytes).  But the involved-
    doc set is far smaller than the pair list (pairs ≥ docs/2), so when the
    involved docs' shingle arrays fit the broadcast budget it is strictly
    cheaper to shingle them ONCE (driver-side, bounded by involved docs,
    never the corpus), ``ray.put`` the dict, and let each pair bucket verify
    against the shared blob: exchange bytes collapse to 16 B/pair.  Returns
    None when over budget — caller falls back to the attach plan."""
    import ray

    ids = (
        pairs_ds.map_batches(
            lambda b: pd.DataFrame({"jid": np.unique(np.concatenate([b["a"], b["b"]]))}),
            batch_format="pandas",
        )
        .to_pandas()["jid"]
        .unique()
    )
    ids_ref = ray.put(np.asarray(ids, dtype=np.int64))

    def filt(b: pd.DataFrame) -> pd.DataFrame:
        keep = b[np.isin(b[id_col].to_numpy(), ray.get(ids_ref))]
        return pd.DataFrame(
            {"jid": keep[id_col].to_numpy(), "text": keep[text_col].astype(str).to_numpy()}
        )

    texts = corpus_ds.map_batches(filt, batch_format="pandas").to_pandas().drop_duplicates("jid")
    if sum(len(t) for t in texts["text"]) > _BCAST_SHINGLE_BYTE_CAP:
        return None
    # factorize + pack ONCE on the driver (bounded by involved docs, never
    # pairs or corpus): every bucket task then verifies its pairs as pure
    # AND+popcount rows against the one shared bitset blob — re-factorizing
    # per bucket was measured SLOWER than the text-attach exchange
    arrs = [exact_shingles(t, shingle_k) for t in texts["text"]]
    doc_ids = texts["jid"].to_numpy(dtype=np.int64)
    order = np.argsort(doc_ids)
    doc_ids = doc_ids[order]
    arrs = [arrs[i] for i in order]
    sizes = np.array([s.size for s in arrs], dtype=np.int64)
    if len(arrs) == 0:
        import pyarrow as pa
        import ray.data

        return ray.data.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        )
    codes = np.unique(np.concatenate(arrs), return_inverse=True)[1]
    words = ((int(codes.max()) + 64) >> 6) if codes.size else 1
    if len(doc_ids) * words > _BITSET_WORD_BUDGET:
        return None
    bmat = np.zeros((len(doc_ids), words), dtype=np.uint64)
    rows = np.repeat(np.arange(len(doc_ids)), sizes)
    np.bitwise_or.at(
        bmat,
        (rows, codes >> 6),
        np.ones(1, dtype=np.uint64) << (codes.astype(np.uint64) & np.uint64(63)),
    )
    blob_ref = ray.put((doc_ids, sizes, bmat))

    def add_bkt(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(b["a"], index=False).to_numpy(dtype=np.uint64)
        h ^= pd.util.hash_pandas_object(b["b"], index=False).to_numpy(dtype=np.uint64)
        b = b.copy()
        b["__bkt"] = (h % n_buckets).astype(np.int64)
        return b

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ids, sz, bm = ray.get(blob_ref)
        g = g.drop_duplicates(subset=["a", "b"])
        a = g["a"].to_numpy(dtype=np.int64)
        b = g["b"].to_numpy(dtype=np.int64)
        ra = np.searchsorted(ids, a)
        rb = np.searchsorted(ids, b)
        ra = np.where((ra < len(ids)) & (ids[np.minimum(ra, len(ids) - 1)] == a), ra, -1)
        rb = np.where((rb < len(ids)) & (ids[np.minimum(rb, len(ids) - 1)] == b), rb, -1)
        ok = (ra >= 0) & (rb >= 0)
        keep = np.zeros(len(a), dtype=bool)
        if ok.any():
            ia, ib = ra[ok], rb[ok]
            x = bm[ia] & bm[ib]
            inter = _POPCNT8[x.view(np.uint8)].reshape(x.shape[0], -1).sum(axis=1)
            keep[ok] = inter >= threshold * (sz[ia] + sz[ib] - inter)
        return pd.DataFrame({"a": a[keep], "b": b[keep]})

    return (
        pairs_ds.map_batches(add_bkt, batch_format="pandas")
        .groupby("__bkt")
        .map_groups(verify_bucket, batch_format="pandas")
    )


def _verify_pairs_dispatch(
    pairs_ds, corpus_ds, id_col: str, text_col: str, threshold: float, shingle_k: int,
    n_buckets: int = 64,
):
    """Verify router: broadcast plan when the involved shingles fit the
    budget, text-attach exchange otherwise."""
    out = _verify_pairs_broadcast(
        pairs_ds, corpus_ds, id_col, text_col, threshold, shingle_k, n_buckets
    )
    if out is not None:
        return out
    sided = _attach_side_texts(pairs_ds, corpus_ds, id_col, text_col, n_buckets)
    return _verify_pairs(sided, threshold, shingle_k, n_buckets)


def _attach_side_texts(pairs_ds, corpus_ds, id_col: str, text_col: str, n_buckets: int = 64):
    """Bucketed shuffle join: each pair side gets its document's text.

    The candidate-id set (ids only, candidate-bounded) is broadcast once to
    filter the corpus; candidate TEXTS flow worker-to-worker through the
    bucketed join — they never land on the driver.  Emits two rows per pair
    ``(a, b, jid, text)``, one per side.
    """
    import ray

    id_batches = pairs_ds.map_batches(
        lambda b: pd.DataFrame({"jid": np.unique(np.concatenate([b["a"], b["b"]]))}),
        batch_format="pandas",
    ).to_pandas()
    cand_ids = np.unique(id_batches["jid"].to_numpy())
    ids_ref = ray.put(cand_ids)

    def filter_corpus(b: pd.DataFrame) -> pd.DataFrame:
        cand = ray.get(ids_ref)
        keep = b[np.isin(b[id_col].to_numpy(), cand)]
        return pd.DataFrame(
            {
                "jid": keep[id_col].to_numpy(),
                "a": np.full(len(keep), -1, dtype=np.int64),
                "b": np.full(len(keep), -1, dtype=np.int64),
                "text": keep[text_col].astype(str).to_numpy(),
            }
        )

    def explode_sides(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "jid": np.concatenate([b["a"].to_numpy(), b["b"].to_numpy()]),
                "a": np.tile(b["a"].to_numpy(), 2),
                "b": np.tile(b["b"].to_numpy(), 2),
                "text": np.full(2 * len(b), "", dtype=object),
            }
        )

    texts = corpus_ds.map_batches(filter_corpus, batch_format="pandas")
    sides = pairs_ds.map_batches(explode_sides, batch_format="pandas")

    def add_bkt(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(b["jid"], index=False).to_numpy(dtype=np.uint64)
        b["__bkt"] = (h % n_buckets).astype(np.int64)
        return b

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        tex = g[g["a"] == -1][["jid", "text"]]
        side = g[g["a"] != -1][["jid", "a", "b"]]
        out = side.merge(tex, on="jid", how="inner")
        return out[["a", "b", "jid", "text"]]

    return (
        texts.union(sides)
        .map_batches(add_bkt, batch_format="pandas")
        .groupby("__bkt")
        .map_groups(join_bucket, batch_format="pandas")
    )


def _verify_pairs(sided_ds, threshold: float, shingle_k: int, n_buckets: int = 64):
    """Exact-Jaccard verification per pair, bucketed by pair key.

    Shingle sets are computed once per distinct doc within a bucket (cache by
    doc id).  The keep predicate ``inter >= threshold * union`` is the exact
    integer/float form a SQL oracle reproduces bit-for-bit.
    """

    def add_pair_bkt(b: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_pandas_object(b["a"], index=False).to_numpy(dtype=np.uint64)
        h ^= pd.util.hash_pandas_object(b["b"], index=False).to_numpy(dtype=np.uint64)
        b["__bkt"] = (h % n_buckets).astype(np.int64)
        return b

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # a pair is verifiable only when BOTH sides' texts arrived
        tx = g.drop_duplicates("jid")
        shingles = {
            int(j): exact_shingles(t, shingle_k) for j, t in zip(tx["jid"], tx["text"])
        }
        pairs = g[["a", "b"]].drop_duplicates()
        a = pairs["a"].to_numpy(dtype=np.int64)
        b = pairs["b"].to_numpy(dtype=np.int64)
        # sides that never shipped a text row must not verify: restrict the
        # shingle map to jids present in THIS bucket's text rows (already is)
        keep = _exact_jaccard_mask(a, b, shingles, threshold)
        return pd.DataFrame({"a": a[keep], "b": b[keep]})

    return sided_ds.map_batches(add_pair_bkt, batch_format="pandas").groupby("__bkt").map_groups(
        verify_bucket, batch_format="pandas"
    )


# --------------------------------------------- distributed connected components
def _driver_union_find(pairs: pd.DataFrame) -> dict:
    """Union-find over a PAIR list (never the corpus): the small-graph fast
    path of :func:`connected_components`."""
    uf = _UnionFind()
    for a, b in zip(pairs["a"], pairs["b"]):
        uf.union(int(a), int(b))
    return {n: uf.find(n) for n in list(uf.parent)}


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
            lo, hi = (rx, ry) if rx <= ry else (ry, rx)
            self.parent[hi] = lo


def connected_components(
    pairs_ds, n_buckets: int = 64, max_rounds: int = 30, driver_threshold: int = 0
) -> dict:
    """Connected components of an undirected pair graph, distributed.

    Min-label propagation over Ray Data shuffles (two bucketed groupbys per
    round: co-locate edges with source labels and emit messages, then
    min-reduce at the target).  Each round the edge set is augmented with
    symmetric label-pointer edges (hash-to-min), so convergence is
    O(log n) rounds, not O(diameter).  Per-round state is materialized in
    the object store (node-count-bounded, never the corpus).

    ``driver_threshold``: pair graphs at or below this edge count short-cut
    to a driver-side union-find over the PAIRS (the same "collect the small
    side" rule as a broadcast join — the pair list is candidate-bounded,
    never the corpus); 0 disables the shortcut.  Both paths produce
    identical labels (min member id per component).

    Returns the final ``{node: component_min_label}`` dict — O(nodes in the
    pair graph), the small side that callers broadcast to label a corpus.
    """
    if driver_threshold:
        n_pairs = pairs_ds.count()
        if n_pairs <= driver_threshold:
            return _driver_union_find(pairs_ds.to_pandas())

    def _bkt(vals: np.ndarray) -> np.ndarray:
        h = (vals.astype(np.uint64) * _GOLDEN) >> np.uint64(40)
        return (h % np.uint64(n_buckets)).astype(np.int64)

    # symmetric edge list bucketed by src node; kind 1 = edge, kind 0 = label
    def to_edges(b: pd.DataFrame) -> pd.DataFrame:
        node = np.concatenate([b["a"].to_numpy(), b["b"].to_numpy()]).astype(np.int64)
        val = np.concatenate([b["b"].to_numpy(), b["a"].to_numpy()]).astype(np.int64)
        return pd.DataFrame(
            {"node": node, "val": val, "kind": np.ones(2 * len(b), dtype=np.int8), "__bkt": _bkt(node)}
        )

    edges = pairs_ds.map_batches(to_edges, batch_format="pandas").materialize()

    # init = round 0 of propagation: label(x) = min(x, min nbr) per bucket
    def init_min(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("node", as_index=False)["val"].min()
        lab = np.minimum(m["node"].to_numpy(), m["val"].to_numpy())
        return pd.DataFrame({"node": m["node"].to_numpy(), "label": lab, "__bkt": _bkt(m["node"].to_numpy())})

    labels = edges.groupby("__bkt").map_groups(init_min, batch_format="pandas").materialize()

    def as_label_rows(b: pd.DataFrame) -> pd.DataFrame:
        """Current labels (kind 0) plus symmetric label-pointer edges
        (kind 1, node <-> label): treating the label pointer as an edge is
        the hash-to-min acceleration — safe (a label is always in the node's
        component) and it makes label reach double per round, so convergence
        is O(log n) rounds rather than O(diameter)."""
        node = b["node"].to_numpy()
        lab = b["label"].to_numpy()
        ptr = lab != node
        out = pd.DataFrame(
            {
                "node": np.concatenate([node, node[ptr], lab[ptr]]),
                "val": np.concatenate([lab, lab[ptr], node[ptr]]),
                "kind": np.concatenate(
                    [
                        np.zeros(len(b), dtype=np.int8),
                        np.ones(int(ptr.sum()) * 2, dtype=np.int8),
                    ]
                ),
            }
        )
        out["__bkt"] = _bkt(out["node"].to_numpy())
        return out

    def make_msgs(g: pd.DataFrame) -> pd.DataFrame:
        """Per src-bucket: each edge sends its src's current label to the
        other endpoint; current labels pass through tagged kind=0."""
        lbl = g[g["kind"] == 0][["node", "val"]]
        edg = g[g["kind"] == 1][["node", "val"]]
        msg = edg.merge(lbl.rename(columns={"val": "label"}), on="node")
        out = pd.concat(
            [
                lbl.assign(kind=np.int8(0)),
                pd.DataFrame(
                    {"node": msg["val"], "val": msg["label"], "kind": np.int8(1)}
                ),
            ],
            ignore_index=True,
        )
        out["__bkt"] = _bkt(out["node"].to_numpy())
        return out

    def min_reduce(g: pd.DataFrame) -> pd.DataFrame:
        """Per target-bucket: new label = min(current, incoming messages)."""
        mn = g.groupby("node", as_index=False)["val"].min().rename(columns={"val": "label"})
        old = g[g["kind"] == 0][["node", "val"]].drop_duplicates("node").rename(
            columns={"val": "old"}
        )
        out = mn.merge(old, on="node", how="left")
        out["old"] = out["old"].fillna(out["node"]).astype(np.int64)
        return pd.DataFrame(
            {
                "node": out["node"].to_numpy(),
                "label": out["label"].to_numpy(),
                "__bkt": _bkt(out["node"].to_numpy()),
                "__changed": (out["label"].to_numpy() < out["old"].to_numpy()).astype(np.int64),
            }
        )

    for _round in range(max_rounds):
        unioned = edges.union(labels.map_batches(as_label_rows, batch_format="pandas"))
        labels = (
            unioned.groupby("__bkt")
            .map_groups(make_msgs, batch_format="pandas")
            .groupby("__bkt")
            .map_groups(min_reduce, batch_format="pandas")
            .materialize()
        )
        if not labels.sum("__changed"):
            break

    out = labels.to_pandas()
    return dict(zip(out["node"].astype(np.int64), out["label"].astype(np.int64)))


def minhash_lsh_dedup(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    concurrency: int = 4,
):
    """Near-duplicate groups via MinHash-LSH; returns a Dataset
    ``(id_col, dup_group)`` where ``dup_group`` is the minimum member id of
    the connected component of verified near-dup pairs.

    Fully distributed: banding → bucketed pair extraction → bucketed
    text join + exact char-k-gram Jaccard verify → distributed connected
    components.  No corpus-sized data ever reaches the driver; the driver
    holds candidate ids and the final component map (both candidate-bounded).
    """
    rows_per_band = num_hashes // bands
    n_buckets = 64

    class MinHashBandStage(MinHasher):
        """Fused stage: signature + banding in one pass.  Each band row also
        carries the doc's FULL signature (fixed 512-byte blob) so the pair
        stage can prefilter candidates by estimated Jaccard (signature
        agreement) before any document text moves — the cure for LSH's
        candidate blowup on vocabulary-dense corpora."""

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            sigs = np.stack([self.signature(t) for t in batch[self.text_col]])
            b = _band_rows(
                pd.DataFrame({id_col: batch[id_col].to_numpy(), "__sig": list(sigs)}),
                id_col,
                bands,
                rows_per_band,
            )
            blobs = [s.astype("<u8").tobytes() for s in sigs]
            b["sig"] = np.repeat(np.array(blobs, dtype=object), bands)
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

    # Estimated-Jaccard prefilter cutoff: a true pair at J >= threshold has
    # P(signature agreement < threshold - 0.35) < 1e-6 over 64 hashes
    # (Chernoff), while the vocabulary-overlap noise floor (J ~ 0.3) is cut
    # ~20x — so candidates shrink an order of magnitude with no practical
    # recall loss, BEFORE any text is shuffled.
    est_cutoff = max(0.0, threshold - 0.35)

    # coarse-bucketed pair extraction: bounded Ray group count; fine-grained
    # (band, band_hash) grouping happens vectorized via a pandas self-merge
    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["band", "band_hash", id_col, "sig"]].drop_duplicates(
            subset=["band", "band_hash", id_col]
        )
        m = g.merge(g, on=["band", "band_hash"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        m = m.drop_duplicates(subset=[f"{id_col}_x", f"{id_col}_y"])
        if not len(m):
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)})
        sx = np.frombuffer(b"".join(m["sig_x"]), dtype="<u8").reshape(len(m), num_hashes)
        sy = np.frombuffer(b"".join(m["sig_y"]), dtype="<u8").reshape(len(m), num_hashes)
        est = (sx == sy).mean(axis=1)
        keep = est >= est_cutoff
        return pd.DataFrame(
            {
                "a": m[f"{id_col}_x"].to_numpy()[keep],
                "b": m[f"{id_col}_y"].to_numpy()[keep],
            }
        )

    # NOTE: pairs may contain cross-band duplicates; the verify stage groups
    # by (a, b) and drops duplicate side rows, so a standalone distinct
    # shuffle would only add latency.
    pairs = band_ds.groupby("__bkt").map_groups(
        emit_pairs, batch_format="pandas"
    ).materialize()

    comp: dict = {}
    if pairs.count() > 0:
        sided = _attach_side_texts(pairs, ds, id_col, text_col, n_buckets)
        verified = _verify_pairs(sided, threshold, shingle_k, n_buckets).materialize()
        if verified.count() > 0:
            comp = connected_components(verified, n_buckets, driver_threshold=200_000)

    import ray

    comp_ref = ray.put(comp)

    def label_corpus(b: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(comp_ref)
        ids = b[id_col].to_numpy()
        if cmap:
            grp = np.array([cmap.get(i, i) for i in ids], dtype=np.int64)
        else:
            grp = ids.astype(np.int64)
        return pd.DataFrame({id_col: ids, "dup_group": grp})

    return ds.map_batches(label_corpus, batch_format="pandas")


# ------------------------------------------- exact n-gram Jaccard (prefix filter)
def ngram_jaccard_join(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    shingle_k: int = 5,
    concurrency: int = 4,
    n_buckets: int = 64,
):
    """EXACT n-gram-Jaccard similarity self-join: all pairs with
    ``J(shingles(a), shingles(b)) >= threshold``, returned as ``(a, b)``.

    Deterministic counterpart of MinHash-LSH (which is probabilistically
    complete): candidate generation is **prefix filtering** (Bayardo et al.,
    "Scaling Up All Pairs Similarity Search", WWW'07; Chaudhuri et al.'s
    SSJoin) — order every document's shingles by ascending global document
    frequency, keep only the first ``|S| - ceil(t * |S|) + 1`` as that
    document's *prefix*; any pair with Jaccard >= t must share a prefix
    shingle (J >= t implies overlap >= ceil(t * |S|) for BOTH sides, and two
    sets under a common total order whose prefixes at that overlap are
    disjoint cannot overlap that much).  Because prefixes favor globally
    RARE shingles, posting groups stay small on natural text even where a
    naive shingle-inverted-index would explode on stopword grams.

    All-Ray-Data plan, three keyed exchanges plus the shared pair machinery:

    1. postings ``(sh, doc, size)`` via the vectorized rolling-hash kernel;
    2. groupby shingle-hash bucket: document frequency per shingle is the
       group size (count + join in ONE grouping);
    3. groupby doc bucket: sort each doc's postings by ``(df, sh)``, keep
       the prefix (vectorized rank-vs-prefix-length mask, no per-doc loop);
    4. groupby shingle bucket: emit candidate pairs by self-merge;
       then ``_dedupe_pairs -> _attach_side_texts -> _verify_pairs`` (the
       MinHash verify path) for exact confirmation — texts never land on
       the driver, and 64-bit shingle-hash collisions can only ADD
       candidates (verification is hash-free via ``exact_shingles``).

    Scale notes: the df pass is the standard TF pass of similarity joins —
    map-side distinct per doc, keyed exchange on shingle hash.  Identical
    duplicate clusters of size g legitimately produce g^2/2 pairs (that IS
    the answer's size, not blowup).
    """

    def postings(b: pd.DataFrame) -> pd.DataFrame:
        out = batched_postings(b[id_col].to_numpy(), b[text_col], shingle_k)
        out["__bkt"] = (out["sh"].to_numpy(dtype=np.uint64) % n_buckets).astype(np.int64)
        return out

    def add_df(g: pd.DataFrame) -> pd.DataFrame:
        # same-shingle postings all land in this bucket: group size = global df
        df = g.groupby("sh")["doc"].transform("size")
        out = g[["sh", "doc", "size"]].copy()
        out["df"] = df.to_numpy(dtype=np.int64)
        h = pd.util.hash_pandas_object(out["doc"], index=False).to_numpy(dtype=np.uint64)
        out["__bkt"] = (h % n_buckets).astype(np.int64)
        return out

    def keep_prefix(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc", "df", "sh"], kind="stable")
        rank = g.groupby("doc", sort=False).cumcount().to_numpy()
        size = g["size"].to_numpy()
        prefix_len = size - np.ceil(threshold * size).astype(np.int64) + 1
        out = g[rank < prefix_len][["sh", "doc"]].copy()
        out["__bkt"] = (out["sh"].to_numpy(dtype=np.uint64) % n_buckets).astype(np.int64)
        return out

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["sh", "doc"]]
        m = g.merge(g, on="sh")
        m = m[m["doc_x"] < m["doc_y"]].drop_duplicates(subset=["doc_x", "doc_y"])
        return pd.DataFrame(
            {"a": m["doc_x"].to_numpy(dtype=np.int64), "b": m["doc_y"].to_numpy(dtype=np.int64)}
        )

    post = ds.map_batches(postings, batch_format="pandas")
    with_df = post.groupby("__bkt").map_groups(add_df, batch_format="pandas")
    prefix = with_df.groupby("__bkt").map_groups(keep_prefix, batch_format="pandas")
    cand = prefix.groupby("__bkt").map_groups(emit_pairs, batch_format="pandas")
    pairs = _dedupe_pairs(cand, n_buckets).materialize()
    if pairs.count() == 0:
        return pairs
    sided = _attach_side_texts(pairs, ds, id_col, text_col, n_buckets)
    return _verify_pairs(sided, threshold, shingle_k, n_buckets)


# ------------------------------------------------------------------- simhash
def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit population count (SWAR bit tricks, no Python loop)."""
    x = x.astype(np.uint64)
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


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


def _simhash_band_rows(id_col: str, bands: int, bits_per_band: int, n_buckets: int = 64):
    mask = np.uint64((1 << bits_per_band) - 1)

    def band_rows(b: pd.DataFrame) -> pd.DataFrame:
        sig = b["simhash"].to_numpy(dtype=np.uint64)
        out = []
        for band in range(bands):
            key = (sig >> np.uint64(band * bits_per_band)) & mask
            out.append(
                pd.DataFrame(
                    {"band": band, "key": key, id_col: b[id_col].to_numpy(), "sig": sig}
                )
            )
        df = pd.concat(out, ignore_index=True)
        # salt the shuffle bucket with the band so one popular key value
        # cannot pin all bands' collision groups onto one reducer
        h = df["key"].to_numpy(dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        h ^= df["band"].to_numpy(dtype=np.uint64)
        df["__bkt"] = (h % n_buckets).astype(np.int64)
        return df

    return band_rows


def simhash_dedup(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
    bits_per_band: int = 16,
    concurrency: int = 4,
):
    """Near-dup pairs by SimHash banding; returns a lazy Dataset of distinct
    ``(a, b, hamming)`` pairs with ``a < b`` — pair data never lands on the
    driver (distributed distinct via :func:`_dedupe_pairs`).

    Recall guarantee (pigeonhole): with ``bands`` disjoint bands covering
    ``bands * bits_per_band <= 64`` signature bits, any pair at Hamming
    distance ``<= bands - 1`` over the covered bits collides in at least one
    band.  Sizing rule: each band has ``2^bits_per_band`` keys, and the
    per-(band, key) candidate self-merge is O(group²) — keep expected group
    size ``N / 2^bits_per_band`` small (≈10–100).  The 4×16 default is right
    up to ~10⁷ docs; at ≥10⁸ use wider bands (e.g. ``bands=3,
    bits_per_band=21`` for Hamming ≤ 2, or 8×8-bit multi-band OR with a
    higher verify budget) so collision groups stay bounded.
    """
    if bands * bits_per_band > 64:
        raise ValueError("bands * bits_per_band must be <= 64 (signature width)")
    sigs = ds.map_batches(
        SimHasher, fn_constructor_kwargs={"text_col": text_col},
        batch_format="pandas", concurrency=pool_size(concurrency),
    )
    n_buckets = 64

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # fine grouping on (band, key) via vectorized self-merge; popcount verify
        g = g[["band", "key", id_col, "sig"]].drop_duplicates(subset=["band", "key", id_col])
        m = g.merge(g, on=["band", "key"])
        m = m[m[f"{id_col}_x"] < m[f"{id_col}_y"]]
        if not len(m):
            return pd.DataFrame(
                {
                    "a": pd.Series([], dtype=np.int64),
                    "b": pd.Series([], dtype=np.int64),
                    "hamming": pd.Series([], dtype=np.int64),
                }
            )
        x = m["sig_x"].to_numpy(dtype=np.uint64) ^ m["sig_y"].to_numpy(dtype=np.uint64)
        ham = popcount64(x)
        keep = ham <= max_hamming
        return pd.DataFrame(
            {
                "a": m[f"{id_col}_x"].to_numpy()[keep],
                "b": m[f"{id_col}_y"].to_numpy()[keep],
                "hamming": ham[keep],
            }
        )

    pairs = (
        sigs.map_batches(
            _simhash_band_rows(id_col, bands, bits_per_band, n_buckets),
            batch_format="pandas",
        )
        .groupby("__bkt")
        .map_groups(emit_pairs, batch_format="pandas")
    )
    # cross-band duplicate pairs dropped by a distributed bucketed distinct —
    # never a driver-side collect of the pair list
    return _dedupe_pairs(pairs, n_buckets)


def simhash_exact_pairs(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 4,
):
    """Exact-duplicate pairs with SimHash banding as the blocking structure.

    Identical texts have identical simhashes, so every true pair collides in
    every band (perfect recall); candidates are then verified by md5 text
    fingerprint equality inside the band group — the driver-checkable variant
    of :func:`simhash_dedup` (whose Hamming-ball output is probabilistic and
    has no SQL oracle).  Returns a Dataset of ``(a, b)`` with ``a < b``.
    """
    sigs = ds.map_batches(
        SimHasher, fn_constructor_kwargs={"text_col": text_col},
        batch_format="pandas", concurrency=pool_size(concurrency),
    )
    n_buckets = 64

    def add_fp(b: pd.DataFrame) -> pd.DataFrame:
        return Fingerprinter(text_col=text_col, out_col="__fp")(b)

    def band_rows(b: pd.DataFrame) -> pd.DataFrame:
        sig = b["simhash"].to_numpy(dtype=np.uint64)
        # one band suffices for exact dups (identical sig -> identical band 0
        # key), but keep all 4 so the blocking structure matches simhash_dedup
        out = []
        for band in range(4):
            key = (sig >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            out.append(
                pd.DataFrame(
                    {"band": band, "key": key, id_col: b[id_col].to_numpy(), "fp": b["__fp"].to_numpy()}
                )
            )
        df = pd.concat(out, ignore_index=True)
        df["__bkt"] = (df["key"].to_numpy(dtype=np.uint64) % n_buckets).astype(np.int64)
        return df

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["band", "key", id_col, "fp"]].drop_duplicates(subset=["band", "key", id_col])
        m = g.merge(g, on=["band", "key"])
        m = m[(m[f"{id_col}_x"] < m[f"{id_col}_y"]) & (m["fp_x"] == m["fp_y"])]
        return (
            m[[f"{id_col}_x", f"{id_col}_y"]]
            .rename(columns={f"{id_col}_x": "a", f"{id_col}_y": "b"})
            .drop_duplicates()
        )

    banded = sigs.map_batches(add_fp, batch_format="pandas").map_batches(
        band_rows, batch_format="pandas"
    )
    pairs = banded.groupby("__bkt").map_groups(emit_pairs, batch_format="pandas")
    return _dedupe_pairs(pairs, n_buckets)
