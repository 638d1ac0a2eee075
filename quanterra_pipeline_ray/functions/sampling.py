"""Deterministic corpus sampling: uniform hash-sample and per-group quotas.

Dataset curation needs *reproducible* sampling — the same subset from every
run, on any cluster shape, with no driver-held state.  Both operators key on
``md5(id || ':' || seed)``: a uniform, seed-switchable, order-free random
key that a SQL oracle reproduces bit-for-bit (the same trick the provenance
fingerprints use — see ``fingerprint_docs``), unlike numpy RNG streams whose
draw order depends on block layout.

* :func:`hash_sample` — keep a ``fraction`` of rows: ``md5key < hex
  threshold``.  Embarrassingly parallel (pure per-row predicate, no
  exchange); the kept fraction is exact in expectation and concentrated at
  corpus scale.
* :func:`quota_sample` — cap rows per group (e.g. ≤ N docs per source
  domain — the classic pretraining-mix rebalance; the reference applies the
  same fixed-quota idea at config level with its dev-mode volume caps,
  `src/models/config/pipeline_settings.py:172-176`): rank by
  ``(md5key, id)`` within each group, keep the first ``cap``.  One keyed exchange; each
  input block pre-truncates to ``cap`` rows per group BEFORE the shuffle
  (a top-k combiner), so exchange bytes are O(groups x cap) per block, not
  O(rows) — the reason this survives a skewed 100-TB group.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd


_DUCK = None


def _duck():
    """Per-process DuckDB connection for the vectorized md5 kernel
    (threads=1: the surrounding map task already owns exactly one CPU, and
    single-threaded projections preserve row order)."""
    global _DUCK
    if _DUCK is None:
        import duckdb

        _DUCK = duckdb.connect()
        _DUCK.execute("SET threads=1")
    return _DUCK


def _md5_keys(ids, seed: int) -> np.ndarray:
    """``md5(str(id) || ':' || seed)`` hex keys, order-preserving.

    The digest is REAL md5 (the SQL oracles reproduce it bit-for-bit);
    the kernel is DuckDB's vectorized C++ md5 over an Arrow column —
    measured 4× the per-row ``hashlib`` loop, which remains as the
    fallback for exotic id dtypes."""
    import pyarrow as pa

    arr = np.asarray(ids)
    seed = int(seed)
    try:
        if arr.dtype.kind in "iu":
            t = pa.table({"i": pa.array(arr, pa.int64())})  # noqa: F841 — duckdb replacement scan
            q = f"select md5(cast(i as varchar) || ':{seed}') as k from t"
        elif arr.dtype.kind in "OU":
            t = pa.table({"i": pa.array([str(x) for x in arr], pa.string())})  # noqa: F841
            q = f"select md5(i || ':{seed}') as k from t"
        else:
            raise TypeError(arr.dtype)
        return _duck().execute(q).arrow().column("k").to_numpy(zero_copy_only=False)
    except Exception:
        return np.array(
            [hashlib.md5(f"{i}:{seed}".encode()).hexdigest() for i in ids], dtype=object
        )


def fraction_threshold_hex(fraction: float, digits: int = 8) -> str:
    """Hex-string threshold such that ``md5key < threshold`` keeps ~fraction
    of rows (lexicographic compare on the zero-padded prefix = numeric
    compare; identical semantics in Python and SQL VARCHAR ``<``)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return "g"  # sorts above every hex digest: keep everything
    return format(int(fraction * (16**digits)), f"0{digits}x")


def hash_sample(ds, fraction: float, id_col: str = "doc_id", seed: int = 42):
    """Deterministic uniform sample: rows whose ``md5(id || ':' || seed)``
    is below the fraction threshold.  No exchange, no driver state."""
    thr = fraction_threshold_hex(fraction)

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        keys = _md5_keys(b[id_col].to_numpy(), seed)
        return b[keys < thr]

    return ds.map_batches(keep, batch_format="pandas")


def mix_sources(
    ds,
    fractions: dict,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
):
    """Per-group admission fractions — the training-mix knob expressed as
    sampling rates instead of absolute caps (:func:`quota_sample`): each
    row keeps iff its ``md5(id || ':' || seed)`` key is under ITS group's
    threshold.  Pure per-row predicate (no exchange), deterministic on any
    cluster shape; groups absent from ``fractions`` get
    ``default_fraction``."""
    thr = {g: fraction_threshold_hex(f) for g, f in fractions.items()}
    thr_default = fraction_threshold_hex(default_fraction)

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        keys = _md5_keys(b[id_col].to_numpy(), seed)
        limits = b[group_col].map(thr).fillna(thr_default).to_numpy(dtype=object)
        return b[keys < limits]

    return ds.map_batches(keep, batch_format="pandas")


def weighted_sample(
    ds,
    group_col: str,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 42,
    n_buckets: int = 64,
):
    """Weighted sampling WITHOUT replacement, k per group — the
    Efraimidis–Spirakis / A-ExpJ scheme (Inf. Proc. Letters 97(5), 2006):
    each row draws an exponential key ``e_i = -ln(u_i) / w_i`` (an Exp(w_i)
    variate) and the k SMALLEST keys per group are exactly a weighted sample
    without replacement.  ``u_i`` is the seeded md5 uniform
    ``(int(md5(id || ':' || seed)[:13], 16) + 0.5) / 2^52`` — deterministic,
    order-free, and bit-reproducible in SQL (13 hex digits = 52 bits, so
    ``h + 0.5`` and the power-of-two division are exact in float64; only ln
    rounding is implementation-defined, a ~1-ulp effect that cannot flip a
    rank except on measure-zero near-ties).

    Same combiner-first plan as :func:`quota_sample`: every block truncates
    to its local per-group top-k BEFORE the shuffle (the global top-k is a
    subset of each block's), so exchange bytes are O(groups x k) per block.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        h = np.array(
            [
                int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:13], 16)
                for i in b[id_col].to_numpy()
            ],
            dtype=np.float64,
        )
        w = b[weight_col].to_numpy(dtype=np.float64)
        if len(w) and (w <= 0).any():
            raise ValueError(f"{weight_col} must be strictly positive")
        b["__key"] = -np.log((h + 0.5) / float(1 << 52)) / w
        return b

    def local_top(b: pd.DataFrame) -> pd.DataFrame:
        b = keyed(b)
        b = b.sort_values(["__key", id_col], kind="mergesort")
        b = b.groupby(group_col, sort=False).head(k)
        hh = pd.util.hash_pandas_object(b[group_col], index=False).to_numpy(dtype=np.uint64)
        b["__bkt"] = (hh % n_buckets).astype(np.int64)
        return b

    def final_top(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__key", id_col], kind="mergesort")
        g = g.groupby(group_col, sort=False).head(k)
        return g.drop(columns=["__key", "__bkt"])

    return (
        ds.map_batches(local_top, batch_format="pandas")
        .groupby("__bkt")
        .map_groups(final_top, batch_format="pandas")
    )


def quota_sample(
    ds,
    group_col: str,
    cap: int,
    id_col: str = "doc_id",
    seed: int = 42,
    n_buckets: int = 64,
):
    """Keep at most ``cap`` rows per ``group_col`` value, chosen
    deterministically by ascending ``(md5(id || ':' || seed), id)`` — a
    seeded uniform draw without replacement per group."""

    def local_cap(b: pd.DataFrame) -> pd.DataFrame:
        # combiner: a block never needs to ship more than cap rows per
        # group — the global top-cap is a subset of every block's top-cap
        b = b.copy()
        b["__key"] = _md5_keys(b[id_col].to_numpy(), seed)
        b = b.sort_values(["__key", id_col], kind="mergesort")
        b = b.groupby(group_col, sort=False).head(cap)
        h = pd.util.hash_pandas_object(b[group_col], index=False).to_numpy(dtype=np.uint64)
        b["__bkt"] = (h % n_buckets).astype(np.int64)
        return b

    def final_cap(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["__key", id_col], kind="mergesort")
        g = g.groupby(group_col, sort=False).head(cap)
        return g.drop(columns=["__key", "__bkt"])

    return (
        ds.map_batches(local_cap, batch_format="pandas")
        .groupby("__bkt")
        .map_groups(final_cap, batch_format="pandas")
    )


def split_assign(
    ds,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    out_col: str = "split",
):
    """Deterministic train/val/test split assignment: each row gets the
    split whose cumulative-fraction band contains ``md5(id || ':' || seed)``.

    The assignment is a pure per-row predicate — no exchange, no driver
    state, stable under repartitioning and appends (a doc keeps its split
    forever, the property a training pipeline needs to avoid eval
    contamination when the corpus grows).  The LAST split takes the
    remainder mass, so fractions need not sum to exactly 1.0.
    """
    names = list(fractions)
    if len(names) < 2:
        raise ValueError("need at least two splits")
    cum = 0.0
    thrs: list[str] = []
    for nm in names[:-1]:
        if fractions[nm] <= 0:
            raise ValueError(f"fraction for {nm!r} must be > 0")
        cum += fractions[nm]
        thrs.append(fraction_threshold_hex(cum))

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        keys = _md5_keys(b[id_col].to_numpy(), seed)
        out = np.full(len(b), names[-1], dtype=object)
        # descending bands: the tightest threshold is applied last and wins
        for nm, t in zip(reversed(names[:-1]), reversed(thrs)):
            out[keys < t] = nm
        b = b.copy()
        b[out_col] = out
        return b

    return ds.map_batches(assign, batch_format="pandas")


def split_thresholds_hex(fractions: dict[str, float]) -> list[str]:
    """The cumulative hex thresholds :func:`split_assign` uses, exposed so a
    SQL oracle can interpolate the IDENTICAL constants."""
    names = list(fractions)
    cum, thrs = 0.0, []
    for nm in names[:-1]:
        cum += fractions[nm]
        thrs.append(fraction_threshold_hex(cum))
    return thrs


def repeat_mix(
    ds,
    factors: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 11,
    out_col: str = "rep_idx",
    default: float = 1.0,
):
    """Epoch-weighted UPSAMPLING: each row is emitted ``k`` times, where
    ``k = floor(f) + Bernoulli(frac(f))`` and ``f`` is its group's repeat
    factor — the standard pretraining-mix primitive for repeating
    high-quality sources fractionally many times per epoch (e.g. 2.5×
    wiki, 0.5× crawl).  The Bernoulli draw is the seeded md5 uniform
    (``md5(id || ':' || seed) < hex(frac(f))``), so the decision is
    per-DOCUMENT deterministic: a doc either gains its extra copy in every
    run on every cluster shape, or never — reproducible epochs.

    Emitted copies carry ``out_col`` = 0..k-1.  Pure per-row expansion
    (``np.repeat`` on the batch), no exchange, no driver state; a factor of
    0.0 drops the group entirely (subsampling degenerates to
    :func:`mix_sources`).
    """
    import math

    thr = {
        g: fraction_threshold_hex(f - math.floor(f)) for g, f in factors.items()
    }
    floors = {g: int(math.floor(f)) for g, f in factors.items()}
    d_floor = int(math.floor(default))
    d_thr = fraction_threshold_hex(default - math.floor(default))

    def expand(b: pd.DataFrame) -> pd.DataFrame:
        keys = _md5_keys(b[id_col].to_numpy(), seed)
        grp = b[group_col].to_numpy()
        base = np.array([floors.get(g, d_floor) for g in grp], dtype=np.int64)
        bern = np.array(
            [k < thr.get(g, d_thr) for g, k in zip(grp, keys)], dtype=np.int64
        )
        counts = base + bern
        idx = np.repeat(np.arange(len(b)), counts)
        out = b.iloc[idx].copy()
        # rep_idx 0..k-1 within each source row
        ends = np.cumsum(counts)
        out[out_col] = np.arange(len(idx), dtype=np.int64) - np.repeat(
            ends - counts, counts
        )
        return out

    return ds.map_batches(expand, batch_format="pandas")


def _exp_keys(ids, weights, seed: int) -> np.ndarray:
    h = np.array(
        [
            int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:13], 16)
            for i in ids
        ],
        dtype=np.float64,
    )
    w = np.asarray(weights, dtype=np.float64)
    if len(w) and (w <= 0).any():
        raise ValueError("weights must be strictly positive")
    return -np.log((h + 0.5) / float(1 << 52)) / w


class WeightedReservoir:
    """Persisted STREAMING weighted sample without replacement (A-ExpJ as
    incremental state): keep the ``k`` smallest exponential keys seen so
    far.  Because the md5-seeded draw is a pure function of (id, seed), the
    reservoir after ANY batch sequence equals :func:`weighted_sample` over
    the union of the batches — batch-order independent, crash-safe (the
    state file is swapped atomically after each update), and SQL-checkable
    by the same ``QUALIFY row_number() OVER (ORDER BY exp_key)`` oracle.

    State is one parquet file of ≤ k rows; each update is one distributed
    pass over the batch (per-block top-k combiner) plus an O(k) driver
    merge — no exchange at all.
    """

    def __init__(self, path: str, k: int, seed: int = 42):
        self.path, self.k, self.seed = path, int(k), int(seed)

    def _load(self) -> pd.DataFrame | None:
        if os.path.exists(self.path):
            return pd.read_parquet(self.path)
        return None

    def update(self, ds, weight_col: str, id_col: str = "doc_id") -> pd.DataFrame:
        """Fold one batch into the reservoir; returns the new sample."""
        k, seed = self.k, self.seed

        def local_top(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["__key"] = _exp_keys(b[id_col].to_numpy(), b[weight_col].to_numpy(), seed)
            return b.sort_values(["__key", id_col], kind="mergesort").head(k)

        cand = ds.map_batches(local_top, batch_format="pandas").to_pandas()
        prev = self._load()
        if prev is not None:
            cand = pd.concat([prev, cand], ignore_index=True)
        cand = (
            cand.drop_duplicates(subset=[id_col])
            .sort_values(["__key", id_col], kind="mergesort")
            .head(k)
            .reset_index(drop=True)
        )
        tmp = self.path + ".tmp"
        cand.to_parquet(tmp)
        os.replace(tmp, self.path)
        return cand.drop(columns="__key")

    def sample(self) -> pd.DataFrame:
        cur = self._load()
        if cur is None:
            raise FileNotFoundError(self.path)
        return cur.drop(columns="__key")


class GroupedWeightedReservoir:
    """Per-GROUP streaming weighted sample: the grouped form of
    :class:`WeightedReservoir` — keep the k smallest exponential keys PER
    group value across any batch sequence.  Same determinism argument
    (md5-seeded draws are pure functions of id), so the state after any
    ingest order equals :func:`weighted_sample` over the union — the
    standard continuously-maintained training-mix state."""

    def __init__(self, path: str, group_col: str, k: int, seed: int = 42):
        self.path, self.group_col, self.k, self.seed = path, group_col, int(k), int(seed)

    def _load(self) -> pd.DataFrame | None:
        if os.path.exists(self.path):
            return pd.read_parquet(self.path)
        return None

    def update(self, ds, weight_col: str, id_col: str = "doc_id") -> pd.DataFrame:
        k, seed, grp = self.k, self.seed, self.group_col

        def local_top(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["__key"] = _exp_keys(b[id_col].to_numpy(), b[weight_col].to_numpy(), seed)
            b = b.sort_values(["__key", id_col], kind="mergesort")
            return b.groupby(grp, sort=False).head(k)

        cand = ds.map_batches(local_top, batch_format="pandas").to_pandas()
        prev = self._load()
        if prev is not None:
            cand = pd.concat([prev, cand], ignore_index=True)
        cand = (
            cand.drop_duplicates(subset=[id_col])
            .sort_values(["__key", id_col], kind="mergesort")
            .groupby(grp, sort=False)
            .head(k)
            .reset_index(drop=True)
        )
        tmp = self.path + ".tmp"
        cand.to_parquet(tmp)
        os.replace(tmp, self.path)
        return cand.drop(columns="__key")

    def sample(self) -> pd.DataFrame:
        cur = self._load()
        if cur is None:
            raise FileNotFoundError(self.path)
        return cur.drop(columns="__key")
