"""Mergeable quantile summary — the scale path beside the exact quantiles.

``pipelines/relational.py:quantiles_disc/cont`` are EXACT because counts of
the distinct-value domain cross the exchange; that plan needs a bounded
domain (lengths, scores, token counts).  For unbounded/continuous domains
the standard tool is a mergeable summary: every block reduces to a small
weighted sorted sample, partials merge associatively, and any quantile is
answered from the final summary with a bounded RANK error.

This is the equi-weight resampling summary (a deterministic cousin of
GK/KLL): compression keeps ``max_size`` points at evenly spaced cumulative
weights, so one compression step moves any rank by at most ``W/max_size``
(W = total weight seen).  A tree of merges over B blocks costs at most
``ceil(log2 B)`` compressions → rank error ≤ ``W · log2(B) / max_size``.
With the 1024-point default and 10⁶ blocks that is ~2% rank error — and the
summary is ~16 KB regardless of N, so the driver reduce is O(blocks · size)
bytes, never rows.

Deterministic given the block contents; like every compressed summary the
result may vary WITHIN the error bound across block layouts (the unit test
asserts the bound, not bit equality — the exact operators keep the
bit-exact contract).
"""

from __future__ import annotations

import numpy as np


class QuantileSummary:
    """Weighted sorted sample ``(values, weights)`` with bounded rank error."""

    __slots__ = ("values", "weights", "max_size")

    def __init__(self, values: np.ndarray, weights: np.ndarray, max_size: int = 1024):
        self.values = np.asarray(values, dtype=np.float64)
        self.weights = np.asarray(weights, dtype=np.float64)
        self.max_size = int(max_size)

    @classmethod
    def from_values(cls, v, max_size: int = 1024) -> "QuantileSummary":
        v = np.sort(np.asarray(v, dtype=np.float64))
        s = cls(v, np.ones(len(v)), max_size)
        return s._compress() if len(v) > max_size else s

    @property
    def total(self) -> float:
        return float(self.weights.sum()) if len(self.weights) else 0.0

    def merge(self, other: "QuantileSummary") -> "QuantileSummary":
        v = np.concatenate([self.values, other.values])
        w = np.concatenate([self.weights, other.weights])
        order = np.argsort(v, kind="mergesort")
        out = QuantileSummary(v[order], w[order], max(self.max_size, other.max_size))
        return out._compress() if len(out.values) > out.max_size else out

    def _compress(self) -> "QuantileSummary":
        cum = np.cumsum(self.weights)
        total = cum[-1]
        # evenly spaced target ranks keep every quantile within W/max_size
        targets = (np.arange(self.max_size) + 0.5) * (total / self.max_size)
        idx = np.searchsorted(cum, targets, side="left")
        idx = np.minimum(idx, len(self.values) - 1)
        vals, inv = np.unique(self.values[idx], return_inverse=True)
        w = np.zeros(len(vals))
        np.add.at(w, inv, total / self.max_size)
        return QuantileSummary(vals, w, self.max_size)

    def quantile(self, q: float) -> float:
        if not len(self.values):
            raise ValueError("empty summary")
        cum = np.cumsum(self.weights)
        rank = q * cum[-1]
        i = int(np.searchsorted(cum, rank, side="left"))
        return float(self.values[min(i, len(self.values) - 1)])

    def to_bytes(self) -> bytes:
        return np.concatenate([self.values, self.weights]).tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, max_size: int = 1024) -> "QuantileSummary":
        a = np.frombuffer(blob, dtype=np.float64)
        h = len(a) // 2
        return cls(a[:h].copy(), a[h:].copy(), max_size)


def approx_quantiles(ds, col: str, qs: list[float], max_size: int = 1024):
    """Distributed approximate quantiles: one summary per block (map-side),
    driver merge of O(blocks) ~16 KB blobs, rank error ≤ W·log₂(blocks)/max_size."""
    import pandas as pd

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        s = QuantileSummary.from_values(b[col].to_numpy(dtype=np.float64), max_size)
        return pd.DataFrame({"blob": [s.to_bytes()]})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    summaries = [QuantileSummary.from_bytes(x, max_size) for x in parts["blob"]]
    acc = summaries[0]
    for s in summaries[1:]:
        acc = acc.merge(s)
    return pd.DataFrame(
        {
            "q": np.array(qs, dtype=np.float64),
            "v": np.array([acc.quantile(q) for q in qs], dtype=np.float64),
        }
    )


def grouped_approx_quantiles(
    ds, key_col: str, col: str, qs: list[float], max_size: int = 512, n_buckets: int = 64
):
    """Per-key approximate quantiles: one summary per (block, key) map-side,
    ONE keyed exchange of ~``max_size``-point blobs (never rows), per-bucket
    merge — the grouped form of :func:`approx_quantiles`, for per-source /
    per-language score distributions over unbounded domains."""
    import pandas as pd

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, g in b.groupby(key_col, sort=False):
            rows.append(
                (k, QuantileSummary.from_values(g[col].to_numpy(dtype=np.float64), max_size).to_bytes())
            )
        out = pd.DataFrame(rows, columns=[key_col, "blob"])
        h = pd.util.hash_pandas_object(out[key_col], index=False).to_numpy(dtype=np.uint64)
        out["__bkt"] = (h % n_buckets).astype(np.int64)
        return out

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for k, grp in g.groupby(key_col, sort=False):
            acc = QuantileSummary.from_bytes(grp["blob"].iloc[0], max_size)
            for blob in grp["blob"].iloc[1:]:
                acc = acc.merge(QuantileSummary.from_bytes(blob, max_size))
            for q in qs:
                rows.append((k, float(q), acc.quantile(q)))
        return pd.DataFrame(rows, columns=[key_col, "q", "v"])

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__bkt")
        .map_groups(merge_bucket, batch_format="pandas")
    )
