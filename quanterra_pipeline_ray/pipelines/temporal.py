"""Temporal joins over keyed, timestamped streams: as-of and range joins.

Ray Data has no built-in as-of join; both operators here are compositions of
``map_batches`` + one bucketed ``groupby`` (hash on the ``by`` key), per the
custom-operator contract.  Partitioning assumption (documented): all rows of
one ``by`` key fit a single bucket's group — buckets hold ~1/n_buckets of
BOTH sides, so memory is bounded by the hot-key row count, the same
assumption the MERGE bucket resolver makes (hot keys would be salted by
coarse time range, as in ``stages/zorder``).

Semantics (match DuckDB's ``ASOF JOIN``):

* :func:`asof_join` — for each left row, the single right row with the
  LATEST ``on`` value ≤ the left's (backward direction, exact matches
  allowed); inner join (left rows with no candidate are dropped).
* :func:`range_join` — inner join of left anchors to right rows of the same
  key with ``on`` in ``[anchor, anchor + width)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .relational import bucketed_groupby


def _sentinel_value(dtype_str: str):
    """Dtype-preserving filler for union-schema padding (never read)."""
    if "int" in dtype_str:
        return 0
    if "float" in dtype_str:
        return 0.0
    if "datetime" in dtype_str or "timestamp" in dtype_str:
        return pd.Timestamp(0)
    return ""


def asof_join(
    left_ds,
    right_ds,
    on: str = "ts",
    by: str = "conv_id",
    suffix: str = "_right",
    n_buckets: int = 64,
):
    """Backward as-of join: attach the latest right ``on`` value with
    ``right[on] <= left[on]`` per ``by`` key as column ``<on><suffix>``.
    Inner semantics (left rows with no candidate are dropped); matches
    DuckDB's ``ASOF JOIN``.

    Both sides stream through one hash shuffle on ``by``; within each bucket
    all keys are joined in ONE vectorized ``pd.merge_asof`` (sorted merge),
    never a per-key Python loop.  Right rows are padded to the left's schema
    with dtype-preserving sentinels (discarded inside the bucket join) so the
    Ray union stays schema-consistent.  Further right-side columns can be
    attached afterwards with an equi-join on ``(by, <on><suffix>)``.
    """
    anchor_col = f"{on}{suffix}"
    lschema = left_ds.schema()
    left_cols = list(lschema.names)
    pad_cols = [
        (name, str(t)) for name, t in zip(lschema.names, lschema.types)
        if name not in (by, on)
    ]

    def tag_left(b: pd.DataFrame) -> pd.DataFrame:
        out = b[left_cols].copy()
        out["__side"] = np.int8(0)
        return out

    def tag_right(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[by, on]].copy()
        for name, t in pad_cols:
            out[name] = _sentinel_value(t)
        out = out[left_cols]
        out["__side"] = np.int8(1)
        return out

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["__side"] == 0][left_cols]
        right = g[g["__side"] == 1][[by, on]]
        empty = left.iloc[0:0].copy()
        empty[anchor_col] = pd.Series([], dtype=g[on].dtype)
        if not len(left) or not len(right):
            return empty
        left = left.sort_values([on, by], kind="mergesort").reset_index(drop=True)
        right = (
            right.drop_duplicates([by, on])
            .sort_values([on, by], kind="mergesort")
            .reset_index(drop=True)
        )
        # right carries an explicit copy of its `on` so the matched anchor
        # timestamp survives into the output (merge_asof consumes the key)
        right = right.assign(**{anchor_col: right[on]})
        merged = pd.merge_asof(
            left, right, on=on, by=by, direction="backward", allow_exact_matches=True
        )
        return merged[merged[anchor_col].notna()]  # inner semantics

    tagged = left_ds.map_batches(tag_left, batch_format="pandas").union(
        right_ds.map_batches(tag_right, batch_format="pandas")
    )
    return bucketed_groupby(tagged, [by], join_bucket, n_buckets)


def range_join(
    left_ds,
    right_ds,
    on: str = "ts",
    by: str = "conv_id",
    width_us: int = 3_600_000_000,
    n_buckets: int = 64,
):
    """Inner range join: for each left anchor row, right rows of the same key
    with ``on`` in ``[anchor, anchor + width_us)``; emits one row per match
    pair with the anchor timestamp as ``anchor_<on>``.

    Vectorized per bucket: both sides sorted once, window bounds found with
    ``np.searchsorted`` per key segment, matches emitted by repeat/arange —
    no per-row Python loop.
    """
    anchor_col = f"anchor_{on}"

    def tag_left(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[by, on]].copy()
        out["__side"] = np.int8(0)
        return out

    def tag_right(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[by, on]].copy()
        out["__side"] = np.int8(1)
        return out

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["__side"] == 0][[by, on]].sort_values([by, on], kind="mergesort")
        right = g[g["__side"] == 1][[by, on]].sort_values([by, on], kind="mergesort")
        if not len(left) or not len(right):
            return pd.DataFrame({by: [], anchor_col: [], on: []})
        # pandas merge on key, then vectorized range filter: bounded by the
        # per-key match product (right rows within `width` of an anchor)
        m = left.rename(columns={on: anchor_col}).merge(right, on=by)
        a = m[anchor_col].astype("int64").to_numpy()
        t = m[on].astype("int64").to_numpy()
        keep = (t >= a) & (t < a + width_us)
        return m[keep]

    tagged = left_ds.map_batches(tag_left, batch_format="pandas").union(
        right_ds.map_batches(tag_right, batch_format="pandas")
    )
    return bucketed_groupby(tagged, [by], join_bucket, n_buckets)
