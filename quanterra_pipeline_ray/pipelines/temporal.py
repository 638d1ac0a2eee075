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


def _pandas_dtype(t) -> np.dtype | None:
    """Target pandas dtype for restoring a column after ragged-union
    NaN-coercion; ``None`` for types that survive concat unchanged (object)."""
    try:
        dt = t.to_pandas_dtype() if hasattr(t, "to_pandas_dtype") else np.dtype(t)
    except (TypeError, NotImplementedError):
        return None
    dt = np.dtype(dt)
    return None if dt == np.dtype(object) else dt


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
    never a per-key Python loop.  The right side is shuffled as ``(by, on)``
    ONLY — no sentinel padding to the left's schema, so a wide left (text
    payloads) never inflates the right side's exchange bytes; the ragged
    union's NaN-coercion of left-only columns (int64→float64 etc.) is
    reversed inside the bucket from the captured left schema.  Further
    right-side columns can be attached afterwards with an equi-join on
    ``(by, <on><suffix>)``.
    """
    anchor_col = f"{on}{suffix}"
    lschema = left_ds.schema()
    left_cols = list(lschema.names)
    restore = [
        (name, _pandas_dtype(t))
        for name, t in zip(lschema.names, lschema.types)
        if name not in (by, on)
    ]

    def tag_left(b: pd.DataFrame) -> pd.DataFrame:
        out = b[left_cols].copy()
        out["__side"] = np.int8(0)
        return out

    def tag_right(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[by, on]].copy()
        out["__side"] = np.int8(1)
        return out

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        for c in left_cols:  # bucket may hold only right rows
            if c not in g.columns:
                g[c] = np.nan
        left = g[g["__side"] == 0][left_cols]
        for name, dt in restore:  # undo ragged-union NaN-coercion
            if dt is not None and left[name].dtype != dt:
                left = left.assign(**{name: left[name].astype(dt)})
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


def _range_join_bucket(
    g: pd.DataFrame, by: str, on: str, anchor_col: str, width_us: int
) -> pd.DataFrame:
    """Range-join kernel for one bucket (sides tagged by ``__side``).

    Never materializes the per-key cartesian product: shared key codes on
    both sides, each key's timestamps shifted into a disjoint int64 range,
    then ONE global ``np.searchsorted`` pair gives every anchor's window
    bounds; matches are emitted with repeat/arange.  Peak memory is
    O(|left| + |right| + matches).
    """
    left = g[g["__side"] == 0][[by, on]]
    right = g[g["__side"] == 1][[by, on]]
    out_dtype = g[on].dtype

    def _empty() -> pd.DataFrame:
        return pd.DataFrame(
            {
                by: pd.Series([], dtype=g[by].dtype),
                anchor_col: pd.Series([], dtype=out_dtype),
                on: pd.Series([], dtype=out_dtype),
            }
        )

    if not len(left) or not len(right):
        return _empty()
    codes, _ = pd.factorize(
        pd.concat([left[by], right[by]], ignore_index=True), sort=False
    )
    lc = codes[: len(left)].astype(np.int64)
    rc = codes[len(left) :].astype(np.int64)
    a_raw = left[on].astype("int64").to_numpy()
    t_raw = right[on].astype("int64").to_numpy()
    tmin = int(min(a_raw.min(), t_raw.min()))
    span = int(max(a_raw.max(), t_raw.max())) - tmin
    offset = span + int(width_us) + 2  # > any in-key window reach
    n_codes = int(codes.max()) + 1
    if n_codes * offset >= 2**62:  # composite-key overflow guard:
        # fall back to per-KEY segments (loop over keys, not anchors)
        return _range_join_per_key(
            lc, rc, a_raw, t_raw, left, right, by, on, anchor_col, width_us
        )
    t_shift = rc * offset + (t_raw - tmin)
    order = np.argsort(t_shift, kind="stable")
    t_shift = t_shift[order]
    a_shift = lc * offset + (a_raw - tmin)
    lo = np.searchsorted(t_shift, a_shift, side="left")
    hi = np.searchsorted(t_shift, a_shift + width_us, side="left")
    counts = hi - lo
    total = int(counts.sum())
    if not total:
        return _empty()
    li = np.repeat(np.arange(len(a_shift)), counts)
    starts = np.cumsum(counts) - counts
    ri = np.repeat(lo, counts) + np.arange(total) - np.repeat(starts, counts)
    ri = order[ri]  # back to right's original row order
    return pd.DataFrame(
        {
            by: left[by].to_numpy()[li],
            anchor_col: left[on].to_numpy()[li],
            on: right[on].to_numpy()[ri],
        }
    )


def _range_join_per_key(
    lc, rc, a_raw, t_raw, left, right, by, on, anchor_col, width_us
) -> pd.DataFrame:
    """Overflow fallback for :func:`range_join`'s composite-key shift trick
    (only reachable when n_keys x ts_span overflows int64): per-KEY segment
    searchsorted — a loop over distinct keys, never over anchors, and still
    never the per-key cartesian product."""
    lorder = np.lexsort((a_raw, lc))
    rorder = np.lexsort((t_raw, rc))
    lc_s, a_s = lc[lorder], a_raw[lorder]
    rc_s, t_s = rc[rorder], t_raw[rorder]
    li_parts, ri_parts = [], []
    r_keys, r_starts = np.unique(rc_s, return_index=True)
    r_ends = np.append(r_starts[1:], len(rc_s))
    key_to_r = dict(zip(r_keys.tolist(), zip(r_starts.tolist(), r_ends.tolist())))
    l_keys, l_starts = np.unique(lc_s, return_index=True)
    l_ends = np.append(l_starts[1:], len(lc_s))
    for k, ls, le in zip(l_keys.tolist(), l_starts.tolist(), l_ends.tolist()):
        rr = key_to_r.get(k)
        if rr is None:
            continue
        rs, re = rr
        seg = t_s[rs:re]
        a = a_s[ls:le]
        lo = rs + np.searchsorted(seg, a, side="left")
        hi = rs + np.searchsorted(seg, a + width_us, side="left")
        counts = hi - lo
        total = int(counts.sum())
        if not total:
            continue
        li_parts.append(np.repeat(np.arange(ls, le), counts))
        starts = np.cumsum(counts) - counts
        ri_parts.append(np.repeat(lo, counts) + np.arange(total) - np.repeat(starts, counts))
    if not li_parts:
        return pd.DataFrame(
            {
                by: pd.Series([], dtype=left[by].dtype),
                anchor_col: pd.Series([], dtype=left[on].dtype),
                on: pd.Series([], dtype=right[on].dtype),
            }
        )
    li = lorder[np.concatenate(li_parts)]
    ri = rorder[np.concatenate(ri_parts)]
    return pd.DataFrame(
        {
            by: left[by].to_numpy()[li],
            anchor_col: left[on].to_numpy()[li],
            on: right[on].to_numpy()[ri],
        }
    )


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
        return _range_join_bucket(g, by, on, anchor_col, width_us)

    tagged = left_ds.map_batches(tag_left, batch_format="pandas").union(
        right_ds.map_batches(tag_right, batch_format="pandas")
    )
    return bucketed_groupby(tagged, [by], join_bucket, n_buckets)
