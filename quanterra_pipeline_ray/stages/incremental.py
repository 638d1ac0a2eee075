"""Incremental (changelog-driven) view maintenance.

The payoff of :mod:`.changelog`: a derived aggregate over a 100-TB table is
kept in sync by processing only the DELTA between two snapshots instead of
recomputing over the full scan — the standard incremental-view-maintenance
decomposition (aggregate(new) = aggregate(old) ⊕ aggregate(delta)) for
abelian aggregates (counts/sums: inserts add, deletes subtract).

:func:`incremental_conv_counts` maintains the per-conversation turn count;
the same shape extends to any per-key count/sum view.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..state.manifest import TranscriptTable
from .changelog import changelog


def conv_counts(ds, n_buckets: int = 64):
    """Per-conversation turn counts of a transcripts Dataset (bucketed,
    partial pre-agg per batch before the shuffle)."""
    from ..pipelines.relational import bucketed_groupby

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("conv_id", as_index=False).size()
        return g.rename(columns={"size": "n_turns"})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("conv_id", as_index=False)["n_turns"].sum()

    return bucketed_groupby(ds.map_batches(partial, batch_format="pandas"), ["conv_id"], combine, n_buckets)


def key_counts(ds, key_col: str, count_col: str = "n_rows", n_buckets: int = 64):
    """Per-key row counts of a Dataset (bucketed, partial pre-agg per batch
    before the shuffle) — the generic form of :func:`conv_counts`."""
    from ..pipelines.relational import bucketed_groupby

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(key_col, as_index=False).size()
        return g.rename(columns={"size": count_col})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key_col, as_index=False)[count_col].sum()

    return bucketed_groupby(ds.map_batches(partial, batch_format="pandas"), [key_col], combine, n_buckets)


def _apply_view_delta(
    base_view, delta_agg, key_col: str, combine_raw, combine_final, n_buckets: int
):
    """Merge a per-key delta aggregate into a maintained view, shuffling
    ONLY the affected keys.

    The classic IVM plan re-shuffles base ∪ delta — O(view) exchange bytes
    for any delta.  Here the delta aggregate (one row per CHANGED key, by
    construction small) is reduced first, its key set broadcast via
    ``ray.put``, and the view split into an untouched side (a pure Arrow
    filter — never enters an exchange) and an affected side that unions
    with the delta and re-combines.  Exchange bytes are O(changed keys);
    driver memory is O(changed keys) — the same honest bound as
    ``anti_join_keys`` (a delta whose key set can't broadcast can't be
    applied by any plan that must name those keys).  When the delta
    touches most of the view (churn-everything maintenance), the split
    buys nothing and the plan falls back to the one-shuffle base ∪ delta
    form.

    ``combine_raw`` sums the abelian columns per key; ``combine_final``
    additionally drops keys whose count reached zero.  The zero-drop MUST
    NOT run on the delta alone: an in-place update nets a zero COUNT delta
    but a nonzero SUM delta, and dropping it there would lose the change."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    from ..pipelines.relational import bucketed_groupby

    # the per-block delta partials are O(changed keys × blocks) rows —
    # bounded by the delta, so one map-only execution sizes the decision
    delta_agg = delta_agg.materialize()
    n_partial = delta_agg.count()
    if n_partial == 0:
        return base_view
    base_n = base_view.count()
    if base_n and n_partial > base_n // 2:
        # churn regime: the delta touches most of the view — the split
        # would read the view twice to save nothing, and the changed-key
        # set may not fit the driver; one bucketed shuffle over
        # base ∪ delta is the right plan there
        merged = base_view.union(delta_agg)
        return bucketed_groupby(merged, [key_col], combine_final, n_buckets)

    # small delta: reduce it ON THE DRIVER (no exchange — the partials are
    # bounded), broadcast the changed-key set, and split the view into an
    # untouched side (pure Arrow filter, never shuffled) and an affected
    # side small enough to combine driver-side too.  The refresh then
    # costs the changelog scan + two map-only passes over the view —
    # ZERO additional sort exchanges.
    reduced_df = combine_raw(delta_agg.to_pandas())
    affected_df = base_view.map_batches(
        _in_keys_filter(key_col, reduced_df[key_col].to_numpy(), invert=False),
        batch_format="pyarrow",
    ).to_pandas()
    updated_df = combine_final(pd.concat([affected_df, reduced_df], ignore_index=True))
    # typed empty safety: build the Arrow block from the combined schema
    updated = rd.from_arrow(pa.Table.from_pandas(updated_df, preserve_index=False))
    untouched = base_view.map_batches(
        _in_keys_filter(key_col, reduced_df[key_col].to_numpy(), invert=True),
        batch_format="pyarrow",
    )
    return untouched.union(updated)


def _in_keys_filter(key_col: str, keys, invert: bool):
    """Arrow block filter: rows whose ``key_col`` is (not) in ``keys``."""
    import pyarrow.compute as pc

    vs0 = pa.array(pd.unique(np.asarray(keys, dtype=object)))

    def f(b: pa.Table) -> pa.Table:
        col = b.column(key_col)
        vs = vs0.cast(col.type) if vs0.type != col.type else vs0
        mask = pc.is_in(col, value_set=vs)
        return b.filter(pc.invert(mask) if invert else mask)

    return f


def incremental_key_counts(
    table: TranscriptTable,
    from_snapshot: int,
    to_snapshot: int,
    base_counts,
    key_col: str = "conv_id",
    count_col: str = "n_turns",
    n_buckets: int = 64,
):
    """Update per-key counts from ``from_snapshot``'s view to
    ``to_snapshot``'s by applying only the row-level changelog.

    ``base_counts``: Dataset of ``(key_col, count_col)`` valid at
    ``from_snapshot``.  Cost is O(changed rows), not O(table): the
    changelog scans only the snapshots' file-set difference, and the
    combine is one bucketed shuffle over base-counts + delta rows.
    Keys whose count reaches zero drop out of the view.
    """
    from ..pipelines.relational import bucketed_groupby

    delta = changelog(table, from_snapshot, to_snapshot, n_buckets)

    def delta_counts(b: pd.DataFrame) -> pa.Table:
        # emit Arrow so the union with an Arrow base (the persisted-view
        # parquet read — the scale path) is Arrow-native; no identity pass
        # over the table-sized base side
        if not len(b):  # typed empty: never poison the union's dtypes
            return pa.table(
                {key_col: pa.array([], pa.string()), count_col: pa.array([], pa.int64())}
            )
        sign = np.where(b["op"].to_numpy() == "insert", 1, -1)
        g = pd.DataFrame({key_col: b[key_col].to_numpy(), count_col: sign})
        out = g.groupby(key_col, as_index=False)[count_col].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    def combine_raw(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key_col, as_index=False)[count_col].sum()

    def combine_final(g: pd.DataFrame) -> pd.DataFrame:
        out = combine_raw(g)
        return out[out[count_col] != 0]

    delta_agg = delta.map_batches(delta_counts, batch_format="pandas")
    return _apply_view_delta(
        base_counts, delta_agg, key_col, combine_raw, combine_final, n_buckets
    )


def incremental_conv_counts(
    table: TranscriptTable,
    from_snapshot: int,
    to_snapshot: int,
    base_counts,
    n_buckets: int = 64,
):
    """Per-conversation turn counts maintained incrementally (the
    transcript-schema instance of :func:`incremental_key_counts`)."""
    return incremental_key_counts(
        table, from_snapshot, to_snapshot, base_counts,
        key_col="conv_id", count_col="n_turns", n_buckets=n_buckets,
    )


def _default_val_fn(b: pd.DataFrame) -> np.ndarray:
    return b["text"].astype(str).str.len().to_numpy(dtype=np.int64)


def key_sums(
    ds,
    key_col: str,
    val_fn=_default_val_fn,
    count_col: str = "n_rows",
    sum_col: str = "val_sum",
    n_buckets: int = 64,
):
    """Per-key ``(count, integer sum)`` of a derived value (default: text
    length) — the abelian pair every count/sum/mean view reduces to.
    Partial pre-agg per batch before the one bucketed shuffle."""
    from ..pipelines.relational import bucketed_groupby

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({key_col: b[key_col].to_numpy(), sum_col: val_fn(b)})
        out = g.groupby(key_col, as_index=False).agg(
            **{count_col: (sum_col, "size"), sum_col: (sum_col, "sum")}
        )
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key_col, as_index=False)[[count_col, sum_col]].sum()

    return bucketed_groupby(
        ds.map_batches(partial, batch_format="pandas"), [key_col], combine, n_buckets
    )


def incremental_key_sums(
    table: TranscriptTable,
    from_snapshot: int,
    to_snapshot: int,
    base_view,
    key_col: str = "conv_id",
    val_fn=_default_val_fn,
    count_col: str = "n_rows",
    sum_col: str = "val_sum",
    n_buckets: int = 64,
):
    """Maintain a per-key ``(count, sum)`` view across snapshots from the
    changelog delta only: inserts add ``(+1, +v)``, deletes add
    ``(-1, -v)`` — the abelian decomposition
    ``agg(new) = agg(old) ⊕ agg(delta)``.  An update (delete+insert of a
    changed row) nets the value difference exactly.  Keys whose count
    reaches zero leave the view.  Cost is O(changed rows); a mean view is
    ``sum / count`` at read time, never stored (means are not abelian).
    """
    from ..pipelines.relational import bucketed_groupby

    delta = changelog(table, from_snapshot, to_snapshot, n_buckets)

    def delta_sums(b: pd.DataFrame) -> pa.Table:
        # Arrow out for an Arrow-native union with a parquet-read base —
        # see delta_counts in incremental_key_counts
        if not len(b):
            return pa.table(
                {
                    key_col: pa.array([], pa.string()),
                    count_col: pa.array([], pa.int64()),
                    sum_col: pa.array([], pa.int64()),
                }
            )
        sign = np.where(b["op"].to_numpy() == "insert", 1, -1).astype(np.int64)
        g = pd.DataFrame(
            {key_col: b[key_col].to_numpy(), count_col: sign, sum_col: sign * val_fn(b)}
        )
        out = g.groupby(key_col, as_index=False)[[count_col, sum_col]].sum()
        return pa.Table.from_pandas(out, preserve_index=False)

    def combine_raw(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key_col, as_index=False)[[count_col, sum_col]].sum()

    def combine_final(g: pd.DataFrame) -> pd.DataFrame:
        out = combine_raw(g)
        return out[out[count_col] != 0]

    delta_agg = delta.map_batches(delta_sums, batch_format="pandas")
    return _apply_view_delta(
        base_view, delta_agg, key_col, combine_raw, combine_final, n_buckets
    )
