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

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key_col, as_index=False)[count_col].sum()
        return out[out[count_col] != 0]

    # the base side unions AS-IS (whatever blocks it arrives in):
    # bucketed_groupby's add_bucket map is the one format-normalizing pass,
    # fused into useful work — never a dedicated identity pass over the base
    merged = base_counts.union(delta.map_batches(delta_counts, batch_format="pandas"))
    return bucketed_groupby(merged, [key_col], combine, n_buckets)


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

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(key_col, as_index=False)[[count_col, sum_col]].sum()
        return out[out[count_col] != 0]

    merged = base_view.union(delta.map_batches(delta_sums, batch_format="pandas"))
    return bucketed_groupby(merged, [key_col], combine, n_buckets)
