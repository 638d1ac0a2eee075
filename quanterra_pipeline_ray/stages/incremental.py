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


def incremental_conv_counts(
    table: TranscriptTable,
    from_snapshot: int,
    to_snapshot: int,
    base_counts,
    n_buckets: int = 64,
):
    """Update per-conversation counts from ``from_snapshot``'s view to
    ``to_snapshot``'s by applying only the row-level changelog.

    ``base_counts``: Dataset of ``(conv_id, n_turns)`` valid at
    ``from_snapshot``.  Cost is O(changed rows), not O(table): the
    changelog scans only the snapshots' file-set difference, and the
    combine is one bucketed shuffle over base-counts + delta rows.
    Conversations whose count reaches zero drop out of the view.
    """
    from ..pipelines.relational import bucketed_groupby

    delta = changelog(table, from_snapshot, to_snapshot, n_buckets)

    def delta_counts(b: pd.DataFrame) -> pd.DataFrame:
        if not len(b):  # typed empty: never poison the union's dtypes
            return pd.DataFrame({"conv_id": pd.Series([], dtype=object), "n_turns": pd.Series([], dtype=np.int64)})
        sign = np.where(b["op"].to_numpy() == "insert", 1, -1)
        g = pd.DataFrame({"conv_id": b["conv_id"].to_numpy(), "n_turns": sign})
        return g.groupby("conv_id", as_index=False)["n_turns"].sum()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("conv_id", as_index=False)["n_turns"].sum()
        return out[out["n_turns"] != 0]

    merged = base_counts.union(delta.map_batches(delta_counts, batch_format="pandas"))
    return bucketed_groupby(merged, ["conv_id"], combine, n_buckets)
