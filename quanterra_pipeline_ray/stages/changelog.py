"""Row-level changelog between two snapshots (incremental maintenance).

Generalizes the reference's envelope-metadata provenance chains (reference
`src/models/data/eodhd_models.py:22-27`) into a CDC surface: what changed
between snapshot A and snapshot B, as ``insert`` / ``delete`` rows (an
update is a delete of the old row plus an insert of the new one — the same
decomposition SQL's ``EXCEPT`` produces, which is the driver oracle).

Incremental by construction: files present in BOTH manifests cannot
contribute (identical content cancels), so only the snapshots' file-set
difference is scanned — a compaction that rewrites bytes but not rows
yields an EMPTY changelog after scanning only the rewritten files, and a
MERGE scans only its touched partitions.  The diff itself is one bucketed
hash shuffle on the row key; full-row comparison happens vectorized per
bucket.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..state.manifest import TranscriptTable


def changelog(
    table: TranscriptTable,
    from_snapshot: int,
    to_snapshot: int,
    n_buckets: int = 64,
):
    """Dataset of ``(op, <schema columns>)`` rows describing the row-level
    delta ``to_snapshot - from_snapshot`` (the TO snapshot's schema; evolved
    columns are padded with their defaults on both sides so a pure schema
    evolution yields an empty changelog)."""
    import ray.data as rd

    _schema = table.schema_of(to_snapshot)
    _defaults = table.defaults_of(to_snapshot)
    _aliases = table.aliases_of(to_snapshot)
    _COLS = list(_schema.names)
    # bucket key: transcript key columns when present, else the first
    # column — ANY deterministic row-value function partitions correctly
    # (identical rows land together and cancel), this just picks a
    # low-skew one for the common schemas
    _KEY_COLS = [c for c in ("conv_id", "turn_idx") if c in _COLS] or _COLS[:1]

    # file identity includes the positional-delete sidecar: a delete-vector
    # commit keeps the data path but changes delete_path, so the file must be
    # scanned on BOTH sides (each through its own mask) — common rows cancel
    # in the bucket diff and only the newly-deleted rows surface.
    old_files = {(f.path, f.delete_path): f for f in table.files(from_snapshot)}
    new_files = {(f.path, f.delete_path): f for f in table.files(to_snapshot)}
    only_old = [old_files[k] for k in sorted(old_files.keys() - new_files.keys())]
    only_new = [new_files[k] for k in sorted(new_files.keys() - old_files.keys())]

    def empty_frame() -> pd.DataFrame:
        base = _schema.empty_table().to_pandas()
        base.insert(0, "op", pd.Series([], dtype=object))
        return base

    if not only_old and not only_new:
        return rd.from_pandas(empty_frame())

    def tag(side: int):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            for c in _COLS:
                if c in b.columns:
                    continue
                for old in reversed(_aliases.get(c, [])):  # renamed columns:
                    if old in b.columns:  # map the file's physical name
                        b = b.rename(columns={old: c})
                        break
            for c in _COLS:  # pad evolved columns missing from old files
                if c not in b.columns:
                    b[c] = _defaults.get(c)
            out = b[_COLS].copy()
            out["__side"] = np.int8(side)
            h = np.zeros(len(out), dtype=np.uint64)
            for c in _KEY_COLS:
                h ^= pd.util.hash_pandas_object(out[c], index=False).to_numpy(dtype=np.uint64)
            out["__bkt"] = (h % n_buckets).astype(np.int64)
            return out

        return fn

    from .deletevec import read_files

    parts = []
    if only_old:
        parts.append(read_files(table, only_old).map_batches(tag(0), batch_format="pandas"))
    if only_new:
        parts.append(read_files(table, only_new).map_batches(tag(1), batch_format="pandas"))
    ds = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

    def diff_bucket(g: pd.DataFrame) -> pd.DataFrame:
        old = g[g["__side"] == 0][_COLS]
        new = g[g["__side"] == 1][_COLS]
        merged = old.merge(new, on=_COLS, how="outer", indicator=True)
        ins = merged[merged["_merge"] == "right_only"][_COLS]
        dele = merged[merged["_merge"] == "left_only"][_COLS]
        out = pd.concat(
            [ins.assign(op="insert"), dele.assign(op="delete")], ignore_index=True
        )
        return out[["op"] + _COLS] if len(out) else empty_frame()

    return ds.groupby("__bkt").map_groups(diff_bucket, batch_format="pandas")
