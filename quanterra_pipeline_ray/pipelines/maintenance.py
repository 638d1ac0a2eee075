"""Flagship maintenance pipeline: compaction + Z-order + MERGE.

The end-to-end lifecycle mirrors the reference's flow DAG shape (plan →
bounded fan-out → validate → store → metadata, reference
`src/orchestration/pipelines/ingest/eodhd_pipeline.py:18-70`) rebuilt as
manifest-committed Ray Data ops.  This module is what ``bench.py`` times and
``__ray_entry__.entry()`` smoke-runs.
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.compaction import compact
from ..stages.expire import expire_snapshots
from ..stages.merge import merge_into
from ..stages.zorder import cluster
from ..state.manifest import TranscriptTable
from ..synth import fragment_table, generate_transcripts


@dataclass
class MaintenanceReport:
    rows: int = 0
    timings_s: dict[str, float] = field(default_factory=dict)
    snapshots: dict[str, int] = field(default_factory=dict)
    files: dict[str, int] = field(default_factory=dict)

    @property
    def turns_per_sec(self) -> float:
        total = sum(self.timings_s.values())
        return self.rows / total if total > 0 else 0.0

    def to_json(self) -> dict[str, Any]:
        return {
            "rows": self.rows,
            "timings_s": {k: round(v, 4) for k, v in self.timings_s.items()},
            "snapshots": self.snapshots,
            "files": self.files,
            "turns_per_sec": round(self.turns_per_sec, 2),
        }


def build_fragmented_table(
    root: str,
    n_convs: int = 2000,
    seed: int = 42,
    mean_turns: int = 16,
    n_files: int = 64,
    hot_convs: int = 3,
    hot_turns: int = 2000,
    fresh: bool = True,
) -> tuple[TranscriptTable, pa.Table]:
    """Deterministic fragmented input table under ``root`` (scratch dirs only)."""
    if fresh:
        shutil.rmtree(root, ignore_errors=True)
    table = TranscriptTable.create(root)
    data = generate_transcripts(
        n_convs=n_convs, seed=seed, mean_turns=mean_turns, hot_convs=hot_convs, hot_turns=hot_turns
    )
    frag_dir = os.path.join(root, "data", "frags")
    paths = fragment_table(data, frag_dir, n_files)
    table.register_fragments(paths)
    return table, data


def default_merge_source(data: pa.Table, update_every: int = 20, seed: int = 7) -> pa.Table:
    """Deterministic merge source: every ``update_every``-th CONVERSATION gets
    all its turns updated, plus one new conversation.

    Updating whole conversations (not every Nth row) is the realistic merge
    shape — it lets manifest-stats partition pruning skip files that contain
    no touched conversation, which is the point of pruning at 100 TB."""
    df = data.to_pandas()
    convs = df["conv_id"].unique()
    touched = set(convs[::update_every])
    df = df[df["conv_id"].isin(touched)].copy()
    df["text"] = "UPDATED " + df["text"]
    new = pd.DataFrame(
        {
            "conv_id": [f"conv-merge-{seed}"] * 4,
            "turn_idx": np.arange(4, dtype=np.int32),
            "role": ["user", "assistant", "user", "assistant"],
            "text": ["q1", "a1", "q2", "a2"],
            "tool": [""] * 4,
            "ts": pd.to_datetime([1, 2, 3, 4], unit="s").astype("datetime64[us]"),
        }
    )
    return pa.Table.from_pandas(pd.concat([df, new], ignore_index=True), preserve_index=False)


def run_maintenance(
    table: TranscriptTable,
    merge_source: pa.Table | None = None,
    target_bytes: int = 128 * 1024 * 1024,
    target_rows: int = 200_000,
    expire_keep_last: int = 2,
    do_expire: bool = False,
    part_bits: int | None = None,
    fuse_compact_cluster: bool = True,
    exchange: str = "direct",
) -> MaintenanceReport:
    """compact → Z-order cluster → MERGE (→ optional expire); timed per stage.

    ``fuse_compact_cluster`` (default): the cluster stage consumes the
    fragmented input DIRECTLY — its writer already emits target-size,
    z-sorted, content-addressed files, so a separate compaction pass would
    write (and re-read) every byte once more for an intermediate layout the
    very next stage destroys.  Final table state is identical; wall time
    drops by ~one full read+write of the dataset.  ``False`` keeps the
    discrete two-snapshot history (useful when compaction and clustering run
    on different cadences).
    """
    rep = MaintenanceReport()
    rep.files["input"] = len(table.files())

    if fuse_compact_cluster:
        t0 = time.monotonic()
        s2 = cluster(table, target_rows=target_rows, part_bits=part_bits, exchange=exchange)
        rep.timings_s["compact+zorder(fused)"] = time.monotonic() - t0
        rep.snapshots["zorder"] = s2.snapshot_id
        rep.files["clustered"] = len(table.files())
    else:
        t0 = time.monotonic()
        s1 = compact(table, target_bytes=target_bytes)
        rep.timings_s["compact"] = time.monotonic() - t0
        rep.snapshots["compact"] = s1.snapshot_id
        rep.files["compacted"] = len(table.files())

        t0 = time.monotonic()
        s2 = cluster(table, target_rows=target_rows, part_bits=part_bits, exchange=exchange)
        rep.timings_s["zorder"] = time.monotonic() - t0
        rep.snapshots["zorder"] = s2.snapshot_id
        rep.files["clustered"] = len(table.files())

    if merge_source is not None and merge_source.num_rows:
        t0 = time.monotonic()
        s3 = merge_into(table, merge_source, target_rows=target_rows)
        rep.timings_s["merge"] = time.monotonic() - t0
        rep.snapshots["merge"] = s3.snapshot_id
        rep.files["merged"] = len(table.files())

    if do_expire:
        t0 = time.monotonic()
        expire_snapshots(table, keep_last=expire_keep_last)
        rep.timings_s["expire"] = time.monotonic() - t0

    rep.rows = int(table.snapshot().summary.get("total_rows", 0))
    return rep
