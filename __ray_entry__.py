"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship maintenance pipeline (compact → Z-order →
MERGE) on a transcripts table synthesized from sf0.001.  ``queries()`` maps
every implemented operator to a callable over ``sf_dir``; ``oracle_sql()``
gives the DuckDB-equivalent SQL where the op is SQL-expressible.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init``/``ray.shutdown``.

Maintenance ops run over a transcripts table DERIVED from the ``events``
view by :data:`quanterra_pipeline_ray.synth.TRANSCRIPTS_FROM_EVENTS_SQL`, so
DuckDB can oracle-check scan equality after compaction / clustering /
merge / expiry / crash-resume.
"""

from __future__ import annotations

import json
import os
import shutil
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from quanterra_pipeline_ray.state.manifest import TranscriptTable
from quanterra_pipeline_ray.synth import (
    TRANSCRIPTS_FROM_EVENTS_SQL,
    fragment_table,
    transcripts_from_events,
)

_SCRATCH = "/tmp/qpr_queries"


# --------------------------------------------------------------------- utils
def _result(table: pa.Table) -> pa.Table:
    """Cast large_string -> string so result schema matches DuckDB's."""
    cols = []
    for field in table.schema:
        col = table.column(field.name)
        if field.type == pa.large_string():
            col = col.cast(pa.string())
        cols.append(col)
    return pa.table(dict(zip(table.schema.names, cols)))


def _maint_table(sf_dir: str, tag: str, n_files: int = 16) -> tuple[TranscriptTable, pa.Table]:
    root = os.path.join(_SCRATCH, f"{tag}-{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(root, ignore_errors=True)
    table = TranscriptTable.create(root)
    data = transcripts_from_events(sf_dir)
    paths = fragment_table(data, os.path.join(root, "data", "frags"), n_files)
    table.register_fragments(paths)
    return table, data


def _merge_source(data: pa.Table) -> pa.Table:
    """SQL-mirrorable merge source: updates (turn_idx%7==3), deletes
    (turn_idx%13==5 and not updated), inserts (conversation 'cNEW')."""
    df = data.to_pandas()
    upd = df[df["turn_idx"] % 7 == 3].copy()
    upd["text"] = "UPDATED " + upd["text"]
    upd["__op"] = "upsert"
    dele = df[(df["turn_idx"] % 13 == 5) & (df["turn_idx"] % 7 != 3)].copy()
    dele["__op"] = "delete"
    ins = pd.DataFrame(
        {
            "conv_id": ["cNEW", "cNEW"],
            "turn_idx": np.array([0, 1], dtype=np.int32),
            "role": ["user", "assistant"],
            "text": ["hello", "hi"],
            "tool": ["", ""],
            "ts": pd.to_datetime(
                ["2024-06-01 00:00:00", "2024-06-01 00:01:00"]
            ).astype("datetime64[us]"),
            "__op": ["upsert", "upsert"],
        }
    )
    return pa.Table.from_pandas(pd.concat([upd, dele, ins], ignore_index=True), preserve_index=False)


# ----------------------------------------------------------- maintenance ops
def _q_maint_scan(sf_dir: str) -> pa.Table:
    table, _ = _maint_table(sf_dir, "scan")
    return _result(table.read_all())


def _q_maint_compact(sf_dir: str) -> pa.Table:
    from quanterra_pipeline_ray.stages.compaction import compact

    table, _ = _maint_table(sf_dir, "compact")
    compact(table, target_bytes=4 << 20)
    return _result(table.read_all())


def _q_maint_zorder(sf_dir: str) -> pa.Table:
    from quanterra_pipeline_ray.stages.compaction import compact
    from quanterra_pipeline_ray.stages.zorder import cluster

    table, _ = _maint_table(sf_dir, "zorder")
    compact(table, target_bytes=4 << 20)
    cluster(table, target_rows=5000)
    return _result(table.read_all())


def _q_maint_append(sf_dir: str) -> pa.Table:
    """Distributed append path: Dataset -> validated, content-addressed
    data files -> one snapshot commit -> scan."""
    import ray.data as rd

    from quanterra_pipeline_ray.stages.append import append_dataset

    root = os.path.join(_SCRATCH, f"append-{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(root, ignore_errors=True)
    table = TranscriptTable.create(root)
    data = transcripts_from_events(sf_dir)
    append_dataset(table, rd.from_arrow(data), rows_per_file=2000)
    return _result(table.read_all())


def _q_maint_hilbert(sf_dir: str) -> pa.Table:
    from quanterra_pipeline_ray.stages.compaction import compact
    from quanterra_pipeline_ray.stages.zorder import cluster

    table, _ = _maint_table(sf_dir, "hilbert")
    compact(table, target_bytes=4 << 20)
    cluster(table, target_rows=5000, curve="hilbert")
    return _result(table.read_all())


def _q_maint_merge(sf_dir: str) -> pa.Table:
    from quanterra_pipeline_ray.stages.compaction import compact
    from quanterra_pipeline_ray.stages.merge import merge_into

    table, data = _maint_table(sf_dir, "merge")
    compact(table, target_bytes=4 << 20)
    merge_into(table, _merge_source(data), target_rows=100_000)
    return _result(table.read_all())


def _q_maint_merge_shuffle(sf_dir: str) -> pa.Table:
    """Same MERGE, forced through the hash-shuffle groupby plan."""
    from quanterra_pipeline_ray.stages.compaction import compact
    from quanterra_pipeline_ray.stages.merge import merge_into

    table, data = _maint_table(sf_dir, "mergeshuf")
    compact(table, target_bytes=4 << 20)
    merge_into(table, _merge_source(data), target_rows=100_000, broadcast_threshold=0)
    return _result(table.read_all())


def _q_maint_expire(sf_dir: str) -> pa.Table:
    from quanterra_pipeline_ray.stages.compaction import compact
    from quanterra_pipeline_ray.stages.expire import expire_snapshots

    table, _ = _maint_table(sf_dir, "expire")
    compact(table, target_bytes=4 << 20)
    expire_snapshots(table, keep_last=1)
    return _result(table.read_all())


def _q_maint_resume(sf_dir: str) -> pa.Table:
    """Crash-resume: one compaction bin pre-completed (its checkpoint record
    exists), then the op re-runs and must replay only the rest."""
    from quanterra_pipeline_ray.stages import compaction as comp
    from quanterra_pipeline_ray.state.checkpoint import Checkpoint

    table, _ = _maint_table(sf_dir, "resume")
    base = table.current_snapshot_id()
    target = 4 << 20
    bins, _carried = comp.plan_bins(table.files(base), target)
    ckpt = Checkpoint(table.root, f"compact-s{base}-t{target}")
    if bins:
        spec = {
            "bin_id": 0,
            "root": table.root,
            "paths": [f.path if f.path.startswith("/") else table._p(f.path) for f in bins[0]],
            "rel_paths": [f.path for f in bins[0]],
            "checksums": [f.checksum for f in bins[0]],
            "ckpt_dir": ckpt.dir,
        }
        comp._compact_bins_batch(pd.DataFrame({"spec": [json.dumps(spec)]}))
    comp.compact(table, target_bytes=target)
    return _result(table.read_all())


def _q_maint_rollback(sf_dir: str) -> pa.Table:
    """Rollback restores a prior snapshot's state as a NEW commit (history
    preserved): after a content-changing MERGE, rolling back to the
    pre-merge snapshot makes the table scan as the plain derived table
    again.  The rollback commit reuses the target's manifest shards by
    reference — O(1) metadata regardless of table size."""
    from quanterra_pipeline_ray.stages.compaction import compact
    from quanterra_pipeline_ray.stages.merge import merge_into

    table, data = _maint_table(sf_dir, "rollback")
    compact(table, target_bytes=4 << 20)
    pre = table.current_snapshot_id()
    merge_into(table, _merge_source(data), target_rows=100_000)
    snap = table.rollback(pre)
    assert snap.snapshot_id > pre  # new commit, history intact
    assert set(table.manifest_paths(snap.snapshot_id)[1:]) == set(
        table.manifest_paths(pre)[1:]
    )  # shards reused by reference
    return _result(table.read_all())


def _q_maint_wap(sf_dir: str) -> pa.Table:
    """Write–Audit–Publish gate (`stages/wap.py`): a bad batch (duplicate
    key + null conv_id) stages, FAILS the audit and is aborted — production
    content never includes it (the staged snapshot stays scannable by id
    under its wap ref until expiry); a good batch stages, passes the same
    checks and publishes via an O(1) roll-forward.  Final content = base +
    good batch, which the oracle reproduces; the aborted rows' absence is
    what the hash check proves."""
    import numpy as np

    from quanterra_pipeline_ray.stages.wap import (
        check_not_null,
        check_row_delta,
        check_unique_key,
        write_audit_publish,
    )

    table, _data = _maint_table(sf_dir, "wap")

    def batch(rows: dict) -> pa.Table:
        t = pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)
        return t.select(table.schema.names).cast(table.schema)

    checks = [
        check_row_delta(min_added=1, max_added=100_000),
        check_not_null("conv_id"),
        check_unique_key(["conv_id", "turn_idx"]),
    ]
    bad = batch(
        {
            "conv_id": ["cWAPBAD", "cWAPBAD", None],
            "turn_idx": np.array([0, 0, 1], np.int32),
            "role": ["user", "user", "assistant"],
            "text": ["dup", "dup", "orphan"],
            "tool": ["", "", ""],
            "ts": pd.to_datetime(["2024-07-01"] * 3),
        }
    )
    snap, fails = write_audit_publish(table, bad, checks, tag="bad")
    assert snap is None and len(fails) == 2, fails  # not_null + unique fail
    good = batch(
        {
            "conv_id": ["cWAP", "cWAP"],
            "turn_idx": np.array([0, 1], np.int32),
            "role": ["user", "assistant"],
            "text": ["wap hello", "wap hi"],
            "tool": ["", ""],
            "ts": pd.to_datetime(["2024-07-01 00:00:00", "2024-07-01 00:01:00"]),
        }
    )
    snap, fails = write_audit_publish(table, good, checks, tag="good")
    assert snap is not None and not fails, fails
    return _result(table.read_all())


def _q_maint_wap_stack(sf_dir: str) -> pa.Table:
    """Stacked WAP gate (`stages/wap.py:stage_stack`): three batches stage
    as a stack (each on the previous staged state, production content
    never includes any of them).  Batch 1 duplicates a key that only
    exists in STAGED batch 0 — the cumulative audit catches it, which a
    per-batch-vs-base audit could not — so batch 1 aborts and batch 2,
    stacked on it, aborts with it.  The passing prefix (batch 0)
    publishes in one O(1) roll-forward.  Final content = base + batch 0,
    which the oracle reproduces; the aborted batches' absence is what the
    hash check proves."""
    import numpy as np

    from quanterra_pipeline_ray.stages.wap import (
        check_not_null,
        check_row_delta,
        check_unique_key,
        write_audit_publish_stack,
    )

    table, _data = _maint_table(sf_dir, "wapstack")

    def batch(rows: dict) -> pa.Table:
        t = pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)
        return t.select(table.schema.names).cast(table.schema)

    checks = [
        check_row_delta(min_added=1, max_added=100_000),
        check_not_null("conv_id"),
        check_unique_key(["conv_id", "turn_idx"]),
    ]
    good = batch(
        {
            "conv_id": ["cWS0", "cWS0"],
            "turn_idx": np.array([0, 1], np.int32),
            "role": ["user", "assistant"],
            "text": ["wap stack hello", "wap stack hi"],
            "tool": ["", ""],
            "ts": pd.to_datetime(["2024-07-01 00:00:00", "2024-07-01 00:01:00"]),
        }
    )
    dup_vs_staged = batch(
        {
            "conv_id": ["cWS0"],  # collides with STAGED batch 0, not base
            "turn_idx": np.array([0], np.int32),
            "role": ["user"],
            "text": ["dup of staged"],
            "tool": [""],
            "ts": pd.to_datetime(["2024-07-01 00:02:00"]),
        }
    )
    stacked_on_bad = batch(
        {
            "conv_id": ["cWS2"],
            "turn_idx": np.array([0], np.int32),
            "role": ["user"],
            "text": ["never lands"],
            "tool": [""],
            "ts": pd.to_datetime(["2024-07-01 00:03:00"]),
        }
    )
    snap, failures = write_audit_publish_stack(
        table, [good, dup_vs_staged, stacked_on_bad], checks, tag="stk"
    )
    assert snap is not None and list(failures) == [1], failures
    assert any("unique" in f for f in failures[1]), failures
    return _result(table.read_all())


def _q_maint_timetravel(sf_dir: str) -> pa.Table:
    """Timestamp time travel: three commits at logical ts 100/200/300 (the
    third is a compaction), scan ``as_of_ts=250`` -> the pre-compaction state
    with both appends visible (turn_idx < 5 at ts 100, the rest at ts 200,
    compaction at 300 rewrites files but not rows — so as-of 250 content
    equals as-of 350 content, and equals the full derived table minus
    nothing; the 150 cut would show only the first append)."""
    import pyarrow.compute as pc

    from quanterra_pipeline_ray.stages.compaction import compact

    root = os.path.join(_SCRATCH, f"timetravel-{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(root, ignore_errors=True)
    table = TranscriptTable.create(root)
    data = transcripts_from_events(sf_dir)
    first = data.filter(pc.less(data.column("turn_idx"), 5))
    rest = data.filter(pc.greater_equal(data.column("turn_idx"), 5))
    table.append_table(first, commit_ts=100)
    table.append_table(rest, commit_ts=200)
    compact(table, target_bytes=4 << 20)  # logical ts 201

    early = table.snapshot_as_of(150)  # only the first append
    snap_250 = table.snapshot_as_of(250)
    assert table.scan(early.snapshot_id, columns=["turn_idx"]).count() == first.num_rows
    return _result(table.read_all(snap_250.snapshot_id))


def _q_maint_changelog(sf_dir: str):
    """Row-level changelog across compaction + MERGE: compaction rewrites
    every byte but no rows (cancels out of the diff); the surviving delta is
    exactly the MERGE's inserts + deletes (updates = delete + insert),
    matching SQL EXCEPT in both directions."""
    from quanterra_pipeline_ray.stages.changelog import changelog
    from quanterra_pipeline_ray.stages.compaction import compact
    from quanterra_pipeline_ray.stages.merge import merge_into

    table, data = _maint_table(sf_dir, "changelog")
    base = table.current_snapshot_id()
    compact(table, target_bytes=4 << 20)
    merge_into(table, _merge_source(data), target_rows=100_000)
    head = table.current_snapshot_id()
    out = changelog(table, base, head)
    return out.map_batches(
        lambda t: _result(t), batch_format="pyarrow"
    )


def _q_maint_point_lookup(sf_dir: str):
    """Stats-pruned point lookup: after compaction, read ONLY the files whose
    range/bloom stats admit the target conversations; result must equal a
    plain WHERE filter (pruning may touch extra files, never miss rows)."""
    from quanterra_pipeline_ray.stages.compaction import compact

    table, _ = _maint_table(sf_dir, "pointlookup")
    compact(table, target_bytes=4 << 20)
    convs = ["c17", "c23", "c5"]
    n_all = len(table.files())
    pruned = table.prune_files_for_convs(convs)
    assert 0 < len(pruned) <= n_all
    out = table.scan_convs(convs)
    return out.map_batches(lambda t: _result(t), batch_format="pyarrow")


def _q_maint_schema_evolution(sf_dir: str) -> pa.Table:
    """Additive schema evolution: add a defaulted column as a metadata-only
    commit, then compact (materializes it physically) and MERGE a source
    that lacks the column (padded by defaults); the final scan carries the
    evolved column everywhere."""
    from quanterra_pipeline_ray.stages.compaction import compact
    from quanterra_pipeline_ray.stages.evolve import evolve_schema
    from quanterra_pipeline_ray.stages.merge import merge_into

    from quanterra_pipeline_ray.stages.evolve import rename_column

    table, data = _maint_table(sf_dir, "evolve")
    n_files_before = len(table.files())
    snap = evolve_schema(table, [("priority", "int32", 0)])
    assert len(table.files()) == n_files_before  # metadata-only commit
    compact(table, target_bytes=4 << 20)  # materializes 'priority' physically
    # RENAME evolution: metadata-only; files written before the rename are
    # name-mapped at read, and the MERGE rewrite materializes the new name
    rename_column(table, "priority", "prio")
    merge_into(table, _merge_source(data), target_rows=100_000)
    assert "prio" in table.schema_of().names
    return _result(table.read_all())


def _q_maint_partition_evolution(sf_dir: str) -> pa.Table:
    """Partition-spec evolution (`stages/spec.py`): declare a pinned cluster
    layout, cluster, append fresh fragments, then migrate INCREMENTALLY —
    `cluster(only_stale=True)` rewrites only the untagged appends, leaving
    current-layout files byte-untouched.  A later layout change (part_bits /
    bucket / time-major) is a metadata-only commit (zero files move) and the
    next incremental run migrates the whole table to the new spec.  The
    scan is layout-independent, so the oracle is the plain table."""
    from quanterra_pipeline_ray.stages.spec import partition_spec_of, set_partition_spec
    from quanterra_pipeline_ray.stages.zorder import cluster

    root = os.path.join(_SCRATCH, f"specevo-{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(root, ignore_errors=True)
    table = TranscriptTable.create(root)
    data = transcripts_from_events(sf_dir)
    # first 12 fragments now; 4 more arrive "later"
    frags = fragment_table(data, os.path.join(root, "data", "frags"), 16)
    table.register_fragments(frags[:12])
    set_partition_spec(table, part_bits=2, ts_bucket_us=3_600_000_000)
    cluster(table, target_rows=50_000)  # layout resolved from the declared spec
    stable = {f.path for f in table.files()}
    table.register_fragments(frags[12:])
    cluster(table, target_rows=50_000, only_stale=True)  # appends only
    assert stable <= {f.path for f in table.files()}, "incremental run rewrote current files"
    # layout change is metadata-only...
    n_files = sorted(f.path for f in table.files())
    set_partition_spec(table, part_bits=3, ts_bucket_us=900_000_000, time_major=True)
    assert sorted(f.path for f in table.files()) == n_files
    # ...and the next incremental run migrates everything to the new spec
    snap = cluster(table, target_rows=50_000, only_stale=True)
    sid = partition_spec_of(table)["spec_id"]
    assert snap.summary["spec_id"] == sid
    assert all(f.spec_id == sid for f in table.files())
    return _result(table.read_all())


def _q_maint_timerange_scan(sf_dir: str):
    """Stats-pruned time-window scan over a Z-ordered table: the ts-bucketed
    curve gives files tight ts ranges, so a one-week window touches a strict
    subset of files; the result must equal a plain WHERE range filter."""
    from quanterra_pipeline_ray.stages.zorder import cluster

    table, _ = _maint_table(sf_dir, "timerange")
    # time-major layout: the ts bucket dominates the sort key, so within
    # each hash partition the writer's row chunks cover contiguous time
    # slices; window-pruning precision = files per partition, so pin few
    # partitions with several files each
    cluster(table, target_rows=600, part_bits=2, time_major=True)
    lo, hi = "2024-01-08", "2024-01-15"
    pruned = table.prune_files_for_ts_range(lo, hi)
    assert 0 < len(pruned) < len(table.files())  # the clustering payoff
    out = table.scan_ts_range(lo, hi)
    return out.map_batches(lambda t: _result(t), batch_format="pyarrow")


def _q_maint_text_search_or(sf_dir: str):
    """Disjunctive index search: union of posting sets, exact any-token
    row filter."""
    from quanterra_pipeline_ray.stages.compaction import compact
    from quanterra_pipeline_ray.stages.textindex import build_text_index, search_tokens_any

    table, _ = _maint_table(sf_dir, "textsearchor")
    compact(table, target_bytes=1 << 20)
    build_text_index(table)
    out = search_tokens_any(table, ["purchase", "signup"])
    return out.map_batches(lambda t: _result(t), batch_format="pyarrow")


def _q_maint_text_search_and(sf_dir: str):
    """Conjunctive index search: intersection of posting sets (rarest token
    bounds the scan), exact all-tokens row filter over survivors."""
    from quanterra_pipeline_ray.stages.compaction import compact
    from quanterra_pipeline_ray.stages.textindex import build_text_index, search_tokens_all

    table, _ = _maint_table(sf_dir, "textsearchand")
    compact(table, target_bytes=1 << 20)
    build_text_index(table)
    out = search_tokens_all(table, ["purchase", "57}"])
    return out.map_batches(lambda t: _result(t), batch_format="pyarrow")


def _extension_rows(data: pa.Table) -> pa.Table:
    """SQL-mirrorable append batch: every turn with turn_idx%17==2, moved to
    a new conversation id and prefixed so it matches the 'purchase' token."""
    df = data.to_pandas()
    ext = df[df["turn_idx"] % 17 == 2].copy()
    ext["conv_id"] = ext["conv_id"] + "x"
    ext["text"] = "purchase extension " + ext["text"]
    return pa.Table.from_pandas(ext, preserve_index=False, schema=data.schema)


def _q_maint_text_search_extend(sf_dir: str):
    """Persisted text-index LIFECYCLE (build -> append -> extend -> probe):
    the index is built at the base snapshot, new rows are appended, and
    ``extend_text_index`` indexes ONLY the new data files (posting files of
    covered files are never rewritten).  A search before the extend REFUSES
    (StaleTextIndexError) rather than returning incomplete results; after
    the extend the search equals the SQL whole-token filter over the
    post-append table."""
    import ray.data as rd

    from quanterra_pipeline_ray.stages.append import append_dataset
    from quanterra_pipeline_ray.stages.compaction import compact
    from quanterra_pipeline_ray.stages.textindex import (
        StaleTextIndexError,
        build_text_index,
        extend_text_index,
        search_token,
    )

    table, data = _maint_table(sf_dir, "textsearchext")
    compact(table, target_bytes=1 << 20)
    build_text_index(table)
    append_dataset(table, rd.from_arrow(_extension_rows(data)), rows_per_file=2000)
    try:
        search_token(table, "purchase")
        raise AssertionError("search over a stale index must refuse")
    except StaleTextIndexError:
        pass
    assert extend_text_index(table) > 0  # covered only the NEW files
    out = search_token(table, "purchase")
    return out.map_batches(lambda t: _result(t), batch_format="pyarrow")


def _q_maint_delete_where(sf_dir: str) -> pa.Table:
    """Predicate DELETE through the MERGE machinery (stats/bloom-pruned
    file rewrites, copy-on-write commit)."""
    from quanterra_pipeline_ray.stages.compaction import compact
    from quanterra_pipeline_ray.stages.delete import delete_where

    table, _ = _maint_table(sf_dir, "deletewhere")
    compact(table, target_bytes=4 << 20)
    delete_where(table, lambda b: b["turn_idx"] % 11 == 7)
    return _result(table.read_all())


def _q_maint_delete_vector(sf_dir: str) -> pa.Table:
    """Predicate DELETE via positional delete vectors: the commit swaps only
    manifest entries (sidecars of row ordinals under deletes/), ZERO data
    files are rewritten, and every reader subtracts the mask.  Same oracle
    predicate as maint_delete_where — different physical plan."""
    from quanterra_pipeline_ray.stages.compaction import compact
    from quanterra_pipeline_ray.stages.deletevec import delete_where_vector

    table, _ = _maint_table(sf_dir, "deletevector")
    compact(table, target_bytes=4 << 20)
    paths_before = {f.path for f in table.files()}
    snap = delete_where_vector(table, lambda b: b["turn_idx"] % 11 == 7, columns=["turn_idx"])
    after = table.files(snap.snapshot_id)
    assert {f.path for f in after} == paths_before  # zero data-file rewrites
    assert any(f.delete_path for f in after)
    return _result(table.read_all())


def _q_maint_multi_txn(sf_dir: str) -> pa.Table:
    """Cross-table atomic transaction through the catalog: move the first 50
    conversations (lexical conv_id order) from table 'a' to table 'b' as ONE
    catalog-version commit (MERGE into b + DELETE from a).  The result is
    the catalog view after the transaction, each row tagged with its table —
    every conversation lives in exactly one table, and intermediate states
    were never visible to catalog readers (asserted against the pre-commit
    version)."""
    import pyarrow.compute as pc

    from quanterra_pipeline_ray.stages.delete import delete_where
    from quanterra_pipeline_ray.stages.merge import merge_into
    from quanterra_pipeline_ray.state.catalog import Catalog

    root = os.path.join(_SCRATCH, f"multitxn-{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(root, ignore_errors=True)
    cat = Catalog.create(root)
    a = cat.create_table("a")
    cat.create_table("b")
    data = transcripts_from_events(sf_dir)
    a.register_fragments(fragment_table(data, os.path.join(a.root, "data", "frags"), 8))
    txn0 = cat.transaction()
    txn0.table("a"), txn0.table("b")
    v0 = txn0.commit()

    convs = sorted(set(data.column("conv_id").to_pylist()))[:50]
    moved = data.filter(pc.is_in(data.column("conv_id"), value_set=pa.array(convs)))
    txn = cat.transaction()
    merge_into(txn.table("b"), moved)
    delete_where(txn.table("a"), lambda df: df["conv_id"].isin(set(convs)))
    v1 = txn.commit()
    # snapshot isolation at catalog scope: the pre-txn version still holds
    # every moved conversation in 'a' and none in 'b'
    assert cat.read_all("b", version=v0).num_rows == 0

    tagged = []
    for name in ("a", "b"):
        part = cat.read_all(name, version=v1)
        tagged.append(
            part.add_column(0, "tbl", pa.array([name] * part.num_rows, type=pa.string()))
        )
    return _result(pa.concat_tables(tagged))


def _q_maint_text_search(sf_dir: str):
    """Secondary-index token search: build per-file token postings for the
    snapshot, then answer an exact-token query by scanning only posted
    files; equals the SQL whole-token filter."""
    from quanterra_pipeline_ray.stages.compaction import compact
    from quanterra_pipeline_ray.stages.textindex import build_text_index, search_token

    table, _ = _maint_table(sf_dir, "textsearch")
    compact(table, target_bytes=1 << 20)
    build_text_index(table)
    out = search_token(table, "purchase")
    return out.map_batches(lambda t: _result(t), batch_format="pyarrow")


def _q_maint_incremental_counts(sf_dir: str):
    """Incremental view maintenance: per-conversation turn counts computed
    at the base snapshot, then brought up to date across compaction + MERGE
    by applying only the changelog delta — must equal a full GROUP BY over
    the merged table."""
    from quanterra_pipeline_ray.stages.compaction import compact
    from quanterra_pipeline_ray.stages.incremental import conv_counts, incremental_conv_counts
    from quanterra_pipeline_ray.stages.merge import merge_into

    table, data = _maint_table(sf_dir, "increment")
    base = table.current_snapshot_id()
    base_counts = conv_counts(table.scan(base)).materialize()
    compact(table, target_bytes=4 << 20)
    merge_into(table, _merge_source(data), target_rows=100_000)
    out = incremental_conv_counts(table, base, table.current_snapshot_id(), base_counts)

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        b["n_turns"] = b["n_turns"].astype(np.int64)
        b["conv_id"] = b["conv_id"].astype(str)
        return b

    return out.map_batches(cast, batch_format="pandas")


def _q_maint_incremental_sums(sf_dir: str):
    """Incremental count+sum+mean view (`stages/incremental.py:
    incremental_key_sums`): per-conversation (n_rows, sum of text length)
    computed at the base snapshot, maintained across compaction + MERGE
    from the changelog delta only — updates net their value difference
    exactly (delete -v_old, insert +v_new), and the mean is derived at
    read time (means are not abelian).  Must equal a full GROUP BY over
    the merged table."""
    from quanterra_pipeline_ray.stages.compaction import compact
    from quanterra_pipeline_ray.stages.incremental import incremental_key_sums, key_sums
    from quanterra_pipeline_ray.stages.merge import merge_into

    table, data = _maint_table(sf_dir, "incsum")
    base = table.current_snapshot_id()
    base_view = key_sums(table.scan(base), "conv_id").materialize()
    compact(table, target_bytes=4 << 20)
    merge_into(table, _merge_source(data), target_rows=100_000)
    out = incremental_key_sums(table, base, table.current_snapshot_id(), base_view)

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        b = b.astype({"n_rows": np.int64, "val_sum": np.int64, "conv_id": str})
        b["val_mean"] = b["val_sum"].to_numpy(dtype=np.float64) / b["n_rows"].to_numpy()
        return b

    return out.map_batches(cast, batch_format="pandas")


def _q_customers_without_orders(sf_dir: str):
    """NOT EXISTS anti-join (`pipelines/relational.py:anti_join_keys`):
    customers with no order above 400k (every customer has SOME order in
    the synthetic data, so the filtered right side makes the anti set
    non-degenerate).  Keys-only exchange (both sides map-side dedup to
    distinct keys); the final filter broadcasts the RESULT key set — the
    honest bound, since a row-wise result that can't broadcast its own
    key set can't be returned anyway."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import anti_join_keys

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    )
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(lambda b: b[b["o_totalprice"] > 400_000.0], batch_format="pandas")
    out = anti_join_keys(cust, orders, "c_custkey", "o_custkey")
    return out.map_batches(
        lambda b: b.astype({"c_name": str, "c_nationkey": np.int32}), batch_format="pandas"
    )


def _q_rolling_sum(sf_dir: str):
    """Per-user rolling SUM over the last 5 events
    (`relational.py:rolling_sum_by`): the frame-aggregate family's summing
    member, in exact int64 cents so the result is accumulation-order
    independent (the q1 discipline)."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import rolling_sum_by

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    out = rolling_sum_by(ev, "user_id", ["ts", "event_id"], "value", window=5)
    return out.map_batches(
        lambda b: b[["event_id", "user_id", "rolling_sum"]], batch_format="pandas"
    )


def _q_rolling_quantile(sf_dir: str):
    """Per-user rolling MEDIAN over the last 7 events
    (`relational.py:rolling_quantile_by`): the window-frame family's
    order-statistic member — one keyed exchange, then a vectorized
    NaN-padded lag matrix + np.nanquantile per bucket, matching SQL
    quantile_cont's linear interpolation bit-for-bit."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import rolling_quantile_by

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    out = rolling_quantile_by(
        ev, "user_id", ["ts", "event_id"], "value", window=7, q=0.5,
        out_col="rolling_median",
    )
    return out.map_batches(
        lambda b: b.select(["event_id", "user_id", "rolling_median"]),
        batch_format="pyarrow",
    )


def _q_lag_lead(sf_dir: str):
    """Per-user LAG/LEAD of event value (`relational.py:lag_lead_by`):
    one keyed exchange, in-bucket Arrow sort + two shifted takes with
    segment-boundary null masks — values are moved bit-for-bit, no
    arithmetic, so the window result is exact for any value type."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import lag_lead_by

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    out = lag_lead_by(ev, "user_id", "value", ["ts", "event_id"])
    return out.map_batches(
        lambda b: b.select(["event_id", "user_id", "prev_value", "next_value"]),
        batch_format="pyarrow",
    )


def _q_first_last(sf_dir: str):
    """Per-user FIRST_VALUE/LAST_VALUE of event_type over the full
    partition frame (`relational.py:first_last_by`): one keyed exchange,
    shared Arrow segment sort, two endpoint `take`s — string values are
    copied bit-for-bit, so the window result is exact."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import first_last_by

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    out = first_last_by(
        ev,
        "user_id",
        "event_type",
        ["ts", "event_id"],
        first_out="first_event_type",
        last_out="last_event_type",
    )
    return out.map_batches(
        lambda b: b.select(
            ["event_id", "user_id", "first_event_type", "last_event_type"]
        ),
        batch_format="pyarrow",
    )


def _q_rollup_pricing(sf_dir: str):
    """GROUP BY ROLLUP (returnflag, linestatus) over lineitem
    (`relational.py:rollup_sums`): finest-grain (count, sum) partials in
    one streamed pass with map-side combine, then the coarser grouping
    sets re-aggregated from the tiny grouped result on the driver —
    O(distinct combos), never a second scan."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import rollup_sums

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )
    return rollup_sums(
        li,
        ["l_returnflag", "l_linestatus"],
        "l_quantity",
        n_out="n_rows",
        sum_out="sum_qty",
    )


def _q_nth_value(sf_dir: str):
    """Per-user NTH_VALUE(event_type, 3) over the full partition frame
    (`relational.py:nth_value_by`): the first_last_by plan with the take
    index at start+n-1 and SQL NULL for partitions shorter than n —
    bit-copied string values, exact."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import nth_value_by

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    )
    out = nth_value_by(
        ev, "user_id", "event_type", ["ts", "event_id"], n=3,
        out_col="third_event_type",
    )
    return out.map_batches(
        lambda b: b.select(["event_id", "user_id", "third_event_type"]),
        batch_format="pyarrow",
    )


def _q_cube_pricing(sf_dir: str):
    """GROUP BY CUBE (returnflag, linestatus) — all 2^d grouping sets from
    the SAME one-pass plan as `rollup_pricing` (`relational.py:rollup_sums`
    with sets='cube'): the data is scanned once; each subset level is
    re-aggregated from the tiny finest-grain grouped result."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import rollup_sums

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )
    return rollup_sums(
        li,
        ["l_returnflag", "l_linestatus"],
        "l_quantity",
        n_out="n_rows",
        sum_out="sum_qty",
        sets="cube",
    )


def _q_grouping_sets_pricing(sf_dir: str):
    """Explicit GROUPING SETS ((returnflag), (linestatus), ()) — the
    arbitrary-list form of the one-pass grouping-sets plan
    (`relational.py:rollup_sums` with an explicit set list): the finest
    grain is computed once and only the REQUESTED levels are emitted."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import rollup_sums

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"],
    )
    return rollup_sums(
        li,
        ["l_returnflag", "l_linestatus"],
        "l_quantity",
        n_out="n_rows",
        sum_out="sum_qty",
        sets=[("l_returnflag",), ("l_linestatus",), ()],
    )


def _q_ntile(sf_dir: str):
    """Per-user NTILE(4) over event order (`relational.py:ntile_by`):
    SQL tile-size semantics (first L%t tiles get one extra row) in O(n)
    vectorized index math over the shared Arrow segment sort — integer
    output, bit-exact by construction."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import ntile_by

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    out = ntile_by(ev, "user_id", ["ts", "event_id"], tiles=4)
    return out.map_batches(
        lambda b: b.select(["event_id", "user_id", "tile"]), batch_format="pyarrow"
    )


def _q_grouped_corr(sf_dir: str):
    """Grouped Pearson corr + covar_pop of (quantity, discount) per
    returnflag (`relational.py:grouped_corr`): per-block integer moment
    partials (map-side combine), exact big-int reduce, then ONE
    explicitly-ordered float expression the oracle replicates
    cast-for-cast — bit-exact despite being a float statistic, because
    integer moments are associative where streaming covariance is not."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import grouped_corr

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_discount"],
    )
    return grouped_corr(
        li, "l_returnflag", "l_quantity", "l_discount", x_scale=1.0, y_scale=100.0
    )


def _q_full_outer_join(sf_dir: str):
    """FULL OUTER equi-join (`relational.py:full_outer_join_keys`):
    filtered customers ⟗ per-customer big-order counts — both sides have
    unmatched keys, exercising left-null, right-null and matched rows.
    Schema-aligned Arrow union with typed-null padding (no identity
    repass), one hash-bucket exchange, per-bucket outer merge."""
    import pyarrow.compute as pc
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import (
        bucketed_groupby,
        full_outer_join_keys,
    )

    def cust_filter(b):
        import numpy as np
        import pyarrow as pa

        keys = b.column("c_custkey").to_numpy(zero_copy_only=False)
        return b.rename_columns(["custkey", "c_name"]).filter(
            pa.array(keys % 3 != 0)
        )

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(cust_filter, batch_format="pyarrow")
    big = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda b: b.filter(
            pc.greater(b.column("o_totalprice"), 150_000.0)
        ).select(["o_custkey"]),
        batch_format="pyarrow",
    )

    def cnt(g):
        out = g.group_by(["o_custkey"]).aggregate([([], "count_all")])
        return out.rename_columns(["custkey", "order_cnt"])

    counts = bucketed_groupby(big, ["o_custkey"], cnt, group_format="pyarrow")
    return full_outer_join_keys(cust, counts, "custkey")


def _q_tfidf_top_term(sf_dir: str):
    """Per-document top TF-IDF term (`functions/text.py:tfidf_top_terms`):
    Arrow tokenize + per-block tf, vocabulary-sized df exchange, bucketed
    score join, tie-stable (score DESC, term ASC) head per doc.  The
    score is (tf·N)/df in matched IEEE order, so the float hash matches
    the SQL oracle exactly."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.text import tfidf_top_terms

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_docs = docs.count()
    out = tfidf_top_terms(docs, n_docs)
    return out.map_batches(
        lambda b: b.rename_columns(["doc_id", "top_term", "score"]),
        batch_format="pyarrow",
    )


def _q_rank_family(sf_dir: str):
    """Per-user ranking family over event_type (ties guaranteed — few
    distinct types per user): rank, dense_rank, percent_rank, cume_dist
    in ONE pass (`relational.py:rank_by`).  The float members are single
    int/int IEEE divisions, so they hash-match the SQL window exactly."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import rank_by

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type"]
    )
    out = rank_by(ev, "user_id", ["event_type"])
    return out.map_batches(
        lambda b: b.select(
            ["event_id", "user_id", "rnk", "drnk", "pct_rank", "cume"]
        ),
        batch_format="pyarrow",
    )


def _q_grouped_median(sf_dir: str):
    """Exact per-type continuous median
    (`relational.py:grouped_quantile_cont`): the segment sort with VALUE
    as the order column yields per-key sorted values in one exchange; the
    lerp is the bit-verified quantile_cont arithmetic."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import grouped_quantile_cont

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return grouped_quantile_cont(ev, "event_type", "value", q=0.5, out_col="median_value")


def _q_top_terms(sf_dir: str):
    """Corpus top-20 terms (`functions/text.py:term_counts`): per-block
    Arrow tokenize + in-block count (map-side combine), vocabulary-sized
    bucketed sum, O(vocab) driver top-k with (cnt DESC, term ASC)
    tie-break — the canonical distributed word count."""
    import pandas as pd
    import ray.data as rd

    from quanterra_pipeline_ray.functions.text import term_counts

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    counts = term_counts(docs).to_pandas()  # vocabulary-sized
    out = counts.sort_values(["cnt", "term"], ascending=[False, True]).head(20)
    return out.reset_index(drop=True)


def _q_mode_per_user(sf_dir: str):
    """Per-user modal event type (`relational.py:mode_by`): in-bucket
    Arrow pair-count combine then a (key, -cnt, val) segment sort —
    deterministic smallest-value tie-break, which bare SQL mode() lacks,
    so the oracle uses the explicit row_number form."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import mode_by

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    return mode_by(ev, "user_id", "event_type", out_col="mode_type")


def _q_grouped_quartiles(sf_dir: str):
    """Per-type quartiles in ONE pass
    (`relational.py:grouped_quantiles_cont`): k quantiles cost one keyed
    exchange, not k — each q is O(keys) index math over the same per-key
    sorted values."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import grouped_quantiles_cont

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return grouped_quantiles_cont(ev, "event_type", "value", qs=[0.25, 0.5, 0.75])


def _q_streaming_reservoir(sf_dir: str):
    """Persisted streaming weighted reservoir
    (`functions/sampling.py:WeightedReservoir`): three sequential ingest
    batches (doc_id % 3) fold into one k=120 A-ExpJ state file; because the
    exponential draw is a pure function of (id, seed), the final reservoir
    equals the ONE-SHOT weighted sample over the union — the SQL oracle is
    the same QUALIFY window as weighted_sample, so batch-order independence
    is driver-checked, not just unit-tested."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.sampling import WeightedReservoir

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "n_chars"]
    )
    path = os.path.join(
        _SCRATCH, f"reservoir-{os.path.basename(os.path.normpath(sf_dir))}.parquet"
    )
    if os.path.exists(path):
        os.remove(path)
    res = WeightedReservoir(path, k=120, seed=42)
    out = None
    for b in range(3):
        batch = ds.map_batches(lambda t, b=b: t[t["doc_id"] % 3 == b], batch_format="pandas")
        out = res.update(batch, weight_col="n_chars")
    return out.astype({"source": str}).reset_index(drop=True)


def _q_quantiles_cont(sf_dir: str):
    """Exact interpolated quantiles (`relational.py:quantiles_cont`,
    quantile_cont semantics: lo*(1-frac) + hi*frac at position q*(n-1) —
    DuckDB's exact float form) over the distributed value-count histogram:
    counts, never samples, cross the exchange."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import quantiles_cont

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return quantiles_cont(ev, "value", [0.1, 0.25, 0.5, 0.75, 0.9, 0.99])


def _q_pca_project(sf_dir: str):
    """Distributed PCA (`functions/embed_stats.py`): one covariance pass
    (per-block (count, sum, X^T X) partials — associative, O(blocks x d^2)
    driver bytes), driver-side eigh on the 64x64 covariance, stateless
    projection map.  NO SQL oracle by design: eigendecomposition is not
    SQL-expressible and float covariance is accumulation-order sensitive —
    the exact-math contract is asserted by unit tests
    (`tests/test_embed_stats.py`: numpy equality, layout invariance,
    orthonormality, projected variance == eigenvalues)."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.embed_stats import (
        pca_components,
        project_embeddings,
    )

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    comps, mean, _ = pca_components(ds, k=8)
    out = project_embeddings(ds, comps, mean)

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        import numpy as _np

        p = _np.stack(b["proj"].to_numpy()) if len(b) else _np.empty((0, 8))
        cols = {"vec_id": b["vec_id"].to_numpy()}
        cols.update({f"pc{i}": p[:, i] for i in range(p.shape[1])})
        return pd.DataFrame(cols)

    # scalar columns (pc0..pc7), not a list column: the compare harness
    # canonicalizes by sorting/hashing values, which a list cell breaks
    return out.map_batches(explode, batch_format="pandas")


def _q_value_histogram(sf_dir: str):
    """Equi-width histogram with SQL width_bucket semantics
    (`relational.py:histogram_bins`): per-block partial counts, one
    O(nbins)-row exchange — the canonical distributed histogram."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import histogram_bins

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])
    return histogram_bins(ev, "value", 0.0, 100.0, 20)


def _q_event_type_paths(sf_dir: str):
    """Per-user ordered event-type path (`relational.py:string_agg_by` =
    string_agg(event_type, '|' ORDER BY ts, event_id)): one keyed exchange,
    deterministic on any cluster shape via the order columns."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import string_agg_by

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts", "event_id"]
    )
    out = string_agg_by(ev, "user_id", "event_type", ["ts", "event_id"], sep="|", out_col="path")
    return out.map_batches(lambda b: b.astype({"path": str}), batch_format="pandas")


def _q_late_arrivals(sf_dir: str):
    """Late-data audit (`stages/streaming.py:late_arrivals`): which events a
    per-key watermarking consumer with 7-day allowed_lateness would drop,
    under a deterministic md5-shuffled arrival order (the synthetic table's
    event_id follows ts, so the audit simulates out-of-order delivery the
    way a real at-least-once transport produces it).  The operator that
    sizes allowed_lateness before deploying a streaming window.  One keyed
    exchange; per-key vectorized running max."""
    import hashlib

    import ray.data as rd

    from quanterra_pipeline_ray.stages.streaming import late_arrivals

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def add_arrival(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["arr"] = [
            hashlib.md5(f"{i}:1".encode()).hexdigest() for i in b["event_id"].to_numpy()
        ]
        return b

    out = late_arrivals(
        ev.map_batches(add_arrival, batch_format="pandas"),
        key_col="user_id",
        ts_col="ts",
        arrival_col="arr",
        lateness_us=7 * 86_400_000_000,
        out_cols=["user_id", "event_id"],
    )
    return out


def _q_running_sum_events(sf_dir: str):
    """Per-user running sum of event value (`relational.py:running_sum_by`):
    SUM OVER (PARTITION BY user ORDER BY ts, event_id) — one keyed
    exchange + in-bucket vectorized cumsum in exact int64 cents, so the
    result bit-matches the SQL window over DECIMAL(18,2) regardless of
    the engine's accumulation tree."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import running_sum_by

    ev = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    out = running_sum_by(ev, "user_id", "value", ["ts", "event_id"])
    return out.map_batches(
        lambda b: b[["event_id", "user_id", "run_sum"]], batch_format="pandas"
    )


# ---------------------------------------------------------- training-data ops
def _q_dedup_exact(sf_dir: str):
    import ray.data as rd

    from quanterra_pipeline_ray.functions.dedup import exact_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet")
    doubled = ds.union(rd.read_parquet(f"{sf_dir}/documents.parquet"))
    return exact_dedup(doubled, "doc_id", "text")


def _q_event_type_pivot(sf_dir: str):
    """Crosstab per user over the five declared event types
    (`pipelines/relational.py:pivot_counts`): per-block vectorized partial
    crosstabs, one keyed exchange of count partials."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import pivot_counts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    return pivot_counts(
        ds, "user_id", "event_type", ["click", "error", "purchase", "signup", "view"]
    )


def _q_event_type_long(sf_dir: str):
    """Pivot → unpivot round trip (`pivot_counts` then `unpivot_counts`):
    the long form keeps explicit zeros, so the pair is a faithful inverse;
    checked against a users × declared-types recomposition."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import pivot_counts, unpivot_counts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
    types = ["click", "error", "purchase", "signup", "view"]
    wide = pivot_counts(ds, "user_id", "event_type", types)
    out = unpivot_counts(wide, "user_id", types, name_col="event_type", value_col="n_events")
    return out.map_batches(lambda b: b.astype({"event_type": str}), batch_format="pandas")


def _q_rolling_max_value(sf_dir: str):
    """Window frames: per-user rolling MAX(value) over the last 3 events
    (`pipelines/relational.py:rolling_max_by`) — the exactly-reproducible
    frame aggregate (comparisons only, no float-summation order)."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import rolling_max_by

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    return rolling_max_by(ds, "user_id", ["ts", "event_id"], "value", window=3)


def _q_latest_event_per_user(sf_dir: str):
    """Grouped argmax (latest event per user) = per-group top-1 with
    deterministic event_id tiebreak — `topk_per_group(k=1)` reused."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import topk_per_group

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    return topk_per_group(ds, ["user_id"], ["ts"], k=1, tiebreak=["event_id"])


def _q_events_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per (event_type, hour): two-level
    dedupe-then-count groupby, both passes map-side-combined
    (`pipelines/relational.py:distinct_count_by`)."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import distinct_count_by

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id", "ts"])

    def add_hour(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].astype("int64")
        return pd.DataFrame(
            {
                "event_type": b["event_type"],
                "hour": ((us // 3_600_000_000) * 3_600_000_000).astype("datetime64[us]"),
                "user_id": b["user_id"],
            }
        )

    out = distinct_count_by(
        ds.map_batches(add_hour, batch_format="pandas"), ["event_type", "hour"], "user_id"
    )
    return out.map_batches(lambda b: b.astype({"event_type": str}), batch_format="pandas")


def _q_events_sliding(sf_dir: str):
    """Sliding 1h windows hopping every 15min per event_type
    (`pipelines/relational.py:sliding_window_counts`): vectorized 4x window
    expansion with per-block partial counts before the keyed exchange."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import sliding_window_counts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])
    out = sliding_window_counts(ds)
    return out.map_batches(
        lambda b: b.astype({"event_type": str}), batch_format="pandas"
    )


def _q_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact discrete quantiles of doc length: distributed value-count
    histogram (counts, not samples, cross the exchange), driver reduce over
    the distinct-value domain (`pipelines/relational.py:quantiles_disc`)."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import quantiles_disc

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])
    out = quantiles_disc(ds, "n_chars", [0.1, 0.25, 0.5, 0.75, 0.9, 0.99])
    out["v"] = out["v"].astype(np.int64)
    return out


def _q_dataprep_flow(sf_dir: str):
    """Composed pretraining-prep flagship (`pipelines/dataprep.py`):
    quality gate -> exact dedup (min-id survivor per distinct text) ->
    per-source quota rebalance (md5 draw) -> fixed-budget sequence packing.
    Checked end-to-end against one chained-CTE SQL oracle."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.dataprep import prep_documents

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    out = prep_documents(ds)
    return out.map_batches(lambda b: b.astype({"source": str}), batch_format="pandas")


def _q_topk_per_lang(sf_dir: str):
    """Per-group top-k (5 longest docs per language, deterministic doc_id
    tiebreak) via the combiner-first distributed selection
    (`pipelines/relational.py:topk_per_group`)."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import topk_per_group

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
    out = topk_per_group(ds, ["lang"], ["n_chars"], k=5, tiebreak=["doc_id"])
    return out.map_batches(lambda b: b.astype({"lang": str}), batch_format="pandas")


def _q_hash_sample(sf_dir: str):
    """Deterministic uniform 25% sample keyed on ``md5(doc_id || ':42')`` —
    reproducible on any cluster shape, no RNG stream, no exchange
    (`functions/sampling.py:hash_sample`)."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.sampling import hash_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"])
    out = hash_sample(ds, 0.25, id_col="doc_id", seed=42)
    return out.map_batches(
        lambda b: b.astype({"lang": str, "source": str}), batch_format="pandas"
    )


def _q_mix_sources(sf_dir: str):
    """Training-mix rates: even-numbered sources admitted at 50%, odd at
    12.5% (`functions/sampling.py:mix_sources`) — per-row md5 predicate,
    no exchange, deterministic on any cluster shape."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.sampling import mix_sources

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    fractions = {f"src{i}": (0.5 if i % 2 == 0 else 0.125) for i in range(20)}
    out = mix_sources(ds, fractions)
    return out.map_batches(lambda b: b.astype({"source": str}), batch_format="pandas")


def _q_quota_sample(sf_dir: str):
    """Per-source quota (≤ 120 docs per source, seeded md5 draw without
    replacement) — the pretraining-mix rebalance
    (`functions/sampling.py:quota_sample`), with a pre-shuffle top-cap
    combiner bounding exchange bytes to O(groups x cap) per block."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.sampling import quota_sample

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    out = quota_sample(ds, "source", cap=120, id_col="doc_id", seed=42)
    return out.map_batches(lambda b: b.astype({"source": str}), batch_format="pandas")


def _q_ingest_dedup_views_flow(sf_dir: str):
    """The COMPOSED continuous pipeline (`pipelines/continuous.py`): three
    ingest batches (doc_id % 3 == 0, 1, 2 in order), each probed against the
    persisted Jaccard index of accepted history, survivors appended as ONE
    snapshot commit, the index extended, and the per-lang count view
    refreshed from the changelog delta.  Result: the maintained view after
    batch 3 — equal to GROUP BY lang over the greedy survivor set (history
    wins; within a batch ascending doc_id)."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.continuous import ingest_with_views, read_view

    store = os.path.join(_SCRATCH, f"contflow-{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(store, ignore_errors=True)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    for b in range(3):
        batch = ds.map_batches(
            lambda t, b=b: t[t["doc_id"] % 3 == b], batch_format="pandas"
        )
        # n_buckets sized to the corpus: at 500 docs the default 1024 hive
        # buckets mean ~1000 tiny files per extend and the probe's wall is
        # ALL read_parquet metadata (measured 70 s -> the pruning math needs
        # buckets ~ corpus_bytes / file_target, not a fixed large count)
        ingest_with_views(store, batch, view_key="lang", n_buckets=32)
    out = read_view(store, "lang")
    return out.map_batches(lambda t: b_astype_lang(t), batch_format="pandas")


def b_astype_lang(b: pd.DataFrame) -> pd.DataFrame:
    return b.astype({"lang": str})


def _q_weighted_sample(sf_dir: str):
    """Grouped weighted sampling without replacement (A-ExpJ /
    Efraimidis–Spirakis): 40 docs per lang, selection probability
    proportional to n_chars, keyed on an md5-seeded exponential draw
    (`functions/sampling.py:weighted_sample`) — combiner-first, exchange
    bytes O(groups x k) per block."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.sampling import weighted_sample

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source", "n_chars"]
    )
    out = weighted_sample(ds, "lang", k=40, weight_col="n_chars", id_col="doc_id", seed=42)
    return out.map_batches(
        lambda b: b.astype({"lang": str, "source": str}), batch_format="pandas"
    )


def _q_split_assign(sf_dir: str):
    """Deterministic train/val/test split assignment (90/5/5) keyed on
    ``md5(doc_id || ':42')`` (`functions/sampling.py:split_assign`) — a pure
    per-row predicate: no exchange, no driver state, append-stable (a doc
    keeps its split forever as the corpus grows)."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.sampling import split_assign

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    out = split_assign(ds, {"train": 0.90, "val": 0.05, "test": 0.05}, seed=42)
    return out.map_batches(
        lambda b: b.astype({"source": str, "split": str}), batch_format="pandas"
    )


def _q_shuffle_order(sf_dir: str):
    """Deterministic global shuffle rank for training order
    (`functions/ordering.py:shuffle_order`): pos = ROW_NUMBER under
    ascending ``(md5(doc_id || ':42'), doc_id)`` — computed WITHOUT a sort
    exchange via hex-prefix buckets + an O(256) driver prefix sum; one
    groupby exchange moves each row exactly once."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.ordering import shuffle_order

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    out = shuffle_order(ds, id_col="doc_id", seed=42)
    return out.map_batches(lambda b: b.astype({"lang": str}), batch_format="pandas")


def _q_contamination(sf_dir: str):
    """Benchmark-contamination flags (`functions/contamination.py`): the
    benchmark set is a seeded 2% md5 sample's chars [20, 60) lower-cased
    (the small side, collected on the driver by design); every doc is then
    flagged by ONE compiled alternation regex per actor, one vectorized
    ``str.contains`` pass per batch — broadcast the phrases, stream the
    corpus (the only 100-TB-shaped plan for decontamination)."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.contamination import (
        benchmark_phrases,
        flag_contaminated,
    )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    phrases = benchmark_phrases(ds, fraction=0.02, seed=7, start=20, length=40)
    return flag_contaminated(ds, phrases)


def _q_contamination_ngram(sf_dir: str):
    """The n-gram form of the decontamination filter
    (`functions/contamination.py:flag_contaminated_ngrams`): benchmark =
    ALL distinct word 3-grams of a seeded 2% sample; a doc is flagged iff
    ANY of its 3-grams is a member.  The membership set ships once per
    actor — the structure that scales to millions of benchmark grams where
    the alternation regex of `contamination_docs` cannot."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.contamination import (
        benchmark_ngrams,
        flag_contaminated_ngrams,
    )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    grams = benchmark_ngrams(ds, fraction=0.02, n=3, seed=13)
    return flag_contaminated_ngrams(ds, grams, n=3)


def _q_contamination_ac(sf_dir: str):
    """Aho–Corasick decontamination
    (`functions/contamination.py:flag_contaminated_ac`): a MID-SIZE
    benchmark set (8 character windows per doc of a seeded 20% sample —
    thousands of phrases, the regime where the alternation regex of
    `contamination_docs` degrades) matched by a goto/fail automaton built
    once per actor; identical substring semantics, first-hit early exit."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.contamination import (
        benchmark_phrase_windows,
        flag_contaminated_ac,
    )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    phrases = benchmark_phrase_windows(ds, fraction=0.2, seed=7)
    return flag_contaminated_ac(ds, phrases)


def _q_contamination_ac_sharded(sf_dir: str):
    """Sharded Aho–Corasick decontamination
    (`functions/contamination.py:flag_contaminated_ac_sharded`): the same
    mid-size benchmark set split round-robin over a chain of 4 actor-pool
    stages, each building only its shard of the automaton (1/K heap and
    build CPU per actor — the >10M-phrase scale path); a doc flagged by
    an earlier shard is never rescanned.  Bit-identical semantics to
    `contamination_ac_docs` (same oracle)."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.contamination import (
        benchmark_phrase_windows,
        flag_contaminated_ac_sharded,
    )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    phrases = benchmark_phrase_windows(ds, fraction=0.2, seed=7)
    return flag_contaminated_ac_sharded(ds, phrases, n_shards=4)


def _q_repeat_mix(sf_dir: str):
    """Epoch-weighted upsampling (`functions/sampling.py:repeat_mix`):
    even-numbered sources repeated 2.5× (2 copies + a seeded-md5 coin for
    the third), odd 0.25× (one copy kept for a quarter of docs) — pure
    per-row np.repeat expansion, no exchange, per-document deterministic
    so every epoch reproduces bit-identically on any cluster shape."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.sampling import repeat_mix

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
    factors = {f"src{i}": (2.5 if i % 2 == 0 else 0.25) for i in range(20)}
    out = repeat_mix(ds, factors, group_col="source", id_col="doc_id", seed=11)
    return out.map_batches(lambda b: b.astype({"source": str}), batch_format="pandas")


def _q_pack_sequences(sf_dir: str):
    """Fixed-budget sequence packing via the distributed prefix-sum scan
    (`functions/packing.py`): docs laid head-to-tail in doc_id order, cut
    every 2048 whitespace tokens — `seq_id = tokens_before // 2048`, the
    SQL-window-checkable streaming-packing rule."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.packing import pack_sequences

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def count_tokens(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "n_tokens": b["text"].astype(str).str.count(r"\S+").to_numpy(dtype=np.int64),
            }
        )

    toks = ds.map_batches(count_tokens, batch_format="pandas")
    return pack_sequences(
        toks, token_col="n_tokens", order_col="doc_id", capacity=2048
    )


def _q_text_stats(sf_dir: str):
    import ray.data as rd

    from quanterra_pipeline_ray.functions.text import TextStats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(TextStats(), batch_format="pandas")
    return out.map_batches(
        lambda b: b[["doc_id", "n_chars_txt", "n_tokens", "token_chars", "n_punct", "quality_score"]],
        batch_format="pandas",
    )


def _q_token_count(sf_dir: str):
    import ray.data as rd

    from quanterra_pipeline_ray.functions.text import TokenCounter

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(TokenCounter(), batch_format="pandas").map_batches(
        lambda b: b[["doc_id", "n_bpe_tokens"]], batch_format="pandas"
    )


def _q_fingerprint(sf_dir: str):
    import ray.data as rd

    from quanterra_pipeline_ray.functions.text import Fingerprinter

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(Fingerprinter(), batch_format="pandas").map_batches(
        lambda b: b[["doc_id", "fingerprint"]], batch_format="pandas"
    )


def _q_lang_id(sf_dir: str):
    """Language id over the corpus; ``max_words=None`` makes the whole
    heuristic SQL-expressible (stopword list_filter + argmax CASE)."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.text import LangId
    from quanterra_pipeline_ray.util import pool_size

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        LangId,
        fn_constructor_kwargs={"max_words": None},
        batch_format="pandas",
        concurrency=pool_size(2),
    ).map_batches(
        lambda b: b[["doc_id", "lang_pred", "lang_conf"]], batch_format="pandas"
    )


def _q_minhash_dedup(sf_dir: str):
    """Near-dup groups over the RAW documents table (the driver test data
    plants near-duplicate pairs at char-5-gram Jaccard >= 0.92); the oracle
    recomputes the exact gram-Jaccard pairs + connected components in SQL."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.dedup import minhash_lsh_dedup

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_lsh_dedup(ds, "doc_id", "text", threshold=0.8)


def _q_jaccard_pairs(sf_dir: str):
    """EXACT n-gram-Jaccard similarity self-join via prefix filtering
    (AllPairs) — the deterministic counterpart of minhash_dedup_docs: same
    pair predicate, but candidate generation is provably complete (df-ordered
    shingle prefixes) instead of probabilistically complete (LSH banding)."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.dedup import ngram_jaccard_join

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ngram_jaccard_join(ds, "doc_id", "text", threshold=0.8)


def _q_jaccard_incremental(sf_dir: str):
    """Incremental dedup via the PERSISTED prefix-posting Jaccard index
    (`functions/jaccard_index.py`): the corpus is split into an already-
    indexed majority (doc_id % 5 != 0) and a simulated ingest batch
    (doc_id % 5 == 0); the index is built over the majority and the batch is
    probed — returning every exact-gram-Jaccard >= 0.8 pair touching the
    batch (new-vs-indexed and new-vs-new), while indexed-vs-indexed pairs
    are out of scope by contract (they were vetted when probed)."""
    import tempfile

    import ray.data as rd

    from quanterra_pipeline_ray.functions.jaccard_index import (
        build_jaccard_index,
        probe_jaccard_index,
    )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    old = ds.map_batches(lambda b: b[b["doc_id"] % 5 != 0], batch_format="pandas")
    new = ds.map_batches(lambda b: b[b["doc_id"] % 5 == 0], batch_format="pandas")
    idx = tempfile.mkdtemp(prefix="qpr_jidx_", dir="/tmp")
    build_jaccard_index(old, idx, n_buckets=64)
    return probe_jaccard_index(new, idx, ds, threshold=0.8)


def _q_jaccard_probe_at_ref(sf_dir: str):
    """Snapshot-pinned index probe (`functions/jaccard_index.py`:
    index versions + named refs): the index is built over docs
    (doc_id % 5 IN (1,2)), ref 'pin' is taken, the index then ADVANCES
    (extend with doc_id % 5 IN (3,4), then a compaction — whose deletions
    the ref must survive), and the batch (doc_id % 5 == 0) probes AT the
    ref: pairs may touch only the pinned doc set, never the later
    extension — snapshot isolation between table and index."""
    import tempfile

    import ray.data as rd

    from quanterra_pipeline_ray.functions.jaccard_index import (
        build_jaccard_index,
        compact_jaccard_index,
        extend_jaccard_index,
        probe_jaccard_index,
        set_index_ref,
    )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    old = ds.map_batches(lambda b: b[(b["doc_id"] % 5).isin([1, 2])], batch_format="pandas")
    later = ds.map_batches(lambda b: b[(b["doc_id"] % 5).isin([3, 4])], batch_format="pandas")
    new = ds.map_batches(lambda b: b[b["doc_id"] % 5 == 0], batch_format="pandas")
    idx = tempfile.mkdtemp(prefix="qpr_jref_", dir="/tmp")
    build_jaccard_index(old, idx, n_buckets=64)
    set_index_ref(idx, "pin")
    extend_jaccard_index(later, idx)
    compact_jaccard_index(idx, min_files_per_bucket=2)
    corpus = ds.map_batches(
        lambda b: b[(b["doc_id"] % 5).isin([0, 1, 2])], batch_format="pandas"
    )
    return probe_jaccard_index(new, idx, corpus, threshold=0.8, at_ref="pin")


def _q_minhash_incremental(sf_dir: str):
    """Incremental near-dup via the PERSISTED MinHash-LSH band index
    (`functions/minhash_index.py`): constant per-doc index metadata (16 band
    rows), probe reads only the batch's band-hash partitions, exact
    char-5-gram verify.  Same split and pair predicate as
    jaccard_incremental_docs — banding recall on this corpus is complete
    (deterministic seed), so the exact-J oracle must hash-match."""
    import tempfile

    import ray.data as rd

    from quanterra_pipeline_ray.functions.minhash_index import (
        build_minhash_index,
        probe_minhash_index,
    )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    old = ds.map_batches(lambda b: b[b["doc_id"] % 5 != 0], batch_format="pandas")
    new = ds.map_batches(lambda b: b[b["doc_id"] % 5 == 0], batch_format="pandas")
    idx = tempfile.mkdtemp(prefix="qpr_mhidx_", dir="/tmp")
    build_minhash_index(old, idx, n_buckets=64)
    return probe_minhash_index(new, idx, ds, threshold=0.8)


def _q_simhash_pairs(sf_dir: str):
    """SimHash banding as the blocking structure, exact (md5) verify, over
    the corpus doubled with planted exact copies — every (id, id+100000)
    pair plus any natural exact dups must surface."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.dedup import simhash_exact_pairs

    base = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    shifted = base.map_batches(
        lambda b: b.assign(doc_id=b["doc_id"] + 100_000), batch_format="pandas"
    )
    # identity map keeps the union's block format homogeneous (Arrow read +
    # pandas map would flag schema divergence on every bundle)
    base_pd = base.map_batches(lambda b: b, batch_format="pandas")
    return simhash_exact_pairs(base_pd.union(shifted), "doc_id", "text")


def _q_similarity_topk(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from quanterra_pipeline_ray.functions.similarity import brute_force_topk

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    emb = emb.sort_values("vec_id")
    q = np.stack([np.asarray(v, dtype=np.float64) for v in emb.head(3)["embedding"]])
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = brute_force_topk(ds, q, k=10)
    qids = emb.head(3)["vec_id"].to_numpy()
    out["query_id"] = qids[out["query_id"].to_numpy()]
    return out[["query_id", "vec_id"]].astype(np.int64)


def _q_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """IVF top-k with ``nprobe == n_lists``: every list probed, so the result
    is provably exact (equals brute force / the SQL cross-join oracle) while
    the full IVF machinery — seeded distributed centroid sample, assignment
    stage, list pruning — still executes."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.similarity import ivf_topk

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    q = np.stack([np.asarray(v, dtype=np.float64) for v in emb.head(3)["embedding"]])
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = ivf_topk(ds, q, k=10, n_lists=16, nprobe=16)
    qids = emb.head(3)["vec_id"].to_numpy()
    out["query_id"] = qids[out["query_id"].to_numpy()]
    return out[["query_id", "vec_id"]].astype(np.int64)


def _q_ivf_index_topk(sf_dir: str) -> pd.DataFrame:
    """Incremental ANN via the PERSISTED IVF index
    (`functions/ivf_index.py`): build over vec_id % 5 != 0, extend with the
    remaining fifth (frozen centroids, append-only partitions), then search
    with ``nprobe == n_lists`` — provably exact over the full corpus, so the
    brute-force SQL oracle must hash-match even though the engine ran a
    build/extend/probe lifecycle with partition-level reads."""
    import tempfile

    import ray.data as rd

    from quanterra_pipeline_ray.functions.ivf_index import (
        build_ivf_index,
        extend_ivf_index,
        search_ivf_index,
    )

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    q = np.stack([np.asarray(v, dtype=np.float64) for v in emb.head(3)["embedding"]])
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    old = ds.map_batches(lambda b: b[b["vec_id"] % 5 != 0], batch_format="pandas")
    new = ds.map_batches(lambda b: b[b["vec_id"] % 5 == 0], batch_format="pandas")
    idx = tempfile.mkdtemp(prefix="qpr_ivfidx_", dir="/tmp")
    build_ivf_index(old, idx, n_lists=16)
    extend_ivf_index(new, idx)
    out = search_ivf_index(q, idx, k=10, nprobe=16)
    qids = emb.head(3)["vec_id"].to_numpy()
    out["query_id"] = qids[out["query_id"].to_numpy()]
    return out[["query_id", "vec_id"]].astype(np.int64)


def _q_ivf_rebalance_topk(sf_dir: str) -> pd.DataFrame:
    """IVF list REBALANCE (`functions/ivf_index.py:rebalance_ivf_index`):
    build small (8 lists), extend, split every above-average list
    (max_ratio=1.0 splits every above-mean list, guaranteed non-empty on any non-uniform distribution), then search with
    ``nprobe == n_lists`` — still provably exact after the split, so the
    same brute-force SQL oracle must hash-match."""
    import tempfile

    import ray.data as rd

    from quanterra_pipeline_ray.functions.ivf_index import (
        build_ivf_index,
        extend_ivf_index,
        read_ivf_meta,
        rebalance_ivf_index,
        search_ivf_index,
    )

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    tail = emb.tail(3)
    q = np.stack([np.asarray(v, dtype=np.float64) for v in tail["embedding"]])
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    old = ds.map_batches(lambda b: b[b["vec_id"] % 5 != 0], batch_format="pandas")
    new = ds.map_batches(lambda b: b[b["vec_id"] % 5 == 0], batch_format="pandas")
    idx = tempfile.mkdtemp(prefix="qpr_ivfreb_", dir="/tmp")
    build_ivf_index(old, idx, n_lists=8)
    extend_ivf_index(new, idx)
    meta = rebalance_ivf_index(idx, max_ratio=1.0)  # any above-mean list splits
    assert meta["n_lists"] > 8  # splits actually happened
    out = search_ivf_index(q, idx, k=10, nprobe=meta["n_lists"])
    qids = tail["vec_id"].to_numpy()
    out["query_id"] = qids[out["query_id"].to_numpy()]
    return out[["query_id", "vec_id"]].astype(np.int64)


def _q_embedding_near_dups(sf_dir: str) -> pd.DataFrame:
    import ray.data as rd

    from quanterra_pipeline_ray.functions.similarity import embedding_near_dup_pairs

    base = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def doubled(b: pd.DataFrame) -> pd.DataFrame:
        # emit the original AND the +10k-shifted copy in ONE pass (one block
        # format, no union) — the planted exact-duplicate workload
        return pd.concat(
            [b, b.assign(vec_id=b["vec_id"] + 10_000)], ignore_index=True
        )

    pairs = embedding_near_dup_pairs(
        base.map_batches(doubled, batch_format="pandas"), threshold=0.999
    )
    return pairs[["a", "b"]].astype(np.int64)


def _q_curation_flow(sf_dir: str):
    """The composed curation pipeline: quality gate -> language id ->
    MinHash near-dedup (keep the minimum-id member per component) in one
    streaming lineage.  Oracle recomposes all three stages in SQL."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.curation import curate_documents

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = curate_documents(ds, min_quality=0.8, min_tokens=20, dedup_threshold=0.8)
    return out.map_batches(
        lambda b: b[["doc_id", "n_tokens", "lang_pred"]], batch_format="pandas"
    )


def _q_quality_filter(sf_dir: str):
    """Quality gate: keep docs whose non-ws/char ratio >= 0.8 and token count
    >= 20 (the classic pre-training text-quality filter shape)."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.text import TextStats

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    scored = ds.map_batches(TextStats(), batch_format="pandas")
    return scored.map_batches(
        lambda b: b[(b["quality_score"] >= 0.8) & (b["n_tokens"] >= 20)][
            ["doc_id", "n_tokens"]
        ],
        batch_format="pandas",
    )


def _q_length_histogram(sf_dir: str):
    """Document length histogram in 100-char buckets (int-only aggregate)."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.relational import bucketed_groupby

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"bucket": (b["n_chars"] // 100) * 100})
        return g.groupby("bucket", as_index=False).size().rename(columns={"size": "n_docs"})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("bucket", as_index=False)["n_docs"].sum()

    out = bucketed_groupby(
        ds.map_batches(partial, batch_format="pandas"), ["bucket"], combine
    ).to_pandas()
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out.sort_values("bucket").reset_index(drop=True)


def _q_semi_join_events(sf_dir: str):
    import ray.data as rd

    from quanterra_pipeline_ray.functions.envelope import substring_semi_join

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "event_type"])
    return substring_semi_join(ds, "event_type", ["ck", "se"])  # click, purchase


def _q_split_key_docs(sf_dir: str):
    import pyarrow.compute as pc
    import ray.data as rd

    from quanterra_pipeline_ray.functions.envelope import split_composite_key

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "source"])

    def compose(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(t.column("lang"), t.column("source"), ".")
        return t.append_column("k", k)

    out = split_composite_key(ds.map_batches(compose, batch_format="pyarrow"), "k")
    return out.map_batches(
        lambda t: t.select(["doc_id", "code", "exchange"]), batch_format="pyarrow"
    )


def _q_storage_keys_events(sf_dir: str):
    import ray.data as rd

    from quanterra_pipeline_ray.functions.envelope import storage_key

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        key = storage_key("events", t.column("ts"), t.column("user_id"), t.column("event_id"))
        return pa.table({"event_id": t.column("event_id"), "obj_key": key})

    return ds.map_batches(derive, batch_format="pyarrow")


def _q_csv_roundtrip_events(sf_dir: str):
    import duckdb

    from quanterra_pipeline_ray.sources.csv import CSVSourceConfig, read_validated_csv

    path = os.path.join(_SCRATCH, f"events-{os.path.basename(os.path.normpath(sf_dir))}.csv")
    os.makedirs(_SCRATCH, exist_ok=True)
    duckdb.connect().execute(
        f"COPY (SELECT event_id, event_type FROM '{sf_dir}/events.parquet' ORDER BY event_id) "
        f"TO '{path}' (HEADER, DELIMITER ',')"
    )
    cfg = CSVSourceConfig(header_row=0, required_columns=("event_id", "event_type"), encoding="utf-8")
    return read_validated_csv(path, cfg)


def _q_ingest_flow(sf_dir: str):
    """Run the fan-out flow, then READ BACK the stored parquet partitions
    and count rows per (endpoint, exchange) — the oracle derives the same
    counts from the deterministic fan-out product (dimension fetch ×
    semi-join filter × data types) in SQL."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.ingest import market_data_flow

    out = os.path.join(_SCRATCH, "ingest-landing")
    shutil.rmtree(out, ignore_errors=True)
    market_data_flow(
        out,
        exchanges=["US", "LSE", "TO"],
        data_types=["eod", "dividends"],
        symbols_per_exchange=3,
        allowed_exchange_suffixes=[".US", ".TO"],
    )
    stored = rd.read_parquet(out)

    def count_parts(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["endpoint", "exchange"], as_index=False).size()
        return g.rename(columns={"size": "n_rows"})

    agg = stored.map_batches(count_parts, batch_format="pandas").to_pandas()
    agg = agg.groupby(["endpoint", "exchange"], as_index=False)["n_rows"].sum()
    agg["n_rows"] = agg["n_rows"].astype(np.int64)
    agg["endpoint"] = agg["endpoint"].astype(str)
    agg["exchange"] = agg["exchange"].astype(str)
    return agg.sort_values(["endpoint", "exchange"]).reset_index(drop=True)


def _q_media_decode(sf_dir: str):
    """Actor-pool media decode over a documents-derived media table (payload
    = utf-8 text bytes, so DuckDB's ``sha256`` recomputes ``sig``)."""
    import ray.data as rd

    from quanterra_pipeline_ray.functions.multimodal import decode_features, media_from_documents

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = decode_features(media_from_documents(docs), feature_dim=16, batch_size=64)

    def project(b: pd.DataFrame) -> pd.DataFrame:
        feats = np.stack([np.asarray(f) for f in b["features"]])
        return pd.DataFrame(
            {
                "media_id": b["media_id"].to_numpy().astype(np.int64),
                "media_type": b["media_type"].to_numpy(),
                "n_features": np.full(len(b), feats.shape[1], dtype=np.int64),
                "sig": b["sig"].to_numpy(),
            }
        )

    return out.map_batches(project, batch_format="pandas")


def _q_events_watermark_hourly(sf_dir: str):
    """Streaming watermark windower over events with unbounded lateness —
    every window finalizes, so the result equals the batch hourly aggregate
    (late-drop behavior is unit-tested; it has no SQL analog)."""
    import ray.data as rd

    from quanterra_pipeline_ray.stages.streaming import windowed_counts

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    out = windowed_counts(ds, window_us=3_600_000_000, lateness_us=None)

    def rename(b: pd.DataFrame) -> pd.DataFrame:
        b = b.rename(columns={"window_start": "hour"})
        b["hour"] = b["hour"].astype("datetime64[us]")
        return b[["user_id", "hour", "n_events"]]

    return out.map_batches(rename, batch_format="pandas")


# ------------------------------------------------------------ temporal joins
def _q_asof_join_events(sf_dir: str):
    """Attach to every non-signup event the latest signup ts <= event ts of
    the same user (DuckDB ASOF JOIN oracle)."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.temporal import asof_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"])
    left = ev.map_batches(
        lambda b: b.loc[b["event_type"] != "signup", ["event_id", "user_id", "ts"]],
        batch_format="pandas",
    )
    right = ev.map_batches(
        lambda b: b.loc[b["event_type"] == "signup", ["user_id", "ts"]],
        batch_format="pandas",
    )
    out = asof_join(left, right, on="ts", by="user_id", suffix="_signup")
    return out.map_batches(
        lambda b: b[["event_id", "user_id", "ts", "ts_signup"]], batch_format="pandas"
    )


def _q_range_join_events(sf_dir: str):
    """Events within 1h after each signup of the same user (range join)."""
    import ray.data as rd

    from quanterra_pipeline_ray.pipelines.temporal import range_join

    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"])
    left = ev.map_batches(
        lambda b: b.loc[b["event_type"] == "signup", ["user_id", "ts"]].drop_duplicates(),
        batch_format="pandas",
    )
    right = ev.map_batches(
        lambda b: b.loc[b["event_type"] != "signup", ["user_id", "ts"]],
        batch_format="pandas",
    )
    out = range_join(left, right, on="ts", by="user_id", width_us=3_600_000_000)

    def agg(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["user_id", "anchor_ts"], as_index=False).size()
        return g.rename(columns={"size": "n_events"})

    from quanterra_pipeline_ray.pipelines.relational import bucketed_groupby

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["user_id", "anchor_ts"], as_index=False)["n_events"].sum()

    res = bucketed_groupby(
        out.map_batches(agg, batch_format="pandas"), ["user_id", "anchor_ts"], combine
    ).to_pandas()
    res["n_events"] = res["n_events"].astype(np.int64)
    return res.sort_values(["user_id", "anchor_ts"]).reset_index(drop=True)


# ------------------------------------------------------------------ contract
def entry() -> Any:
    """Flagship: compact + Z-order + MERGE over sf0.001-derived transcripts."""
    from quanterra_pipeline_ray.pipelines.maintenance import run_maintenance

    sf_dir = "/root/testdata/sf0.001"
    table, data = _maint_table(sf_dir, "entry")
    run_maintenance(
        table,
        merge_source=_merge_source(data),
        target_bytes=4 << 20,
        target_rows=100_000,
    )
    return table.scan()


def queries() -> dict[str, Callable[[str], Any]]:
    from quanterra_pipeline_ray.pipelines import relational as rel

    # Registry ORDER matters: the round-3 driver evaluated only the first 50
    # entries, so queries that have never had a driver-green CORRECTNESS row
    # lead (VERDICT r3 "Next round #1"); the 23 stable maint queries — driver
    # green in r2 AND r3 — ride in the tail.
    return {
        # --- new in r5 (never driver-checked) first ---
        "lag_lead_events": _q_lag_lead,
        "first_last_events": _q_first_last,
        "nth_value_events": _q_nth_value,
        "rollup_pricing": _q_rollup_pricing,
        "cube_pricing": _q_cube_pricing,
        "grouping_sets_pricing": _q_grouping_sets_pricing,
        "ntile_events": _q_ntile,
        "corr_quantity_discount": _q_grouped_corr,
        "full_outer_customer_orders": _q_full_outer_join,
        "tfidf_top_term_docs": _q_tfidf_top_term,
        "rank_family_events": _q_rank_family,
        "grouped_median_events": _q_grouped_median,
        "top_terms_docs": _q_top_terms,
        "maint_wap": _q_maint_wap,
        "maint_wap_stack": _q_maint_wap_stack,
        "mode_event_type_per_user": _q_mode_per_user,
        "grouped_quartiles_events": _q_grouped_quartiles,
        # --- new in r4 (never driver-checked) first ---
        "repeat_mix_docs": _q_repeat_mix,
        "contamination_ngram_docs": _q_contamination_ngram,
        "contamination_ac_docs": _q_contamination_ac,
        "contamination_ac_sharded_docs": _q_contamination_ac_sharded,
        "maint_incremental_sums": _q_maint_incremental_sums,
        "customers_without_orders": _q_customers_without_orders,
        "running_sum_events": _q_running_sum_events,
        "quantiles_cont_events": _q_quantiles_cont,
        "pca_project_embeddings": _q_pca_project,
        "value_histogram_events": _q_value_histogram,
        "late_arrivals_events": _q_late_arrivals,
        "streaming_reservoir_docs": _q_streaming_reservoir,
        "rolling_sum_value_events": _q_rolling_sum,
        "rolling_median_value_events": _q_rolling_quantile,
        "event_type_paths": _q_event_type_paths,
        "split_assign_docs": _q_split_assign,
        "shuffle_order_docs": _q_shuffle_order,
        "contamination_docs": _q_contamination,
        "maint_text_search_extend": _q_maint_text_search_extend,
        "weighted_sample_docs": _q_weighted_sample,
        "ingest_dedup_views_flow": _q_ingest_dedup_views_flow,
        "ivf_rebalance_topk_embeddings": _q_ivf_rebalance_topk,
        # --- never driver-checked (r3 positions 51-70) ---
        "jaccard_pairs_docs": _q_jaccard_pairs,
        "jaccard_incremental_docs": _q_jaccard_incremental,
        "jaccard_probe_at_ref_docs": _q_jaccard_probe_at_ref,
        "minhash_incremental_docs": _q_minhash_incremental,
        "ivf_index_topk_embeddings": _q_ivf_index_topk,
        "simhash_pairs_docs": _q_simhash_pairs,
        "similarity_topk": _q_similarity_topk,
        "ivf_topk_embeddings": _q_ivf_topk,
        "embedding_near_dups": _q_embedding_near_dups,
        "media_decode_features": _q_media_decode,
        "curation_flow": _q_curation_flow,
        "quality_filter_docs": _q_quality_filter,
        "length_histogram_docs": _q_length_histogram,
        "events_watermark_hourly": _q_events_watermark_hourly,
        "asof_join_events": _q_asof_join_events,
        "range_join_events": _q_range_join_events,
        "semi_join_events": _q_semi_join_events,
        "split_key_docs": _q_split_key_docs,
        "storage_keys_events": _q_storage_keys_events,
        "csv_roundtrip_events": _q_csv_roundtrip_events,
        "ingest_flow": _q_ingest_flow,
        # --- relational engine ops ---
        "q1_pricing_summary": rel.q1_pricing_summary,
        "orders_per_nation": rel.orders_per_nation,
        "lineitems_per_region": rel.lineitems_per_region,
        "topk_orders": rel.topk_orders,
        "events_hourly": rel.events_hourly,
        "events_sessions": rel.events_sessions,
        "distinct_event_types": rel.distinct_event_types,
        "docs_stats_by_lang": rel.docs_stats_by_lang,
        # --- training-data ops ---
        "dedup_exact_docs": _q_dedup_exact,
        "text_stats_docs": _q_text_stats,
        "token_count_docs": _q_token_count,
        "pack_sequences_docs": _q_pack_sequences,
        "dataprep_flow": _q_dataprep_flow,
        "quantiles_docs": _q_quantiles,
        "events_sliding_windows": _q_events_sliding,
        "events_distinct_users": _q_events_distinct_users,
        "latest_event_per_user": _q_latest_event_per_user,
        "rolling_max_value_events": _q_rolling_max_value,
        "event_type_pivot": _q_event_type_pivot,
        "event_type_long": _q_event_type_long,
        "topk_per_lang_docs": _q_topk_per_lang,
        "hash_sample_docs": _q_hash_sample,
        "quota_sample_docs": _q_quota_sample,
        "mix_sources_docs": _q_mix_sources,
        "fingerprint_docs": _q_fingerprint,
        "lang_id_docs": _q_lang_id,
        "minhash_dedup_docs": _q_minhash_dedup,
        # --- lakehouse maintenance (driver-green r2+r3; stable tail) ---
        "maint_scan": _q_maint_scan,
        "maint_append": _q_maint_append,
        "maint_timetravel": _q_maint_timetravel,
        "maint_rollback": _q_maint_rollback,
        "maint_changelog": _q_maint_changelog,
        "maint_point_lookup": _q_maint_point_lookup,
        "maint_incremental_counts": _q_maint_incremental_counts,
        "maint_schema_evolution": _q_maint_schema_evolution,
        "maint_partition_evolution": _q_maint_partition_evolution,
        "maint_timerange_scan": _q_maint_timerange_scan,
        "maint_text_search": _q_maint_text_search,
        "maint_text_search_and": _q_maint_text_search_and,
        "maint_text_search_or": _q_maint_text_search_or,
        "maint_delete_where": _q_maint_delete_where,
        "maint_delete_vector": _q_maint_delete_vector,
        "maint_multi_txn": _q_maint_multi_txn,
        "maint_compact": _q_maint_compact,
        "maint_zorder": _q_maint_zorder,
        "maint_hilbert": _q_maint_hilbert,
        "maint_merge": _q_maint_merge,
        "maint_merge_shuffle": _q_maint_merge_shuffle,
        "maint_expire": _q_maint_expire,
        "maint_resume": _q_maint_resume,
    }


def oracle_sql() -> dict[str, str]:
    t = TRANSCRIPTS_FROM_EVENTS_SQL
    scan_sql = f"WITH t AS ({t}) SELECT * FROM t"
    merge_sql = f"""
WITH t AS ({t}),
upd AS (
  SELECT conv_id, turn_idx, role, 'UPDATED ' || text AS text, tool, ts
  FROM t WHERE turn_idx % 7 = 3
),
kept AS (
  SELECT * FROM t WHERE turn_idx % 7 <> 3 AND turn_idx % 13 <> 5
),
ins AS (
  SELECT 'cNEW' AS conv_id, CAST(0 AS INTEGER) AS turn_idx, 'user' AS role,
         'hello' AS text, '' AS tool, TIMESTAMP '2024-06-01 00:00:00' AS ts
  UNION ALL
  SELECT 'cNEW', CAST(1 AS INTEGER), 'assistant', 'hi', '',
         TIMESTAMP '2024-06-01 00:01:00'
)
SELECT * FROM kept UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM ins
""".strip()
    changelog_sql = f"""
WITH t AS ({t}),
upd AS (
  SELECT conv_id, turn_idx, role, 'UPDATED ' || text AS text, tool, ts
  FROM t WHERE turn_idx % 7 = 3
),
kept AS (
  SELECT * FROM t WHERE turn_idx % 7 <> 3 AND turn_idx % 13 <> 5
),
ins AS (
  SELECT 'cNEW' AS conv_id, CAST(0 AS INTEGER) AS turn_idx, 'user' AS role,
         'hello' AS text, '' AS tool, TIMESTAMP '2024-06-01 00:00:00' AS ts
  UNION ALL
  SELECT 'cNEW', CAST(1 AS INTEGER), 'assistant', 'hi', '',
         TIMESTAMP '2024-06-01 00:01:00'
),
m AS (SELECT * FROM kept UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM ins)
SELECT 'insert' AS op, * FROM (SELECT * FROM m EXCEPT SELECT * FROM t)
UNION ALL
SELECT 'delete' AS op, * FROM (SELECT * FROM t EXCEPT SELECT * FROM m)
""".strip()
    return {
        # r5 window/statistics/join family
        "lag_lead_events": """
SELECT event_id, user_id,
       LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
       LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
FROM events
""".strip(),
        "ntile_events": """
SELECT event_id, user_id,
       NTILE(4) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS tile
FROM events
""".strip(),
        "first_last_events": """
SELECT event_id, user_id,
       FIRST_VALUE(event_type) OVER w AS first_event_type,
       LAST_VALUE(event_type)  OVER w AS last_event_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""".strip(),
        "nth_value_events": """
SELECT event_id, user_id,
       NTH_VALUE(event_type, 3) OVER w AS third_event_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""".strip(),
        "rollup_pricing": """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""".strip(),
        "cube_pricing": """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""".strip(),
        "grouping_sets_pricing": """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""".strip(),
        # closed-form moments with explicit casts so the float expression is
        # evaluated in the SAME IEEE order as relational.grouped_corr —
        # bit-exact, unlike DuckDB's streaming corr()/covar_pop() accumulators
        "corr_quantity_discount": """
WITH s AS (
  SELECT l_returnflag, count(*) AS n,
         sum(qx) AS sx, sum(qy) AS sy, sum(qx*qy) AS sxy,
         sum(qx*qx) AS sxx, sum(qy*qy) AS syy
  FROM (SELECT l_returnflag,
               CAST(round(l_quantity) AS BIGINT)      AS qx,
               CAST(round(l_discount * 100) AS BIGINT) AS qy
        FROM lineitem)
  GROUP BY l_returnflag)
SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
       CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*n AS DOUBLE) AS covar_pop,
       CAST(n*sxy - sx*sy AS DOUBLE)
         / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS corr
FROM s
""".strip(),
        "full_outer_customer_orders": """
WITH c AS (
  SELECT c_custkey AS custkey, c_name FROM customer WHERE c_custkey % 3 <> 0),
o AS (
  SELECT o_custkey AS custkey, count(*) AS order_cnt
  FROM orders WHERE o_totalprice > 150000 GROUP BY 1)
SELECT COALESCE(c.custkey, o.custkey) AS custkey, c_name, order_cnt
FROM c FULL OUTER JOIN o ON c.custkey = o.custkey
""".strip(),
        # score = CAST(tf AS DOUBLE) * N / df — left-assoc double ops matching
        # the numpy expression in text.tfidf_top_terms exactly
        "tfidf_top_term_docs": """
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' GROUP BY 1, 2),
df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
ranked AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf AS DOUBLE) * (SELECT n_docs FROM n) / df.df AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE) * (SELECT n_docs FROM n) / df.df DESC,
                    tf.term ASC) AS rn
  FROM tf JOIN df USING (term))
SELECT doc_id, term AS top_term, score FROM ranked WHERE rn = 1
""".strip(),
        "rank_family_events": """
SELECT event_id, user_id,
       rank()         OVER w AS rnk,
       dense_rank()   OVER w AS drnk,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cume
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY event_type)
""".strip(),
        "grouped_median_events": """
SELECT event_type, quantile_cont(value, 0.5) AS median_value
FROM events GROUP BY event_type
""".strip(),
        "grouped_quartiles_events": """
SELECT event_type, 0.25 AS q, quantile_cont(value, 0.25) AS q_val
FROM events GROUP BY event_type
UNION ALL
SELECT event_type, 0.5, quantile_cont(value, 0.5) FROM events GROUP BY event_type
UNION ALL
SELECT event_type, 0.75, quantile_cont(value, 0.75) FROM events GROUP BY event_type
""".strip(),
        "top_terms_docs": """
WITH tok AS (
  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents)
SELECT term, count(*) AS cnt FROM tok WHERE term <> ''
GROUP BY term ORDER BY cnt DESC, term ASC LIMIT 20
""".strip(),
        "mode_event_type_per_user": """
WITH c AS (
  SELECT user_id, event_type, count(*) AS cnt
  FROM events GROUP BY user_id, event_type),
r AS (
  SELECT user_id, event_type, cnt,
         row_number() OVER (
           PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS rn
  FROM c)
SELECT user_id, event_type AS mode_type, cnt AS mode_cnt FROM r WHERE rn = 1
""".strip(),
        "maint_wap": f"""
WITH t AS ({t})
SELECT * FROM t
UNION ALL
SELECT 'cWAP' AS conv_id, CAST(0 AS INTEGER) AS turn_idx, 'user' AS role,
       'wap hello' AS text, '' AS tool, TIMESTAMP '2024-07-01 00:00:00' AS ts
UNION ALL
SELECT 'cWAP', CAST(1 AS INTEGER), 'assistant', 'wap hi', '',
       TIMESTAMP '2024-07-01 00:01:00'
""".strip(),
        "maint_wap_stack": f"""
WITH t AS ({t})
SELECT * FROM t
UNION ALL
SELECT 'cWS0' AS conv_id, CAST(0 AS INTEGER) AS turn_idx, 'user' AS role,
       'wap stack hello' AS text, '' AS tool, TIMESTAMP '2024-07-01 00:00:00' AS ts
UNION ALL
SELECT 'cWS0', CAST(1 AS INTEGER), 'assistant', 'wap stack hi', '',
       TIMESTAMP '2024-07-01 00:01:00'
""".strip(),
        "maint_scan": scan_sql,
        "maint_append": scan_sql,
        "maint_timetravel": scan_sql,
        "maint_rollback": scan_sql,
        "maint_changelog": changelog_sql,
        "maint_point_lookup": f"WITH t AS ({t}) SELECT * FROM t WHERE conv_id IN ('c17', 'c23', 'c5')",
        # layout changes never change content: the spec-evolved, twice-
        # incrementally-reclustered table must scan as the plain table
        "maint_partition_evolution": scan_sql,
        "maint_timerange_scan": f"""
WITH t AS ({t})
SELECT * FROM t
WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
""".strip(),
        "maint_text_search": rf"""
WITH t AS ({t})
SELECT * FROM t
WHERE LEN(list_filter(regexp_extract_all(text, '\S+'), x -> x = 'purchase')) > 0
""".strip(),
        "maint_text_search_and": rf"""
WITH t AS ({t})
SELECT * FROM t
WHERE LEN(list_filter(regexp_extract_all(text, '\S+'), x -> x = 'purchase')) > 0
  AND LEN(list_filter(regexp_extract_all(text, '\S+'), x -> x = '57}}')) > 0
""".strip(),
        "maint_text_search_or": rf"""
WITH t AS ({t})
SELECT * FROM t
WHERE LEN(list_filter(regexp_extract_all(text, '\S+'), x -> x = 'purchase')) > 0
   OR LEN(list_filter(regexp_extract_all(text, '\S+'), x -> x = 'signup')) > 0
""".strip(),
        "maint_text_search_extend": rf"""
WITH t AS ({t}),
ext AS (
  SELECT conv_id || 'x' AS conv_id, turn_idx, role,
         'purchase extension ' || text AS text, tool, ts
  FROM t WHERE turn_idx % 17 = 2
),
u AS (SELECT * FROM t UNION ALL SELECT * FROM ext)
SELECT * FROM u
WHERE LEN(list_filter(regexp_extract_all(text, '\S+'), x -> x = 'purchase')) > 0
""".strip(),
        "maint_delete_where": f"WITH t AS ({t}) SELECT * FROM t WHERE turn_idx % 11 <> 7",
        "maint_delete_vector": f"WITH t AS ({t}) SELECT * FROM t WHERE turn_idx % 11 <> 7",
        # atomic cross-table move: first 50 conversations (lexical order)
        # relocate from table a to table b in one catalog-version commit
        "maint_multi_txn": f"""
WITH t AS ({t}),
moved AS (SELECT DISTINCT conv_id FROM t ORDER BY conv_id LIMIT 50)
SELECT 'a' AS tbl, * FROM t WHERE conv_id NOT IN (SELECT conv_id FROM moved)
UNION ALL
SELECT 'b' AS tbl, * FROM t WHERE conv_id IN (SELECT conv_id FROM moved)
""".strip(),
        "maint_incremental_counts": f"""
WITH t AS ({t}),
kept AS (SELECT * FROM t WHERE turn_idx % 7 <> 3 AND turn_idx % 13 <> 5),
upd AS (SELECT conv_id FROM t WHERE turn_idx % 7 = 3),
m AS (
  SELECT conv_id FROM kept UNION ALL SELECT conv_id FROM upd
  UNION ALL SELECT 'cNEW' UNION ALL SELECT 'cNEW'
)
SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_turns FROM m GROUP BY conv_id
""".strip(),
        # count+sum view across compact+merge: updates net the text-length
        # difference; mean derived as exact-int sum / count in double
        "maint_incremental_sums": f"""
WITH t AS ({t}),
upd AS (SELECT conv_id, 'UPDATED ' || text AS text FROM t WHERE turn_idx % 7 = 3),
kept AS (SELECT conv_id, text FROM t WHERE turn_idx % 7 <> 3 AND turn_idx % 13 <> 5),
ins AS (SELECT 'cNEW' AS conv_id, 'hello' AS text UNION ALL SELECT 'cNEW', 'hi'),
m AS (SELECT * FROM kept UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM ins)
SELECT conv_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS val_sum,
       CAST(SUM(LENGTH(text)) AS DOUBLE) / COUNT(*) AS val_mean
FROM m GROUP BY conv_id
""".strip(),
        "maint_compact": scan_sql,
        "maint_zorder": scan_sql,
        "maint_hilbert": scan_sql,
        "maint_expire": scan_sql,
        "maint_resume": scan_sql,
        "maint_merge": merge_sql,
        "maint_merge_shuffle": merge_sql,
        # the evolved column rides along with default 0 through compaction +
        # a rename (priority -> prio, metadata-only, name-mapped at read) +
        # merge (merge source lacks it -> padded under the NEW name)
        "maint_schema_evolution": merge_sql.replace(
            "SELECT * FROM kept", "SELECT *, CAST(0 AS INTEGER) AS prio FROM kept"
        )
        .replace("SELECT * FROM upd", "SELECT *, CAST(0 AS INTEGER) AS prio FROM upd")
        .replace("SELECT * FROM ins", "SELECT *, CAST(0 AS INTEGER) AS prio FROM ins"),
        # exact-decimal arithmetic on both sides -> bit-identical doubles
        "q1_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
""".strip(),
        "orders_per_nation": """
SELECT n_name, COUNT(*) AS order_count, MAX(o_totalprice) AS max_price
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""".strip(),
        "lineitems_per_region": """
SELECT r_name, COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE l_shipdate < TIMESTAMP '1995-06-01'
GROUP BY r_name
""".strip(),
        "topk_orders": """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""".strip(),
        "events_hourly": """
SELECT user_id, date_trunc('hour', ts) AS hour, COUNT(*) AS n_events
FROM events GROUP BY user_id, date_trunc('hour', ts)
""".strip(),
        "events_sessions": """
WITH o AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT user_id,
       CAST(SUM(CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM o GROUP BY user_id
""".strip(),
        "distinct_event_types": "SELECT DISTINCT event_type FROM events",
        "docs_stats_by_lang": """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       MAX(n_chars) AS max_chars, MIN(n_chars) AS min_chars
FROM documents GROUP BY lang
""".strip(),
        # one survivor (min doc_id) per distinct text: at sf0.01 this equals
        # SELECT * (no natural dup texts), but larger scales plant exact-dup
        # texts and the oracle must collapse them exactly like the engine
        "dedup_exact_docs": """
SELECT d.* FROM documents d
JOIN (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text) k USING (doc_id)
""".strip(),
        "text_stats_docs": r"""
SELECT doc_id,
       LENGTH(text) AS n_chars_txt,
       LEN(regexp_extract_all(text, '\S+')) AS n_tokens,
       LENGTH(regexp_replace(text, '\s', '', 'g')) AS token_chars,
       LENGTH(text) - LENGTH(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
       LENGTH(regexp_replace(text, '\s', '', 'g')) / GREATEST(LENGTH(text), 1) AS quality_score
FROM documents
""".strip(),
        "token_count_docs": r"""
SELECT doc_id,
       LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]')) AS n_bpe_tokens
FROM documents
""".strip(),
        "fingerprint_docs": "SELECT doc_id, md5(text) AS fingerprint FROM documents",
        # full LangId heuristic in SQL: word regex -> lowercase -> stopword
        # hits per language -> insertion-order argmax -> single int division
        "lang_id_docs": """
WITH w AS (
  SELECT doc_id, list_transform(regexp_extract_all(text, '[A-Za-z]+'), x -> lower(x)) AS ws
  FROM documents
),
s AS (
  SELECT doc_id, LEN(ws) AS n,
    LEN(list_filter(ws, x -> x IN ('the','and','of','to','a','in','is','that','it','for'))) AS h_en,
    LEN(list_filter(ws, x -> x IN ('der','die','das','und','ist','nicht','ein','mit','zu','auf'))) AS h_de,
    LEN(list_filter(ws, x -> x IN ('le','la','les','et','est','un','une','des','que','pour'))) AS h_fr,
    LEN(list_filter(ws, x -> x IN ('el','la','los','las','y','es','un','una','que','por'))) AS h_es
  FROM w
)
SELECT doc_id,
  CASE WHEN n = 0 OR (h_en = 0 AND h_de = 0 AND h_fr = 0 AND h_es = 0) THEN 'und'
       WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
       WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
       WHEN h_fr >= h_es THEN 'fr'
       ELSE 'es' END AS lang_pred,
  CASE WHEN n = 0 THEN 0.0 ELSE GREATEST(h_en, h_de, h_fr, h_es) / n END AS lang_conf
FROM s
""".strip(),
        # exact char-5-gram Jaccard pairs (distinct substr grams, int-encoded
        # for speed) + recursive-CTE connected components + min member label
        "minhash_dedup_docs": """
WITH RECURSIVE gs AS (
  SELECT doc_id, list_distinct(list_transform(range(1, GREATEST(LENGTH(text)-3, 2)), i -> substr(text, CAST(i AS INT), 5))) AS grams_s
  FROM documents
),
g AS (
  SELECT doc_id, list_transform(grams_s,
    s -> ((((ascii(substr(s,1,1))::BIGINT * 131 + ascii(substr(s,2,1))) * 131
           + ascii(substr(s,3,1))) * 131 + ascii(substr(s,4,1))) * 131 + ascii(substr(s,5,1)))) AS grams
  FROM gs
),
p0 AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         LEN(list_intersect(x.grams, y.grams)) AS inter,
         LEN(x.grams) AS na, LEN(y.grams) AS nb
  FROM g x JOIN g y
    ON x.doc_id < y.doc_id
   AND LEN(x.grams) >= 0.8 * LEN(y.grams)
   AND LEN(y.grams) >= 0.8 * LEN(x.grams)
),
pairs AS (SELECT a, b FROM p0 WHERE inter >= 0.8 * (na + nb - inter)),
e AS (SELECT a AS s, b AS d FROM pairs UNION ALL SELECT b, a FROM pairs),
r(s, d) AS (
  SELECT s, s FROM (SELECT DISTINCT s FROM e)
  UNION
  SELECT r.s, e.d FROM r JOIN e ON r.d = e.s
),
comp AS (SELECT s AS doc_id, MIN(d) AS dup_group FROM r GROUP BY s)
SELECT d.doc_id, COALESCE(c.dup_group, d.doc_id) AS dup_group
FROM documents d LEFT JOIN comp c USING (doc_id)
""".strip(),
        # exact char-5-gram Jaccard pair join (same grams/predicate as the
        # minhash oracle, pairs only — no CC): the engine's prefix-filter
        # candidate generation must be COMPLETE for this to hash-match
        "jaccard_pairs_docs": """
WITH gs AS (
  SELECT doc_id, list_distinct(list_transform(range(1, GREATEST(LENGTH(text)-3, 2)), i -> substr(text, CAST(i AS INT), 5))) AS grams_s
  FROM documents
),
g AS (
  SELECT doc_id, list_transform(grams_s,
    s -> ((((ascii(substr(s,1,1))::BIGINT * 131 + ascii(substr(s,2,1))) * 131
           + ascii(substr(s,3,1))) * 131 + ascii(substr(s,4,1))) * 131 + ascii(substr(s,5,1)))) AS grams
  FROM gs
),
p0 AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         LEN(list_intersect(x.grams, y.grams)) AS inter,
         LEN(x.grams) AS na, LEN(y.grams) AS nb
  FROM g x JOIN g y
    ON x.doc_id < y.doc_id
   AND LEN(x.grams) >= 0.8 * LEN(y.grams)
   AND LEN(y.grams) >= 0.8 * LEN(x.grams)
)
SELECT a, b FROM p0 WHERE inter >= 0.8 * (na + nb - inter)
""".strip(),
        # incremental-index probe: same gram/J predicate as jaccard_pairs,
        # restricted to pairs touching the simulated ingest batch (doc_id%5=0)
        # — the persisted-index probe must be COMPLETE for this to hash-match
        "jaccard_probe_at_ref_docs": """
WITH gs AS (
  SELECT doc_id, list_distinct(list_transform(range(1, GREATEST(LENGTH(text)-3, 2)), i -> substr(text, CAST(i AS INT), 5))) AS grams
  FROM documents
  WHERE doc_id % 5 IN (0, 1, 2)
),
p0 AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         LEN(list_intersect(x.grams, y.grams)) AS inter,
         LEN(x.grams) AS na, LEN(y.grams) AS nb
  FROM gs x JOIN gs y
    ON x.doc_id < y.doc_id
   AND (x.doc_id % 5 = 0 OR y.doc_id % 5 = 0)
   AND LEN(x.grams) >= 0.8 * LEN(y.grams)
   AND LEN(y.grams) >= 0.8 * LEN(x.grams)
)
SELECT a, b FROM p0 WHERE inter >= 0.8 * (na + nb - inter)
""".strip(),
        "jaccard_incremental_docs": """
WITH gs AS (
  SELECT doc_id, list_distinct(list_transform(range(1, GREATEST(LENGTH(text)-3, 2)), i -> substr(text, CAST(i AS INT), 5))) AS grams
  FROM documents
),
p0 AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         LEN(list_intersect(x.grams, y.grams)) AS inter,
         LEN(x.grams) AS na, LEN(y.grams) AS nb
  FROM gs x JOIN gs y
    ON x.doc_id < y.doc_id
   AND (x.doc_id % 5 = 0 OR y.doc_id % 5 = 0)
   AND LEN(x.grams) >= 0.8 * LEN(y.grams)
   AND LEN(y.grams) >= 0.8 * LEN(x.grams)
)
SELECT a, b FROM p0 WHERE inter >= 0.8 * (na + nb - inter)
""".strip(),
        # LSH-index probe, same predicate: banding (64 hashes / 16 bands,
        # fixed seed) is recall-complete on this corpus, exact verify kills
        # any false positives — so the exact-J pair oracle applies verbatim
        "minhash_incremental_docs": """
WITH gs AS (
  SELECT doc_id, list_distinct(list_transform(range(1, GREATEST(LENGTH(text)-3, 2)), i -> substr(text, CAST(i AS INT), 5))) AS grams
  FROM documents
),
p0 AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         LEN(list_intersect(x.grams, y.grams)) AS inter,
         LEN(x.grams) AS na, LEN(y.grams) AS nb
  FROM gs x JOIN gs y
    ON x.doc_id < y.doc_id
   AND (x.doc_id % 5 = 0 OR y.doc_id % 5 = 0)
   AND LEN(x.grams) >= 0.8 * LEN(y.grams)
   AND LEN(y.grams) >= 0.8 * LEN(x.grams)
)
SELECT a, b FROM p0 WHERE inter >= 0.8 * (na + nb - inter)
""".strip(),
        "simhash_pairs_docs": """
WITH c AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents
)
SELECT x.doc_id AS a, y.doc_id AS b
FROM c x JOIN c y ON x.text = y.text AND x.doc_id < y.doc_id
""".strip(),
        "media_decode_features": """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       CAST(16 AS BIGINT) AS n_features,
       sha256(text) AS sig
FROM documents
""".strip(),
        "ingest_flow": """
WITH symbols AS (
  SELECT 'SYM' || CAST(n.i AS VARCHAR) || '.' || e.ex AS symbol, e.ex AS exchange
  FROM (VALUES ('US'), ('LSE'), ('TO')) e(ex), (VALUES (0), (1), (2)) n(i)
),
kept AS (SELECT * FROM symbols WHERE symbol LIKE '%.US' OR symbol LIKE '%.TO'),
dt AS (SELECT * FROM (VALUES ('eod'), ('dividends')) d(endpoint))
SELECT dt.endpoint, kept.exchange, CAST(COUNT(*) AS BIGINT) AS n_rows
FROM dt, kept
GROUP BY dt.endpoint, kept.exchange
""".strip(),
        "quality_filter_docs": r"""
SELECT doc_id, LEN(regexp_extract_all(text, '\S+')) AS n_tokens
FROM documents
WHERE LENGTH(regexp_replace(text, '\s', '', 'g')) / GREATEST(LENGTH(text), 1) >= 0.8
  AND LEN(regexp_extract_all(text, '\S+')) >= 20
""".strip(),
        "topk_per_lang_docs": """
SELECT doc_id, lang, n_chars
FROM documents
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) <= 5
""".strip(),
        "events_distinct_users": """
SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS hour,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events GROUP BY event_type, hour
""".strip(),
        "latest_event_per_user": """
SELECT event_id, user_id, ts
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id) = 1
""".strip(),
        "rolling_max_value_events": """
SELECT event_id, user_id, ts, value,
       MAX(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
       ) AS rolling_max
FROM events
""".strip(),
        "event_type_pivot": """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY user_id
""".strip(),
        # pivot->unpivot round trip: users x declared types, zeros explicit
        "event_type_long": """
WITH u AS (SELECT DISTINCT user_id FROM events),
t(event_type) AS (VALUES ('click'), ('error'), ('purchase'), ('signup'), ('view')),
c AS (SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2)
SELECT u.user_id, t.event_type, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
FROM u CROSS JOIN t
LEFT JOIN c ON c.user_id = u.user_id AND c.event_type = t.event_type
""".strip(),
        # hopping-window recomposition: each event joins its 4 covering
        # window starts (k = 0..3 hops back from its own hop bucket)
        "events_sliding_windows": """
WITH w AS (
  SELECT event_type,
         make_timestamp(((epoch_us(ts) // 900000000) - k.k) * 900000000) AS window_start
  FROM events, (VALUES (0), (1), (2), (3)) k(k)
)
SELECT event_type, window_start, CAST(COUNT(*) AS BIGINT) AS n_events
FROM w GROUP BY event_type, window_start
""".strip(),
        "quantiles_docs": """
SELECT CAST(0.1 AS DOUBLE) AS q, CAST(quantile_disc(n_chars, 0.1) AS BIGINT) AS v FROM documents
UNION ALL SELECT 0.25, CAST(quantile_disc(n_chars, 0.25) AS BIGINT) FROM documents
UNION ALL SELECT 0.5, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) FROM documents
UNION ALL SELECT 0.75, CAST(quantile_disc(n_chars, 0.75) AS BIGINT) FROM documents
UNION ALL SELECT 0.9, CAST(quantile_disc(n_chars, 0.9) AS BIGINT) FROM documents
UNION ALL SELECT 0.99, CAST(quantile_disc(n_chars, 0.99) AS BIGINT) FROM documents
""".strip(),
        # composed prep oracle: gate -> min-id-per-text dedup -> md5 quota
        # -> prefix-sum packing, one chained-CTE recomposition
        "dataprep_flow": r"""
WITH gated AS (
  SELECT doc_id, source, text,
         CAST(LEN(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
  WHERE LENGTH(regexp_replace(text, '\s', '', 'g')) / GREATEST(LENGTH(text), 1) >= 0.8
    AND LEN(regexp_extract_all(text, '\S+')) >= 20
),
dedup AS (
  SELECT * FROM gated
  QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
),
quota AS (
  SELECT doc_id, source, n_tokens FROM dedup
  QUALIFY row_number() OVER (
    PARTITION BY source
    ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42'), doc_id
  ) <= 120
)
SELECT doc_id, source, n_tokens,
       CAST((SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens) // 2048 AS BIGINT) AS seq_id
FROM quota
""".strip(),
        "customers_without_orders": """
SELECT c_custkey, c_name, c_nationkey
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0
)
""".strip(),
        "quantiles_cont_events": """
SELECT CAST(0.1 AS DOUBLE) AS q, quantile_cont(value, 0.1) AS v FROM events
UNION ALL SELECT 0.25, quantile_cont(value, 0.25) FROM events
UNION ALL SELECT 0.5, quantile_cont(value, 0.5) FROM events
UNION ALL SELECT 0.75, quantile_cont(value, 0.75) FROM events
UNION ALL SELECT 0.9, quantile_cont(value, 0.9) FROM events
UNION ALL SELECT 0.99, quantile_cont(value, 0.99) FROM events
""".strip(),
        # width_bucket semantics spelled out (DuckDB has no width_bucket):
        # bin 0 below lo, nbins+1 at/above hi, else floor((x-lo)/(hi-lo)*n)+1
        "value_histogram_events": """
SELECT CAST(CASE WHEN value < 0.0 THEN 0
            WHEN value >= 100.0 THEN 21
            ELSE LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 100.0 * 20) AS BIGINT) + 1, 1), 20)
       END AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1
""".strip(),
        # late iff prev-arrival running max of ts exceeds ts by > lateness
        # (strictly); md5 arrival permutation simulates out-of-order delivery
        "late_arrivals_events": """
SELECT user_id, event_id,
       COALESCE(epoch_us(MAX(ts) OVER (
           PARTITION BY user_id
           ORDER BY md5(CAST(event_id AS VARCHAR) || ':1'), event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         - epoch_us(ts) > 604800000000, FALSE) AS late
FROM events
""".strip(),
        "event_type_paths": """
SELECT user_id, string_agg(event_type, '|' ORDER BY ts, event_id) AS path
FROM events GROUP BY user_id
""".strip(),
        # exact-decimal running sum: int64 cents on the Ray side matches
        # the DECIMAL(18,2) window regardless of accumulation order
        "running_sum_events": """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS run_sum
FROM events
""".strip(),
        # n-gram decontamination: word 3-grams via 1-indexed list slots;
        # range upper bound GREATEST(LEN-1, 1) yields LEN-2 grams (empty
        # when < 3 words), matching the Python rolling window exactly
        "contamination_ngram_docs": r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws FROM documents
),
g AS (
  SELECT doc_id, list_transform(range(1, GREATEST(LEN(ws) - 1, 1)),
                                i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS gs
  FROM w
),
bench AS (
  SELECT LIST(DISTINCT gg) AS bg
  FROM (
    SELECT unnest(g.gs) AS gg
    FROM g
    WHERE md5(CAST(g.doc_id AS VARCHAR) || ':13') < '051eb851'
  )
)
SELECT g.doc_id, LEN(list_intersect(g.gs, b.bg)) > 0 AS contaminated
FROM g CROSS JOIN bench b
""".strip(),
        # epoch-weighted upsampling: k = floor(f) + (md5key < hex(frac(f)));
        # 2.5 -> 2 + coin('80000000'), 0.25 -> 0 + coin('40000000')
        "repeat_mix_docs": """
WITH c AS (
  SELECT doc_id, source,
         CASE WHEN CAST(SUBSTR(source, 4) AS INT) % 2 = 0
              THEN 2 + CASE WHEN md5(CAST(doc_id AS VARCHAR) || ':11') < '80000000' THEN 1 ELSE 0 END
              ELSE 0 + CASE WHEN md5(CAST(doc_id AS VARCHAR) || ':11') < '40000000' THEN 1 ELSE 0 END
         END AS k
  FROM documents
)
SELECT doc_id, source, CAST(unnest(range(k)) AS BIGINT) AS rep_idx
FROM c
WHERE k > 0
""".strip(),
        # cumulative-band split: 0.90 -> 'e6666666', 0.95 -> 'f3333333'
        # (int(f * 16^8) zero-padded hex, same constants split_assign uses)
        "split_assign_docs": """
SELECT doc_id, source,
       CASE WHEN md5(CAST(doc_id AS VARCHAR) || ':42') < 'e6666666' THEN 'train'
            WHEN md5(CAST(doc_id AS VARCHAR) || ':42') < 'f3333333' THEN 'val'
            ELSE 'test' END AS split
FROM documents
""".strip(),
        # deterministic global shuffle rank: ROW_NUMBER under the seeded
        # md5 key (doc_id tiebreak), 0-based
        "shuffle_order_docs": """
SELECT doc_id, lang,
       CAST(row_number() OVER (
         ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42'), doc_id) - 1 AS BIGINT) AS pos
FROM documents
""".strip(),
        # benchmark set = chars [21, 60] (1-indexed substr) of the seeded 2%
        # sample (0.02 -> '051eb851'); a doc is contaminated iff its
        # lower-cased text contains ANY phrase as a plain substring
        "contamination_ac_docs": """
WITH bench AS (
  SELECT DISTINCT lower(substr(d.text, CAST(21 + 17*t.k AS INT), 24)) AS phrase
  FROM documents d, range(0, 8) t(k)
  WHERE md5(CAST(d.doc_id AS VARCHAR) || ':7') < '33333333'
    AND LENGTH(d.text) >= 44 + 17*t.k
)
SELECT d.doc_id,
       EXISTS (SELECT 1 FROM bench b WHERE contains(lower(d.text), b.phrase)) AS contaminated
FROM documents d
""".strip(),
        "contamination_ac_sharded_docs": """
WITH bench AS (
  SELECT DISTINCT lower(substr(d.text, CAST(21 + 17*t.k AS INT), 24)) AS phrase
  FROM documents d, range(0, 8) t(k)
  WHERE md5(CAST(d.doc_id AS VARCHAR) || ':7') < '33333333'
    AND LENGTH(d.text) >= 44 + 17*t.k
)
SELECT d.doc_id,
       EXISTS (SELECT 1 FROM bench b WHERE contains(lower(d.text), b.phrase)) AS contaminated
FROM documents d
""".strip(),
        "contamination_docs": """
WITH bench AS (
  SELECT DISTINCT lower(substr(text, 21, 40)) AS phrase
  FROM documents
  WHERE md5(CAST(doc_id AS VARCHAR) || ':7') < '051eb851'
    AND LENGTH(text) >= 60
)
SELECT d.doc_id,
       EXISTS (SELECT 1 FROM bench b WHERE contains(lower(d.text), b.phrase)) AS contaminated
FROM documents d
""".strip(),
        # deterministic md5-keyed sampling: VARCHAR '<' on zero-padded hex
        # is numeric compare, identical in Python and SQL
        "hash_sample_docs": """
SELECT doc_id, lang, source
FROM documents
WHERE md5(CAST(doc_id AS VARCHAR) || ':42') < '40000000'
""".strip(),
        # The composed continuous-ingest flow: exact-J pairs (same gram
        # predicate as jaccard_pairs_docs) -> the GREEDY survivor set in
        # processing order (batch = doc_id % 3, then doc_id) via a
        # single-row recursive CTE carrying the accepted set as a list
        # (greedy is inherently sequential: each decision depends on all
        # previous ones) -> GROUP BY lang over the survivors.
        "ingest_dedup_views_flow": """
WITH RECURSIVE
gs AS MATERIALIZED (
  SELECT doc_id, list_distinct(list_transform(range(1, GREATEST(LENGTH(text)-3, 2)), i -> substr(text, CAST(i AS INT), 5))) AS grams
  FROM documents
),
p0 AS MATERIALIZED (
  SELECT x.doc_id AS a, y.doc_id AS b,
         LEN(list_intersect(x.grams, y.grams)) AS inter,
         LEN(x.grams) AS na, LEN(y.grams) AS nb
  FROM gs x JOIN gs y
    ON x.doc_id < y.doc_id
   AND LEN(x.grams) >= 0.8 * LEN(y.grams)
   AND LEN(y.grams) >= 0.8 * LEN(x.grams)
),
pairs AS MATERIALIZED (SELECT a, b FROM p0 WHERE inter >= 0.8 * (na + nb - inter)),
nodes AS MATERIALIZED (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id % 3, doc_id) AS rnk
  FROM (SELECT a AS doc_id FROM pairs UNION SELECT b FROM pairs)
),
rp AS MATERIALIZED (
  SELECT LEAST(na.rnk, nb.rnk) AS rlo, GREATEST(na.rnk, nb.rnk) AS rhi
  FROM pairs p JOIN nodes na ON na.doc_id = p.a JOIN nodes nb ON nb.doc_id = p.b
),
g(i, acc) AS (
  SELECT 0, CAST([] AS BIGINT[])
  UNION ALL
  SELECT i + 1,
         CASE WHEN EXISTS (SELECT 1 FROM rp WHERE rp.rhi = i + 1 AND list_contains(acc, rp.rlo))
              THEN acc ELSE list_append(acc, i + 1) END
  FROM g WHERE i < (SELECT MAX(rnk) FROM nodes)
),
acc_final AS (SELECT acc FROM g ORDER BY i DESC LIMIT 1),
dropped AS (
  SELECT n.doc_id FROM nodes n, acc_final f WHERE NOT list_contains(f.acc, n.rnk)
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
GROUP BY lang
""".strip(),
        "rolling_sum_value_events": """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_sum
FROM events
""".strip(),
        "rolling_median_value_events": """
SELECT event_id, user_id,
       quantile_cont(value, 0.5) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rolling_median
FROM events
""".strip(),
        # streaming reservoir == one-shot A-ExpJ sample over the union
        # (global top-120 by the exponential key, no per-group partition)
        "streaming_reservoir_docs": """
SELECT doc_id, source, n_chars
FROM documents
QUALIFY row_number() OVER (
  ORDER BY -ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 13) AS BIGINT)
                + 0.5) / 4503599627370496.0) / n_chars,
           doc_id
) <= 120
""".strip(),
        # A-ExpJ weighted sampling: Exp(w) key from the md5 uniform; the k
        # smallest keys per group are a weighted sample w/o replacement.
        # (h + 0.5) / 2^52 is exact float64 on both sides (52-bit h).
        "weighted_sample_docs": """
SELECT doc_id, lang, source, n_chars
FROM documents
QUALIFY row_number() OVER (
  PARTITION BY lang
  ORDER BY -ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 13) AS BIGINT)
                + 0.5) / 4503599627370496.0) / n_chars,
           doc_id
) <= 40
""".strip(),
        "quota_sample_docs": """
SELECT doc_id, source
FROM documents
QUALIFY row_number() OVER (
  PARTITION BY source
  ORDER BY md5(CAST(doc_id AS VARCHAR) || ':42'), doc_id
) <= 120
""".strip(),
        # per-source admission rates: 0.5 -> '80000000', 0.125 -> '20000000'
        "mix_sources_docs": """
SELECT doc_id, source
FROM documents
WHERE md5(CAST(doc_id AS VARCHAR) || ':42') <
      CASE WHEN CAST(SUBSTR(source, 4) AS INT) % 2 = 0
           THEN '80000000' ELSE '20000000' END
""".strip(),
        # streaming-packing rule: seq_id = floor(tokens strictly before / cap)
        # under doc_id order — integer division keeps the oracle exact
        "pack_sequences_docs": r"""
WITH t AS (
  SELECT doc_id, CAST(LEN(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST((SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens) // 2048 AS BIGINT) AS seq_id
FROM t
""".strip(),
        # composed curation oracle: quality gate -> gram-Jaccard dedup over
        # the GATED corpus (recursive-CTE components, drop non-minimum
        # members) -> language id over the survivors
        "curation_flow": r"""
WITH RECURSIVE g0 AS (
  SELECT doc_id, text, LEN(regexp_extract_all(text, '\S+')) AS n_tokens
  FROM documents
  WHERE LENGTH(regexp_replace(text, '\s', '', 'g')) / GREATEST(LENGTH(text), 1) >= 0.8
    AND LEN(regexp_extract_all(text, '\S+')) >= 20
),
gs AS (
  SELECT doc_id, list_distinct(list_transform(range(1, GREATEST(LENGTH(text)-3, 2)), i -> substr(text, CAST(i AS INT), 5))) AS grams_s
  FROM g0
),
g AS (
  SELECT doc_id, list_transform(grams_s,
    s -> ((((ascii(substr(s,1,1))::BIGINT * 131 + ascii(substr(s,2,1))) * 131
           + ascii(substr(s,3,1))) * 131 + ascii(substr(s,4,1))) * 131 + ascii(substr(s,5,1)))) AS grams
  FROM gs
),
p0 AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         LEN(list_intersect(x.grams, y.grams)) AS inter,
         LEN(x.grams) AS na, LEN(y.grams) AS nb
  FROM g x JOIN g y
    ON x.doc_id < y.doc_id
   AND LEN(x.grams) >= 0.8 * LEN(y.grams)
   AND LEN(y.grams) >= 0.8 * LEN(x.grams)
),
pairs AS (SELECT a, b FROM p0 WHERE inter >= 0.8 * (na + nb - inter)),
e AS (SELECT a AS s, b AS d FROM pairs UNION ALL SELECT b, a FROM pairs),
r(s, d) AS (
  SELECT s, s FROM (SELECT DISTINCT s FROM e)
  UNION
  SELECT r.s, e.d FROM r JOIN e ON r.d = e.s
),
comp AS (SELECT s AS doc_id, MIN(d) AS dup_group FROM r GROUP BY s),
dropset AS (SELECT doc_id FROM comp WHERE dup_group <> doc_id),
kept AS (
  SELECT g0.doc_id, g0.text, g0.n_tokens FROM g0
  WHERE g0.doc_id NOT IN (SELECT doc_id FROM dropset)
),
w AS (
  SELECT doc_id, n_tokens, list_transform(regexp_extract_all(text, '[A-Za-z]+'), x -> lower(x)) AS ws
  FROM kept
),
s2 AS (
  SELECT doc_id, n_tokens, LEN(ws) AS n,
    LEN(list_filter(ws, x -> x IN ('the','and','of','to','a','in','is','that','it','for'))) AS h_en,
    LEN(list_filter(ws, x -> x IN ('der','die','das','und','ist','nicht','ein','mit','zu','auf'))) AS h_de,
    LEN(list_filter(ws, x -> x IN ('le','la','les','et','est','un','une','des','que','pour'))) AS h_fr,
    LEN(list_filter(ws, x -> x IN ('el','la','los','las','y','es','un','una','que','por'))) AS h_es
  FROM w
)
SELECT doc_id, n_tokens,
  CASE WHEN n = 0 OR (h_en = 0 AND h_de = 0 AND h_fr = 0 AND h_es = 0) THEN 'und'
       WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en'
       WHEN h_de >= h_fr AND h_de >= h_es THEN 'de'
       WHEN h_fr >= h_es THEN 'fr'
       ELSE 'es' END AS lang_pred
FROM s2
""".strip(),
        "length_histogram_docs": """
SELECT (n_chars // 100) * 100 AS bucket, COUNT(*) AS n_docs
FROM documents GROUP BY (n_chars // 100) * 100
""".strip(),
        "events_watermark_hourly": """
SELECT user_id, date_trunc('hour', ts) AS hour, COUNT(*) AS n_events
FROM events GROUP BY user_id, date_trunc('hour', ts)
""".strip(),
        "asof_join_events": """
SELECT l.event_id, l.user_id, l.ts, r.ts AS ts_signup
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type <> 'signup') l
ASOF JOIN (SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'signup') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
""".strip(),
        "range_join_events": """
SELECT s.user_id, s.ts AS anchor_ts, CAST(COUNT(*) AS BIGINT) AS n_events
FROM (SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'signup') s
JOIN (SELECT user_id, ts FROM events WHERE event_type <> 'signup') e
  ON e.user_id = s.user_id AND e.ts >= s.ts AND e.ts < s.ts + INTERVAL 1 HOUR
GROUP BY s.user_id, s.ts
""".strip(),
        "semi_join_events": """
SELECT event_id, event_type FROM events
WHERE event_type LIKE '%ck' OR event_type LIKE '%se'
""".strip(),
        "split_key_docs": """
SELECT doc_id, lang AS code, source AS exchange FROM documents
""".strip(),
        "storage_keys_events": """
SELECT event_id,
       'eodhd/events/' || strftime(ts, '%Y/%m/%d') || '/' ||
       CAST(user_id AS VARCHAR) || '/' || CAST(event_id AS VARCHAR) ||
       '.json.gz' AS obj_key
FROM events
""".strip(),
        "csv_roundtrip_events": "SELECT event_id, event_type FROM events",
        "similarity_topk": """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  ORDER BY vec_id LIMIT 3
),
s AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e
),
r AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
  FROM s
)
SELECT query_id, vec_id FROM r WHERE rn <= 10
""".strip(),
        # nprobe == n_lists probes every inverted list -> provably exact,
        # so the brute-force cross-join SQL is a valid oracle
        "ivf_topk_embeddings": """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  ORDER BY vec_id LIMIT 3
),
s AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e
),
r AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
  FROM s
)
SELECT query_id, vec_id FROM r WHERE rn <= 10
""".strip(),
        # the persisted-IVF-index variant searches the SAME full corpus
        # (build over 4/5 + extend with 1/5, nprobe=n_lists) -> same oracle
        "ivf_index_topk_embeddings": """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  ORDER BY vec_id LIMIT 3
),
s AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e
),
r AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
  FROM s
)
SELECT query_id, vec_id FROM r WHERE rn <= 10
""".strip(),
        # rebalance keeps nprobe==n_lists search exact, so the oracle is the
        # same brute-force cosine top-k, anchored at the LAST 3 vec_ids
        "ivf_rebalance_topk_embeddings": """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings
  ORDER BY vec_id DESC LIMIT 3
),
s AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q CROSS JOIN embeddings e
),
r AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
  FROM s
)
SELECT query_id, vec_id FROM r WHERE rn <= 10
""".strip(),
        "embedding_near_dups": """
WITH c AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000, embedding FROM embeddings
),
p AS (
  SELECT x.vec_id AS a, y.vec_id AS b,
         list_cosine_similarity(x.embedding, y.embedding) AS sim
  FROM c x JOIN c y ON x.vec_id < y.vec_id
)
SELECT a, b FROM p WHERE sim >= 0.999
""".strip(),
    }
