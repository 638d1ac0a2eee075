"""Write–Audit–Publish (WAP) over the snapshot log + named refs.

The lakehouse pattern for gated ingestion: a writer STAGES a commit that
production readers cannot see, audits run against exactly the staged
state, and only a passing audit PUBLISHES it — a failing one aborts with
zero cleanup (Iceberg's ``wap.id`` / cherry-pick workflow, expressed over
this table's linear CoW history).

Mechanics on a linear history:

* ``stage_table`` appends normally (snapshot S), pins S with a
  ``wap-*`` ref (refs protect snapshots from expiry), then immediately
  rolls back to the pre-stage snapshot — current CONTENT never includes
  the unaudited rows, while S stays fully scannable by id.  Both commits
  are O(1) metadata (shard reuse); the data files are written once.
* ``audit_staged`` runs check callables against ``scan(snapshot_id=S)``
  — distributed Dataset pipelines, not driver loops.
* ``publish_staged`` rolls FORWARD to S's content (again O(1) shard
  reuse), after verifying no other writer advanced the table since the
  stage (the fast-forward precondition; concurrent changes would be
  silently erased by a blind publish).
* ``abort_staged`` just drops the ref — the orphaned snapshot ages out
  with normal snapshot expiry.

Built-in checks cover the three audits every ingestion gate needs:
row-delta bounds (metadata-only, O(1)), NOT NULL, and key uniqueness
(bucketed exchange, no driver materialization).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import pyarrow as pa


@dataclass(frozen=True)
class StagedCommit:
    """Handle returned by :func:`stage_table`; pass to audit/publish/abort."""

    staged_id: int
    base_id: int
    restored_id: int
    ref_name: str


def stage_table(table, data: pa.Table, tag: str = "wap", commit_ts: int | None = None) -> StagedCommit:
    base = table.current_snapshot_id()
    snap = table.append_table(data, operation="wap-stage", commit_ts=commit_ts)
    ref = f"wap-{snap.snapshot_id:06d}-{tag}"
    table.set_ref(ref, snap.snapshot_id)
    restored = table.rollback(base)
    return StagedCommit(
        staged_id=snap.snapshot_id,
        base_id=base,
        restored_id=restored.snapshot_id,
        ref_name=ref,
    )


def audit_staged(table, staged: StagedCommit, checks: list[Callable]) -> list[str]:
    """Run every check against the staged snapshot; return failure messages
    (empty list = audit passed).  A check is ``f(table, staged) -> str | None``."""
    failures = []
    for check in checks:
        msg = check(table, staged)
        if msg:
            failures.append(msg)
    return failures


def publish_staged(table, staged: StagedCommit):
    """Fast-forward the table to the staged content.  Refuses when another
    writer advanced the table after the stage (their rows are not in the
    staged manifest — a blind roll-forward would erase them)."""
    cur = table.current_snapshot_id()
    if cur != staged.restored_id:
        raise ValueError(
            f"table advanced since stage (s{staged.restored_id} -> s{cur}); "
            "re-stage on the new base"
        )
    snap = table.rollback(staged.staged_id)
    table.drop_ref(staged.ref_name)
    return snap


def abort_staged(table, staged: StagedCommit) -> None:
    table.drop_ref(staged.ref_name)


def write_audit_publish(
    table, data: pa.Table, checks: list[Callable], tag: str = "wap",
    commit_ts: int | None = None,
):
    """Composed gate: stage → audit → publish-or-abort.
    Returns ``(published_snapshot_or_None, failures)``."""
    staged = stage_table(table, data, tag=tag, commit_ts=commit_ts)
    failures = audit_staged(table, staged, checks)
    if failures:
        abort_staged(table, staged)
        return None, failures
    return publish_staged(table, staged), []


# ------------------------------------------------------------- branch stacking
@dataclass(frozen=True)
class StagedStack:
    """Ordered staged batches, each built on top of the previous staged
    state.  ``expected_current`` is the production snapshot the next
    publish fast-forwards from (the precondition)."""

    commits: tuple[StagedCommit, ...]
    expected_current: int


def stage_stack(
    table, batches: list[pa.Table], tag: str = "wap",
    commit_ts: int | None = None,
) -> StagedStack:
    """Stage several batches as a STACK: batch i is appended on top of
    batch i-1's staged snapshot (roll forward → append → roll back, all
    O(1) metadata commits; each data file is written once), so staged
    snapshot S_i contains batches 1..i.  Production content never
    includes any staged row — after every batch the table is rolled back
    to the pre-stage content.  Audits can then run per batch against the
    cumulative staged state, and a passing PREFIX can publish in order
    while a failing batch aborts itself and everything stacked on it."""
    base = table.current_snapshot_id()
    commits: list[StagedCommit] = []
    prev_top = base
    restore_point = base
    for i, data in enumerate(batches):
        if table.current_snapshot_id() != prev_top:
            table.rollback(prev_top)  # roll forward to the stack top
        snap = table.append_table(data, operation="wap-stage", commit_ts=commit_ts)
        ref = f"wap-{snap.snapshot_id:06d}-{tag}{i}"
        table.set_ref(ref, snap.snapshot_id)
        restored = table.rollback(restore_point)
        restore_point = restored.snapshot_id
        commits.append(
            StagedCommit(
                staged_id=snap.snapshot_id,
                base_id=prev_top,
                restored_id=restored.snapshot_id,
                ref_name=ref,
            )
        )
        prev_top = snap.snapshot_id
    return StagedStack(commits=tuple(commits), expected_current=restore_point)


def audit_stack(
    table, stack: StagedStack, checks: list[Callable]
) -> dict[int, list[str]]:
    """Audit each staged batch IN ORDER against its cumulative staged
    snapshot (S_i = base + batches 1..i, so e.g. key-uniqueness checks a
    batch against both the base AND the earlier staged batches).  Stops
    at the first failing batch — later batches are stacked on it and
    cannot publish anyway.  Returns ``{batch_index: failures}`` for
    audited batches; an all-empty dict of len(commits) means a clean
    stack."""
    results: dict[int, list[str]] = {}
    for i, staged in enumerate(stack.commits):
        failures = audit_staged(table, staged, checks)
        results[i] = failures
        if failures:
            break
    return results


def publish_stack(table, stack: StagedStack, upto: int | None = None):
    """Publish the first ``upto`` staged batches (default: all) with ONE
    O(1) roll-forward to S_upto — batches land in stage order by
    construction.  Same fast-forward precondition as
    :func:`publish_staged`.  Returns ``(snapshot, remaining_stack)``;
    the remaining suffix stays staged and publishable later (its staged
    snapshots already contain the published prefix)."""
    k = len(stack.commits) if upto is None else upto
    if not 1 <= k <= len(stack.commits):
        raise ValueError(f"upto={k} out of range 1..{len(stack.commits)}")
    cur = table.current_snapshot_id()
    if cur != stack.expected_current:
        raise ValueError(
            f"table advanced since stage (s{stack.expected_current} -> s{cur}); "
            "re-stage on the new base"
        )
    snap = table.rollback(stack.commits[k - 1].staged_id)
    for c in stack.commits[:k]:
        table.drop_ref(c.ref_name)
    return snap, StagedStack(
        commits=stack.commits[k:], expected_current=snap.snapshot_id
    )


def abort_stack_from(table, stack: StagedStack, index: int) -> StagedStack:
    """Abort staged batch ``index`` AND every batch stacked on top of it
    (their staged snapshots contain the aborted rows) by dropping their
    refs — the orphaned snapshots age out with snapshot expiry.  The
    surviving prefix remains staged and publishable."""
    for c in stack.commits[index:]:
        table.drop_ref(c.ref_name)
    return StagedStack(
        commits=stack.commits[:index], expected_current=stack.expected_current
    )


def write_audit_publish_stack(
    table, batches: list[pa.Table], checks: list[Callable], tag: str = "wap",
    commit_ts: int | None = None,
):
    """Composed stacked gate: stage every batch, audit in order, publish
    the passing prefix in ONE roll-forward, abort from the first failure.
    Returns ``(published_snapshot_or_None, failures_by_batch)``."""
    stack = stage_stack(table, batches, tag=tag, commit_ts=commit_ts)
    results = audit_stack(table, stack, checks)
    first_bad = next((i for i in sorted(results) if results[i]), None)
    failures = {i: f for i, f in results.items() if f}
    if first_bad is not None:
        stack = abort_stack_from(table, stack, first_bad)
        if not stack.commits:
            return None, failures
    snap, _ = publish_stack(table, stack)
    return snap, failures


# ------------------------------------------------------------------ checks
def check_row_delta(min_added: int = 1, max_added: int | None = None) -> Callable:
    """Metadata-only audit: rows added by the staged commit must fall in
    ``[min_added, max_added]`` — snapshot summaries, no scan."""

    def check(table, staged: StagedCommit) -> str | None:
        added = int(table.snapshot(staged.staged_id).summary["total_rows"]) - int(
            table.snapshot(staged.base_id).summary["total_rows"]
        )
        if added < min_added:
            return f"row-delta: added {added} < min {min_added}"
        if max_added is not None and added > max_added:
            return f"row-delta: added {added} > max {max_added}"
        return None

    return check


def check_not_null(col: str) -> Callable:
    """Distributed NOT NULL audit over the staged snapshot: per-block null
    counts, one tiny reduce."""

    def check(table, staged: StagedCommit) -> str | None:
        def nulls(b: pa.Table) -> pa.Table:
            return pa.table({"n": pa.array([b.column(col).null_count], pa.int64())})

        total = sum(
            r["n"]
            for r in table.scan(snapshot_id=staged.staged_id)
            .map_batches(nulls, batch_format="pyarrow")
            .take_all()  # one int per block — metadata-sized
        )
        return f"not-null({col}): {total} null rows" if total else None

    return check


def check_unique_key(cols: list[str], n_buckets: int = 64) -> Callable:
    """Distributed uniqueness audit: per-block (key, count) partials, one
    bucketed exchange, per-bucket duplicate detection — only per-bucket
    duplicate COUNTS reach the driver."""

    def check(table, staged: StagedCommit) -> str | None:
        from ..pipelines.relational import bucketed_groupby

        def partial(b: pa.Table) -> pa.Table:
            out = b.select(cols).group_by(cols).aggregate([([], "count_all")])
            return out.rename_columns([*cols, "cnt"])

        def dup_count(g: pa.Table) -> pa.Table:
            out = g.group_by(cols).aggregate([("cnt", "sum")])
            import pyarrow.compute as pc

            dups = pc.sum(
                pc.if_else(
                    pc.greater(out.column("cnt_sum"), pa.scalar(1, pa.int64())),
                    pa.scalar(1, pa.int64()),
                    pa.scalar(0, pa.int64()),
                )
            ).as_py()
            return pa.table({"dups": pa.array([dups or 0], pa.int64())})

        parts = table.scan(snapshot_id=staged.staged_id).map_batches(
            partial, batch_format="pyarrow"
        )
        total = sum(
            r["dups"]
            for r in bucketed_groupby(
                parts, cols, dup_count, n_buckets, group_format="pyarrow"
            ).take_all()
        )
        return f"unique({','.join(cols)}): {total} duplicated keys" if total else None

    return check
