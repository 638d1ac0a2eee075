"""Write–Audit–Publish gate (`stages/wap.py`)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from quanterra_pipeline_ray.state.manifest import TranscriptTable
from quanterra_pipeline_ray.stages.wap import (
    StagedCommit,
    abort_stack_from,
    abort_staged,
    audit_stack,
    audit_staged,
    check_not_null,
    check_row_delta,
    check_unique_key,
    publish_stack,
    publish_staged,
    stage_stack,
    stage_table,
    write_audit_publish,
    write_audit_publish_stack,
)
from quanterra_pipeline_ray.synth import content_fingerprint, generate_transcripts


def _batch(table, conv, n, null_at=None, dup=False):
    idx = np.arange(n, dtype=np.int32)
    if dup and n > 1:
        idx[1] = idx[0]
    conv_ids = [conv] * n
    if null_at is not None:
        conv_ids[null_at] = None
    t = pa.Table.from_pandas(
        pd.DataFrame(
            {
                "conv_id": conv_ids,
                "turn_idx": idx,
                "role": ["user"] * n,
                "text": [f"wap {i}" for i in range(n)],
                "tool": [""] * n,
                "ts": pd.to_datetime(["2024-07-01"] * n),
            }
        ),
        preserve_index=False,
    )
    return t.select(table.schema.names).cast(table.schema)


@pytest.fixture()
def table(tmp_path):
    t = TranscriptTable.create(str(tmp_path / "wap-table"))
    t.append_table(generate_transcripts(n_convs=20, seed=3))
    return t


def test_stage_is_invisible_and_scannable_by_id(table):
    base_fp = content_fingerprint(table.read_all())
    staged = stage_table(table, _batch(table, "cW", 3))
    # production content unchanged after staging
    assert content_fingerprint(table.read_all()) == base_fp
    # staged snapshot scannable by id, includes the new rows
    staged_rows = table.read_all(snapshot_id=staged.staged_id)
    assert staged_rows.num_rows == table.read_all().num_rows + 3
    # ref pins it
    assert table.ref(staged.ref_name) == staged.staged_id
    abort_staged(table, staged)
    assert staged.ref_name not in table.refs()


def test_publish_appends_and_abort_leaves_untouched(table):
    checks = [check_row_delta(1), check_not_null("conv_id"),
              check_unique_key(["conv_id", "turn_idx"])]
    snap, fails = write_audit_publish(table, _batch(table, "cBAD", 3, dup=True), checks)
    assert snap is None and any("unique" in f for f in fails)
    snap, fails = write_audit_publish(
        table, _batch(table, "cBAD2", 3, null_at=2), checks
    )
    assert snap is None and any("not-null" in f for f in fails)
    before = table.read_all().num_rows
    snap, fails = write_audit_publish(table, _batch(table, "cGOOD", 4), checks)
    assert snap is not None and not fails
    after = table.read_all()
    assert after.num_rows == before + 4
    assert after.filter(
        pa.compute.equal(after.column("conv_id"), "cGOOD")
    ).num_rows == 4


def test_publish_refuses_after_concurrent_advance(table):
    staged = stage_table(table, _batch(table, "cW", 2))
    # another writer advances the table between stage and publish
    table.append_table(_batch(table, "cOTHER", 1))
    with pytest.raises(ValueError, match="advanced since stage"):
        publish_staged(table, staged)
    # re-staging on the new base succeeds
    staged2 = stage_table(table, _batch(table, "cW", 2))
    assert publish_staged(table, staged2) is not None


def test_stack_stage_invisible_then_publish_all_in_order(table):
    base_fp = content_fingerprint(table.read_all())
    base_rows = table.read_all().num_rows
    stack = stage_stack(
        table, [_batch(table, f"cS{i}", i + 1) for i in range(3)]
    )
    # production content untouched through the whole staging sequence
    assert content_fingerprint(table.read_all()) == base_fp
    # staged snapshots are cumulative: S_i = base + batches 0..i
    for i, c in enumerate(stack.commits):
        want = base_rows + sum(j + 1 for j in range(i + 1))
        assert table.read_all(snapshot_id=c.staged_id).num_rows == want
    results = audit_stack(
        table, stack,
        [check_row_delta(1), check_not_null("conv_id"),
         check_unique_key(["conv_id", "turn_idx"])],
    )
    assert list(results) == [0, 1, 2] and not any(results.values())
    snap, rest = publish_stack(table, stack)
    assert not rest.commits
    after = table.read_all()
    assert after.num_rows == base_rows + 6
    assert all(c.ref_name not in table.refs() for c in stack.commits)


def test_stack_middle_failure_publishes_prefix_only(table):
    base_rows = table.read_all().num_rows
    checks = [check_row_delta(1), check_not_null("conv_id"),
              check_unique_key(["conv_id", "turn_idx"])]
    batches = [
        _batch(table, "cOK", 3),
        _batch(table, "cBAD", 3, dup=True),
        _batch(table, "cLATER", 2),  # stacked on the bad batch
    ]
    snap, failures = write_audit_publish_stack(table, batches, checks)
    assert snap is not None
    assert list(failures) == [1] and any("unique" in f for f in failures[1])
    after = table.read_all()
    assert after.num_rows == base_rows + 3  # only the passing prefix
    assert after.filter(
        pa.compute.equal(after.column("conv_id"), "cLATER")
    ).num_rows == 0
    # no wap refs left behind
    assert not [r for r in table.refs() if r.startswith("wap-")]


def test_stack_partial_publish_then_rest(table):
    base_rows = table.read_all().num_rows
    stack = stage_stack(
        table, [_batch(table, f"cP{i}", 2) for i in range(3)]
    )
    snap1, rest = publish_stack(table, stack, upto=1)
    assert table.read_all().num_rows == base_rows + 2
    assert len(rest.commits) == 2
    snap2, rest2 = publish_stack(table, rest)
    assert not rest2.commits
    assert table.read_all().num_rows == base_rows + 6


def test_stack_publish_refuses_after_concurrent_advance(table):
    stack = stage_stack(table, [_batch(table, "cW", 2)])
    table.append_table(_batch(table, "cOTHER", 1))
    with pytest.raises(ValueError, match="advanced since stage"):
        publish_stack(table, stack)


def test_stack_abort_from_keeps_prefix_publishable(table):
    base_rows = table.read_all().num_rows
    stack = stage_stack(
        table, [_batch(table, f"cA{i}", 2) for i in range(3)]
    )
    kept = abort_stack_from(table, stack, 1)
    assert len(kept.commits) == 1
    assert not any(
        c.ref_name in table.refs() for c in stack.commits[1:]
    )
    snap, rest = publish_stack(table, kept)
    assert not rest.commits
    assert table.read_all().num_rows == base_rows + 2


def test_row_delta_bounds(table):
    staged = stage_table(table, _batch(table, "cW", 5))
    assert audit_staged(table, staged, [check_row_delta(1, 10)]) == []
    assert audit_staged(table, staged, [check_row_delta(6)]) != []
    assert audit_staged(table, staged, [check_row_delta(1, 4)]) != []
    abort_staged(table, staged)
