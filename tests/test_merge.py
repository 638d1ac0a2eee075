import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from quanterra_pipeline_ray.schema import TRANSCRIPTS_SCHEMA
from quanterra_pipeline_ray.state.manifest import DataFile, TranscriptTable
from quanterra_pipeline_ray.stages.merge import merge_into, prune_touched_files
from quanterra_pipeline_ray.synth import content_fingerprint, fragment_table, generate_transcripts


def _make(tmp_path, n_files=6, **gen):
    root = str(tmp_path / "t")
    table = TranscriptTable.create(root)
    data = generate_transcripts(
        **{"n_convs": 25, "seed": 11, "mean_turns": 8, "hot_convs": 1, "hot_turns": 60, **gen}
    )
    paths = fragment_table(data, os.path.join(root, "data", "frags"), n_files)
    table.register_fragments(paths)
    return table, data


def _source_from(data: pa.Table, update_every=5, new_conv="conv-new-x", deletes=0) -> pa.Table:
    df = data.to_pandas()
    upd = df.iloc[::update_every].copy()
    upd["text"] = "UPDATED " + upd["text"]
    upd["__op"] = "upsert"
    new = pd.DataFrame(
        {
            "conv_id": [new_conv] * 3,
            "turn_idx": np.array([0, 1, 2], dtype=np.int32),
            "role": ["user", "assistant", "user"],
            "text": ["hello", "hi there", "bye"],
            "tool": ["", "", ""],
            "ts": pd.to_datetime([1, 2, 3], unit="s").astype("datetime64[us]"),
            "__op": ["upsert"] * 3,
        }
    )
    parts = [upd, new]
    if deletes:
        dele = df.iloc[1 :: len(df) // deletes].head(deletes).copy()
        dele = dele[~dele.set_index(["conv_id", "turn_idx"]).index.isin(
            upd.set_index(["conv_id", "turn_idx"]).index
        )]
        dele["__op"] = "delete"
        parts.append(dele)
    return pa.Table.from_pandas(pd.concat(parts, ignore_index=True), preserve_index=False)


def _expected(data: pa.Table, source: pa.Table) -> pd.DataFrame:
    tgt = data.to_pandas()
    src = source.to_pandas().drop_duplicates(["conv_id", "turn_idx"], keep="last")
    tgt = tgt.merge(src[["conv_id", "turn_idx"]], on=["conv_id", "turn_idx"], how="left", indicator=True)
    tgt = tgt[tgt.pop("_merge") == "left_only"]
    ins = src[src["__op"] != "delete"].drop(columns="__op")
    out = pd.concat([tgt, ins], ignore_index=True).sort_values(["conv_id", "turn_idx"])
    return out.reset_index(drop=True)


def _got(table: TranscriptTable) -> pd.DataFrame:
    return (
        table.read_all().to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )


@pytest.mark.parametrize("threshold", [200_000, 0], ids=["broadcast", "shuffle"])
def test_merge_upsert_insert_delete(tmp_path, threshold):
    table, data = _make(tmp_path)
    source = _source_from(data, deletes=4)
    snap = merge_into(table, source, broadcast_threshold=threshold, target_rows=1000)
    assert snap.operation == "merge"
    exp = _expected(data, source)
    got = _got(table)
    pd.testing.assert_frame_equal(
        got, exp, check_dtype=False, check_like=True
    )
    # text updated where source matched
    joined = got.merge(
        source.to_pandas()[["conv_id", "turn_idx", "__op"]], on=["conv_id", "turn_idx"], how="inner"
    )
    assert (joined[joined["__op"] == "upsert"].merge(got, on=["conv_id", "turn_idx"]))[
        "text_y"
    ].str.startswith(("UPDATED", "h", "b")).all()


def test_merge_partition_pruning(tmp_path):
    table, data = _make(tmp_path)
    files = table.files()
    # source touching exactly one conversation
    one_conv = data.to_pandas()["conv_id"].iloc[0]
    src_df = data.to_pandas()
    src_df = src_df[src_df["conv_id"] == one_conv].head(2).copy()
    src_df["text"] = "X " + src_df["text"]
    source = pa.Table.from_pandas(src_df, preserve_index=False)
    touched = prune_touched_files(files, np.array([one_conv], dtype=object))
    assert 0 < len(touched) <= len(files)
    snap = merge_into(table, source)
    # untouched files carried forward byte-identical into the new snapshot
    new_paths = {f.path for f in table.files()}
    untouched = [f.path for f in files if f not in touched]
    assert set(untouched) <= new_paths
    exp = _expected(data, source.append_column("__op", pa.array(["upsert"] * source.num_rows)))
    pd.testing.assert_frame_equal(_got(table), exp, check_dtype=False, check_like=True)


def test_merge_duplicate_source_keys_deterministic(tmp_path):
    table, data = _make(tmp_path)
    df = data.to_pandas().head(1)
    dup = pd.concat([df, df], ignore_index=True)
    dup["text"] = ["first write", "second write"]
    dup["ts"] = pd.to_datetime([100, 200], unit="s").astype("datetime64[us]")
    source = pa.Table.from_pandas(dup, preserve_index=False)
    merge_into(table, source)
    got = _got(table)
    row = got.merge(df[["conv_id", "turn_idx"]], on=["conv_id", "turn_idx"])
    assert row["text"].tolist() == ["second write"]  # max ts wins


def test_merge_empty_source_is_noop_scan(tmp_path):
    table, data = _make(tmp_path)
    before = content_fingerprint(table.read_all())
    source = TRANSCRIPTS_SCHEMA.empty_table()
    merge_into(table, source)
    assert content_fingerprint(table.read_all()) == before


def test_prune_no_stats_means_touched():
    f = DataFile(path="data/x.parquet", rows=1, bytes=1, checksum="c", stats={})
    assert prune_touched_files([f], np.array(["k"], dtype=object)) == [f]


def test_merge_checkpoint_op_id_captures_source_content(tmp_path):
    """Two different sources with equal row counts must not share checkpoints."""
    from quanterra_pipeline_ray.stages.merge import _source_token
    import ray.data as rd

    table, data = _make(tmp_path)
    src_a = _source_from(data, update_every=5)
    df_b = src_a.to_pandas()
    df_b["ts"] = df_b["ts"] + pd.Timedelta(seconds=1)
    src_b = pa.Table.from_pandas(df_b, preserve_index=False)
    assert src_a.num_rows == src_b.num_rows
    assert _source_token(src_a) != _source_token(src_b)
    # Dataset form: deterministic and content-sensitive too (block-order
    # independent wrap-add; algorithm differs from the Table fast path)
    assert _source_token(rd.from_arrow(src_a)) == _source_token(rd.from_arrow(src_a))
    assert _source_token(rd.from_arrow(src_a)) != _source_token(rd.from_arrow(src_b))


def test_merge_shuffle_accepts_ray_dataset_source(tmp_path):
    """Regression: Dataset source above the broadcast threshold must complete
    (the shuffle-plan summary previously read source.num_rows and crashed)."""
    import ray.data as rd

    table, data = _make(tmp_path)
    src = _source_from(data, update_every=4)
    snap = merge_into(table, rd.from_arrow(src), target_rows=10_000, broadcast_threshold=0)
    assert snap.summary["plan"] == "shuffle"
    assert snap.summary["source_rows"] == src.num_rows
    got = table.read_all()
    assert got.num_rows > 0


def test_merge_exchange_plans_identical_content(tmp_path):
    """Direct map-reduce exchange == Ray Data sort exchange, row for row
    (same bucket hash, same resolver kernel), including deletes."""
    table_a, data = _make(tmp_path, n_files=6)
    src = _source_from(data, update_every=4, deletes=5)
    snap_a = merge_into(
        table_a, src, target_rows=10_000, broadcast_threshold=0, exchange="direct"
    )
    assert snap_a.summary["plan"] == "shuffle"

    root_b = str(tmp_path / "t_sort")
    table_b = TranscriptTable.create(root_b)
    paths = fragment_table(data, os.path.join(root_b, "data", "frags"), 6)
    table_b.register_fragments(paths)
    snap_b = merge_into(
        table_b, src, target_rows=10_000, broadcast_threshold=0, exchange="sort"
    )
    assert content_fingerprint(table_a.read_all()) == content_fingerprint(table_b.read_all())
    # resolved rows equal the reference last-writer-wins semantics
    got = (
        table_a.read_all()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = _expected(data, src)
    assert got["text"].tolist() == exp["text"].tolist()


def test_merge_direct_exchange_dataset_source(tmp_path):
    """Dataset sources flow through the direct exchange via their own block
    refs (no driver materialization)."""
    import ray.data as rd

    table, data = _make(tmp_path)
    src = _source_from(data, update_every=4)
    snap = merge_into(
        table, rd.from_arrow(src), target_rows=10_000, broadcast_threshold=0, exchange="direct"
    )
    assert snap.summary["plan"] == "shuffle"
    exp = _expected(data, src)
    got = (
        table.read_all().to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert got["text"].tolist() == exp["text"].tolist()


def test_merge_direct_exchange_resumes_after_bucket_failure(tmp_path):
    """Crash mid-exchange: one bucket's reduce raises; the retry must skip
    completed buckets (checkpoint records) and converge to the clean-run
    state."""
    from quanterra_pipeline_ray.stages import merge as mergemod

    table_clean, data = _make(tmp_path, n_files=6)
    src = _source_from(data, update_every=4)
    merge_into(table_clean, src, target_rows=10_000, broadcast_threshold=0, exchange="direct")
    want = content_fingerprint(table_clean.read_all())

    root_b = str(tmp_path / "t_crash")
    table = TranscriptTable.create(root_b)
    paths = fragment_table(data, os.path.join(root_b, "data", "frags"), 6)
    table.register_fragments(paths)

    orig_factory = mergemod._make_bucket_resolver

    def failing_factory(*a, **kw):
        resolver = orig_factory(*a, **kw)

        def failing_resolver(group):
            bucket = int(group.column("__bucket")[0].as_py())
            if bucket == 1:
                raise RuntimeError("injected bucket failure")
            return resolver(group)

        return failing_resolver

    mergemod._make_bucket_resolver = failing_factory
    try:
        with pytest.raises(Exception):
            merge_into(table, src, target_rows=10_000, broadcast_threshold=0, exchange="direct")
    finally:
        mergemod._make_bucket_resolver = orig_factory

    # retry with the SAME source: completed buckets' checkpoints are reused,
    # the failed bucket re-runs, and the table converges
    snap = merge_into(table, src, target_rows=10_000, broadcast_threshold=0, exchange="direct")
    assert snap.summary["plan"] == "shuffle"
    assert content_fingerprint(table.read_all()) == want


def test_run_op_protocol_drives_compaction(tmp_path):
    from quanterra_pipeline_ray.stages.compaction import CompactionOp
    from quanterra_pipeline_ray.stages.protocol import MaintenanceOp, run_op

    table, data = _make(tmp_path)
    op = CompactionOp(target_bytes=1 << 20)
    assert isinstance(op, MaintenanceOp)
    before = content_fingerprint(table.read_all())
    snap = run_op(op, table)
    assert snap.operation == "compact"
    assert content_fingerprint(table.read_all()) == before


def test_delete_where_prunes_and_deletes(tmp_path):
    from quanterra_pipeline_ray.stages.delete import delete_where
    from quanterra_pipeline_ray.synth import content_fingerprint

    table, data = _make(tmp_path)
    df = data.to_pandas()
    snap = delete_where(table, lambda b: b["turn_idx"] >= 10)
    exp = df[df["turn_idx"] < 10]
    got = table.read_all().to_pandas()
    assert len(got) == len(exp)
    assert content_fingerprint(table.read_all()) == content_fingerprint(
        pa.Table.from_pandas(exp.reset_index(drop=True), preserve_index=False)
    )
    # snapshot isolation: the pre-delete snapshot still reads everything
    assert table.scan(snap.parent_id).count() == len(df)
