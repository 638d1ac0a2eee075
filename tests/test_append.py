import os

import pyarrow as pa
import pytest
import ray.data as rd

from quanterra_pipeline_ray.schema import SchemaValidationError
from quanterra_pipeline_ray.stages.append import append_dataset
from quanterra_pipeline_ray.state.manifest import TranscriptTable
from quanterra_pipeline_ray.synth import content_fingerprint, generate_transcripts
from quanterra_pipeline_ray.util import pool_size


def test_append_dataset_distributed(tmp_path):
    root = str(tmp_path / "t")
    table = TranscriptTable.create(root)
    data = generate_transcripts(n_convs=50, seed=4, mean_turns=8, hot_convs=0)
    snap = append_dataset(table, rd.from_arrow(data), rows_per_file=100)
    assert snap.operation == "append"
    assert snap.summary["quarantined_rows"] == 0
    assert content_fingerprint(table.read_all()) == content_fingerprint(data)
    # multiple target-size files, each manifest-tracked with stats
    assert len(table.files()) >= data.num_rows // 100
    assert all("conv_id" in f.stats for f in table.files())


def test_append_quarantines_invalid_batches(tmp_path):
    root = str(tmp_path / "t")
    table = TranscriptTable.create(root)
    good = generate_transcripts(n_convs=10, seed=4, mean_turns=5, hot_convs=0)
    bad = pa.table({"wrong_col": [1, 2, 3]})
    ds = rd.from_arrow(good).union(rd.from_arrow(bad))
    snap = append_dataset(table, ds)
    assert snap.summary["quarantined_rows"] == 3
    assert table.read_all().num_rows == good.num_rows
    qdir = os.path.join(root, "quarantine")
    assert os.path.isdir(qdir) and len(os.listdir(qdir)) == 1


def test_append_on_invalid_raise(tmp_path):
    root = str(tmp_path / "t")
    table = TranscriptTable.create(root)
    bad = pa.table({"wrong_col": [1]})
    with pytest.raises(Exception):
        append_dataset(table, rd.from_arrow(bad), on_invalid="raise")


def test_pool_size_clamps():
    # fixture session has 4 CPUs
    assert pool_size(100) <= 3
    assert pool_size(100, pools_in_pipeline=2) <= 2
    assert pool_size(0) == 1
