import os

import pyarrow as pa
import pytest

from quanterra_pipeline_ray.state.catalog import Catalog, TransactionConflict
from quanterra_pipeline_ray.synth import content_fingerprint, fragment_table, generate_transcripts


def _fill(table, n_convs=12, seed=3, n_files=4):
    data = generate_transcripts(n_convs=n_convs, seed=seed, hot_convs=0)
    table.register_fragments(
        fragment_table(data, os.path.join(table.root, "data", "frags"), n_files)
    )
    return data


def test_catalog_create_tables_and_pinned_scan(tmp_path):
    cat = Catalog.create(str(tmp_path / "cat"))
    a = cat.create_table("a")
    b = cat.create_table("b")
    da = _fill(a, seed=1)
    db = _fill(b, seed=2)
    # table-level snapshots moved, but the catalog still pins the EMPTY ones
    assert cat.read_all("a").num_rows == 0
    txn = cat.transaction()
    txn.table("a")
    txn.table("b")
    txn.commit()
    assert content_fingerprint(cat.read_all("a")) == content_fingerprint(da)
    assert content_fingerprint(cat.read_all("b")) == content_fingerprint(db)
    assert cat.table_names() == ["a", "b"]
    with pytest.raises(ValueError):
        cat.create_table("a")


def test_transaction_moves_tables_atomically(tmp_path):
    """Move conversations from A to B: catalog readers see each conversation
    in exactly one table at EVERY catalog version (no intermediate state)."""
    from quanterra_pipeline_ray.stages.delete import delete_where
    from quanterra_pipeline_ray.stages.merge import merge_into

    cat = Catalog.create(str(tmp_path / "cat"))
    a, b = cat.create_table("a"), cat.create_table("b")
    da = _fill(a, seed=5)
    _fill(b, seed=6)
    txn0 = cat.transaction()
    txn0.table("a"), txn0.table("b")
    txn0.commit()
    v_before = cat.current_version()
    rows_before = cat.read_all("a").num_rows + cat.read_all("b").num_rows

    convs = sorted(set(da.column("conv_id").to_pylist()))[:3]
    moved = da.filter(pa.compute.is_in(da.column("conv_id"), value_set=pa.array(convs)))

    txn = cat.transaction()
    merge_into(txn.table("b"), moved)
    delete_where(txn.table("a"), lambda df: df["conv_id"].isin(convs))
    v_after = txn.commit()

    # old version: conversations still (only) in a
    assert set(cat.read_all("a", version=v_before).column("conv_id").to_pylist()) >= set(convs)
    assert not set(cat.read_all("b", version=v_before).column("conv_id").to_pylist()) & set(convs)
    # new version: moved wholesale, with total row count conserved
    assert not set(cat.read_all("a", version=v_after).column("conv_id").to_pylist()) & set(convs)
    assert set(cat.read_all("b", version=v_after).column("conv_id").to_pylist()) >= set(convs)
    assert (
        cat.read_all("a", v_after).num_rows + cat.read_all("b", v_after).num_rows
        == rows_before
    )


def test_uncommitted_transaction_invisible(tmp_path):
    """A transaction that never commits (crash analog) leaves catalog reads
    untouched even though table-level snapshots advanced."""
    from quanterra_pipeline_ray.stages.merge import merge_into

    cat = Catalog.create(str(tmp_path / "cat"))
    a = cat.create_table("a")
    da = _fill(a, seed=7)
    txn0 = cat.transaction()
    txn0.table("a")
    txn0.commit()

    txn = cat.transaction()
    upd = da.slice(0, 4)
    merge_into(txn.table("a"), upd)  # table snapshot moves...
    # ...but no txn.commit(): the catalog pin is unchanged
    assert content_fingerprint(cat.read_all("a")) == content_fingerprint(da)
    assert cat.table("a").current_snapshot_id() > cat.pins()["a"]


def test_conflicting_transactions_surface(tmp_path):
    """Two transactions touching the SAME table: the second to commit gets a
    TransactionConflict; disjoint tables merge cleanly."""
    from quanterra_pipeline_ray.stages.merge import merge_into

    cat = Catalog.create(str(tmp_path / "cat"))
    a, b = cat.create_table("a"), cat.create_table("b")
    da, db = _fill(a, seed=8), _fill(b, seed=9)
    t0 = cat.transaction()
    t0.table("a"), t0.table("b")
    t0.commit()

    # disjoint: txn1 touches a, txn2 touches b — both land
    txn1, txn2 = cat.transaction(), cat.transaction()
    merge_into(txn1.table("a"), da.slice(0, 2))
    merge_into(txn2.table("b"), db.slice(0, 2))
    txn1.commit()
    txn2.commit()  # merges txn1's newer pin for a, no conflict

    # same table: txn3 and txn4 both touch a
    txn3, txn4 = cat.transaction(), cat.transaction()
    merge_into(txn3.table("a"), da.slice(2, 2))
    txn4.table("a")
    txn3.commit()
    with pytest.raises(TransactionConflict):
        txn4.commit()


def test_catalog_version_history(tmp_path):
    cat = Catalog.create(str(tmp_path / "cat"))
    cat.create_table("a")
    h = cat.history()
    assert h[0]["summary"]["op"] == "create"
    assert h[-1]["summary"]["op"] == "create_table"
    assert [d["version"] for d in h] == list(range(len(h)))
