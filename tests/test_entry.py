"""Driver-contract smoke tests: entry(), queries() vs oracle_sql() keys."""

import sys

import pandas as pd
import pyarrow as pa

sys.path.insert(0, "/root/repo")

import __ray_entry__ as E

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows():
    ds = E.entry()
    assert ds.count() > 0
    names = set(ds.schema().names)
    assert {"conv_id", "turn_idx", "role", "text", "tool", "ts"} <= names


def test_oracle_keys_subset_of_queries():
    qs, osql = E.queries(), E.oracle_sql()
    assert set(osql) <= set(qs)
    # every maintenance + relational op has an oracle
    for name in ["maint_compact", "maint_zorder", "maint_merge", "q1_pricing_summary"]:
        assert name in osql


def test_maint_merge_matches_oracle_at_sf0001():
    import duckdb

    con = duckdb.connect()
    con.execute(f"create view events as select * from '{SF}/events.parquet'")
    oracle = con.sql(E.oracle_sql()["maint_merge"]).df()
    mine = E.queries()["maint_merge"](SF).to_pandas()
    key = ["conv_id", "turn_idx"]
    a = mine.sort_values(key).reset_index(drop=True)
    b = oracle.sort_values(key).reset_index(drop=True)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)], check_dtype=False)


def test_queries_run_at_sf0001_sample():
    qs = E.queries()
    for name in ["maint_compact", "topk_orders", "docs_stats_by_lang", "dedup_exact_docs"]:
        res = qs[name](SF)
        if isinstance(res, (pd.DataFrame, pa.Table)):
            assert len(res) > 0
        else:
            assert res.count() > 0
