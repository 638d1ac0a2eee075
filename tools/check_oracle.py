#!/usr/bin/env python
"""Driver-simulation harness: run every __ray_entry__.queries() entry and
compare against its oracle_sql() via DuckDB (row count, columns, values).

Usage: python tools/check_oracle.py [SF_DIR] [query ...]
Mirrors the graft driver's CORRECTNESS check; "EXACT" = bit-identical values.
"""
import os, sys, time, traceback
import duckdb, numpy as np, pandas as pd, pyarrow as pa
import ray
ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __ray_entry__ as E

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = sys.argv[2:] 
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"create view {t} as select * from '{SF}/{t}.parquet'")

def to_df(x):
    if isinstance(x, pd.DataFrame): return x
    if isinstance(x, pa.Table): return x.to_pandas()
    return x.to_pandas()  # ray Dataset

def canon(df):
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)

qs, osql = E.queries(), E.oracle_sql()
results = {}
for name, fn in qs.items():
    if only and name not in only: continue
    t0 = time.time()
    try:
        mine = canon(to_df(fn(SF)))
    except Exception as e:
        traceback.print_exc()
        results[name] = f"QUERY ERROR: {e}"; print(name, results[name], flush=True); continue
    dt = time.time()-t0
    if name not in osql:
        results[name] = f"rows={len(mine)} (no oracle) [{dt:.1f}s]"; print(f"{name:28s} {results[name]}", flush=True); continue
    try:
        oracle = canon(con.sql(osql[name]).df())
    except Exception as e:
        results[name] = f"ORACLE SQL ERROR: {e}"; print(f"{name:28s} {results[name]}", flush=True); continue
    status = []
    if len(mine) != len(oracle): status.append(f"ROWS {len(mine)} vs {len(oracle)}")
    if list(mine.columns) != list(oracle.columns): status.append(f"COLS {list(mine.columns)} vs {list(oracle.columns)}")
    if not status:
        exact = True; approx = True
        for c in mine.columns:
            a, b = mine[c], oracle[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                av, bv = a.astype(float).to_numpy(), b.astype(float).to_numpy()
                if not np.array_equal(av, bv, equal_nan=True): exact = False
                if not np.allclose(av, bv, rtol=1e-9, atol=1e-12, equal_nan=True): approx = False
            else:
                if not (a.astype(str).to_numpy() == b.astype(str).to_numpy()).all(): exact = False; approx = False
        status.append("EXACT" if exact else ("APPROX" if approx else "VALUE MISMATCH"))
        # dtype comparison note
        dt_mismatch = [(c, str(mine[c].dtype), str(oracle[c].dtype)) for c in mine.columns if str(mine[c].dtype) != str(oracle[c].dtype)]
        if dt_mismatch: status.append(f"dtypes{dt_mismatch}")
    results[name] = "; ".join(status) + f" [{dt:.1f}s]"
    print(f"{name:28s} {results[name]}", flush=True)
pass
ray.shutdown()
