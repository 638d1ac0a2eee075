#!/usr/bin/env python
"""Benchmark harness.

Headline: maintenance throughput (turns/sec) for compaction + Z-order +
MERGE over a deterministic synthetic transcripts table (fragmented small
files), per BASELINE.json.  Also times the relational / training-data
queries over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling`` runs the headline pipeline in two fresh processes at
num_cpus=8 and num_cpus=32 on the same input and reports throughput at both
plus scaling efficiency (the sandbox evidence protocol for the north rule's
N -> 4N criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_ROOT = "/tmp/qpr_bench"

# headline workload shape: ~0.5M turns in 256 small fragments, skewed convs
N_CONVS = int(os.environ.get("QPR_BENCH_CONVS", "30000"))
N_FILES = int(os.environ.get("QPR_BENCH_FILES", "256"))


def _headline() -> dict:
    import pyarrow as pa

    from quanterra_pipeline_ray.pipelines.maintenance import (
        build_fragmented_table,
        default_merge_source,
        run_maintenance,
    )

    root = os.path.join(BENCH_ROOT, f"table-{NUM_CPUS}")
    t_gen = time.monotonic()
    table, data = build_fragmented_table(
        root, n_convs=N_CONVS, seed=42, mean_turns=16, n_files=N_FILES, hot_convs=3, hot_turns=2000
    )
    source = default_merge_source(data, update_every=20)
    gen_s = time.monotonic() - t_gen

    t0 = time.monotonic()
    rep = run_maintenance(
        table,
        merge_source=source,
        target_bytes=64 * 1024 * 1024,
        target_rows=250_000,
    )
    wall = time.monotonic() - t0
    return {
        "headline_sec": round(wall, 3),
        "rows": rep.rows,
        "turns_per_sec": round(rep.rows / wall, 1),
        "stage_sec": {k: round(v, 3) for k, v in rep.timings_s.items()},
        "gen_sec_untimed": round(gen_s, 3),
        "files": rep.files,
    }


def _queries() -> dict:
    import __ray_entry__ as entrymod

    wanted = [
        "maint_compact",
        "maint_merge",
        "q1_pricing_summary",
        "orders_per_nation",
        "lineitems_per_region",
        "topk_orders",
        "events_hourly",
        "events_sessions",
        "docs_stats_by_lang",
        "dedup_exact_docs",
        "text_stats_docs",
        "fingerprint_docs",
        "minhash_dedup_docs",
        "similarity_topk",
    ]
    qs = entrymod.queries()
    out = {}
    for name in wanted:
        t0 = time.monotonic()
        try:
            res = qs[name](SF_DIR)
            # force execution for lazy Datasets
            if hasattr(res, "count") and not hasattr(res, "columns"):
                res.count()
            out[name] = round(time.monotonic() - t0, 3)
        except Exception as exc:  # pragma: no cover
            out[name] = f"ERROR: {exc}"
    return out


def run_once(include_queries: bool = True) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    head = _headline()
    queries = _queries() if include_queries else {}
    result = {
        "metric": "maintenance throughput (compact+zorder+merge), turns/sec",
        "value": head["headline_sec"],
        "unit": "sec",
        "turns_per_sec": head["turns_per_sec"],
        "rows": head["rows"],
        "stage_sec": head["stage_sec"],
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same headline job, fresh processes at 8 and 32 CPUs, same input."""
    results = {}
    for ncpu in (8, 32):
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            QPR_BENCH_HEADLINE_ONLY="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        results[ncpu] = json.loads(out.strip().splitlines()[-1])
    tput8 = results[8]["turns_per_sec"]
    tput32 = results[32]["turns_per_sec"]
    eff = (tput32 / tput8) / (32 / 8)
    return {
        "metric": "scaling efficiency (num_cpus 8 -> 32)",
        "turns_per_sec_8": tput8,
        "turns_per_sec_32": tput32,
        "sec_8": results[8]["value"],
        "sec_32": results[32]["value"],
        "scaling_efficiency": round(eff, 3),
        "rows": results[32]["rows"],
        "criterion": "efficiency >= 0.8 from N to 4N",
    }


if __name__ == "__main__":
    shutil.rmtree(BENCH_ROOT, ignore_errors=True)
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        include_queries = os.environ.get("QPR_BENCH_HEADLINE_ONLY") != "1"
        print(json.dumps(run_once(include_queries=include_queries)))
