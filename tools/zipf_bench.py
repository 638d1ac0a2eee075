"""Index-lifecycle bench on the Zipfian corpus — the official dedup/index
benchmark (VERDICT r4 #5).

The driver corpus's ~2k-shingle vocabulary is the similarity-join worst
case (every shingle common, pruning keeps nothing); real text is Zipfian.
This harness measures the persisted-index lifecycle — build / extend /
compact / probe — for BOTH index families on `synth.generate_zipf_documents`
at a configurable corpus size, and prints one JSON line per size.

Usage:
    python tools/zipf_bench.py [--docs 50000 ...] [--probe 1000] [--cpus 32]

Scratch under /dev/shm (falls back to /tmp)."""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_size(n_docs: int, probe_docs: int, scratch: str, dup_frac: float) -> dict:
    import numpy as np
    import pyarrow as pa
    import ray

    from quanterra_pipeline_ray.functions.jaccard_index import (
        build_jaccard_index,
        compact_jaccard_index,
        extend_jaccard_index,
        index_file_count,
        probe_jaccard_index,
    )
    from quanterra_pipeline_ray.functions.minhash_index import (
        build_minhash_index,
        compact_minhash_index,
        extend_minhash_index,
        probe_minhash_index,
    )
    from quanterra_pipeline_ray.synth import generate_zipf_documents

    ext_docs = max(probe_docs, n_docs // 50)
    corpus = generate_zipf_documents(n_docs + ext_docs + probe_docs, seed=42)
    base = corpus.slice(0, n_docs)
    ext = corpus.slice(n_docs, ext_docs)
    new = corpus.slice(n_docs + ext_docs, probe_docs)

    # Make a fraction of probe docs NEAR-DUPS of random base docs (append one
    # token: J = n/(n+1) shingles, well above 0.8) so the verify stage fires.
    n_dups = int(probe_docs * dup_frac)
    if n_dups:
        rng = np.random.default_rng(7)
        srcs = rng.choice(n_docs, size=n_dups, replace=False)
        texts = new.column("text").to_pylist()
        base_texts = base.column("text").take(pa.array(srcs)).to_pylist()
        for i, bt in enumerate(base_texts):
            texts[i] = bt + " zqdup"
        new = pa.table(
            {"doc_id": new.column("doc_id"), "text": pa.array(texts, type=pa.string())}
        )
    corpus_ds = ray.data.from_arrow(pa.concat_tables([base, ext, new]))

    out: dict = {
        "n_docs": n_docs,
        "ext_docs": ext_docs,
        "probe_docs": probe_docs,
        "planted_dups": n_dups,
    }

    for fam, build, extend, compact, probe in (
        (
            "jaccard",
            build_jaccard_index,
            extend_jaccard_index,
            compact_jaccard_index,
            lambda nd, d, c: probe_jaccard_index(nd, d, c, threshold=0.8),
        ),
        (
            "minhash",
            build_minhash_index,
            extend_minhash_index,
            compact_minhash_index,
            lambda nd, d, c: probe_minhash_index(nd, d, c, threshold=0.8),
        ),
    ):
        idx = os.path.join(scratch, f"{fam}_idx")
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.perf_counter()
        build(ray.data.from_arrow(base), idx)
        out[f"{fam}_build_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        extend(ray.data.from_arrow(ext), idx)
        out[f"{fam}_extend_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        compact(idx, min_files_per_bucket=2)
        out[f"{fam}_compact_s"] = round(time.perf_counter() - t0, 2)
        out[f"{fam}_files"] = index_file_count(idx)
        t0 = time.perf_counter()
        pairs = probe(ray.data.from_arrow(new), idx, corpus_ds)
        n_pairs = pairs.count()
        out[f"{fam}_probe_s"] = round(time.perf_counter() - t0, 2)
        out[f"{fam}_pairs"] = n_pairs
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, nargs="+", default=[50_000])
    ap.add_argument("--probe", type=int, default=1_000)
    ap.add_argument("--dup-frac", type=float, default=0.1)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    scratch_root = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    scratch = os.path.join(scratch_root, "zipf_bench")
    os.makedirs(scratch, exist_ok=True)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        for n in args.docs:
            res = run_size(n, args.probe, scratch, args.dup_frac)
            res["num_cpus"] = args.cpus
            print(json.dumps(res), flush=True)
    finally:
        ray.shutdown()
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
