"""Manifest metadata-scaling microbench (driver-only, no Ray).

Measures commit-path metadata I/O on a table whose manifest holds N
synthetic file entries (no data bytes — this isolates the metadata layer):

* append of 10 files        (the steady-state ingest commit)
* removal of 10 files       (a small DELETE/compaction commit)
* metadata-only commit      (schema evolution / rollback)

For each, reports wall time and bytes of manifest metadata written, for
the sharded layout (current) vs the legacy single-doc rewrite (simulated
as one JSON of all entries — what every commit paid before sharding).

Usage: python tools/manifest_bench.py [N_FILES=100000]
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from quanterra_pipeline_ray.state.manifest import (  # noqa: E402
    DataFile,
    TranscriptTable,
)


def synth_entries(n: int) -> list[DataFile]:
    import hashlib

    out = []
    for i in range(n):
        sha = hashlib.sha256(str(i).encode()).hexdigest()
        out.append(
            DataFile(
                path=f"data/part-{sha[:20]}.parquet",
                rows=200_000,
                bytes=128 << 20,
                checksum=sha,
                stats={
                    "conv_id": [f"c{i*37%997:06d}", f"c{(i*37%997)+5:06d}"],
                    "ts": ["2024-01-01T00:00:00", "2024-06-30T23:59:59"],
                    "conv_kmv": "A" * 344,  # typical base64 sketch payload
                },
            )
        )
    return out


def dir_bytes(root: str, sub: str) -> int:
    total = 0
    d = os.path.join(root, sub)
    for name in os.listdir(d):
        total += os.path.getsize(os.path.join(d, name))
    return total


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    root = "/tmp/qpr_manifest_bench"
    shutil.rmtree(root, ignore_errors=True)
    table = TranscriptTable.create(root)
    entries = synth_entries(n)

    t0 = time.perf_counter()
    table.commit(entries, operation="bulk")
    bulk_s = time.perf_counter() - t0
    base_manifest_bytes = dir_bytes(root, "manifests")
    legacy_doc_bytes = len(
        json.dumps({"files": [f.to_json() for f in entries]}, sort_keys=True)
    )

    results = {"n_files": n, "bulk_commit_s": round(bulk_s, 3),
               "n_shards": len(table.manifest_paths()) - 1,
               "legacy_manifest_doc_bytes": legacy_doc_bytes}

    # steady-state append of 10 files
    extra = synth_entries(n + 10)[-10:]
    before = dir_bytes(root, "manifests")
    t0 = time.perf_counter()
    table.commit(extra, operation="append")
    results["append10_s"] = round(time.perf_counter() - t0, 4)
    results["append10_meta_bytes"] = dir_bytes(root, "manifests") - before

    # removal of 10 files (scattered)
    victims = [entries[i * (n // 10)].path for i in range(10)]
    before = dir_bytes(root, "manifests")
    t0 = time.perf_counter()
    table.commit([], removed_paths=victims, operation="delete")
    results["remove10_s"] = round(time.perf_counter() - t0, 4)
    results["remove10_meta_bytes"] = dir_bytes(root, "manifests") - before

    # metadata-only commit (rollback)
    before = dir_bytes(root, "manifests")
    t0 = time.perf_counter()
    table.rollback(table.current_snapshot_id() - 1)
    results["rollback_s"] = round(time.perf_counter() - t0, 4)
    results["rollback_meta_bytes"] = dir_bytes(root, "manifests") - before

    # cold full files() parse (fresh handle, no caches)
    fresh = TranscriptTable.load(root)
    t0 = time.perf_counter()
    n_read = len(fresh.files())
    results["cold_files_parse_s"] = round(time.perf_counter() - t0, 3)
    results["files_read"] = n_read

    print(json.dumps(results, sort_keys=True))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
