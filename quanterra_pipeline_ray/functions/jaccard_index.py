"""Persisted prefix-posting index for INCREMENTAL exact-Jaccard dedup.

The batch self-join (:func:`..functions.dedup.ngram_jaccard_join`) re-shingles
the whole corpus every run.  At 100 TB with continuous ingest the right shape
is an *index*: shingle the corpus once into a partitioned on-disk posting
table, then each new batch only (1) shingles ITSELF, (2) probes the index
partitions its rare shingles hash into, and (3) exact-verifies the candidates.
Probe cost is O(new batch + matching partitions), not O(corpus).

Completeness argument (unconditional, no ordering assumption): the index
stores EVERY posting ``(shingle, doc, size)`` of indexed docs; a probe doc
``p`` queries only its *prefix* — any ``|S_p| - ceil(t * |S_p|) + 1`` of its
shingles.  If ``J(p, q) >= t`` then ``|S_p ∩ S_q| >= ceil(t * |S_p|)``, and
``p``'s non-prefix remainder has only ``ceil(t * |S_p|) - 1`` shingles, so at
least one overlap shingle is in the prefix and hits ``q``'s postings
(pigeonhole).  Unlike AllPairs' index-side prefix (Bayardo et al., WWW'07,
which needs a global size/frequency order over BOTH sides), probing a FULL
index is complete under ANY prefix choice — the persisted document-frequency
table is used purely to pick globally-rare shingles as the prefix, which
shrinks the candidate set and the number of partitions read.

Layout under ``index_dir`` (all Parquet, hive-partitioned by
``bkt = shingle_hash % n_buckets``):

* ``postings/bkt=*/``  — ``(sh uint64, doc int64, size int64)``; append-only.
* ``df/bkt=*/``        — ``(sh uint64, df int64)`` additive deltas; probe
  sums per shingle, so :func:`extend_jaccard_index` appends rather than
  rewriting (same structural-sharing idea as the manifest shards).
* ``meta.json``        — shingle params; doc/posting counters.

Partition pruning: the probe computes its prefix-shingle bucket set on the
driver (bounded by ``n_buckets`` ints, never row data) and reads ONLY those
``bkt=`` directories — at cluster scale raise ``n_buckets`` (e.g. 4096) so a
small batch touches a small fraction of the index bytes.

Reference parity: the reference has no similarity index; this extends its
"skip work already stored" idiom (store_csv_file_from_blob skip-if-compressed,
src/clients/google_cloud_storage_client.py:40-57) to dedup state.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from .dedup import (
    _DRIVER_VERIFY_PAIR_CAP,
    _attach_side_texts,
    _dedupe_pairs,
    _verify_pairs,
    _verify_pairs_dispatch,
    _verify_pairs_small,
    batched_postings,
)

_META = "meta.json"
_POSTINGS = "postings"
_DF = "df"
_BLOOMS = "blooms"
_PROBE_STATS = "_probe_stats.json"

#: driver-side cap on the distinct probe-shingle set used for bloom pruning
#: — probe batches are small by contract; a batch beyond this simply skips
#: the extra pruning (reads stay correct, just less pruned).
_PRUNE_SH_CAP = 200_000
#: tighter cap for pushing the shingle set down as a parquet scan filter:
#: evaluating a large isin per row group costs more than it saves, so only
#: genuinely small probes get the row-level filter.
_PUSHDOWN_SH_CAP = 10_000


def _postings_fn(id_col: str, text_col: str, shingle_k: int, n_buckets: int):
    """Batch kernel: explode docs into distinct-shingle posting rows
    ``(sh, doc, size, bkt)`` via the BATCHED rolling-hash kernel (one
    sweep per batch, no per-doc Python dispatch)."""

    def postings(b: pd.DataFrame) -> pd.DataFrame:
        out = batched_postings(b[id_col].to_numpy(), b[text_col], shingle_k)
        out["bkt"] = (out["sh"].to_numpy(dtype=np.uint64) % n_buckets).astype(np.int64)
        return out

    return postings


def _df_rows(g: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket document-frequency delta rows for a posting group."""
    counts = g.groupby("sh", sort=False).size()
    return pd.DataFrame(
        {
            "sh": counts.index.to_numpy(dtype=np.uint64),
            "df": counts.to_numpy(dtype=np.int64),
            "bkt": np.full(len(counts), int(g["bkt"].iloc[0]), dtype=np.int64),
        }
    )


def _bloom_rows(g: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket bloom over the batch's distinct shingle hashes — the
    partition-skip stat: a probe bucket whose shingles miss EVERY bloom of
    a bucket cannot have a candidate there."""
    from ..state.bloom import bloom_build

    sh = np.unique(g["sh"].to_numpy(dtype=np.uint64))
    return pd.DataFrame(
        {
            "bkt": np.array([int(g["bkt"].iloc[0])], dtype=np.int64),
            "bloom": [bloom_build(sh)],
            "n_sh": np.array([len(sh)], dtype=np.int64),
        }
    )


def _write_hive_direct(ds, root: str) -> None:
    """Hive-partitioned write without Ray's parquet sink: each (sorted,
    bucket-contiguous) block writes one file per bucket slice it holds —
    no 1024-partition fragment cap, no sink-side block batching.  File
    contents match the built-in hive write (the ``bkt`` column lives in
    the directory name, not the file)."""

    def write_block(b: pd.DataFrame) -> pd.DataFrame:
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        for bkt, g in b.groupby("bkt", sort=True):
            d = os.path.join(root, f"bkt={int(bkt)}")
            os.makedirs(d, exist_ok=True)
            pq.write_table(
                pa.Table.from_pandas(g.drop(columns=["bkt"]), preserve_index=False),
                os.path.join(d, f"part-{uuid.uuid4().hex}.parquet"),
            )
        return pd.DataFrame({"n": [len(b)]})

    ds.map_batches(write_block, batch_format="pandas", batch_size=None).count()


def _append_postings(post_ds, index_dir: str, n_buckets: int | None = None) -> dict:
    """Append a posting Dataset (with its df deltas and per-bucket shingle
    blooms) under ``index_dir``; returns counters.  All writes are
    hive-partitioned / directory APPENDs — extending the index never
    rewrites existing files (blooms accumulate: a bucket may hold one blob
    per extend, and a probe skips the bucket only if its shingles miss ALL
    of them)."""
    post_ds = post_ds.materialize()
    n_post = post_ds.count()
    if n_post == 0:  # empty build/extend (bootstrap store)
        return {"n_postings": 0, "n_docs": 0}
    wide = n_buckets is not None and int(n_buckets) > 512
    if wide:
        # WIDE index (cluster-scale bucket counts): pyarrow caps one write
        # fragment at 1024 hive partitions, and Ray's sink may batch
        # several blocks into ONE fragment, so the built-in hive write
        # cannot be used at 4096+ buckets at all.  Sort by bucket (blocks
        # become bucket-contiguous — each bucket's rows land in ~1 block,
        # the tightest file layout) and write the hive files DIRECTLY from
        # each block: one parquet file per (block, bucket) slice, exactly
        # the layout the probe and compaction already consume.
        post_ds = post_ds.sort("bkt").materialize()
        _write_hive_direct(post_ds, os.path.join(index_dir, _POSTINGS))
    else:
        # coalesce before the partitioned write: Ray writes one file per
        # (block x partition value), so an un-coalesced posting set fans out
        # into thousands of tiny per-bucket files and every later probe pays
        # a metadata-bound read (measured: 16k files / 19 s to read 64k rows).
        # 2M rows/block (~60 MB) keeps file count = ceil(n/2M) per bucket.
        post_ds = post_ds.repartition(max(1, -(-n_post // 2_000_000)))
        post_ds.write_parquet(os.path.join(index_dir, _POSTINGS), partition_cols=["bkt"])
    df_ds = post_ds.groupby("bkt").map_groups(_df_rows, batch_format="pandas")
    if wide:
        _write_hive_direct(df_ds, os.path.join(index_dir, _DF))
    else:
        df_ds.write_parquet(os.path.join(index_dir, _DF), partition_cols=["bkt"])
    blooms = post_ds.groupby("bkt").map_groups(_bloom_rows, batch_format="pandas")
    blooms.write_parquet(os.path.join(index_dir, _BLOOMS))
    docs = post_ds.map_batches(
        lambda b: pd.DataFrame({"doc": pd.unique(b["doc"])}), batch_format="pandas"
    ).to_pandas()
    return {"n_postings": post_ds.count(), "n_docs": int(docs["doc"].nunique())}


def build_jaccard_index(
    ds,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    n_buckets: int = 1024,
) -> dict:
    """Create a persisted Jaccard index over ``ds``; returns the meta dict.

    ``n_buckets`` sizes the partition-pruning granularity: a probe reads
    only the ``bkt=`` directories its shingles hash into, so small probes
    touch ~(distinct probe shingles)/n_buckets of the index.  The 1024
    default makes pruning real at bench scale; raise to 4096+ for
    cluster-scale corpora (more, smaller partition files)."""
    os.makedirs(index_dir, exist_ok=True)
    post = ds.map_batches(_postings_fn(id_col, text_col, shingle_k, n_buckets), batch_format="pandas")
    counters = _append_postings(post, index_dir, n_buckets)
    # a multi-block build writes one file per (block x bucket); merge them
    # now (3.7 s at 17.5M postings) so the FIRST probe already reads one
    # file per bucket — measured 73 -> 16 s on a 50k-doc Zipf corpus
    if counters["n_postings"] > 2_000_000:
        compact_jaccard_index(index_dir)
    meta = {
        # version 2: per-bucket shingle blooms exist for EVERY append, so
        # the probe may skip bloom-missed buckets (v1 indexes get no bloom
        # pruning — soundness over speed)
        "version": 2,
        "shingle_k": shingle_k,
        "n_buckets": n_buckets,
        **counters,
    }
    with open(os.path.join(index_dir, _META), "w") as f:
        json.dump(meta, f)
    meta["index_version"] = _commit_index_version(index_dir, "build")
    return meta


def compact_jaccard_index(index_dir: str, min_files_per_bucket: int = 2) -> dict:
    """Merge each bucket's accumulated posting/df fragment files into ONE
    file per table — INDEX compaction, riding the same maintenance idea as
    table compaction (hive writes mint one file per (block x bucket) per
    append, so a continuously-extended index goes metadata-bound: measured
    8.3k files / 50k docs, and the probe's pruned read pays per-file
    metadata).  Distinct ``(sh, doc)`` postings are kept; df deltas are
    SUMMED into one delta row per shingle (probe semantics unchanged — it
    sums deltas).  Blooms are left to accumulate (tiny, and OR-sound).

    Crash contract: the compacted file is written BEFORE the fragments are
    deleted, so a crash can only leave BOTH.  That is still correct: the
    candidate join consumes postings DISTINCT by ``(sh, doc)``, and df is
    advisory only (any prefix is complete by the pigeonhole argument;
    doubled df can only reorder the rare-first choice).  Returns counters.
    """
    import glob

    import ray
    import ray.data as rd

    buckets = sorted(
        set(_existing_buckets(index_dir, _POSTINGS))
        | set(_existing_buckets(index_dir, _DF))
    )
    items = [
        {"bkt": b}
        for b in buckets
        if len(glob.glob(os.path.join(index_dir, _POSTINGS, f"bkt={b}", "*.parquet")))
        >= min_files_per_bucket
        or len(glob.glob(os.path.join(index_dir, _DF, f"bkt={b}", "*.parquet")))
        >= min_files_per_bucket
    ]
    if not items:
        return {"buckets_compacted": 0}

    # files pinned by named refs survive compaction (the expire analogy);
    # the merged file still covers their rows, and the unpinned probe
    # tolerates the overlap by construction (postings consume distinct by
    # (sh, doc); df is advisory) — same argument as the crash contract
    protected = _ref_protected_files(index_dir)

    def compact_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        done = []
        for bkt in batch["bkt"]:
            bkt = int(bkt)
            for table, reduce in ((_POSTINGS, "distinct"), (_DF, "sum")):
                d = os.path.join(index_dir, table, f"bkt={bkt}")
                files = sorted(glob.glob(os.path.join(d, "*.parquet")))
                if len(files) < min_files_per_bucket:
                    continue
                t = pq.read_table(files)
                df = t.to_pandas()
                if reduce == "distinct":
                    df = df.drop_duplicates(["sh", "doc"])
                else:
                    df = df.groupby("sh", as_index=False)["df"].sum()
                    df["sh"] = df["sh"].astype(np.uint64)
                out = os.path.join(d, f"compact-{uuid.uuid4().hex}.parquet")
                pq.write_table(
                    pa.Table.from_pandas(df, preserve_index=False), out
                )
                for f in files:  # only after the merged file is durable
                    if os.path.relpath(f, index_dir) not in protected:
                        os.remove(f)
            done.append(bkt)
        return pd.DataFrame({"bkt": np.array(done, dtype=np.int64)})

    out = (
        rd.from_items(items, override_num_blocks=max(1, min(len(items), 64)))
        .map_batches(compact_bucket, batch_format="pandas", batch_size=None)
        .count()
    )
    if os.path.isdir(os.path.join(index_dir, _VERSIONS)):
        _commit_index_version(index_dir, "compact")
    return {"buckets_compacted": int(out)}


def index_file_count(index_dir: str) -> int:
    """Total parquet files under the index (the metadata-cost metric
    compaction exists to bound)."""
    import glob

    return len(glob.glob(os.path.join(index_dir, "**", "*.parquet"), recursive=True))


# --------------------------------------------------------- index versions
# The index advances like the table: every build/extend/compact COMMITS a
# version record (the live postings/df file set + the meta at commit time),
# and named refs pin versions the way table refs pin snapshots.  A probe
# ``at_version``/``at_ref`` reads exactly that version's file set, so a
# reader pinned to table snapshot s(N) can probe the index state of s(N)
# (the continuous flow sets ref ``s{N}`` at each commit).  Soundness of
# the unpinned pieces: blooms are OR-advisory (extra blobs only reduce
# skips) and df is advisory by the pigeonhole argument, so only the
# postings/df file sets need pinning for exact results.
_VERSIONS = "versions"
_REFS = "refs.json"


def _live_index_files(index_dir: str) -> list[str]:
    """Relative paths of the current postings/df parquet files — the
    version record's payload (blooms stay unversioned: advisory-only)."""
    import glob

    out = []
    for table in (_POSTINGS, _DF):
        for p in glob.glob(os.path.join(index_dir, table, "bkt=*", "*.parquet")):
            out.append(os.path.relpath(p, index_dir))
    return sorted(out)


def index_version(index_dir: str) -> int:
    """Latest committed version id (0 when the index predates versioning)."""
    import glob

    vs = glob.glob(os.path.join(index_dir, _VERSIONS, "v*.json"))
    return max(
        (int(os.path.basename(v)[1:-5]) for v in vs),
        default=0,
    )


def _commit_index_version(index_dir: str, op: str) -> int:
    """Durably record the current live file set as the next version."""
    n = index_version(index_dir) + 1
    vdir = os.path.join(index_dir, _VERSIONS)
    os.makedirs(vdir, exist_ok=True)
    rec = {
        "version": n,
        "op": op,
        "files": _live_index_files(index_dir),
        "meta": read_index_meta(index_dir),
    }
    tmp = os.path.join(vdir, f"v{n:06d}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, os.path.join(vdir, f"v{n:06d}.json"))
    return n


def read_index_version(index_dir: str, version: int) -> dict:
    with open(os.path.join(index_dir, _VERSIONS, f"v{version:06d}.json")) as f:
        return json.load(f)


def read_index_refs(index_dir: str) -> dict:
    p = os.path.join(index_dir, _REFS)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def set_index_ref(index_dir: str, name: str, version: int | None = None) -> int:
    """Pin ``name`` to ``version`` (default: the latest).  Ref'd versions'
    files are PROTECTED from compaction deletion — the expire analogy."""
    v = index_version(index_dir) if version is None else int(version)
    refs = read_index_refs(index_dir)
    refs[name] = v
    tmp = os.path.join(index_dir, _REFS + ".tmp")
    with open(tmp, "w") as f:
        json.dump(refs, f)
    os.replace(tmp, os.path.join(index_dir, _REFS))
    return v


def drop_index_ref(index_dir: str, name: str) -> None:
    refs = read_index_refs(index_dir)
    refs.pop(name, None)
    tmp = os.path.join(index_dir, _REFS + ".tmp")
    with open(tmp, "w") as f:
        json.dump(refs, f)
    os.replace(tmp, os.path.join(index_dir, _REFS))


def _ref_protected_files(index_dir: str) -> set[str]:
    """Relative paths referenced by ANY named ref — compaction must not
    delete these (a pinned probe would lose its exact file set)."""
    out: set[str] = set()
    for v in read_index_refs(index_dir).values():
        try:
            out.update(read_index_version(index_dir, int(v))["files"])
        except FileNotFoundError:
            continue
    return out


def read_index_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _META)) as f:
        return json.load(f)


def extend_jaccard_index(
    ds,
    index_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Append a new doc batch to an existing index (O(batch) writes: new
    posting files + additive df-delta files into the hive partitions)."""
    meta = read_index_meta(index_dir)
    post = ds.map_batches(
        _postings_fn(id_col, text_col, meta["shingle_k"], meta["n_buckets"]),
        batch_format="pandas",
    )
    counters = _append_postings(post, index_dir, int(meta["n_buckets"]))
    meta["n_postings"] += counters["n_postings"]
    meta["n_docs"] += counters["n_docs"]
    with open(os.path.join(index_dir, _META), "w") as f:
        json.dump(meta, f)
    # standalone extends accumulate per-bucket fragments exactly like the
    # continuous flow's: merge once any bucket holds >= 8 (cheap glob scan
    # when under; layout-only, crash-safe — see compact_jaccard_index).
    # Compact BEFORE committing the extend's version so the version record
    # references the post-compaction live set (a ref taken on it is then
    # never invalidated by this extend's own housekeeping).
    compact_jaccard_index(index_dir, min_files_per_bucket=8)
    meta["index_version"] = _commit_index_version(index_dir, "extend")
    return meta


def _distinct_bkt_sh(post_ds) -> tuple[list[int], np.ndarray | None]:
    """Driver-side distinct partition ids AND distinct shingle hashes of a
    PROBE-sized posting Dataset in ONE execution (per-block dedup first —
    the pull is bounded by distinct shingles, never row data).  The shingle
    set comes back ``None`` beyond the pruning cap: pruning is an
    optimization, never a requirement."""
    parts = post_ds.map_batches(
        lambda b: b[["bkt", "sh"]].drop_duplicates(), batch_format="pandas"
    ).to_pandas()
    buckets = sorted(int(x) for x in parts["bkt"].unique())
    sh = np.unique(parts["sh"].to_numpy(dtype=np.uint64))
    return buckets, (sh if sh.size <= _PRUNE_SH_CAP else None)


def _bloom_keep(
    index_dir: str, buckets: list[int], sh: np.ndarray | None, n_buckets: int
) -> list[int]:
    """Subset of ``buckets`` whose per-bucket blooms may contain ANY of the
    probe shingles ``sh``.  Sound only on version>=2 indexes (callers gate on
    meta); a bucket with postings but zero bloom rows cannot exist there, so
    a full miss really means no shared shingle."""
    import pyarrow.dataset as pads

    from ..state.bloom import bloom_any

    bdir = os.path.join(index_dir, _BLOOMS)
    if sh is None or not os.path.isdir(bdir):
        return list(buckets)
    tbl = pads.dataset(bdir).to_table(columns=["bkt", "bloom"]).to_pandas()
    by_bkt = tbl.groupby("bkt")["bloom"].agg(list)
    sh_bkt = (sh % np.uint64(n_buckets)).astype(np.int64)
    keep = []
    for b in buckets:
        blobs = by_bkt.get(b)
        if blobs is None:
            continue  # nothing was ever indexed into this bucket
        q = sh[sh_bkt == b]
        if q.size and any(bloom_any(blob, q) for blob in blobs):
            keep.append(b)
    return keep


def _partition_paths(
    index_dir: str, table: str, buckets, file_set: set[str] | None = None
) -> list[str]:
    """Existing hive-partition dirs for the requested buckets (the pruned
    read set — everything else in the index is never opened).  With
    ``file_set`` (a pinned version's relative paths), only files in that
    set are eligible — the snapshot-pinned read."""
    import glob

    paths = []
    for bkt in buckets:
        p = os.path.join(index_dir, table, f"bkt={bkt}")
        if os.path.isdir(p):
            # expand to the partition's data files: Ray 2.49 read_parquet
            # rejects directory entries inside a multi-path list
            found = sorted(glob.glob(os.path.join(p, "*.parquet")))
            if file_set is not None:
                found = [f for f in found if os.path.relpath(f, index_dir) in file_set]
            paths.extend(found)
    return paths


def _read_partitions(
    index_dir: str,
    table: str,
    buckets,
    columns,
    n_buckets: int,
    sh_values=None,
    file_set: set[str] | None = None,
):
    """Pruned read of index partitions; re-derives ``bkt`` from ``sh`` (the
    hive dir name carries it, but recomputing avoids partitioning-inference
    differences across readers).  With ``sh_values``, the probe's distinct
    shingle set is pushed down as a parquet scan filter — only rows whose
    shingle the probe actually holds leave the scan."""
    import ray.data

    paths = _partition_paths(index_dir, table, buckets, file_set)
    if not paths:
        return None

    def clean(b: pd.DataFrame) -> pd.DataFrame:
        out = b[columns].copy()
        out["bkt"] = (out["sh"].to_numpy(dtype=np.uint64) % n_buckets).astype(np.int64)
        return out

    kwargs = {}
    if sh_values is not None:
        import pyarrow as pa
        import pyarrow.dataset as pads

        kwargs["filter"] = pads.field("sh").isin(pa.array(sh_values, type=pa.uint64()))
    return ray.data.read_parquet(paths, columns=columns, **kwargs).map_batches(
        clean, batch_format="pandas"
    )


def _existing_buckets(index_dir: str, table: str) -> list[int]:
    """All bucket partitions present on disk (the probe-stats denominator)."""
    import glob

    dirs = glob.glob(os.path.join(index_dir, table, "bkt=*"))
    return sorted(int(os.path.basename(d).split("=", 1)[1]) for d in dirs)


def _write_probe_stats(index_dir: str, stats: dict) -> None:
    """Record the last probe's pruning effectiveness (partitions read vs
    total) next to the index — the probe's lineage record."""
    tmp = os.path.join(index_dir, _PROBE_STATS + ".tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, os.path.join(index_dir, _PROBE_STATS))


def read_probe_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _PROBE_STATS)) as f:
        return json.load(f)


def _empty_pairs():
    import pyarrow as pa
    import ray.data

    # from_arrow, not from_pandas: Ray 2.49 drops a 0-row pandas frame's
    # schema on the to_pandas round trip
    return ray.data.from_arrow(
        pa.table({"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())})
    )


#: posting-row bound for the exchange-free small-probe plan: a probe batch
#: whose postings fit comfortably on the driver (the contract case — small
#: ingest batches against a big index) skips every sort exchange.  2M rows
#: of (sh, doc, size, bkt) is ~64 MB.
_SMALL_PROBE_POSTINGS = 2_000_000


def _emit_candidates(prefix: pd.DataFrame, full: pd.DataFrame, threshold: float) -> pd.DataFrame:
    """Candidate pairs from prefix rows vs full posting rows: equal shingle,
    distinct docs, two-sided size filter — the shared join kernel of both
    probe plans.

    The full side is pre-filtered with a sorted-uint64 ``np.isin`` against
    the prefix's distinct shingles before the pandas merge: on rare-shingle
    (Zipf) corpora almost every full row misses the prefix, and dropping
    them in one vectorized pass is ~10× cheaper than hashing them through
    the merge (measured: 1000-doc probe of a 50k-doc Zipf index 21.6→8.9 s
    — the emit merge was the probe's bottleneck, not the pruned read)."""
    pref_sh = np.unique(prefix["sh"].to_numpy(dtype=np.uint64))
    hit = np.isin(full["sh"].to_numpy(dtype=np.uint64), pref_sh, kind="sort")
    f = full[hit][["sh", "doc", "size"]].drop_duplicates(["sh", "doc"])
    m = prefix.merge(f, on="sh", suffixes=("_p", "_f"))
    m = m[m["doc_p"] != m["doc_f"]]
    if len(m):
        sp = m["size_p"].to_numpy(dtype=np.float64)
        sf = m["size_f"].to_numpy(dtype=np.float64)
        m = m[(sf >= threshold * sp) & (sp >= threshold * sf)]
    if not len(m):
        return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
    a = np.minimum(m["doc_p"].to_numpy(), m["doc_f"].to_numpy()).astype(np.int64)
    b = np.maximum(m["doc_p"].to_numpy(), m["doc_f"].to_numpy()).astype(np.int64)
    return pd.DataFrame({"a": a, "b": b}).drop_duplicates()


def _probe_small(
    new_post,
    index_dir: str,
    corpus_ds,
    *,
    threshold: float,
    k: int,
    nb: int,
    id_col: str,
    text_col: str,
    probe_sh: np.ndarray,
    df_bkts: list[int],
    blooms_ok: bool,
    stats: dict,
    n_buckets_pairs: int,
    file_set: set[str] | None = None,
):
    """Exchange-free probe plan for a SMALL batch (the continuous-ingest
    common case): batch postings live on the driver (O(batch), bounded by
    the caller's gate), df comes from one pushdown-filtered pruned read,
    the prefix is broadcast over the pruned posting read, and candidates
    verify through the driver fast path.  Selection logic (df-rare prefix,
    size filter, exact verify) is IDENTICAL to the distributed plan —
    only the placement changes, so results are bit-equal by construction."""
    import ray
    import ray.data

    np_df = new_post.to_pandas()
    push_sh = probe_sh if probe_sh.size <= _PUSHDOWN_SH_CAP else None
    df_ds = _read_partitions(
        index_dir, _DF, df_bkts, ["sh", "df"], nb, sh_values=push_sh, file_set=file_set
    )
    if df_ds is not None:
        df_df = df_ds.to_pandas()
        if push_sh is None:  # not filtered at the scan: filter on arrival
            df_df = df_df[np.isin(df_df["sh"].to_numpy(dtype=np.uint64), probe_sh)]
        dfm = df_df.groupby("sh", sort=False)["df"].sum()
        np_df = np_df.assign(
            df=np_df["sh"].map(dfm).fillna(0).to_numpy(dtype=np.int64)
        )
    else:
        np_df = np_df.assign(df=np.int64(0))

    # per-doc df-rare prefix — same sort keys / length as keep_prefix
    g = np_df.sort_values(["doc", "df", "sh"], kind="stable")
    rank = g.groupby("doc", sort=False).cumcount().to_numpy()
    size = g["size"].to_numpy()
    prefix_len = size - np.ceil(threshold * size).astype(np.int64) + 1
    prefix = g[rank < prefix_len][["sh", "doc", "size"]]
    prefix_sh = np.unique(prefix["sh"].to_numpy(dtype=np.uint64))
    prefix_bkts = sorted(int(x) for x in np.unique(prefix_sh % np.uint64(nb)))
    stats["postings_candidate"] = len(prefix_bkts)
    post_bkts = _bloom_keep(index_dir, prefix_bkts, prefix_sh, nb) if blooms_ok else prefix_bkts
    stats["postings_read"] = len(post_bkts)
    _write_probe_stats(index_dir, stats)

    push_prefix = prefix_sh if prefix_sh.size <= _PUSHDOWN_SH_CAP else None
    idx_post = _read_partitions(
        index_dir,
        _POSTINGS,
        post_bkts,
        ["sh", "doc", "size"],
        nb,
        sh_values=push_prefix,
        file_set=file_set,
    )
    pref_ref = ray.put(prefix)

    def emit(b: pd.DataFrame) -> pd.DataFrame:  # broadcast-merge, no exchange
        return _emit_candidates(ray.get(pref_ref), b, threshold)

    # full side = the batch's OWN postings (new-vs-new) + pruned index
    # partitions (new-vs-indexed), both through the SAME distributed
    # broadcast-emit: the merge fans out ~df× per prefix row, so on
    # low-entropy corpora a driver-side new-new merge is the probe's
    # single-core bottleneck — repartition the (small) posting set and
    # let every emit task carry its own slice of the explosion
    cpus = int(ray.cluster_resources().get("CPU", 4))
    full = new_post.select_columns(["sh", "doc", "size"]).repartition(min(64, 2 * cpus))
    if idx_post is not None:
        full = full.union(idx_post.select_columns(["sh", "doc", "size"]))
    pairs = (
        full.map_batches(emit, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(["a", "b"])
    )
    if not len(pairs):
        return _empty_pairs()
    if len(pairs) <= _DRIVER_VERIFY_PAIR_CAP:
        return _verify_pairs_small(pairs, corpus_ds, id_col, text_col, threshold, k)
    import pyarrow as pa

    pairs_ds = ray.data.from_arrow(pa.Table.from_pandas(pairs, preserve_index=False))
    return _verify_pairs_dispatch(
        pairs_ds, corpus_ds, id_col, text_col, threshold, k, n_buckets_pairs
    )


def probe_jaccard_index(
    new_ds,
    index_dir: str,
    corpus_ds,
    *,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets_pairs: int = 64,
    at_version: int | None = None,
    at_ref: str | None = None,
):
    """All pairs ``(a, b)`` with exact n-gram ``J >= threshold`` where at
    least one side is in ``new_ds`` — new-vs-indexed AND new-vs-new (so one
    probe fully vets an ingest batch); indexed-vs-indexed pairs were vetted
    when THEY were probed.  ``corpus_ds`` supplies verification texts and
    must cover both sides (e.g. the table scan after append).

    Plan (three keyed exchanges + the shared verify machinery, all pruned to
    the probe's partitions):

    1. shingle the new batch (`(sh, doc, size, bkt)`), materialized once;
    2. attach document frequency from the pruned ``df/`` partitions (sum of
       deltas per shingle; unseen shingles get 0 = rarest) — bucket groupby;
    3. per-doc prefix selection (rank by ``(df, sh)`` under the doc-bucket
       groupby, keep ``size - ceil(t*size) + 1``);
    4. candidates: prefix rows vs FULL postings (pruned index partitions +
       the new batch's own full postings, so new-new pairs surface) under the
       shingle-bucket groupby, with the two-sided size filter
       ``t*|p| <= |q| <= |p|/t``;
    5. ``_dedupe_pairs -> _attach_side_texts -> _verify_pairs`` — exact
       confirmation; hash collisions only ever ADD candidates.

    ``at_version`` / ``at_ref`` pin the probe to a committed index
    VERSION: only that version's postings/df files are read, so the
    result equals a probe against the index as it stood at that commit —
    snapshot isolation between table and index (the continuous flow sets
    ref ``s{N}`` per table snapshot).  Named refs protect their files
    from compaction deletion; blooms stay live (OR-advisory, so newer
    blobs can only reduce pruning, never change results).
    """
    file_set: set[str] | None = None
    if at_ref is not None:
        refs = read_index_refs(index_dir)
        if at_ref not in refs:
            raise KeyError(f"unknown index ref {at_ref!r}")
        at_version = int(refs[at_ref])
    if at_version is not None:
        rec = read_index_version(index_dir, at_version)
        file_set = set(rec["files"])
        meta = rec["meta"]
    else:
        meta = read_index_meta(index_dir)
    k, nb = int(meta["shingle_k"]), int(meta["n_buckets"])
    blooms_ok = int(meta.get("version", 1)) >= 2
    new_post = (
        new_ds.map_batches(_postings_fn(id_col, text_col, k, nb), batch_format="pandas")
        .materialize()
    )
    if new_post.count() == 0:
        return _empty_pairs()
    probe_bkts, probe_sh = _distinct_bkt_sh(new_post)
    stats = {
        "partitions_total": len(_existing_buckets(index_dir, _POSTINGS)),
        "df_candidate": len(probe_bkts),
    }

    # --- 2. document-frequency attach (pruned df read, additive deltas;
    # bloom-missed buckets hold NONE of the probe's shingles, and unseen
    # shingles default to df=0 anyway, so skipping them is exact)
    df_bkts = _bloom_keep(index_dir, probe_bkts, probe_sh, nb) if blooms_ok else probe_bkts
    stats["df_read"] = len(df_bkts)
    if probe_sh is not None and new_post.count() <= _SMALL_PROBE_POSTINGS:
        # small batch (the continuous-ingest contract case): run the
        # exchange-free plan — identical selection logic, driver placement
        return _probe_small(
            new_post,
            index_dir,
            corpus_ds,
            threshold=threshold,
            k=k,
            nb=nb,
            id_col=id_col,
            text_col=text_col,
            probe_sh=probe_sh,
            df_bkts=df_bkts,
            blooms_ok=blooms_ok,
            stats=stats,
            n_buckets_pairs=n_buckets_pairs,
            file_set=file_set,
        )
    push_sh = probe_sh if probe_sh is not None and probe_sh.size <= _PUSHDOWN_SH_CAP else None
    df_ds = _read_partitions(
        index_dir, _DF, df_bkts, ["sh", "df"], nb, sh_values=push_sh, file_set=file_set
    )

    def tag_post(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["df"] = np.int64(-1)  # marker: posting row, not df row
        return out

    def tag_df(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["doc"] = np.int64(-1)
        out["size"] = np.int64(0)
        return out[["sh", "doc", "size", "bkt", "df"]]

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        posts = g[g["df"] < 0]
        deltas = g[g["df"] >= 0]
        dfm = deltas.groupby("sh", sort=False)["df"].sum()
        out = posts[["sh", "doc", "size"]].copy()
        out["df"] = (
            out["sh"].map(dfm).fillna(0).to_numpy(dtype=np.int64)
            if len(dfm)
            else np.zeros(len(out), dtype=np.int64)
        )
        h = pd.util.hash_pandas_object(out["doc"], index=False).to_numpy(dtype=np.uint64)
        out["dbkt"] = (h % n_buckets_pairs).astype(np.int64)
        return out

    tagged = new_post.map_batches(tag_post, batch_format="pandas")
    if df_ds is not None:
        tagged = tagged.union(df_ds.map_batches(tag_df, batch_format="pandas"))
    with_df = tagged.groupby("bkt").map_groups(attach_df, batch_format="pandas")

    # --- 3. per-doc prefix (any prefix is complete; df-rare minimizes cost)
    def keep_prefix(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc", "df", "sh"], kind="stable")
        rank = g.groupby("doc", sort=False).cumcount().to_numpy()
        size = g["size"].to_numpy()
        prefix_len = size - np.ceil(threshold * size).astype(np.int64) + 1
        out = g[rank < prefix_len][["sh", "doc", "size"]].copy()
        out["bkt"] = (out["sh"].to_numpy(dtype=np.uint64) % nb).astype(np.int64)
        return out

    prefix = with_df.groupby("dbkt").map_groups(keep_prefix, batch_format="pandas").materialize()
    prefix_bkts, prefix_sh = _distinct_bkt_sh(prefix)
    stats["postings_candidate"] = len(prefix_bkts)

    # --- 4. candidates from pruned index partitions + the batch's own
    # postings (bloom-missed buckets share no shingle with the prefix; the
    # new batch's own postings are unioned below, so new-new pairs survive)
    post_bkts = _bloom_keep(index_dir, prefix_bkts, prefix_sh, nb) if blooms_ok else prefix_bkts
    stats["postings_read"] = len(post_bkts)
    _write_probe_stats(index_dir, stats)
    push_prefix = prefix_sh if prefix_sh is not None and prefix_sh.size <= _PUSHDOWN_SH_CAP else None
    idx_post = _read_partitions(
        index_dir, _POSTINGS, post_bkts, ["sh", "doc", "size"], nb, sh_values=push_prefix
    )

    def tag_side(side: int):
        def tag(b: pd.DataFrame) -> pd.DataFrame:
            out = b[["sh", "doc", "size", "bkt"]].copy()
            out["side"] = np.int8(side)
            return out

        return tag

    full = new_post.map_batches(tag_side(1), batch_format="pandas")
    if idx_post is not None:
        full = full.union(idx_post.map_batches(tag_side(1), batch_format="pandas"))
    both = prefix.map_batches(tag_side(0), batch_format="pandas").union(full)

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g["side"] == 0][["sh", "doc", "size"]]
        f = g[g["side"] == 1][["sh", "doc", "size"]].drop_duplicates(["sh", "doc"])
        if not len(p) or not len(f):
            return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
        m = p.merge(f, on="sh", suffixes=("_p", "_f"))
        m = m[m["doc_p"] != m["doc_f"]]
        sp = m["size_p"].to_numpy(dtype=np.float64)
        sf = m["size_f"].to_numpy(dtype=np.float64)
        m = m[(sf >= threshold * sp) & (sp >= threshold * sf)]
        if not len(m):
            return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
        a = np.minimum(m["doc_p"].to_numpy(), m["doc_f"].to_numpy()).astype(np.int64)
        b = np.maximum(m["doc_p"].to_numpy(), m["doc_f"].to_numpy()).astype(np.int64)
        return pd.DataFrame({"a": a, "b": b}).drop_duplicates()

    cand = both.groupby("bkt").map_groups(emit_pairs, batch_format="pandas")
    pairs = _dedupe_pairs(cand, n_buckets_pairs).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return _empty_pairs()
    if n_pairs <= _DRIVER_VERIFY_PAIR_CAP:
        # candidate-bounded fast path: exact-verify on the driver (pair
        # lists only; texts fetched for pair-involved docs by one broadcast-
        # filtered map) — the probe's common case is a small batch against a
        # big index, where the attach+verify sort exchanges' fixed cost
        # dwarfs the candidates' actual work
        return _verify_pairs_small(
            pairs.to_pandas(), corpus_ds, id_col, text_col, threshold, k
        )
    return _verify_pairs_dispatch(
        pairs, corpus_ds, id_col, text_col, threshold, k, n_buckets_pairs
    )
