"""Secondary index: per-file token postings for text search.

A maintenance artifact with the same build -> extend -> probe lifecycle as
the similarity-index triad (``functions/jaccard_index.py`` etc.): for each
data file the index stores a posting list of its distinct whitespace tokens
(``\\S+`` runs — the same tokenization the engine's text stats and the
DuckDB oracle use).  A token search reads ONLY the files whose postings
contain the token (sound pruning by construction) and applies the exact
vectorized per-row filter over the survivors.

Layout (shared across snapshots, append-only — structural sharing like the
manifest shards):

* ``<root>/index/tokens/postings/bucket=<B>/*.parquet`` — rows
  ``(token, path)`` hash-partitioned so a lookup reads one bucket dir.
* ``<root>/index/tokens/_coverage.json`` — the set of data files whose
  postings are present.  :func:`extend_text_index` indexes ONLY files not
  yet covered (O(new files), never a rebuild); compaction/merge rewrites
  produce new files which a later extend picks up, while postings of
  now-dead files are neutralized by intersecting candidates with the
  queried snapshot's file set (and reclaimed by a rebuild).

A search against a snapshot whose files are not fully covered raises
:class:`StaleTextIndexError` — append-without-extend REFUSES rather than
silently returning incomplete results.

Building/extending is embarrassingly parallel (one stateless task per data
file, same control-dataset pattern as compaction).
"""

from __future__ import annotations

import json
import os
import re
import shutil

import numpy as np
import pandas as pd

from ..state.fs import LOCAL
from ..state.manifest import TranscriptTable

N_BUCKETS = 64

_COVERAGE = "_coverage.json"
_POSTINGS = "postings"


class StaleTextIndexError(RuntimeError):
    """The queried snapshot has data files the index has never seen."""


def _token_bucket(tokens: np.ndarray) -> np.ndarray:
    from .skew import key_hash64

    return (key_hash64(tokens) % np.uint64(N_BUCKETS)).astype(np.int64)


def _index_root(table: TranscriptTable) -> str:
    return table._p("index", "tokens")


def _read_coverage(index_dir: str) -> set[str]:
    p = os.path.join(index_dir, _COVERAGE)
    if not os.path.exists(p):
        return set()
    with open(p) as f:
        return set(json.load(f)["files"])


def _write_coverage(index_dir: str, files: set[str]) -> None:
    LOCAL.makedirs(index_dir)
    tmp = os.path.join(index_dir, _COVERAGE + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"version": 2, "files": sorted(files)}, f)
    os.replace(tmp, os.path.join(index_dir, _COVERAGE))


def _index_new_files(
    table: TranscriptTable, rel_paths: list[str], index_dir: str, text_col: str
) -> None:
    """Append posting files for ``rel_paths`` into the shared bucket dirs."""
    import ray.data as rd

    items = [
        {
            "spec": json.dumps(
                {
                    "path": p if os.path.isabs(p) else table._p(p),
                    "rel_path": p,
                }
            )
        }
        for p in rel_paths
    ]

    def index_file(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        out = []
        for spec_json in batch["spec"]:
            spec = json.loads(spec_json)
            t = pq.read_table(spec["path"], columns=[text_col])
            # Arrow-native tokenization: unicode-whitespace split -> flatten
            # -> unique, all inside Arrow buffers (split semantics match the
            # search filter's \S+ runs: no empties)
            col = t.column(text_col)
            if pa.types.is_large_string(col.type):
                col = col.cast(pa.string())
            toks_arr = pc.unique(pc.list_flatten(pc.utf8_split_whitespace(col)))
            toks_arr = toks_arr.filter(pc.not_equal(toks_arr, ""))
            toks = toks_arr.to_numpy(zero_copy_only=False)
            out.append(
                pd.DataFrame(
                    {
                        "token": toks,
                        "path": spec["rel_path"],
                        "bucket": _token_bucket(toks_arr),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    ds = rd.from_items(items, override_num_blocks=len(items))
    postings = ds.map_batches(index_file, batch_size=None, batch_format="pandas")
    postings.write_parquet(os.path.join(index_dir, _POSTINGS), partition_cols=["bucket"])


def build_text_index(
    table: TranscriptTable,
    snapshot_id: int | None = None,
    text_col: str = "text",
) -> str:
    """(Re)build the token->file posting index from scratch for a snapshot's
    files; returns the index dir.  Discards any prior postings (the only
    operation that reclaims postings of compacted-away files)."""
    base = table.current_snapshot_id() if snapshot_id is None else snapshot_id
    index_dir = _index_root(table)
    if os.path.isdir(index_dir):
        shutil.rmtree(index_dir)
    LOCAL.makedirs(index_dir)
    rel_paths = [f.path for f in table.files(base)]
    if rel_paths:
        _index_new_files(table, rel_paths, index_dir, text_col)
    _write_coverage(index_dir, set(rel_paths))
    return index_dir


def extend_text_index(
    table: TranscriptTable,
    snapshot_id: int | None = None,
    text_col: str = "text",
) -> int:
    """Extend the index to cover a (newer) snapshot: index ONLY files not
    yet covered and append their postings (O(new files) — existing posting
    files are never rewritten, the structural-sharing idea of the manifest
    shards).  Returns the number of newly indexed files.  With no existing
    index this is a fresh build."""
    base = table.current_snapshot_id() if snapshot_id is None else snapshot_id
    index_dir = _index_root(table)
    covered = _read_coverage(index_dir)
    rel_paths = [f.path for f in table.files(base) if f.path not in covered]
    if rel_paths:
        _index_new_files(table, rel_paths, index_dir, text_col)
    _write_coverage(index_dir, covered | set(rel_paths))
    return len(rel_paths)


def _candidate_state(table: TranscriptTable, snapshot_id: int | None):
    """(index_dir, snapshot file set) with the staleness gate applied."""
    base = table.current_snapshot_id() if snapshot_id is None else snapshot_id
    index_dir = _index_root(table)
    snap_files = {f.path for f in table.files(base)}
    covered = _read_coverage(index_dir)
    missing = snap_files - covered
    if missing:
        raise StaleTextIndexError(
            f"text index at {index_dir} does not cover {len(missing)} data "
            f"file(s) of snapshot {base} (e.g. {sorted(missing)[:3]}); run "
            "extend_text_index() or build_text_index() first"
        )
    return base, index_dir, snap_files


def _posting_paths(index_dir: str, token: str, snap_files: set[str]) -> set[str]:
    """Files of the queried snapshot whose postings contain ``token`` —
    one pruned bucket-directory read."""
    import pyarrow.dataset as pads

    bucket = int(_token_bucket(np.array([token], dtype=object))[0])
    bucket_dir = os.path.join(index_dir, _POSTINGS, f"bucket={bucket}")
    if not os.path.isdir(bucket_dir):
        return set()
    postings = pads.dataset(bucket_dir).to_table(
        columns=["token", "path"], filter=pads.field("token") == token
    )
    return set(postings.column("path").to_pylist()) & snap_files


def _token_patterns(tokens: list[str]) -> list[re.Pattern]:
    """One compiled word-boundary pattern per token: the token appears in
    the \\S+ tokenization iff it occurs delimited by whitespace/edges."""
    return [re.compile(r"(?<!\S)" + re.escape(t) + r"(?!\S)") for t in tokens]


def _keep_rows_fn(tokens: list[str], text_col: str, mode: str):
    """Vectorized exact row verify: per-token word-boundary contains masks
    AND/OR-combined — no per-row lambda, no findall materialization."""
    pats = _token_patterns(tokens)

    def keep_rows(b: pd.DataFrame) -> pd.DataFrame:
        s = b[text_col].astype(str)
        if mode == "all":
            mask = np.ones(len(b), dtype=bool)
            for p in pats:
                mask &= s.str.contains(p).to_numpy(dtype=bool)
        else:
            mask = np.zeros(len(b), dtype=bool)
            for p in pats:
                mask |= s.str.contains(p).to_numpy(dtype=bool)
        return b[mask]

    return keep_rows


def _scan_filtered(table, base, paths: set[str], tokens, text_col, columns, mode):
    import ray.data as rd

    if not paths:
        return rd.from_arrow(table.schema_of(base).empty_table())
    abs_paths = [p if os.path.isabs(p) else table._p(p) for p in sorted(paths)]
    ds = rd.read_parquet(abs_paths, columns=columns)
    return ds.map_batches(_keep_rows_fn(tokens, text_col, mode), batch_format="pandas")


def search_tokens_all(
    table: TranscriptTable,
    tokens: list[str],
    snapshot_id: int | None = None,
    text_col: str = "text",
    columns: list[str] | None = None,
):
    """Conjunctive (AND) token search: rows whose tokenization contains
    EVERY query token.  Candidate files are the INTERSECTION of each
    token's posting set — each lookup reads one bucket directory, and the
    rarest token bounds the scan (classic conjunctive posting-list
    intersection); the exact all-tokens row filter runs over survivors."""
    if not tokens:
        raise ValueError("tokens must be non-empty")
    base, index_dir, snap_files = _candidate_state(table, snapshot_id)
    paths: set[str] | None = None
    for token in tokens:
        s = _posting_paths(index_dir, token, snap_files)
        paths = s if paths is None else (paths & s)
        if not paths:
            break
    return _scan_filtered(table, base, paths or set(), tokens, text_col, columns, "all")


def search_tokens_any(
    table: TranscriptTable,
    tokens: list[str],
    snapshot_id: int | None = None,
    text_col: str = "text",
    columns: list[str] | None = None,
):
    """Disjunctive (OR) token search: rows containing ANY query token.
    Candidate files are the UNION of the tokens' posting sets; the exact
    any-token row filter runs over the survivors."""
    if not tokens:
        raise ValueError("tokens must be non-empty")
    base, index_dir, snap_files = _candidate_state(table, snapshot_id)
    paths: set[str] = set()
    for token in tokens:
        paths |= _posting_paths(index_dir, token, snap_files)
    return _scan_filtered(table, base, paths, tokens, text_col, columns, "any")


def search_token(
    table: TranscriptTable,
    token: str,
    snapshot_id: int | None = None,
    text_col: str = "text",
    columns: list[str] | None = None,
):
    """Exact-token search: rows whose ``\\S+`` tokenization contains
    ``token``.  Reads one index bucket to find candidate files, scans only
    those, then applies the exact vectorized row filter (same tokenization
    as the index, so pruning is sound — never a missed row)."""
    base, index_dir, snap_files = _candidate_state(table, snapshot_id)
    paths = _posting_paths(index_dir, token, snap_files)
    return _scan_filtered(table, base, paths, [token], text_col, columns, "all")


def compact_text_index(table: TranscriptTable, min_files_per_bucket: int = 2) -> dict:
    """Merge each posting bucket's fragment files into one (distinct
    ``(token, path)``) — the text-index instance of index compaction
    (`functions/jaccard_index.py:compact_jaccard_index`): every extend
    appends per-file posting fragments, so a long-lived index goes
    metadata-bound.  Crash-safe with the same argument: the merged file
    lands before fragments are deleted, and duplicates are harmless
    because lookups take the SET union of posting paths."""
    import glob
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    pdir = os.path.join(_index_root(table), _POSTINGS)
    items = [
        {"dir": d}
        for d in sorted(glob.glob(os.path.join(pdir, "bucket=*")))
        if len(glob.glob(os.path.join(d, "*.parquet"))) >= min_files_per_bucket
    ]
    if not items:
        return {"buckets_compacted": 0}

    def compact_bucket(batch: pd.DataFrame) -> pd.DataFrame:
        n = 0
        for d in batch["dir"]:
            files = sorted(glob.glob(os.path.join(d, "*.parquet")))
            if len(files) < min_files_per_bucket:
                continue
            df = pq.read_table(files).to_pandas().drop_duplicates(["token", "path"])
            out = os.path.join(d, f"compact-{uuid.uuid4().hex}.parquet")
            pq.write_table(pa.Table.from_pandas(df, preserve_index=False), out)
            for f in files:
                os.remove(f)
            n += 1
        return pd.DataFrame({"n": np.array([n], dtype=np.int64)})

    total = (
        rd.from_items(items, override_num_blocks=max(1, min(len(items), 64)))
        .map_batches(compact_bucket, batch_format="pandas", batch_size=None)
        .to_pandas()["n"]
        .sum()
    )
    return {"buckets_compacted": int(total)}
