"""Secondary index: per-file token postings for text search.

A maintenance artifact, like the manifest itself: for a given snapshot,
each data file gets a posting list of its distinct whitespace tokens
(``\\S+`` runs — the same tokenization the engine's text stats and the
DuckDB oracle use).  A token search then reads ONLY the files whose
postings contain the token (sound pruning by construction: the index is
complete for the snapshot it was built against) and applies the exact
per-row filter over the survivors.

Layout: ``<root>/index/s<NNNN>/tokens/bucket=<B>/*.parquet`` — posting rows
``(token, path)`` hash-partitioned into buckets so a lookup reads one
bucket directory, not the whole index.  Building is embarrassingly parallel
(one stateless task per data file, same control-dataset pattern as
compaction); the index is snapshot-pinned and immutable, so maintenance
ops never invalidate it silently — they commit NEW snapshots, and the
caller rebuilds (or keeps querying the pinned snapshot).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from ..state.fs import LOCAL
from ..state.manifest import TranscriptTable

N_BUCKETS = 64


def _token_bucket(tokens: np.ndarray) -> np.ndarray:
    from .skew import key_hash64

    return (key_hash64(tokens) % np.uint64(N_BUCKETS)).astype(np.int64)


def build_text_index(
    table: TranscriptTable,
    snapshot_id: int | None = None,
    text_col: str = "text",
) -> str:
    """Build the token→file posting index for a snapshot; returns its dir."""
    import ray.data as rd

    base = table.current_snapshot_id() if snapshot_id is None else snapshot_id
    index_dir = table._p("index", f"s{base:06d}", "tokens")
    items = [
        {
            "spec": json.dumps(
                {
                    "path": f.path if os.path.isabs(f.path) else table._p(f.path),
                    "rel_path": f.path,
                    "index_dir": index_dir,
                }
            )
        }
        for f in table.files(base)
    ]
    if not items:
        LOCAL.makedirs(index_dir)
        return index_dir

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
            # search filter's \S+ findall: runs of non-whitespace, no empties)
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
    postings.write_parquet(index_dir, partition_cols=["bucket"])
    return index_dir


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
    import pyarrow.dataset as pads
    import ray.data as rd

    if not tokens:
        raise ValueError("tokens must be non-empty")
    base = table.current_snapshot_id() if snapshot_id is None else snapshot_id
    index_dir = table._p("index", f"s{base:06d}", "tokens")
    paths: set | None = None
    for token in tokens:
        bucket = int(_token_bucket(np.array([token], dtype=object))[0])
        bucket_dir = os.path.join(index_dir, f"bucket={bucket}")
        if not os.path.isdir(bucket_dir):
            return rd.from_arrow(table.schema_of(base).empty_table())
        postings = pads.dataset(bucket_dir).to_table(
            columns=["token", "path"], filter=pads.field("token") == token
        )
        s = set(postings.column("path").to_pylist())
        paths = s if paths is None else (paths & s)
        if not paths:
            return rd.from_arrow(table.schema_of(base).empty_table())
    abs_paths = [p if os.path.isabs(p) else table._p(p) for p in sorted(paths)]
    want = list(tokens)

    def keep_rows(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].astype(str).str.findall(r"\S+")
        has = toks.map(lambda ts: all(t in ts for t in want))
        return b[has.to_numpy()]

    ds = rd.read_parquet(abs_paths, columns=columns)
    return ds.map_batches(keep_rows, batch_format="pandas")


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
    import pyarrow.dataset as pads
    import ray.data as rd

    if not tokens:
        raise ValueError("tokens must be non-empty")
    base = table.current_snapshot_id() if snapshot_id is None else snapshot_id
    index_dir = table._p("index", f"s{base:06d}", "tokens")
    paths: set = set()
    for token in tokens:
        bucket = int(_token_bucket(np.array([token], dtype=object))[0])
        bucket_dir = os.path.join(index_dir, f"bucket={bucket}")
        if not os.path.isdir(bucket_dir):
            continue
        postings = pads.dataset(bucket_dir).to_table(
            columns=["token", "path"], filter=pads.field("token") == token
        )
        paths |= set(postings.column("path").to_pylist())
    if not paths:
        return rd.from_arrow(table.schema_of(base).empty_table())
    abs_paths = [p if os.path.isabs(p) else table._p(p) for p in sorted(paths)]
    want = set(tokens)

    def keep_rows(b: pd.DataFrame) -> pd.DataFrame:
        toks = b[text_col].astype(str).str.findall(r"\S+")
        has = toks.map(lambda ts: any(t in want for t in ts))
        return b[has.to_numpy()]

    ds = rd.read_parquet(abs_paths, columns=columns)
    return ds.map_batches(keep_rows, batch_format="pandas")


def search_token(
    table: TranscriptTable,
    token: str,
    snapshot_id: int | None = None,
    text_col: str = "text",
    columns: list[str] | None = None,
):
    """Exact-token search: rows whose ``\\S+`` tokenization contains
    ``token``.  Reads one index bucket to find candidate files, scans only
    those, then applies the exact row filter (same tokenization as the
    index, so pruning is sound — never a missed row)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    base = table.current_snapshot_id() if snapshot_id is None else snapshot_id
    index_dir = table._p("index", f"s{base:06d}", "tokens")
    bucket = int(_token_bucket(np.array([token], dtype=object))[0])
    bucket_dir = os.path.join(index_dir, f"bucket={bucket}")
    if not os.path.isdir(bucket_dir):
        return rd.from_arrow(table.schema_of(base).empty_table())
    postings = pads.dataset(bucket_dir).to_table(
        columns=["token", "path"], filter=pads.field("token") == token
    )
    paths = sorted(set(postings.column("path").to_pylist()))
    if not paths:
        return rd.from_arrow(table.schema_of(base).empty_table())
    abs_paths = [p if os.path.isabs(p) else table._p(p) for p in paths]

    def keep_rows(b: pd.DataFrame) -> pd.DataFrame:
        has = b[text_col].astype(str).str.findall(r"\S+").map(lambda ts: token in ts)
        return b[has.to_numpy()]

    ds = rd.read_parquet(abs_paths, columns=columns)
    return ds.map_batches(keep_rows, batch_format="pandas")
