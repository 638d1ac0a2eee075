"""Deterministic synthetic transcripts (seeded, no wall clock).

Two sources of transcript-shaped data:

* :func:`generate_transcripts` — a pure, vectorized numpy generator producing
  a skewed conversation-size distribution (a few hot conversations, many
  small ones), mirroring the reference's known skew pain point (full-exchange
  fan-out disabled in prod, reference `pipeline_settings.py:79-84`).

* :func:`transcripts_from_events` — derives a transcripts table from the
  driver test data's ``events`` table with a mapping that is expressible in
  ANSI SQL (see :data:`TRANSCRIPTS_FROM_EVENTS_SQL`), so DuckDB can act as an
  oracle for maintenance-op scan equality.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .schema import TRANSCRIPTS_SCHEMA, ensure_schema

_TOOLS = np.array(["search", "browser", "python", "calculator", "sql", "editor", "shell", "api"])
_WORDS = (
    "table scan merge sort hash join filter window agg query plan batch block "
    "shuffle spill actor stream vector column row key range bucket salt skew "
    "manifest snapshot lineage checkpoint compact cluster order data file turn"
).split()

# epoch base for synthetic timestamps: 2024-01-01T00:00:00 in microseconds.
_TS0_US = 1_704_067_200_000_000


def _sentence_pool(seed: int, n: int = 512) -> np.ndarray:
    """Deterministic pool of pseudo-sentences with varying length."""
    rng = np.random.default_rng(seed ^ 0x5EED)
    pool = []
    for _ in range(n):
        k = int(rng.integers(5, 60))
        words = rng.choice(_WORDS, size=k)
        pool.append(" ".join(words.tolist()))
    return np.array(pool, dtype=object)


def generate_transcripts(
    n_convs: int = 1000,
    seed: int = 42,
    mean_turns: int = 16,
    max_turns: int = 4096,
    hot_convs: int = 3,
    hot_turns: int = 2000,
) -> pa.Table:
    """Vectorized deterministic transcripts table.

    Conversation lengths follow a heavy-tailed (Pareto) distribution capped at
    ``max_turns`` plus ``hot_convs`` explicit hot conversations of
    ``hot_turns`` turns each, so skew-handling paths are always exercised.
    """
    rng = np.random.default_rng(seed)
    lengths = np.clip(
        ((rng.pareto(1.7, n_convs) + 1.0) * (mean_turns / 2.4)).astype(np.int64), 1, max_turns
    )
    if hot_convs > 0:
        hot_idx = rng.choice(n_convs, size=min(hot_convs, n_convs), replace=False)
        lengths[hot_idx] = hot_turns
    total = int(lengths.sum())
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])

    conv_ord = np.repeat(np.arange(n_convs), lengths)
    turn_idx = (np.arange(total) - np.repeat(starts, lengths)).astype(np.int32)

    # build one string per conversation, then repeat (vectorized; never one
    # Python format call per row)
    conv_pool = np.array([f"conv-{seed}-{i:08d}" for i in range(n_convs)], dtype=object)
    conv_id = np.repeat(conv_pool, lengths)

    conv_salt = rng.integers(0, 1 << 31, size=n_convs)
    row_salt = np.repeat(conv_salt, lengths) + turn_idx.astype(np.int64) * 2654435761
    roles = np.where(
        turn_idx % 2 == 0,
        "user",
        np.where(row_salt % 7 == 0, "tool", "assistant"),
    ).astype(object)
    tool = np.where(roles == "tool", _TOOLS[row_salt % len(_TOOLS)], "").astype(object)

    pool = _sentence_pool(seed)
    base = pool[row_salt % len(pool)]
    text = (
        pd.Series(base, dtype=object)
        + pd.Series(np.char.add(" #", (row_salt % 100_000).astype(str)), dtype=object)
    ).to_numpy(dtype=object)

    conv_start = rng.integers(0, 365 * 24 * 3600, size=n_convs) * 1_000_000 + _TS0_US
    ts_us = np.repeat(conv_start, lengths) + turn_idx.astype(np.int64) * 30_000_000 + (
        row_salt % 10_000_000
    )

    table = pa.table(
        {
            "conv_id": pa.array(conv_id, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": pa.array(text, type=pa.large_string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts_us, type=pa.timestamp("us")),
        }
    )
    return ensure_schema(table)


#: SQL over the driver's ``events`` view that defines the derived transcripts
#: table.  :func:`transcripts_from_events` MUST stay semantically identical to
#: this string — it is the DuckDB oracle for every maintenance-op
#: scan-equality query in ``__ray_entry__``.
TRANSCRIPTS_FROM_EVENTS_SQL = """
SELECT
  'c' || CAST(user_id AS VARCHAR) AS conv_id,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY event_id) - 1 AS INTEGER) AS turn_idx,
  CASE
    WHEN event_type IN ('click', 'view') THEN 'user'
    WHEN event_type = 'purchase' THEN 'assistant'
    WHEN event_type = 'signup' THEN 'system'
    ELSE 'tool'
  END AS role,
  props || ' ' || event_type AS text,
  CASE WHEN event_type IN ('purchase', 'error') THEN event_type ELSE '' END AS tool,
  ts
FROM events
""".strip()


def transcripts_from_events(sf_dir: str) -> pa.Table:
    """Derive a transcripts table from ``{sf_dir}/events.parquet``.

    Semantically identical to :data:`TRANSCRIPTS_FROM_EVENTS_SQL`.  Runs
    driver-side with pyarrow/pandas — this is fixture construction for the
    oracle-checked maintenance queries, not a measured operator (the measured
    path uses :func:`generate_transcripts` fragments).
    """
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet")
    df = t.to_pandas().sort_values(["user_id", "event_id"], kind="mergesort")
    turn_idx = df.groupby("user_id", sort=False).cumcount().astype(np.int32)
    et = df["event_type"]
    role = np.select(
        [et.isin(["click", "view"]), et == "purchase", et == "signup"],
        ["user", "assistant", "system"],
        default="tool",
    )
    tool = np.where(et.isin(["purchase", "error"]), et, "")
    out = pd.DataFrame(
        {
            "conv_id": "c" + df["user_id"].astype(str),
            "turn_idx": turn_idx,
            "role": role,
            "text": df["props"] + " " + et,
            "tool": tool,
            "ts": df["ts"],
        }
    )
    return ensure_schema(pa.Table.from_pandas(out, preserve_index=False))


def fragment_table(
    table: pa.Table, out_dir: str, n_files: int, seed: int = 7, shuffle: bool = True
) -> list[str]:
    """Write ``table`` as ``n_files`` small parquet fragments under ``out_dir``.

    Rows are deterministically shuffled first so fragments interleave
    conversations — the worst-case small-file layout that compaction and
    clustering must fix.  Returns the written paths.
    """
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    if shuffle:
        perm = np.random.default_rng(seed).permutation(n)
        table = table.take(pa.array(perm))
    bounds = np.linspace(0, n, n_files + 1).astype(int)
    paths = []
    for i in range(n_files):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        if hi <= lo:
            continue
        path = os.path.join(out_dir, f"frag-{i:05d}.parquet")
        pq.write_table(table.slice(lo, hi - lo), path, compression="zstd")
        paths.append(path)
    return paths


def fragment_table_with_entries(
    table: pa.Table, out_dir: str, n_files: int, seed: int = 7
) -> list[dict]:
    """Like :func:`fragment_table` but also returns manifest-ready DataFile
    entries (checksum + stats computed from the in-memory bytes, no re-read).

    Lets a benchmark generate input ONCE and register it into many fresh
    table roots without driver-side re-reading."""
    import hashlib as _hashlib
    import io
    import os

    import pyarrow.parquet as pq

    from .state.manifest import table_stats

    os.makedirs(out_dir, exist_ok=True)
    n = table.num_rows
    perm = np.random.default_rng(seed).permutation(n)
    table = table.take(pa.array(perm))
    bounds = np.linspace(0, n, n_files + 1).astype(int)
    entries = []
    for i in range(n_files):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        if hi <= lo:
            continue
        chunk = table.slice(lo, hi - lo)
        buf = io.BytesIO()
        pq.write_table(chunk, buf, compression="zstd")
        payload = buf.getvalue()
        path = os.path.join(out_dir, f"frag-{i:05d}.parquet")
        with open(path, "wb") as f:
            f.write(payload)
        entries.append(
            {
                "path": path,
                "rows": chunk.num_rows,
                "bytes": len(payload),
                "checksum": _hashlib.sha256(payload).hexdigest(),
                "stats": table_stats(chunk),
            }
        )
    return entries


def content_fingerprint(table: pa.Table) -> str:
    """Order-insensitive fingerprint of a transcripts table (test helper)."""
    df = table.to_pandas().sort_values(["conv_id", "turn_idx"], kind="mergesort")
    h = hashlib.sha256()
    for col in TRANSCRIPTS_SCHEMA.names:
        h.update(pd.util.hash_pandas_object(df[col], index=False).values.tobytes())
    return h.hexdigest()


def generate_zipf_documents(
    n_docs: int,
    vocab_size: int = 50_000,
    alpha: float = 1.1,
    mean_tokens: int = 80,
    seed: int = 42,
) -> "pa.Table":
    """Documents with a ZIPFIAN token vocabulary — realistic text statistics.

    The driver-supplied ``documents.parquet`` draws from a tiny vocabulary
    (~2k distinct 5-grams at sf0.1), which is the worst case for similarity
    joins: every shingle is common, prefix/bloom pruning keeps nothing, and
    candidates explode.  Real corpora are Zipf-distributed — most shingles
    are RARE — which is exactly the regime the df-rare prefix and the
    partition/bloom pruning are designed for.  This generator exists so
    that regime is testable without external data.
    """
    rng = np.random.default_rng(seed)
    # Zipf ranks via inverse-CDF over a truncated power law (vectorized)
    ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
    probs = ranks ** (-alpha)
    probs /= probs.sum()
    lens = np.maximum(5, rng.poisson(mean_tokens, n_docs))
    total = int(lens.sum())
    toks = rng.choice(vocab_size, size=total, p=probs)
    # compact token surface forms: base-26 letters, length-varied
    def word(t: int) -> str:
        s = []
        t = int(t) + 1
        while t:
            s.append(chr(97 + t % 26))
            t //= 26
        return "".join(s)

    vocab_words = np.array([word(t) for t in range(vocab_size)], dtype=object)
    offs = np.concatenate([[0], np.cumsum(lens)])
    texts = [
        " ".join(vocab_words[toks[offs[i] : offs[i + 1]]]) for i in range(n_docs)
    ]
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
        }
    )
