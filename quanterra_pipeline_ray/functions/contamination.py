"""Benchmark-contamination flagging for training corpora.

Before training, every doc is checked against a (small) set of benchmark
phrases — eval-set excerpts whose verbatim presence in training data
invalidates the eval (the GPT-3 appendix-C n-gram decontamination, here in
its exact-substring form).  The benchmark side is tiny (thousands of
phrases); the corpus side is the 100-TB table, so the only scalable shape is
*broadcast the phrases, stream the corpus*:

* :func:`benchmark_phrases` derives a deterministic phrase set from a seeded
  md5 sample of a corpus (a fixed character window per sampled doc,
  lower-cased) — a stand-in for reading a real eval set, keeping everything
  synthesisable and SQL-checkable.
* :func:`flag_contaminated` compiles the phrases ONCE per actor into a
  single alternation regex (escaped literals → plain substring semantics)
  and runs one vectorized ``str.contains`` pass per batch.  The phrase list
  rides in the actor constructor — shipped once per actor, never per batch.

Scale note: a few thousand phrases fit one compiled regex; for millions of
phrases the right kernel is hashed n-gram membership (hash every n-gram of
the doc, probe a broadcast frozenset) or Aho–Corasick — same broadcast
shape, different inner kernel.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..util import pool_size as _pool_size
from .sampling import _md5_keys, fraction_threshold_hex


def benchmark_phrases(
    ds,
    fraction: float = 0.02,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 7,
    start: int = 20,
    length: int = 40,
) -> list[str]:
    """Deterministic benchmark set: from the ~``fraction`` of docs whose
    ``md5(id || ':' || seed)`` is below the threshold (and long enough),
    take ``text[start : start+length]`` lower-cased.  Returns the sorted
    distinct phrase list — driver-side by design: the benchmark set is the
    SMALL side of the broadcast."""
    thr = fraction_threshold_hex(fraction)

    def pick(b: pd.DataFrame):
        import pyarrow as pa

        keys = _md5_keys(b[id_col].to_numpy(), seed)
        s = b[text_col].astype(str)
        keep = (keys < thr) & (s.str.len() >= start + length).to_numpy()
        ph = s[keep].str.slice(start, start + length).str.lower()
        # typed Arrow output: an empty pandas object column loses its schema
        return pa.table({"phrase": pa.array(list(ph), type=pa.string())})

    rows = ds.map_batches(pick, batch_format="pandas").take_all()
    return sorted({r["phrase"] for r in rows})


class ContaminationFlagger:
    """Actor stage: one compiled alternation regex, one vectorized
    ``str.contains`` pass per batch."""

    def __init__(self, phrases: list[str], id_col: str, text_col: str, out_col: str):
        self.rx = (
            re.compile("|".join(re.escape(p) for p in phrases)) if phrases else None
        )
        self.id_col, self.text_col, self.out_col = id_col, text_col, out_col

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        out = b[[self.id_col]].copy()
        if self.rx is None:
            out[self.out_col] = np.zeros(len(b), dtype=bool)
        else:
            s = b[self.text_col].astype(str).str.lower()
            out[self.out_col] = s.str.contains(self.rx, regex=True).to_numpy()
        return out


def flag_contaminated(
    ds,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "contaminated",
    concurrency: int = 8,
):
    """``(id, contaminated)`` per row: True iff the lower-cased text contains
    ANY benchmark phrase as a substring."""
    return ds.map_batches(
        ContaminationFlagger,
        fn_constructor_args=(list(phrases), id_col, text_col, out_col),
        batch_format="pandas",
        concurrency=_pool_size(concurrency),
    )


def benchmark_phrase_windows(
    ds,
    fraction: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 7,
    start: int = 20,
    length: int = 24,
    stride: int = 17,
    count: int = 8,
) -> list[str]:
    """Mid-size benchmark set: ``count`` fixed character windows per sampled
    doc (window k covers ``[start + stride*k, +length)``), lower-cased —
    the multi-window generalization of :func:`benchmark_phrases` that
    produces thousands-to-tens-of-thousands of phrases, the regime where
    the alternation regex degrades and Aho–Corasick wins.  Small side by
    construction; driver-collected by design."""
    thr = fraction_threshold_hex(fraction)

    def pick(b: pd.DataFrame):
        import pyarrow as pa

        keys = _md5_keys(b[id_col].to_numpy(), seed)
        s = b.loc[keys < thr, text_col].astype(str).str.lower()
        ph: set[str] = set()
        for k in range(count):
            off = start + stride * k
            w = s[s.str.len() >= off + length].str.slice(off, off + length)
            ph.update(w)
        return pa.table({"phrase": pa.array(sorted(ph), type=pa.string())})

    rows = ds.map_batches(pick, batch_format="pandas").take_all()
    return sorted({r["phrase"] for r in rows})


class AhoCorasick:
    """Multi-pattern substring matcher (Aho & Corasick 1975, CACM 18(6)):
    a trie over the phrases with BFS failure links, terminal flags
    propagated through the links so ``contains_any`` can stop at the FIRST
    hit.  Built once per actor (the stateful-stage discipline); matching is
    the classic amortized-O(len) goto/fail loop.  Unlike the alternation
    regex, build and match cost are independent of the phrase COUNT —
    only total phrase bytes (trie edges) matter — so this is the kernel
    for the mid-size regime (10^3–10^5 phrases) between `re` (dozens) and
    hashed n-gram membership (millions of fixed-length grams)."""

    def __init__(self, phrases: list[str]):
        goto: list[dict[str, int]] = [{}]
        terminal = [False]
        for p in phrases:
            if not p:
                continue
            st = 0
            for ch in p:
                nxt = goto[st].get(ch)
                if nxt is None:
                    goto.append({})
                    terminal.append(False)
                    nxt = len(goto) - 1
                    goto[st][ch] = nxt
                st = nxt
            terminal[st] = True
        fail = [0] * len(goto)
        from collections import deque

        q = deque()
        for ch, s in goto[0].items():
            fail[s] = 0
            q.append(s)
        while q:
            r = q.popleft()
            for ch, s in goto[r].items():
                q.append(s)
                f = fail[r]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[s] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != s else 0
                terminal[s] = terminal[s] or terminal[fail[s]]
        self._goto, self._fail, self._terminal = goto, fail, terminal
        self._empty = not any(terminal)

    def contains_any(self, text: str) -> bool:
        if self._empty:
            return False
        goto, fail, terminal = self._goto, self._fail, self._terminal
        st = 0
        for ch in text:
            while st and ch not in goto[st]:
                st = fail[st]
            st = goto[st].get(ch, 0)
            if terminal[st]:
                return True
        return False


class ACContaminationFlagger:
    """Actor stage: the Aho–Corasick automaton builds ONCE per actor from
    the broadcast phrase list; each batch is one first-hit scan per doc."""

    def __init__(self, phrases: list[str], id_col: str, text_col: str, out_col: str):
        self.ac = AhoCorasick(phrases)
        self.id_col, self.text_col, self.out_col = id_col, text_col, out_col

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        ac = self.ac
        out = b[[self.id_col]].copy()
        out[self.out_col] = np.fromiter(
            (ac.contains_any(t.lower()) for t in b[self.text_col].astype(str)),
            dtype=bool,
            count=len(b),
        )
        return out


def flag_contaminated_ac(
    ds,
    phrases: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "contaminated",
    concurrency: int = 8,
):
    """``(id, contaminated)`` via Aho–Corasick — identical semantics to
    :func:`flag_contaminated` (lower-cased substring, ANY phrase), the
    mid-size-phrase-set kernel.  Same broadcast-the-phrases shape: the
    list rides the actor constructor once, never per batch."""
    return ds.map_batches(
        ACContaminationFlagger,
        fn_constructor_args=(list(phrases), id_col, text_col, out_col),
        batch_format="pandas",
        concurrency=_pool_size(concurrency),
    )


class ACShardFlagger:
    """One stage of the SHARDED Aho–Corasick chain: builds the automaton
    for its own phrase shard only (1/K of the trie heap and build CPU per
    actor), ORs its hits into the carried flag column, and SKIPS docs an
    earlier shard already flagged (first-hit short-circuit across the
    whole chain, not just within one automaton)."""

    def __init__(
        self, phrases: list[str], id_col: str, text_col: str, out_col: str,
        carry: bool,
    ):
        self.ac = AhoCorasick(phrases)
        self.id_col, self.text_col, self.out_col = id_col, text_col, out_col
        self.carry = carry  # False on the first shard (flag col absent)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        ac = self.ac
        texts = b[self.text_col].astype(str)
        if self.carry:
            flag = b[self.out_col].to_numpy(copy=True)
            tarr = texts.to_numpy()
            for i in np.flatnonzero(~flag):
                if ac.contains_any(tarr[i].lower()):
                    flag[i] = True
        else:
            flag = np.fromiter(
                (ac.contains_any(t.lower()) for t in texts),
                dtype=bool,
                count=len(b),
            )
        out = b[[self.id_col, self.text_col]].copy()
        out[self.out_col] = flag
        return out


def flag_contaminated_ac_sharded(
    ds,
    phrases: list[str],
    n_shards: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "contaminated",
    concurrency: int = 8,
):
    """``(id, contaminated)`` with the phrase set SHARDED over a chain of
    ``n_shards`` actor-pool stages — the scale path for phrase sets too
    large for one automaton (>10^6–10^7 phrases: a single Python trie
    costs ~hundreds of bytes/char × concurrency in worker heap, and its
    build repeats in EVERY actor).  Each stage ships and builds only its
    1/K round-robin shard; docs stream through the chain with
    backpressure (Ray Data pipelines the stages), and a doc flagged by an
    earlier shard is never rescanned.  Identical semantics to
    :func:`flag_contaminated_ac` for any shard count.

    The honest trade, measured in BASELINE §g: a CLEAN doc is scanned
    once per shard (automaton scan cost is O(len), independent of phrase
    count), so wall grows ~linearly with K while per-actor build time and
    heap SHRINK ~1/K — shard only when the single automaton cannot fit or
    its per-actor build dominates.  Cf. the reference's bounded-fan-out
    split of one large work set (`src/services/eodhd_processor.py:178`)."""
    n_shards = max(1, min(n_shards, max(1, len(phrases))))
    shards = [list(phrases[i::n_shards]) for i in range(n_shards)]
    # all shard pools run CONCURRENTLY (the chain pipelines); size each so
    # the whole chain plus task slots fits the cluster, or the executor
    # live-locks (see util.pool_size)
    per_stage = _pool_size(concurrency, pools_in_pipeline=n_shards)
    out = ds
    for i, shard in enumerate(shards):
        out = out.map_batches(
            ACShardFlagger,
            fn_constructor_args=(shard, id_col, text_col, out_col, i > 0),
            batch_format="pandas",
            concurrency=per_stage,
        )
    return out.map_batches(
        lambda b: b.select([id_col, out_col]), batch_format="pyarrow"
    )


def _word_ngrams(text: str, n: int) -> list[str]:
    ws = text.lower().split()
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


def benchmark_ngrams(
    ds,
    fraction: float = 0.02,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 13,
) -> frozenset:
    """N-gram benchmark set: ALL distinct lower-cased word ``n``-grams of the
    seeded md5 sample — the membership structure for the n-gram form of the
    decontamination filter (GPT-3 appendix C uses 13-gram collisions; the
    principle is identical at any n).  Small side by construction."""
    thr = fraction_threshold_hex(fraction)

    def pick(b: pd.DataFrame):
        import pyarrow as pa

        keys = _md5_keys(b[id_col].to_numpy(), seed)
        grams: set[str] = set()
        for t in b.loc[keys < thr, text_col].astype(str):
            grams.update(_word_ngrams(t, n))
        return pa.table({"gram": pa.array(sorted(grams), type=pa.string())})

    rows = ds.map_batches(pick, batch_format="pandas").take_all()
    return frozenset(r["gram"] for r in rows)


class NgramContaminationFlagger:
    """Actor stage: the benchmark n-gram set ships once per actor; each doc
    is flagged iff ANY of its word n-grams is a member.  Per-doc dispatch
    loop with O(1) set probes per gram — the membership structure (not a
    regex) is what scales to millions of benchmark grams."""

    def __init__(self, grams: frozenset, n: int, id_col: str, text_col: str, out_col: str):
        self.grams, self.n = grams, n
        self.id_col, self.text_col, self.out_col = id_col, text_col, out_col

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        g, n = self.grams, self.n
        out = b[[self.id_col]].copy()
        out[self.out_col] = np.fromiter(
            (any(x in g for x in _word_ngrams(t, n)) for t in b[self.text_col].astype(str)),
            dtype=bool,
            count=len(b),
        )
        return out


def flag_contaminated_ngrams(
    ds,
    grams: frozenset,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "contaminated",
    concurrency: int = 8,
):
    """``(id, contaminated)``: True iff ANY word n-gram of the doc is in the
    benchmark set — the scale path when the benchmark side outgrows a
    compiled regex (set membership is O(1) per gram at any set size)."""
    return ds.map_batches(
        NgramContaminationFlagger,
        fn_constructor_args=(frozenset(grams), n, id_col, text_col, out_col),
        batch_format="pandas",
        concurrency=_pool_size(concurrency),
    )
