"""Text-analysis stages for large-scale training-data pipelines.

All operators are vectorized ``map_batches`` stages over an arbitrary text
column; stateful pieces (compiled regexes, stopword tables) live in callable
classes constructed once per actor — the Ray-native version of the
reference's per-process singletons (reference
`src/clients/google_cloud_storage_client.py:14-38`).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# ---------------------------------------------------------------------- stats


class TextStats:
    """Adds integer text statistics + a quality score.

    Output columns (exact arithmetic, so a SQL oracle can reproduce them
    bit-for-bit): ``n_chars_txt`` (length), ``n_tokens`` (count of ``\\S+``
    runs), ``token_chars`` (non-whitespace chars), ``n_punct``
    (``.,;:!?`` count), and ``quality_score = token_chars / n_chars_txt``
    (single IEEE division of identical ints — deterministic cross-engine).
    """

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.tok = re.compile(r"\S+")
        self.ws = re.compile(r"\s")
        self.punct = re.compile(r"[.,;:!?]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].astype(str)
        n_chars = s.str.len().astype(np.int64)
        n_tokens = s.str.count(self.tok).astype(np.int64)
        token_chars = (n_chars - s.str.count(self.ws)).astype(np.int64)
        batch["n_chars_txt"] = n_chars
        batch["n_tokens"] = n_tokens
        batch["token_chars"] = token_chars
        batch["n_punct"] = s.str.count(self.punct).astype(np.int64)
        batch["quality_score"] = token_chars / n_chars.clip(lower=1)
        return batch


class TokenCounter:
    """BPE-ish token estimate: words + punctuation as separate tokens.

    The regex mirrors common byte-pair pretokenizers (word pieces, numerals,
    punctuation runs) without shipping a vocab; counting is vectorized.
    """

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.pat = re.compile(r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_bpe_tokens"] = (
            batch[self.text_col].astype(str).str.count(self.pat).astype(np.int64)
        )
        return batch


# --------------------------------------------------------------- language id

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "por"},
}


class LangId:
    """Heuristic language id: stopword hits per language + CJK char ratio.

    Deterministic, vocabulary-only (no model); emits ``lang_pred`` and
    ``lang_conf``.  With ``max_words=None`` (score every word) the whole
    heuristic is ANSI-SQL-expressible — word extraction is
    ``regexp_extract_all(text, '[A-Za-z]+')``, hits are a list_filter
    against the stopword sets, the argmax tiebreak is the en→de→fr→es
    insertion order, and ``lang_conf = hits/words`` is one IEEE division of
    identical ints — so a DuckDB oracle reproduces it bit-for-bit.  The
    default caps scoring at 200 words to bound per-doc cost at scale.
    """

    def __init__(self, text_col: str = "text", max_words: int | None = 200):
        import re

        self.text_col = text_col
        self.max_words = max_words
        self.word = re.compile(r"[a-zA-Z]+")
        self.cjk = re.compile(r"[一-鿿぀-ヿ]")
        self.tables = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].astype(str)
        cjk_ratio = texts.str.count(self.cjk) / texts.str.len().clip(lower=1)
        preds, confs = [], []
        for text, cjk in zip(texts, cjk_ratio):
            if cjk > 0.2:
                preds.append("zh")
                confs.append(float(cjk))
                continue
            words = [w.lower() for w in self.word.findall(text)[: self.max_words]]
            if not words:
                preds.append("und")
                confs.append(0.0)
                continue
            scores = {
                lang: sum(w in table for w in words) / len(words)
                for lang, table in self.tables.items()
            }
            best = max(scores, key=scores.get)
            preds.append(best if scores[best] > 0 else "und")
            confs.append(scores[best])
        batch["lang_pred"] = preds
        batch["lang_conf"] = confs
        return batch


# -------------------------------------------------------------- fingerprints


class Fingerprinter:
    """Document fingerprint column: md5 hex of the raw text (matches SQL
    ``md5(text)``) — exact-dup key that any engine can reproduce."""

    def __init__(self, text_col: str = "text", out_col: str = "fingerprint"):
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch[self.out_col] = [
            hashlib.md5(str(t).encode("utf-8")).hexdigest() for t in batch[self.text_col]
        ]
        return batch


def rolling_window_hashes(text: str, window: int, base: int = 1000003) -> np.ndarray:
    """All ``window``-byte rolling (Rabin-Karp) polynomial hashes of a
    document, fully vectorized over the utf-8 byte array.

    Shared kernel: this is both the shingle hasher behind MinHash-LSH
    (:mod:`.dedup`) and the provenance fingerprint window hash
    (:class:`RollingFingerprinter`).  Short documents are space-padded to one
    window.
    """
    data = np.frombuffer(str(text).encode("utf-8"), dtype=np.uint8)
    if len(data) < window:
        data = np.pad(data, (0, window - len(data)), constant_values=32)
    b = np.uint64(base)
    powers = np.power(b, np.arange(window, dtype=np.uint64), dtype=np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(data, window).astype(np.uint64)
    return (windows * powers[::-1]).sum(axis=1, dtype=np.uint64)


class RollingFingerprinter:
    """Rolling window fingerprints for shingle-level provenance: emits the
    min and max 64-bit window hash per document (same kernel as the MinHash
    shingle hasher, so provenance fingerprints and LSH shingles agree)."""

    def __init__(self, text_col: str = "text", window: int = 16, base: int = 257):
        self.text_col = text_col
        self.window = window
        self.base = base

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        hashes = [
            rolling_window_hashes(t, self.window, self.base) for t in batch[self.text_col]
        ]
        batch["rfp_min"] = np.array([h.min() for h in hashes], dtype=np.uint64)
        batch["rfp_max"] = np.array([h.max() for h in hashes], dtype=np.uint64)
        return batch


# ---------------------------------------------------------------------- tf-idf
def tfidf_top_terms(ds, n_docs: int, doc_col: str = "doc_id", text_col: str = "text",
                    n_buckets: int = 64):
    """Per-document top TF-IDF term over a whole corpus, fully distributed.

    Plan (three bounded keyed exchanges, no driver materialization):

    1. **tokenize + tf** — Arrow-native ``utf8_lower`` + ``split_pattern``
       per block, then a per-block Arrow ``group_by`` count.  One table row
       is one whole document, so per-block (doc, term) counts are already
       complete — tf needs NO cross-block combine.
    2. **df** — the (doc, term) pairs are distinct by construction, so
       document frequency is a bucketed count by term (vocabulary-sized
       output, not corpus-sized).
    3. **score + top-1** — a bucketed join by term attaches df, the score
       is one explicitly-ordered float expression
       (``CAST(tf AS DOUBLE) * n_docs / df``) that a SQL oracle replicates
       cast-for-cast, and a final bucketed groupby by doc takes the
       (score DESC, term ASC) head — bit-exact, tie-stable.

    ``n_docs`` is passed in (a parquet-metadata count) so the pipeline
    stays lazy end to end.
    """
    import pyarrow.compute as pc

    from ..pipelines.relational import bucketed_groupby

    def tf_block(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(b.column(text_col)), " ")
        toks = toks.combine_chunks()
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.chunk(0) if toks.num_chunks else pa.array([], pa.list_(pa.string()))
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        docs = b.column(doc_col).take(
            pa.array(np.repeat(np.arange(len(lens)), lens))
        )
        flat = pc.list_flatten(toks)
        pairs = pa.table({doc_col: docs, "term": flat}).filter(
            pc.not_equal(flat, pa.scalar("", pa.string()))
        )
        return pairs.group_by([doc_col, "term"]).aggregate([([], "count_all")]).rename_columns(
            [doc_col, "term", "tf"]
        )

    tf = ds.map_batches(tf_block, batch_format="pyarrow")

    def df_count(g: pa.Table) -> pa.Table:
        out = g.select(["term"]).group_by(["term"]).aggregate([([], "count_all")])
        return out.rename_columns(["term", "df"])

    df = bucketed_groupby(
        tf.select_columns(["term"]), ["term"], df_count, n_buckets,
        group_format="pyarrow",
    )

    # bucketed join by term: tag sides, one exchange, per-bucket df map
    def tag(side):
        def f(b: pa.Table) -> pa.Table:
            cols = {
                doc_col: b.column(doc_col)
                if doc_col in b.column_names
                else pa.nulls(b.num_rows, pa.int64()),
                "term": b.column("term"),
                "tf": b.column("tf")
                if "tf" in b.column_names
                else pa.nulls(b.num_rows, pa.int64()),
                "df": b.column("df")
                if "df" in b.column_names
                else pa.nulls(b.num_rows, pa.int64()),
                "__side": pa.array(np.full(b.num_rows, side, dtype=np.int8)),
            }
            return pa.table(cols)

        return f

    both = tf.map_batches(tag(0), batch_format="pyarrow").union(
        df.map_batches(tag(1), batch_format="pyarrow")
    )

    def score_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {doc_col: pa.array([], pa.int64()),
                 "term": pa.array([], pa.string()),
                 "score": pa.array([], pa.float64())}
            )
        is_df = pc.equal(g.column("__side"), pa.scalar(1, pa.int8()))
        dft = g.filter(is_df)
        tft = g.filter(pc.invert(is_df))
        # vectorized in-bucket join: every tf term has exactly one df row here
        vocab = dft.column("term").combine_chunks()
        pos = pc.index_in(tft.column("term"), value_set=vocab)
        dfv = (
            dft.column("df")
            .combine_chunks()
            .take(pos)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        tfv = tft.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        # (tf * n_docs) / df with left-assoc IEEE ops — matches the oracle cast-for-cast
        score = tfv * float(n_docs) / dfv
        return pa.table(
            {doc_col: tft.column(doc_col), "term": tft.column("term"),
             "score": pa.array(score)}
        )

    scored = bucketed_groupby(both, ["term"], score_bucket, n_buckets,
                              group_format="pyarrow")

    def top1(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return g
        idx = pc.sort_indices(
            g,
            sort_keys=[(doc_col, "ascending"), ("score", "descending"),
                       ("term", "ascending")],
        )
        g = g.combine_chunks().take(idx)
        d = g.column(doc_col)
        n = g.num_rows
        if n > 1:
            neq = pc.not_equal(d.slice(1), d.slice(0, n - 1)).to_numpy(
                zero_copy_only=False
            )
            starts = np.flatnonzero(np.concatenate([[True], neq.astype(bool)]))
        else:
            starts = np.zeros(min(n, 1), dtype=np.int64)
        return g.take(pa.array(starts))

    return bucketed_groupby(scored, [doc_col], top1, n_buckets,
                            group_format="pyarrow")


def term_counts(ds, text_col: str = "text", n_buckets: int = 64):
    """Corpus-wide term counts — the canonical distributed word count.

    Per-block Arrow tokenize (``utf8_lower`` + ``split_pattern``) and an
    in-block ``group_by`` count (map-side combine: one row per distinct
    term per block leaves the node), then a vocabulary-sized bucketed
    sum.  The output is vocabulary-sized, so a driver top-k over it is
    O(vocab), never O(corpus)."""
    import pyarrow.compute as pc

    from ..pipelines.relational import bucketed_groupby

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(b.column(text_col)), " ")
        flat = pc.list_flatten(toks.combine_chunks())
        t = pa.table({"term": flat}).filter(
            pc.not_equal(flat, pa.scalar("", pa.string()))
        )
        out = t.group_by(["term"]).aggregate([([], "count_all")])
        return out.rename_columns(["term", "cnt"])

    def combine(g: pa.Table) -> pa.Table:
        out = g.group_by(["term"]).aggregate([("cnt", "sum")])
        return out.rename_columns(["term", "cnt"])

    return bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["term"],
        combine,
        n_buckets,
        group_format="pyarrow",
    )
