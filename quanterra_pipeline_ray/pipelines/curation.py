"""Training-data curation flow: the composed end-to-end pipeline.

The showcase composition a 100-TB pre-training pipeline runs nightly, built
entirely from this engine's verified operators (each independently
oracle-checked), streaming through ONE Ray Data lineage with no driver
materialization of corpus-sized data:

    read -> quality gate (TextStats) -> language id (LangId)
         -> near-dup removal (MinHash-LSH groups, keep the group minimum)
         -> write partitioned parquet

The quality/langid stages are corpus-wide streaming map_batches; dedup is
the bucketed LSH pipeline from :mod:`..functions.dedup`; the survivors are
labeled by a broadcast component map and filtered vectorized.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.dedup import minhash_lsh_dedup
from ..functions.text import LangId, TextStats
from ..util import pool_size


def curate_documents(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.8,
    min_tokens: int = 20,
    dedup_threshold: float = 0.8,
    langid_max_words: int | None = None,
    out_dir: str | None = None,
):
    """Quality-gate, language-id, and near-dedup a document corpus.

    Returns the curated Dataset ``(id, text stats, lang, dup_group)`` with
    exactly one survivor (minimum id) per near-dup component; writes
    partitioned parquet when ``out_dir`` is given (resumable layout: one
    directory per language).
    """
    scored = ds.map_batches(TextStats(text_col), batch_format="pandas")
    gated = scored.map_batches(
        lambda b: b[(b["quality_score"] >= min_quality) & (b["n_tokens"] >= min_tokens)],
        batch_format="pandas",
    )
    tagged = gated.map_batches(
        LangId,
        fn_constructor_kwargs={"text_col": text_col, "max_words": langid_max_words},
        batch_format="pandas",
        concurrency=pool_size(2, pools_in_pipeline=2),
    ).materialize()

    # near-dedup over the GATED corpus: groups computed on survivors only
    groups = minhash_lsh_dedup(tagged, id_col, text_col, threshold=dedup_threshold)

    # keep the minimum-id member of each component.  The DROP set (non-
    # canonical dup members, dup_group != id) is duplicate-bounded — the
    # small side — so it broadcasts; the survivor set is corpus-sized and
    # never leaves the cluster.
    def non_canonical(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["dup_group"].to_numpy() != b[id_col].to_numpy(), [id_col]]

    import ray

    drop_ref = ray.put(
        np.unique(
            groups.map_batches(non_canonical, batch_format="pandas")
            .to_pandas()[id_col]
            .to_numpy()
        )
    )

    def keep_rows(b: pd.DataFrame) -> pd.DataFrame:
        keep = ~np.isin(b[id_col].to_numpy(), ray.get(drop_ref))
        return b[keep]

    curated = tagged.map_batches(keep_rows, batch_format="pandas")
    if out_dir is not None:
        curated.write_parquet(out_dir, partition_cols=["lang_pred"])
    return curated
