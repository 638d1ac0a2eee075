from .dedup import exact_dedup, minhash_lsh_dedup, ngram_jaccard, ngram_jaccard_join, simhash_dedup
from .ivf_index import build_ivf_index, extend_ivf_index, probe_ivf_near_dups, search_ivf_index
from .jaccard_index import build_jaccard_index, extend_jaccard_index, probe_jaccard_index
from .minhash_index import build_minhash_index, extend_minhash_index, probe_minhash_index
from .packing import global_cumsum, pack_sequences
from .sampling import hash_sample, quota_sample
from .similarity import brute_force_topk, embedding_near_dup_pairs, ivf_topk
from .text import Fingerprinter, LangId, TextStats, TokenCounter

__all__ = [
    "exact_dedup",
    "minhash_lsh_dedup",
    "ngram_jaccard",
    "ngram_jaccard_join",
    "simhash_dedup",
    "build_jaccard_index",
    "extend_jaccard_index",
    "probe_jaccard_index",
    "build_ivf_index",
    "extend_ivf_index",
    "search_ivf_index",
    "probe_ivf_near_dups",
    "build_minhash_index",
    "extend_minhash_index",
    "probe_minhash_index",
    "global_cumsum",
    "pack_sequences",
    "hash_sample",
    "quota_sample",
    "brute_force_topk",
    "embedding_near_dup_pairs",
    "ivf_topk",
    "Fingerprinter",
    "LangId",
    "TextStats",
    "TokenCounter",
]
