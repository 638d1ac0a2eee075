from .dedup import exact_dedup, minhash_lsh_dedup, ngram_jaccard, simhash_dedup
from .similarity import brute_force_topk, embedding_near_dup_pairs, ivf_topk
from .text import Fingerprinter, LangId, TextStats, TokenCounter

__all__ = [
    "exact_dedup",
    "minhash_lsh_dedup",
    "ngram_jaccard",
    "simhash_dedup",
    "brute_force_topk",
    "embedding_near_dup_pairs",
    "ivf_topk",
    "Fingerprinter",
    "LangId",
    "TextStats",
    "TokenCounter",
]
