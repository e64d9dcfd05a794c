"""Large-scale pipeline operators: dedup, similarity search, text analysis,
multimodal plumbing, rule-impact reporting."""

from .dedup import (
    dedup_exact,
    exact_duplicate_groups,
    embedding_near_dup_pairs,
    jaccard_ngram_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)
from .impact import rule_impact_report
from .similarity import cosine_topk, cosine_topk_lsh
from .textops import language_id, text_fingerprints, text_stats

__all__ = [
    "dedup_exact",
    "exact_duplicate_groups",
    "embedding_near_dup_pairs",
    "jaccard_ngram_pairs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "rule_impact_report",
    "cosine_topk",
    "cosine_topk_lsh",
    "language_id",
    "text_fingerprints",
    "text_stats",
]
