"""Large-scale pipeline operators: dedup, similarity search, text analysis,
corpus cleaning (PII/quality/decontamination/sampling), multimodal
plumbing, rule-impact reporting."""

from .cleaning import (
    chunk_documents,
    decontaminate,
    decontaminate_fuzzy,
    dedup_spans_within_doc,
    mixture_report,
    oversample_by_key,
    gopher_quality_flags,
    pack_token_budget,
    remove_boilerplate_spans,
    sample_per_key,
    sample_to_token_budget,
    scrub_pii,
    stratified_sample,
    trim_by_quantile,
)
from .dedup import (
    content_digests,
    dedup_exact,
    dedup_exact_against,
    exact_duplicate_groups,
    embedding_near_dup_pairs,
    jaccard_ngram_pairs,
    minhash_lsh_join,
    minhash_lsh_pairs,
    minhash_lsh_pairs_ml,
    minhash_signatures,
    simhash_pairs,
)
from .events import funnel_counts, sessionize
from .expectations import Expectation, check_expectations, flag_violations
from .semistructured import extract_json_fields, flatten_json
from .snapshot import snapshot_diff
from .groups import connected_components_star, dedup_keep_best, near_dup_groups
from .impact import rule_impact_report
from .joins import asof_join, range_join, salted_join
from .profiling import column_profile, histogram, length_quartiles_by_source
from .scoring import fake_quality_scorer, score_with_model
from .similarity import (
    blocked_cosine_pairs,
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_lsh,
    cosine_topk_pq,
    embedding_norms,
)
from .textops import (
    distinctive_tokens,
    language_id,
    text_fingerprints,
    text_stats,
    top_tokens,
)

__all__ = [
    "chunk_documents",
    "decontaminate",
    "decontaminate_fuzzy",
    "dedup_spans_within_doc",
    "oversample_by_key",
    "gopher_quality_flags",
    "pack_token_budget",
    "remove_boilerplate_spans",
    "sample_per_key",
    "sample_to_token_budget",
    "scrub_pii",
    "stratified_sample",
    "trim_by_quantile",
    "mixture_report",
    "content_digests",
    "dedup_exact",
    "dedup_exact_against",
    "exact_duplicate_groups",
    "embedding_near_dup_pairs",
    "jaccard_ngram_pairs",
    "minhash_lsh_join",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_ml",
    "minhash_signatures",
    "simhash_pairs",
    "rule_impact_report",
    "asof_join",
    "range_join",
    "salted_join",
    "column_profile",
    "length_quartiles_by_source",
    "score_with_model",
    "fake_quality_scorer",
    "histogram",
    "sessionize",
    "funnel_counts",
    "Expectation",
    "check_expectations",
    "flag_violations",
    "extract_json_fields",
    "flatten_json",
    "snapshot_diff",
    "near_dup_groups",
    "connected_components_star",
    "dedup_keep_best",
    "blocked_cosine_pairs",
    "cosine_topk",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    "cosine_topk_pq",
    "embedding_norms",
    "language_id",
    "text_fingerprints",
    "text_stats",
    "distinctive_tokens",
    "top_tokens",
]
