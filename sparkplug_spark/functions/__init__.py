"""Column-function library: text, hashing, and vector helpers.

Everything here is built from ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd) — no Python UDFs.  Hashes derive from ``md5`` so
results are reproducible across engines (the DuckDB correctness oracle
computes the identical values).
"""

from .text import (
    MINHASH_PERMS,
    MINHASH_PRIME,
    STOPWORDS,
    hash32,
    lang_scores,
    mean_token_len,
    minhash_signature,
    normalize_text,
    punct_ratio,
    quality_score,
    simhash32,
    stopword_ratio,
    token_fingerprint,
    tokens,
    word_shingles,
)
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "MINHASH_PERMS",
    "MINHASH_PRIME",
    "STOPWORDS",
    "hash32",
    "lang_scores",
    "mean_token_len",
    "minhash_signature",
    "normalize_text",
    "punct_ratio",
    "quality_score",
    "simhash32",
    "stopword_ratio",
    "token_fingerprint",
    "tokens",
    "word_shingles",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
