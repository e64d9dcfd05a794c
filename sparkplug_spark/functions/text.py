"""Text-analysis column functions (tokenize, shingle, hash, fingerprint,
language-ID, quality) — all built-in Spark expressions, zero UDFs.

Scale notes: every function here is a narrow per-row projection that
whole-stage-codegen compiles; nothing shuffles.  Hashes are md5-derived so
the DuckDB oracle reproduces them bit-for-bit (md5 is identical everywhere,
unlike Spark's xxhash64 / DuckDB's hash()).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "normalize_text",
    "tokens",
    "word_shingles",
    "hash32",
    "MINHASH_PRIME",
    "MINHASH_PERMS",
    "minhash_signature",
    "simhash32",
    "simhash64_pd",
    "token_fingerprint",
    "token_count_bpe",
    "unicode_normalize_pd",
    "winnowing_fingerprints",
    "STOPWORDS",
    "stopword_ratio",
    "punct_ratio",
    "mean_token_len",
    "quality_score",
    "lang_scores",
    "char_multi_ngrams_pd",
]


#: Codepoint ranges of the no-whitespace scripts the canonical normalize
#: keeps AND splits into standalone single-char tokens (Chinese/Japanese
#: text has no word spaces; each Han ideograph / Kana syllable / Hangul
#: syllable / Thai character becomes its own token, so shingles over the
#: token stream are char-n-grams — the standard IR fallback when no
#: segmenter dictionary is available).  Explicit ranges, NOT \\p{Script=}
#: properties: Java regex, RE2 (DuckDB) and Python ``re`` disagree on
#: script-property coverage, but all three treat literal hex ranges
#: identically, which is what keeps the SQL oracle bit-equal.
#: Thai combining vowels/tone marks split off their base consonant under
#: char-splitting — linguistically crude but deterministic, and shingle
#: windows recombine the context downstream.
CJK_RANGES: tuple[tuple[int, int], ...] = (
    (0x0E00, 0x0E7F),  # Thai
    (0x3040, 0x309F),  # Hiragana
    (0x30A0, 0x30FF),  # Katakana
    (0x31F0, 0x31FF),  # Katakana phonetic extensions
    (0x3400, 0x4DBF),  # CJK unified ideographs extension A
    (0x4E00, 0x9FFF),  # CJK unified ideographs
    (0xAC00, 0xD7AF),  # Hangul syllables
    (0xF900, 0xFAFF),  # CJK compatibility ideographs
)

#: The ranges as LITERAL range endpoints (actual codepoints, not \x{h}
#: escapes): Java regex (Spark), RE2 (DuckDB) and Python ``re`` all parse
#: literal-char ranges identically, and the string contains no braces —
#: safe to splice into SQL templates that later run through str.format.
CJK_CLASS: str = "".join(f"{chr(a)}-{chr(b)}" for a, b in CJK_RANGES)

#: the strip/pad passes as engine-portable pattern strings
KEEP_PATTERN: str = f"[^a-z0-9 {CJK_CLASS}]"
PAD_PATTERN: str = f"([{CJK_CLASS}])"

#: compiled pieces of the canonical normalize, shared by every Python-side
#: kernel so tokenization can never drift between operators
_STRIP = re.compile(KEEP_PATTERN)
_PAD = re.compile(PAD_PATTERN)
_SQUASH = re.compile(r" +")


def norm_py(text: str | None) -> str:
    """Python twin of :func:`normalize_text`: lowercase → strip everything
    outside [a-z0-9 space + CJK/Kana/Hangul/Thai] → space-pad each kept
    no-whitespace-script char into its own token → squash/trim."""
    return _SQUASH.sub(
        " ", _PAD.sub(r" \1 ", _STRIP.sub(" ", (text or "").lower()))
    ).strip()


def norm_tokens_py(text: str | None) -> list[str]:
    """Python twin of ``tokens``: normalize + whitespace-split one string."""
    return norm_py(text).split(" ")


def normalize_text(col: Column) -> Column:
    """lowercase, strip non-alphanumerics (keeping CJK/Kana/Hangul/Thai),
    split no-whitespace-script chars into standalone tokens, collapse
    whitespace.  Latin-only text is byte-identical to the historical
    two-pass normalize (the pad pass only fires on the kept ranges)."""
    c = F.lower(col)
    c = F.regexp_replace(c, KEEP_PATTERN, " ")
    c = F.regexp_replace(c, PAD_PATTERN, " $1 ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize_text(col), " ")


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>).  Documents shorter
    than ``n`` tokens yield a single shingle of the whole text.

    NOTE: the ``F.slice(toks, i, n)`` inside the transform lambda
    re-evaluates the full tokenize expression (two regexp_replace + split)
    once per shingle index — ~50× per doc.  Use :func:`word_shingles_pd`
    on hot paths; this JVM form is kept for expression-only contexts."""
    toks = tokens(col)
    ngrams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.array_distinct(ngrams)


def word_shingles_pd(col: Column | str, n: int = 3) -> Column:
    """Arrow-batched pandas equivalent of :func:`word_shingles` — identical
    output (same normalize → split → distinct-first-occurrence n-grams),
    but the text is tokenized exactly once per row in vectorized Python.
    ~20× faster per core than the JVM lambda form on real documents."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _shingles(s: pd.Series) -> pd.Series:
        out = []
        for text in s:
            norm = norm_py(text)
            toks = norm.split(" ")
            if len(toks) <= n:
                out.append([" ".join(toks)])
            else:
                out.append(
                    list(
                        dict.fromkeys(
                            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                        )
                    )
                )
        return pd.Series(out)

    return _shingles(col)


def shingles_minhash_pd(
    col: Column | str, n: int = 3, num_hashes: int = 32
) -> Column:
    """(shingles, sig) struct in ONE Arrow crossing: normalize → shingle →
    md5-hash each DISTINCT gram once per batch → all ``num_hashes``
    permuted minima via one vectorized ``np.minimum.reduceat``.

    Bit-identical to the explode → ``hash32`` → groupBy-min aggregation
    path (and therefore to the SQL oracle): same shingling as
    :func:`word_shingles_pd`, same ``int(md5[:8], 16)`` hash, same
    ``(a*h + b) % MINHASH_PRIME`` permutations — coefficients keep
    ``a*h+b`` under 2^63, so uint64 arithmetic is exact (twin-tested in
    ``tests/test_property_kernels.py``).  Replacing the aggregation kills
    the gram explode AND the signature shuffle: the whole signature stage
    becomes a narrow per-row projection."""
    import hashlib

    import numpy as np

    perms = MINHASH_PERMS[:num_hashes]
    A = np.array([a for a, _ in perms], dtype=np.uint64)[:, None]
    B = np.array([b for _, b in perms], dtype=np.uint64)[:, None]
    P = np.uint64(MINHASH_PRIME)

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("shingles", T.ArrayType(T.StringType())),
                T.StructField("sig", T.ArrayType(T.LongType())),
            ]
        )
    )
    def _k(s: pd.Series) -> pd.DataFrame:
        sh_lists = []
        for text in s:
            norm = norm_py(text)
            toks = norm.split(" ")
            if len(toks) <= n:
                sh_lists.append([" ".join(toks)])
            else:
                sh_lists.append(
                    list(
                        dict.fromkeys(
                            " ".join(toks[i : i + n])
                            for i in range(len(toks) - n + 1)
                        )
                    )
                )
        counts = np.fromiter((len(x) for x in sh_lists), dtype=np.int64,
                             count=len(sh_lists))
        total = int(counts.sum())
        hvals = np.empty(total, dtype=np.uint64)
        cache: dict[str, int] = {}
        pos = 0
        for sh in sh_lists:
            for g in sh:
                v = cache.get(g)
                if v is None:
                    v = int(hashlib.md5(g.encode()).hexdigest()[:8], 16)
                    cache[g] = v
                hvals[pos] = v
                pos += 1
        if total == 0:
            return pd.DataFrame({"shingles": sh_lists,
                                 "sig": [None] * len(sh_lists)})
        starts = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        vals = (A * hvals[None, :] + B) % P  # num_hashes x total, exact
        nz = counts > 0  # every doc shingles to >=1 gram, but stay safe
        mins = np.minimum.reduceat(vals, starts[nz], axis=1).astype(np.int64)
        sigs: list = [None] * len(sh_lists)
        for out_i, row_i in enumerate(np.flatnonzero(nz)):
            sigs[row_i] = mins[:, out_i].tolist()
        return pd.DataFrame({"shingles": sh_lists, "sig": sigs})

    return _k(col)


def hashed_shingles_pd(col: Column | str, n: int = 3) -> Column:
    """``array<bigint>`` of :func:`hash60`-hashed distinct word n-grams in
    ONE Arrow crossing — same shingling as :func:`word_shingles_pd`, same
    ``int(md5[:15], 16)`` as the JVM/SQL ``hash60``, with each distinct
    gram hashed once per batch.  For consumers that only ever use the
    hash (inverted indexes, decontamination): no gram STRINGS cross the
    UDF boundary or the downstream explode."""
    import hashlib


    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _hs(s: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}
        md5 = hashlib.md5
        out = []
        for text in s:
            norm = norm_py(text)
            toks = norm.split(" ")
            if len(toks) <= n:
                grams = [" ".join(toks)]
            else:
                grams = list(
                    dict.fromkeys(
                        " ".join(toks[i : i + n])
                        for i in range(len(toks) - n + 1)
                    )
                )
            row = []
            for g in grams:
                v = cache.get(g)
                if v is None:
                    v = int(md5(g.encode()).hexdigest()[:15], 16)
                    cache[g] = v
                row.append(v)
            out.append(row)
        return pd.Series(out)

    return _hs(col)


def unicode_normalize_pd(
    col: Column | str,
    form: str = "NFC",
    lowercase: bool = True,
    squash_whitespace: bool = True,
) -> Column:
    """Unicode-normalized text (Arrow kernel — Spark has no built-in UAX#15
    normalizer).  ``form`` is NFC/NFKC/NFD/NFKD; lowercasing uses Python's
    Unicode default case conversion, which matches DuckDB ``lower()``;
    whitespace squashing uses the explicit ASCII class ``[ \\t\\n\\r\\f\\v]``
    (NOT ``\\s``, whose Unicode coverage differs between regex engines) so
    the DuckDB oracle ``trim(regexp_replace(lower(nfc_normalize(x)),
    '[ \\t\\n\\r\\f\\v]+', ' ', 'g'))`` is bit-identical."""
    import unicodedata

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form: {form!r}")
    ws = re.compile(r"[ \t\n\r\f\v]+")

    @F.pandas_udf(T.StringType())
    def _norm(s: pd.Series) -> pd.Series:
        def one(t):
            if t is None:
                return None
            t = unicodedata.normalize(form, t)
            if lowercase:
                t = t.lower()
            if squash_whitespace:
                t = ws.sub(" ", t).strip()
            return t

        return s.map(one)

    return _norm(col)


def tokens_pd(col: Column | str) -> Column:
    """Arrow-batched pandas equivalent of :func:`tokens` (same normalize +
    split), tokenizing once per row."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _tokens(s: pd.Series) -> pd.Series:
        return pd.Series(
            [
                norm_py(t).split(" ")
                for t in s
            ]
        )

    return _tokens(col)


def char_ngrams_pd(col: Column | str, n: int = 3) -> Column:
    """All overlapping character n-grams of the RAW string (no
    normalization — byte-for-byte what the engine stores), one Arrow pass.
    A string shorter than ``n`` yields an empty array.  Python slicing is
    unicode-codepoint based, matching Spark ``substring`` and DuckDB
    ``substr`` character semantics, so an oracle can regenerate the exact
    same grams with ``substr(text, i, n)`` over ``generate_series``."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _grams(s: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [t[i : i + n] for i in range(len(t) - n + 1)]
                if t is not None
                else []
                for t in s
            ]
        )

    return _grams(col)


def char_multi_ngrams_pd(
    col: Column | str, sizes: tuple[int, ...] = (2, 3)
) -> Column:
    """Concatenated overlapping character n-grams for EVERY size in
    ``sizes``, in one Arrow pass (one kernel eval instead of one per
    size — the hot-path discipline).  Same raw-string, codepoint-sliced
    semantics as :func:`char_ngrams_pd`, so an oracle regenerates each
    size with ``substr(text, i, n)`` and UNION ALLs them."""
    sizes = tuple(int(n) for n in sizes)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _grams(s: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [
                    t[i : i + n]
                    for n in sizes
                    for i in range(len(t) - n + 1)
                ]
                if t is not None
                else []
                for t in s
            ]
        )

    return _grams(col)


def hash32(col: Column) -> Column:
    """Portable 32-bit unsigned hash as bigint: first 8 hex digits of md5.
    DuckDB equivalent: ``('0x' || substr(md5(x),1,8))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hash60(col: Column) -> Column:
    """Portable 60-bit hash as bigint: first 15 hex digits of md5.  Used as
    a join/shuffle key in place of the string it hashes — 8 bytes on the
    wire instead of a 20-40 byte string, collision odds ~2^-60 per pair
    (and the oracle applies the identical function, so results stay
    bit-equal either way).  DuckDB:
    ``('0x' || substr(md5(x),1,15))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def cutoff_bucket(u: Column, cutoffs: "list[int]") -> Column:
    """0-based index of the FIRST element of ascending ``cutoffs`` that is
    strictly greater than ``u``; -1 when none is (unreachable when the
    table ends at 2^60 and ``u`` is a :func:`hash60` coin).  Semantically
    ``array_position(transform(cutoffs, c -> u < c), true) - 1``, but as
    a flat CASE WHEN chain: the higher-order-function form allocates and
    scans a per-row array OUTSIDE whole-stage codegen, which measured
    ~10x slower under an aggregate (7.7 s vs 0.8 s on the 7.5M-row
    bootstrap explode) for identical values."""
    expr = None
    for i, c in enumerate(cutoffs):
        branch = u < F.lit(int(c))
        expr = F.when(branch, F.lit(i)) if expr is None else expr.when(
            branch, F.lit(i)
        )
    return expr.otherwise(F.lit(-1)).cast("long")


#: MinHash universal-hash family h_i(x) = (a_i * x + b_i) mod p over the
#: 32-bit hash space.  Constants from a fixed LCG so the oracle SQL embeds
#: the same family (deterministic, engine-independent).
MINHASH_PRIME = 4294967311  # smallest prime > 2^32


def _lcg_perms(k: int, seed: int = 42) -> list[tuple[int, int]]:
    state = seed
    out = []
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        # a < 2^31 keeps a*h + b < 2^63 for 32-bit h: exact in Spark AND
        # DuckDB (which errors on bigint overflow rather than wrapping)
        a = 1 + state % ((1 << 31) - 1)
        state = (state * 6364136223846793005 + 1442695040888963407) % (2**63)
        b = state % MINHASH_PRIME
        out.append((a, b))
    return out


MINHASH_PERMS: list[tuple[int, int]] = _lcg_perms(32)


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature (array<bigint> of length ``num_hashes``) over a
    shingle array.  a*h+b stays < 2^63 (a < 2^33, h < 2^32) so the same
    arithmetic is exact in DuckDB (which errors on bigint overflow rather
    than wrapping)."""
    perms = MINHASH_PERMS[:num_hashes]
    hashes = F.transform(shingles, hash32)

    def perm_fn(a: int, b: int):
        # factory: F.transform inspects the lambda arity, so default-arg
        # closures (lambda h, a=a, b=b) would read as 3-arg lambdas
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)

    return F.array(
        *[F.array_min(F.transform(hashes, perm_fn(a, b))) for a, b in perms]
    )


def simhash32(col: Column) -> Column:
    """32-bit SimHash over whitespace tokens (term frequency weighted).

    Single-pass per row: token hashes -> per-bit ±1 contributions ->
    elementwise fold -> sign bits packed into a bigint.  No shuffle."""
    hs = F.transform(tokens(col), hash32)
    contribs = F.transform(
        hs,
        lambda h: F.array(
            *[
                F.when(((h / F.lit(1 << j)).cast("long") % 2) == 1, 1).otherwise(-1)
                for j in range(32)
            ]
        ),
    )
    counts = F.aggregate(
        contribs,
        F.array_repeat(F.lit(0), 32),
        lambda acc, bits: F.zip_with(acc, bits, lambda x, y: x + y),
    )
    bit_terms = [
        F.when(F.element_at(counts, j + 1) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j in range(32)
    ]
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out + t
    return out.cast("long")


def simhash32_pd(col: Column | str) -> Column:
    """Arrow-batched pandas equivalent of :func:`simhash32` — identical
    values (same md5-derived token hashes, ±1 bit votes, sign pack), but
    tokenizes once per row and memoizes token hashes across the batch
    (document vocabulary repeats heavily).  ~10× the interpreted JVM
    higher-order-function fold."""
    import hashlib

    import numpy as np

    bit_idx = np.arange(32)

    @F.pandas_udf(T.LongType())
    def _simhash(s: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def h32(tok: str) -> int:
            v = cache.get(tok)
            if v is None:
                v = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
                if len(cache) < 1_000_000:
                    cache[tok] = v
            return v

        out = []
        for text in s:
            norm = norm_py(text)
            hs = np.fromiter(
                (h32(t) for t in norm.split(" ")), dtype=np.int64
            )
            votes = (2 * ((hs[:, None] >> bit_idx) & 1) - 1).sum(axis=0)
            out.append(int(((votes > 0).astype(np.int64) << bit_idx).sum()))
        return pd.Series(out, dtype="int64")

    return _simhash(col)


def simhash64_pd(col: Column | str) -> Column:
    """64-bit SimHash (the Manku et al. WWW'07 shape) as a signed bigint.

    Per-token 64-bit hash = two md5-derived 32-bit halves: bit j<32 comes
    from hex[1:8] (low word), bit j>=32 from hex[9:16] (high word) — both
    halves parse as non-negative BIGINTs in DuckDB, so the oracle never
    touches an out-of-range 16-hex-digit literal.  ±1 bit votes over the
    token multiset, sign bits packed; bit 63 makes the result negative
    (two's complement), which both engines handle identically under
    xor/bit_count/shift-and-mask.

    Replaces 32-bit simhash for candidate generation: 64 bits give 4
    chunk tables of 16 bits (65536 buckets each), so bucket population
    stays ~n/2^16 as the corpus grows — the 32-bit/8-bit-chunk variant
    saturated at 256 buckets per table.
    """
    import hashlib

    import numpy as np

    bit_idx = np.arange(64, dtype=np.uint64)

    @F.pandas_udf(T.LongType())
    def _simhash(s: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def h64(tok: str) -> int:
            v = cache.get(tok)
            if v is None:
                hx = hashlib.md5(tok.encode()).hexdigest()
                v = (int(hx[8:16], 16) << 32) | int(hx[:8], 16)
                if len(cache) < 1_000_000:
                    cache[tok] = v
            return v

        out = []
        for text in s:
            norm = norm_py(text)
            hs = np.fromiter(
                (h64(t) for t in norm.split(" ")), dtype=np.uint64
            )
            votes = (
                2 * ((hs[:, None] >> bit_idx) & np.uint64(1)).astype(np.int64) - 1
            ).sum(axis=0)
            packed = int(((votes > 0).astype(np.uint64) << bit_idx).sum(dtype=np.uint64))
            out.append(packed - (1 << 64) if packed >= (1 << 63) else packed)
        return pd.Series(out, dtype="int64")

    return _simhash(col)


def token_fingerprint(col: Column) -> Column:
    """OpenRefine-style fingerprint: md5 of the sorted distinct token set —
    robust to word order / duplication."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(col))), " "))


#: Tiny per-language function-word sets for the n-gram/stopword language-ID
#: heuristic.  Deliberately small and deterministic.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "en", "que", "los", "se", "un", "por"],
    "de": ["der", "die", "das", "und", "ist", "von", "den", "mit", "zu", "auf"],
    "fr": ["le", "la", "et", "les", "des", "en", "un", "du", "une", "que"],
}


def stopword_ratio_t(toks: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are function words of ``lang``, over an
    already-materialized token array (tokenize ONCE, derive many — a
    tokens expression inlined here would be re-evaluated per consumer
    after projection collapse)."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return n_sw.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are function words of ``lang``."""
    return stopword_ratio_t(tokens(col), lang)


def lang_scores_t(toks: Column) -> Column:
    """Per-language stopword-ratio struct over a materialized token array."""
    return F.struct(
        *[stopword_ratio_t(toks, lang).alias(lang) for lang in sorted(STOPWORDS)]
    )


def lang_scores(col: Column) -> Column:
    """Struct of per-language stopword-ratio scores; argmax is the
    predicted language (documents with no function words score 0 for all)."""
    return lang_scores_t(tokens(col))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are neither alphanumeric nor space
    (over the RAW text)."""
    n = F.length(col)
    stripped = F.length(F.regexp_replace(col, "[a-zA-Z0-9 ]", ""))
    return stripped.cast("double") / F.greatest(n, F.lit(1)).cast("double")


def mean_token_len_t(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def mean_token_len(col: Column) -> Column:
    return mean_token_len_t(tokens(col))


def quality_score_t(toks: Column, raw: Column) -> Column:
    """Quality score over a materialized token array + the raw text
    (punctuation is measured on the raw string).  Identical arithmetic
    order to :func:`quality_score` so oracle doubles stay bit-equal."""
    n_tok = F.size(toks).cast("double")
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio(raw) * F.lit(4.0), F.lit(1.0))
    sw_score = F.least(stopword_ratio_t(toks, "en") * F.lit(5.0), F.lit(1.0))
    return (len_score * F.lit(0.4)) + (punct_score * F.lit(0.4)) + (sw_score * F.lit(0.2))


def quality_score(col: Column) -> Column:
    """Heuristic document-quality score in [0,1]: rewards reasonable
    length, low punctuation noise, and presence of function words.

    The arithmetic uses a fixed operation order so the DuckDB oracle
    reproduces identical doubles."""
    return quality_score_t(tokens(col), col)


def token_count_bpe(col: Column | str) -> Column:
    """BPE-style pre-tokenizer count: runs of word chars OR single
    non-word-non-space chars (the GPT-2 pre-tokenize shape, without the
    merge table).  Whitespace-insensitive, punctuation counted per symbol.
    DuckDB: ``len(regexp_extract_all(x, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]'))``."""
    return F.size(
        F.regexp_extract_all(col if not isinstance(col, str) else F.col(col),
                             F.lit(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"), F.lit(0))
    )


def winnowing_fingerprints(
    col: Column | str, k: int = 8, window: int = 4
) -> Column:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    rolling char k-gram hashes of the normalized text; keep the minimum of
    each ``window`` consecutive hashes; distinct mins are the fingerprint
    set (``array<bigint>``).  Robust to local edits — standard for
    plagiarism/near-dup detection.  Hashes are md5-derived (hash60), so the
    DuckDB oracle reproduces the exact set."""
    import hashlib

    import numpy as np

    swv = np.lib.stride_tricks.sliding_window_view

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _fp(s: pd.Series) -> pd.Series:
        # char k-grams repeat heavily across a batch (common words,
        # whitespace runs): hash each distinct gram once
        cache: dict[str, int] = {}
        md5 = hashlib.md5
        out = []
        for text in s:
            norm = norm_py(text)
            if len(norm) < k:
                grams = [norm]
            else:
                grams = [norm[i : i + k] for i in range(len(norm) - k + 1)]
            hs = np.empty(len(grams), dtype=np.int64)
            for i, g in enumerate(grams):
                v = cache.get(g)
                if v is None:
                    v = int(md5(g.encode()).hexdigest()[:15], 16)
                    cache[g] = v
                hs[i] = v
            if len(hs) <= window:
                mins = hs.min(keepdims=True)
            else:
                # vectorized rolling minimum over the hash sequence
                mins = swv(hs, window).min(axis=1)
            out.append(np.unique(mins).tolist())
        return pd.Series(out)

    return _fp(col)


def repetition_metrics_pd(col: Column | str, line_delim: str = "\n") -> Column:
    """Arrow kernel behind ``cleaning.repetition_report``: all Gopher
    char-coverage repetition metrics in ONE pass per document, returned
    as a struct of exact integer-ppm ratios (floor division — DuckDB
    ``//`` equivalent).  Token n-grams use the shared normalization
    (:func:`norm_tokens_py`); lines split the RAW text on
    ``line_delim``, dropping empty segments."""
    fields = [
        "n_lines",
        "dup_line_frac_ppm",
        "dup_line_char_frac_ppm",
        "top_2gram_char_frac_ppm",
        "top_3gram_char_frac_ppm",
        "dup_5gram_char_frac_ppm",
    ]
    schema = T.StructType([T.StructField(f, T.LongType()) for f in fields])

    def _one(text: str | None) -> tuple:
        from collections import Counter

        lines = [s for s in (text or "").split(line_delim) if s != ""]
        n_lines = len(lines)
        lc = Counter(lines)
        if n_lines:
            dup_line = (n_lines - len(lc)) * 1_000_000 // n_lines
            all_chars = sum(c * len(s) for s, c in lc.items())
            dup_chars = sum((c - 1) * len(s) for s, c in lc.items())
            dup_line_chars = (
                dup_chars * 1_000_000 // all_chars if all_chars else 0
            )
        else:
            dup_line = dup_line_chars = 0
        toks = [t for t in norm_tokens_py(text) if t]
        tchars = sum(len(t) for t in toks)

        def top_frac(n: int) -> int:
            if tchars == 0 or len(toks) < n:
                return 0
            cnt = Counter(
                (" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
            )
            # max count, ties to lexicographically smallest gram
            g, c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            cov = c * (len(g) - (n - 1))  # token chars = len minus spaces
            return min(cov * 1_000_000 // tchars, 1_000_000)

        def dup_frac(n: int) -> int:
            if tchars == 0 or len(toks) < n:
                return 0
            cnt = Counter(
                (" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
            )
            cov = sum(
                c * (len(g) - (n - 1)) for g, c in cnt.items() if c >= 2
            )
            return min(cov * 1_000_000 // tchars, 1_000_000)

        return (
            n_lines,
            dup_line,
            dup_line_chars,
            top_frac(2),
            top_frac(3),
            dup_frac(5),
        )

    @F.pandas_udf(schema)
    def _metrics(s: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [_one(t) for t in s], columns=fields, dtype="int64"
        )

    return _metrics(col)
