"""Byte-pair-encoding tokenization: driver-trained merges, distributed
application.

The token-count that matters for a pretraining budget is the TRAINED
tokenizer's, not whitespace words.  Following the classic BPE recipe
(Sennrich et al., ACL 2016) and the same bounded-sample training shape
as the IVF quantizer (``similarity._spherical_lloyd``): merges train
DRIVER-SIDE on a ``limit``-bounded sample (training reads megabytes, no
full scan), then APPLY distributes as one Arrow-batched pass with the
merge table shipped in the closure — the 100 TB side of the work is
embarrassingly parallel.

Determinism: the merge loop breaks frequency ties lexicographically, so
(sample, n_merges) fully determines the tokenizer; application caches
per-word segmentations (Zipf makes the hit rate ~99%).  Token counts are
engine-specific (no BPE in SQL) → rows-only for cross-engine checks;
tests pin the trainer and applier against an independent reference
implementation.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import spread

__all__ = ["train_bpe_merges", "train_bpe_merges_from_counts", "apply_bpe"]

_STRIP = re.compile(r"[^a-z0-9 ]")
_SQUASH = re.compile(r" +")

_EOW = "</w>"  # end-of-word marker (standard BPE)


def _words(text: str) -> list[str]:
    """Shared normalization (same as ``functions.text.tokens``): lowercase,
    strip non-alphanumerics, split on whitespace."""
    return _SQUASH.sub(" ", _STRIP.sub(" ", (text or "").lower())).strip().split(" ")


def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (_EOW,)


def train_bpe_merges(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    sample_docs: int = 2000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a bounded corpus sample.

    Classic algorithm: start from characters (+ end-of-word marker),
    repeatedly merge the most frequent adjacent symbol pair across the
    word-frequency table; ties break on the lexicographically SMALLEST
    pair, so the merge list is deterministic for a given sample.  Stops
    early when no pair occurs twice.

    Returns the ordered merge list — store it (it IS the tokenizer) and
    hand it to :func:`apply_bpe`."""
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    rows = df.select(F.col(text_col).alias("t")).limit(int(sample_docs)).collect()
    word_freq: Counter = Counter()
    for r in rows:
        for w in _words(r["t"]):
            if w:
                word_freq[w] += 1
    return train_bpe_merges_from_counts(word_freq, n_merges)


def train_bpe_merges_from_counts(
    word_freq, n_merges: int = 200
) -> list[tuple[str, str]]:
    """The merge-training loop over a prebuilt ``word -> count`` table.
    Split out of :func:`train_bpe_merges` so an engine-independent caller
    (e.g. the DuckDB oracle, which re-reads the same sample with its own
    scan) trains the IDENTICAL tokenizer from its own word counts."""
    if not word_freq:
        raise ValueError("train_bpe_merges: empty sample (no words)")
    vocab = {_word_symbols(w): c for w, c in word_freq.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best_n = max(pairs.values())
        if best_n < 2:
            break
        best = min(p for p, c in pairs.items() if c == best_n)
        merges.append(best)
        merged = best[0] + best[1]
        nxt = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + c
        vocab = nxt
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    count_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Append the BPE token count under a trained merge list — the budget
    number a dataloader actually consumes.

    One Arrow-batched pandas UDF; the merge-rank dict rides the closure
    (KBs).  Per-word segmentations are memoized per batch (Zipf: most
    words repeat), and each word applies merges by ascending rank with
    the standard lowest-rank-pair-first loop."""
    rank = {tuple(m): i for i, m in enumerate(merges)}

    def _encode_word(word: str, cache: dict) -> int:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(_word_symbols(word))
        while len(syms) > 1:
            best_i, best_r = -1, None
            for i in range(len(syms) - 1):
                r = rank.get((syms[i], syms[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        cache[word] = len(syms)
        return len(syms)

    @F.pandas_udf("long")
    def _count(texts: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for t in texts:
            out.append(
                sum(_encode_word(w, cache) for w in _words(t) if w)
            )
        return pd.Series(out, dtype="int64")

    return spread(df).withColumn(count_col, _count(F.col(text_col)))
