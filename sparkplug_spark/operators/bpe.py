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

from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import spread

__all__ = [
    "train_bpe_merges",
    "train_bpe_merges_from_counts",
    "apply_bpe",
    "train_wordpiece_vocab",
    "train_wordpiece_vocab_from_counts",
    "wordpiece_token_stats",
    "train_unigram_vocab",
    "train_unigram_vocab_from_counts",
    "unigram_token_stats",
    "UNIGRAM_COMBINED_MULT",
]

_EOW = "</w>"  # end-of-word marker (standard BPE)


def _words(text: str) -> list[str]:
    """Shared normalization (same as ``functions.text.tokens``, via the
    canonical ``norm_tokens_py`` twin — CJK/Kana/Hangul/Thai chars arrive
    as standalone single-char words, so BPE merges treat each as an
    atomic symbol pair with its </w> marker)."""
    from ..functions.text import norm_tokens_py

    return norm_tokens_py(text)


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


def train_wordpiece_vocab_from_counts(
    word_freq: Counter,
    n_words: int = 10,
    n_cont: int = 50,
) -> tuple[list[str], list[str]]:
    """Deterministic WordPiece-style vocabulary from a word-frequency
    table: the ``n_words`` most frequent whole words (ties break
    lexicographically), every character seen in any word (so
    segmentation always succeeds on in-distribution text), and the
    ``n_cont`` most frequent word-internal character bigrams as
    continuation pieces.  Returns ``(starts, conts)`` — piece CONTENTS
    (no '##' marker; position decides rendering).  Pure Python and
    engine-independent, so the oracle retrains the identical vocabulary
    from the same sample (the bpe-oracle pattern)."""
    top_words = [
        w
        for w, _ in sorted(word_freq.items(), key=lambda kv: (-kv[1], kv[0]))[
            : int(n_words)
        ]
    ]
    chars = {c for w in word_freq for c in w}
    bg: Counter = Counter()
    for w, c in word_freq.items():
        for i in range(1, len(w) - 1):
            bg[w[i : i + 2]] += c
    top_bg = [
        b
        for b, _ in sorted(bg.items(), key=lambda kv: (-kv[1], kv[0]))[
            : int(n_cont)
        ]
    ]
    return sorted(set(top_words) | chars), sorted(set(top_bg) | chars)


def train_wordpiece_vocab(
    df: DataFrame,
    text_col: str = "text",
    n_words: int = 10,
    n_cont: int = 50,
    sample_docs: int = 500,
) -> tuple[list[str], list[str]]:
    """Train the WordPiece vocabulary on a bounded file-order sample
    (same sampling contract as :func:`train_bpe_merges`)."""
    rows = df.select(F.col(text_col).alias("t")).limit(int(sample_docs)).collect()
    wf: Counter = Counter()
    for r in rows:
        for w in _words(r["t"]):
            if w:
                wf[w] += 1
    return train_wordpiece_vocab_from_counts(wf, n_words, n_cont)


def _wp_segment(
    word: str, starts: frozenset, conts: frozenset, max_start: int, max_cont: int
) -> list[str]:
    """Greedy longest-match-first WordPiece segmentation.  A position
    with no matching piece turns the WHOLE word into one '[UNK]' (the
    standard algorithm — partial pieces are discarded)."""
    pieces: list[str] = []
    pos, n = 0, len(word)
    while pos < n:
        vocab, mx = (starts, max_start) if pos == 0 else (conts, max_cont)
        best = None
        for ln in range(min(n - pos, mx), 0, -1):
            cand = word[pos : pos + ln]
            if cand in vocab:
                best = cand
                break
        if best is None:
            return ["[UNK]"]
        pieces.append(best if pos == 0 else "##" + best)
        pos += len(best)
    return pieces


def wordpiece_token_stats(
    df: DataFrame,
    vocab: tuple[list[str], list[str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document WordPiece budget report under a trained vocabulary:
    (id, n_words, n_pieces, n_unk, n_distinct_pieces).

    The dictionary-apply shape that scales: segmentation runs ONCE per
    DISTINCT word (Arrow kernel over the deduped word table — Zipf says
    that's orders of magnitude smaller than the occurrence stream),
    then joins back to occurrences for the per-doc aggregates.  Docs
    with no tokens keep a zero row."""
    from ..caching import materialize_release
    from ..functions.text import tokens_pd

    starts, conts = (frozenset(vocab[0]), frozenset(vocab[1]))
    max_start = max(map(len, starts), default=1)
    max_cont = max(map(len, conts), default=1)

    @F.pandas_udf("array<string>")
    def _seg(words: pd.Series) -> pd.Series:
        return pd.Series(
            [_wp_segment(w, starts, conts, max_start, max_cont) for w in words]
        )

    occ = (
        spread(df)
        .select(F.col(id_col), F.explode(tokens_pd(F.col(text_col))).alias("__w"))
        .filter(F.col("__w") != "")
    )
    seg = (
        occ.select("__w")
        .dropDuplicates(["__w"])
        .withColumn("__pieces", _seg(F.col("__w")))
        .select(
            "__w",
            "__pieces",
            F.size("__pieces").alias("__np"),
            F.size(
                F.filter("__pieces", lambda p: p == F.lit("[UNK]"))
            ).alias("__nunk"),
        )
    )
    base = occ.join(seg, "__w").persist()
    tot = base.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("__np").cast("long").alias("n_pieces"),
        F.sum("__nunk").cast("long").alias("n_unk"),
    )
    dp = (
        base.select(id_col, F.explode("__pieces").alias("__p"))
        .groupBy(id_col)
        .agg(F.countDistinct("__p").alias("n_distinct_pieces"))
    )
    out = (
        df.select(F.col(id_col))
        .dropDuplicates([id_col])
        .join(tot, id_col, "left")
        .join(dp, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_pieces", F.lit(0)).cast("long").alias("n_pieces"),
            F.coalesce("n_unk", F.lit(0)).cast("long").alias("n_unk"),
            F.coalesce("n_distinct_pieces", F.lit(0))
            .cast("long")
            .alias("n_distinct_pieces"),
        )
    )
    return materialize_release(out, base)


# ---------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) tokenizer — Kudo, ACL 2018.  Completes
# the tokenizer family next to BPE and WordPiece; modern model stacks
# mostly ship Unigram-LM vocabularies.
# ---------------------------------------------------------------------------

#: Combined-score multiplier for the Viterbi DP: a prefix state packs
#: (total_cost_micros, n_pieces) into ONE BIGINT as cost*MULT + n, so the
#: lexicographic minimum (cheapest, then fewest pieces) is a plain integer
#: min AND each appended piece is a plain integer ADD of cost*MULT + 1 —
#: exactly replayable by a recursive SQL CTE with list state.  Valid while
#: n_pieces < MULT (words near 2^20 chars don't exist post-normalization).
UNIGRAM_COMBINED_MULT = 1 << 20


def _uni_viterbi(
    word: str,
    cost: dict,
    max_len: int,
    with_pieces: bool = False,
):
    """Integer-cost Viterbi segmentation minimizing the packed combined
    score (cost first, piece count as tie-break).  Returns
    (combined, pieces|None); combined is None when some character is
    outside the vocabulary (the [UNK] case).  Deterministic: DP scans
    piece lengths ascending with strict-< updates."""
    mult = UNIGRAM_COMBINED_MULT
    n = len(word)
    best: list = [None] * (n + 1)
    best[0] = 0
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        b, bl = None, 0
        for ln in range(1, min(max_len, j) + 1):
            prev = best[j - ln]
            if prev is None:
                continue
            c = cost.get(word[j - ln : j])
            if c is None:
                continue
            cand = prev + c * mult + 1
            if b is None or cand < b:
                b, bl = cand, ln
        best[j], back[j] = b, bl
    if best[n] is None:
        return None, None
    if not with_pieces:
        return best[n], None
    out, j = [], n
    while j > 0:
        out.append(word[j - back[j] : j])
        j -= back[j]
    return best[n], out[::-1]


def train_unigram_vocab_from_counts(
    word_freq,
    vocab_size: int = 60,
    max_piece_len: int = 4,
    em_iters: int = 3,
    seed_mult: int = 4,
) -> list[tuple[str, int]]:
    """Deterministic Unigram-LM training over a ``word -> count`` table:
    seed with every character plus the most frequent multi-character
    substrings (ties lexicographic), then alternate hard-EM (Viterbi
    usage counts under the current INTEGER micro-nat costs, Laplace
    re-estimation) with usage-based pruning toward ``vocab_size``
    (single characters are never pruned, so segmentation always
    succeeds on in-distribution text).  Hard EM instead of
    forward-backward keeps every quantity integer/deterministic — the
    documented simplification vs Kudo 2018's soft E-step.

    Returns the trained vocabulary as a sorted ``[(piece,
    cost_micro_nats)]`` list — store it (it IS the tokenizer) and hand
    it to :func:`unigram_token_stats`.  Pure Python and engine-
    independent, so the DuckDB oracle retrains the identical model from
    its own scan of the same sample (the bpe-oracle pattern)."""
    import math

    if not word_freq:
        raise ValueError("train_unigram_vocab: empty sample (no words)")
    micros = lambda x: int(math.floor(x * 1e6 + 0.5))  # noqa: E731
    chars = sorted({c for w in word_freq for c in w})
    if vocab_size < len(chars):
        raise ValueError(
            f"vocab_size={vocab_size} < {len(chars)} distinct characters"
        )
    sub: Counter = Counter()
    for w, c in word_freq.items():
        L = len(w)
        for i in range(L):
            for ln in range(2, min(max_piece_len, L - i) + 1):
                sub[w[i : i + ln]] += c
    seed_n = max(int(vocab_size) * int(seed_mult) - len(chars), 0)
    multi = [
        p
        for p, _ in sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))[
            :seed_n
        ]
    ]
    pieces = sorted(set(chars) | set(multi))
    # init costs from raw seed counts (chars get their occurrence counts)
    cnt: Counter = Counter()
    for w, c in word_freq.items():
        for ch in w:
            cnt[ch] += c
    for p in multi:
        cnt[p] = sub[p]
    total = sum(cnt[p] for p in pieces)
    cost = {
        p: micros(math.log(total + len(pieces)) - math.log(cnt[p] + 1))
        for p in pieces
    }

    def _em_pass(pcs, cst):
        use: Counter = Counter()
        for w, c in word_freq.items():
            _, seg = _uni_viterbi(w, cst, max_piece_len, with_pieces=True)
            if seg is None:
                continue
            for p in seg:
                use[p] += c
        tot_use = sum(use.values())
        v = len(pcs)
        new_cost = {
            p: micros(math.log(tot_use + v) - math.log(use.get(p, 0) + 1))
            for p in pcs
        }
        return use, new_cost

    for it in range(int(em_iters)):
        use, cost = _em_pass(pieces, cost)
        last = it == int(em_iters) - 1
        target = (
            int(vocab_size)
            if last
            else max(int(vocab_size), (len(pieces) * 3) // 5)
        )
        if len(pieces) > target:
            multi_now = sorted(
                (p for p in pieces if len(p) > 1),
                key=lambda p: (use.get(p, 0), p),
            )
            n_drop = len(pieces) - target
            dropped = set(multi_now[:n_drop])
            pieces = [p for p in pieces if p not in dropped]
            cost = {p: cost[p] for p in pieces}
    # final re-estimation on the pruned vocabulary (costs above still
    # reflect pre-prune competition)
    _, cost = _em_pass(pieces, cost)
    return sorted(cost.items())


def train_unigram_vocab(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 60,
    max_piece_len: int = 4,
    em_iters: int = 3,
    sample_docs: int = 500,
) -> list[tuple[str, int]]:
    """Train the Unigram-LM vocabulary on a bounded file-order sample
    (same sampling contract as :func:`train_bpe_merges`)."""
    rows = (
        df.select(F.col(text_col).alias("t")).limit(int(sample_docs)).collect()
    )
    wf: Counter = Counter()
    for r in rows:
        for w in _words(r["t"]):
            if w:
                wf[w] += 1
    return train_unigram_vocab_from_counts(
        wf, vocab_size, max_piece_len, em_iters
    )


def unigram_token_stats(
    df: DataFrame,
    vocab: list[tuple[str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document Unigram-LM budget report under a trained vocabulary:
    (id, n_words, n_pieces, n_unk, cost_micros) — piece counts from the
    minimum-cost Viterbi segmentation, total cost in exact integer
    micro-nats (the corpus' negative log-likelihood under the piece LM,
    the number SentencePiece reports as the training objective).  A word
    containing an out-of-vocabulary character segments to one [UNK]
    piece at cost 0 (counted in ``n_unk``).

    Same dictionary-apply shape as :func:`wordpiece_token_stats`:
    segmentation runs ONCE per DISTINCT word (Zipf), joins back to
    occurrences, docs with no tokens keep a zero row.  The DP packs
    (cost, n_pieces) into one BIGINT (see :data:`UNIGRAM_COMBINED_MULT`)
    so a recursive SQL CTE replays it bit-exactly."""
    from ..caching import materialize_release
    from ..functions.text import tokens_pd

    cost = {p: int(c) for p, c in vocab}
    max_len = max((len(p) for p in cost), default=1)
    mult = UNIGRAM_COMBINED_MULT

    @F.pandas_udf("np long, nunk long, cost long")
    def _seg(words: pd.Series) -> pd.DataFrame:
        nps, nunks, costs = [], [], []
        for w in words:
            combined, _ = _uni_viterbi(w, cost, max_len)
            if combined is None:
                nps.append(1)
                nunks.append(1)
                costs.append(0)
            else:
                nps.append(combined % mult)
                nunks.append(0)
                costs.append(combined // mult)
        return pd.DataFrame({"np": nps, "nunk": nunks, "cost": costs})

    occ = (
        spread(df)
        .select(
            F.col(id_col), F.explode(tokens_pd(F.col(text_col))).alias("__w")
        )
        .filter(F.col("__w") != "")
    )
    seg = (
        occ.select("__w")
        .dropDuplicates(["__w"])
        .withColumn("__s", _seg(F.col("__w")))
        .select(
            "__w",
            F.col("__s.np").alias("__np"),
            F.col("__s.nunk").alias("__nunk"),
            F.col("__s.cost").alias("__cost"),
        )
    )
    base = occ.join(seg, "__w").persist()
    tot = base.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("__np").cast("long").alias("n_pieces"),
        F.sum("__nunk").cast("long").alias("n_unk"),
        F.sum("__cost").cast("long").alias("cost_micros"),
    )
    out = (
        df.select(F.col(id_col))
        .dropDuplicates([id_col])
        .join(tot, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
            F.coalesce("n_pieces", F.lit(0)).cast("long").alias("n_pieces"),
            F.coalesce("n_unk", F.lit(0)).cast("long").alias("n_unk"),
            F.coalesce("cost_micros", F.lit(0))
            .cast("long")
            .alias("cost_micros"),
        )
    )
    return materialize_release(out, base)
