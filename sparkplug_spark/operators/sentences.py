"""Sentence segmentation: the boundary pass between document-level
cleaning and sentence-level consumers (context-window chunking that
respects sentence boundaries, per-sentence dedup/decontamination,
sentence-sampled eval sets, alignment corpora).

Rule-based and engine-replayable by construction: every step is a
regexp in the Java∩RE2 dialect (no lookaround — RE2 has none, so the
usual ``(?<=[.!?])\\s+`` splitter is out).  Instead, protected spans are
masked with control-byte sentinels, boundaries are marked by consuming
the terminator+whitespace pair into a sentinel, and the text splits on
the sentinel:

1. protect known abbreviations (``dr.``, ``e.g.``, …, case-insensitive,
   word-boundary-anchored) by rewriting their trailing dot to ``\\x02``,
2. protect decimal points between digits the same way,
3. mark boundaries: ``([.!?]+)(\\s+)`` → ``$1\\x01`` (the terminator
   stays with its sentence; inter-sentence whitespace dies),
4. split on ``\\x01``, restore ``\\x02`` → ``.``, trim, drop empties.

Conservative by design: a terminator followed by a closing quote or at
end-of-text starts no new sentence (nothing follows to split), and an
unknown abbreviation yields a false split — the standard rule-splitter
trade-off (Kiss & Strunk 2006 motivates the statistical upgrade; this
is the deterministic tier an oracle can replay).

Scale shape: one narrow projection + posexplode; no shuffle at all —
the output stays partition-local to the input rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import spread

__all__ = ["split_sentences", "chunk_sentences", "DEFAULT_ABBREVIATIONS"]

#: trailing-dot tokens that do NOT end a sentence (lower-case; matched
#: case-insensitively on a word boundary).  Multi-dot entries like
#: ``e.g`` protect their final dot; their inner dots never match the
#: boundary pattern anyway (no following whitespace).
DEFAULT_ABBREVIATIONS: tuple[str, ...] = (
    "mr", "mrs", "ms", "dr", "prof", "sr", "jr", "st", "no", "nr",
    "fig", "vol", "approx", "etc", "vs", "e.g", "i.e", "cf", "al",
)

_BOUNDARY = "\x01"
_PROTECT = "\x02"


def _sentence_array(
    text_col: str,
    min_chars: int,
    abbreviations: Sequence[str] | None,
) -> "F.Column":
    """The sentinel split pipeline as an ARRAY column — shared by
    :func:`split_sentences` (explodes it) and :func:`chunk_sentences`
    (folds it)."""
    if abbreviations is None:
        abbreviations = DEFAULT_ABBREVIATIONS
    cur = F.coalesce(F.col(text_col), F.lit(""))
    for abbr in abbreviations:
        pat = "(?i)\\b(" + abbr.replace(".", "\\.") + ")\\."
        cur = F.regexp_replace(cur, pat, "$1" + _PROTECT)
    cur = F.regexp_replace(cur, r"([0-9])\.([0-9])", "$1" + _PROTECT + "$2")
    cur = F.regexp_replace(cur, r"([.!?]+)(\s+)", "$1" + _BOUNDARY)
    return F.filter(
        F.transform(
            F.split(cur, _BOUNDARY),
            lambda s: F.trim(F.replace(s, F.lit(_PROTECT), F.lit("."))),
        ),
        lambda s: F.length(s) >= int(min_chars),
    )


def split_sentences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_chars: int = 1,
    abbreviations: Sequence[str] | None = None,
) -> DataFrame:
    """Explode documents into ``(id_col, sent_pos, sentence, n_chars)``
    rows, ``sent_pos`` numbered from 1 in document order.  Sentences are
    trimmed; empties and those under ``min_chars`` drop.  NULL text
    yields no rows."""
    if min_chars < 1:
        raise ValueError("min_chars must be >= 1")
    sents = _sentence_array(text_col, min_chars, abbreviations)
    return spread(df).select(
        id_col, F.posexplode(sents).alias("__p", "sentence")
    ).select(
        id_col,
        (F.col("__p") + 1).cast("long").alias("sent_pos"),
        "sentence",
        F.length("sentence").cast("long").alias("n_chars"),
    )


def chunk_sentences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    min_chars: int = 1,
    abbreviations: Sequence[str] | None = None,
    sep: str = " ",
) -> DataFrame:
    """Sentence-RESPECTING context-window chunking — the RAG/eval-set
    sibling of :func:`~.cleaning.chunk_documents` (which cuts at fixed
    token offsets and happily splits a sentence in half): sentences
    (the :func:`split_sentences` pipeline) pack greedily in document
    order into chunks of at most ``chunk_tokens`` whitespace tokens; a
    sentence longer than the budget forms its own over-budget chunk
    (never split).  Returns ``(id_col, chunk_idx, n_sentences,
    n_chunk_tokens, chunk_text)``, chunks numbered from 0 in document
    order.

    All-integer greedy fold over the per-row sentence array (one
    ``F.aggregate``, no window, no Python), then ONE groupBy on
    (id, chunk) reassembles — the same corpus-bounded shuffle envelope
    as main-content reassembly.  Engine-exact: a recursive-CTE twin
    replays the fold step-for-step."""
    if chunk_tokens < 1:
        raise ValueError("chunk_tokens must be >= 1")
    # chain selects so the regex chain / counts materialize ONCE per row
    # (each is referenced by several downstream expressions — inlining
    # would re-run the sentinel pipeline per reference)
    base = spread(df).select(
        F.col(id_col),
        _sentence_array(text_col, min_chars, abbreviations).alias("__sents"),
    )
    base = base.select(
        id_col,
        "__sents",
        F.transform(
            F.col("__sents"),
            lambda s: F.size(
                F.filter(F.split(s, "[ \t\n]+"), lambda t: t != "")
            ).cast("long"),
        ).alias("__counts"),
    )
    zero = F.struct(
        F.lit(0).cast("long").alias("idx"),
        F.lit(0).cast("long").alias("used"),
        F.array().cast("array<long>").alias("out"),
    )
    budget = int(chunk_tokens)
    base = base.select(
        id_col,
        "__sents",
        "__counts",
        F.aggregate(
            F.col("__counts"),
            zero,
            lambda acc, c: F.when(
                (acc["used"] == 0) | (acc["used"] + c <= budget),
                F.struct(
                    acc["idx"].alias("idx"),
                    (acc["used"] + c).alias("used"),
                    F.array_append(acc["out"], acc["idx"]).alias("out"),
                ),
            ).otherwise(
                F.struct(
                    (acc["idx"] + 1).alias("idx"),
                    c.alias("used"),
                    F.array_append(acc["out"], acc["idx"] + 1).alias("out"),
                )
            ),
            lambda acc: acc["out"],
        ).alias("__assign"),
    )
    rows = (
        base.select(
            F.col(id_col),
            F.posexplode(
                F.arrays_zip(
                    F.col("__sents").alias("s"),
                    F.col("__counts").alias("c"),
                    F.col("__assign").alias("g"),
                )
            ).alias("__pos", "__z"),
        )
        .select(
            id_col,
            "__pos",
            F.col("__z.s").alias("__s"),
            F.col("__z.c").alias("__c"),
            F.col("__z.g").alias("chunk_idx"),
        )
    )
    return rows.groupBy(id_col, "chunk_idx").agg(
        F.count(F.lit(1)).cast("long").alias("n_sentences"),
        F.sum("__c").cast("long").alias("n_chunk_tokens"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("__pos").alias("p"), F.col("__s").alias("t")
                        )
                    )
                ),
                lambda s: s["t"],
            ),
            sep,
        ).alias("chunk_text"),
    )
