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

__all__ = ["split_sentences", "DEFAULT_ABBREVIATIONS"]

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
    if abbreviations is None:
        abbreviations = DEFAULT_ABBREVIATIONS
    cur = F.coalesce(F.col(text_col), F.lit(""))
    for abbr in abbreviations:
        pat = "(?i)\\b(" + abbr.replace(".", "\\.") + ")\\."
        cur = F.regexp_replace(cur, pat, "$1" + _PROTECT)
    cur = F.regexp_replace(cur, r"([0-9])\.([0-9])", "$1" + _PROTECT + "$2")
    cur = F.regexp_replace(cur, r"([.!?]+)(\s+)", "$1" + _BOUNDARY)
    sents = F.filter(
        F.transform(
            F.split(cur, _BOUNDARY),
            lambda s: F.trim(F.replace(s, F.lit(_PROTECT), F.lit("."))),
        ),
        lambda s: F.length(s) >= int(min_chars),
    )
    return spread(df).select(
        id_col, F.posexplode(sents).alias("__p", "sentence")
    ).select(
        id_col,
        (F.col("__p") + 1).cast("long").alias("sent_pos"),
        "sentence",
        F.length("sentence").cast("long").alias("n_chars"),
    )
