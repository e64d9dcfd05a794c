"""HTML main-content extraction: a jusText-shape block classifier.

``cleaning.strip_markup`` (E78) removes tags; it cannot tell a article
paragraph from navigation chrome — after stripping, "Home | About |
Contact" looks like text.  Every web-crawl corpus pass wants the
DOM-block-level selection step BEFORE quality scoring (Gopher flags,
char-LM perplexity): drop nav/header/footer/related-links boilerplate,
keep the content blocks.  This module implements the context-free core
of jusText (Pomikálek 2011, "Removing boilerplate and duplicate content
from web corpora", ch. 4): segment the page into blocks at block-level
tag boundaries, score each block by length, LINK DENSITY (chars inside
``<a>`` elements / block chars) and STOPWORD DENSITY (function-word
tokens / tokens), and keep blocks that look like prose — long enough,
link-poor, stopword-rich.  (The full jusText adds a context-sensitive
relabeling pass for short blocks between good ones; the context-free
classification does the heavy lifting and keeps the operator a pure
per-row projection + one grouped aggregation.)

Engine-exactness: every classification threshold is an INTEGER ratio
(``link_chars·100 <= chars·max_link_pct`` — never a float division), the
tag/entity/whitespace pipeline is byte-identical to ``strip_markup``'s,
and all regexes stay in the Java∩RE2 dialect (no backreferences, no
lookaround) so the DuckDB oracle reproduces the extraction bit-for-bit.

Scale shape: blocks explode to rows (one narrow projection, whole-stage
codegen — no Python anywhere), classify row-wise, then ONE groupBy on
the document id reassembles kept blocks in document order.  Block rows
are bounded by the input page bytes, so the single shuffle moves at most
the corpus itself — same envelope as any tokenize-and-regroup pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..partitioning import spread
from .cleaning import MARKUP_ENTITIES

__all__ = [
    "extract_main_content",
    "extract_html_metadata",
    "drop_repeated_blocks",
    "BLOCK_SPLIT_PATTERN",
]

#: Block-level elements whose OPENING OR CLOSING tag ends the current text
#: block (HTML5 flow-content splitters + ``<br>``).  Inline elements
#: (``a``, ``span``, ``b``, ``em`` …) stay inside the block so link
#: density can be measured.
_BLOCK_TAGS = (
    "p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tfoot|tr|td|th"
    "|caption|section|article|main|header|footer|nav|aside|blockquote"
    "|pre|figure|figcaption|form|fieldset|hr|br|body|html|head|title"
)
BLOCK_SPLIT_PATTERN = rf"(?i)</?(?:{_BLOCK_TAGS})\b[^>]*>"

# RE2 has no backreferences, so script/style bodies are removed by two
# separate non-greedy replaces instead of one <(script|style)>...</\1>
_SCRIPT_PAT = r"(?is)<script\b[^>]*>.*?</script>"
_STYLE_PAT = r"(?is)<style\b[^>]*>.*?</style>"
_COMMENT_PAT = r"(?s)<!--.*?-->"
_ANCHOR_PAT = r"(?is)<a\b[^>]*>(.*?)</a>"


def _clean_text(col: Column) -> Column:
    """tags → space, entity decode (fixed order), whitespace collapse —
    byte-identical to :func:`..cleaning.strip_markup`'s pipeline."""
    cur = F.regexp_replace(col, r"<[^>]*>", " ")
    for ent, ch in MARKUP_ENTITIES:
        cur = F.replace(cur, F.lit(ent), F.lit(ch))
    # literal control chars, not \v (Java \v is a vertical-whitespace
    # CLASS; RE2/DuckDB \v is VT only — see strip_markup)
    return F.trim(F.regexp_replace(cur, "[ \t\n\r\f\x0b]+", " "))


def extract_main_content(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_chars: int = 80,
    max_link_pct: int = 30,
    min_stop_pct: int = 25,
    stopwords: Sequence[str] | None = None,
    out_col: str = "main_text",
) -> DataFrame:
    """Classify HTML blocks and keep the prose: returns one row per input
    row with ``(id_col, n_blocks, n_good, main_chars, out_col)`` where
    ``out_col`` is the kept blocks' cleaned text joined by newlines in
    document order ('' when nothing qualifies).

    A block is GOOD iff all of (integer arithmetic throughout):

    - ``chars >= min_chars`` after tag-strip/entity-decode/ws-collapse,
    - ``link_chars * 100 <= chars * max_link_pct`` (link density),
    - ``stop_tokens * 100 >= tokens * min_stop_pct`` with ``tokens > 0``
      (stopword density; ``stopwords`` defaults to the English
      function-word set used by the language-ID heuristic).

    ``n_blocks`` counts non-empty blocks (empty split fragments between
    adjacent tags are ignored); NULL html is treated as ''.  Script and
    style elements and comments are removed before segmentation, so
    their bodies can never masquerade as content."""
    if min_chars < 1:
        raise ValueError("min_chars must be >= 1")
    if not (0 <= max_link_pct <= 100):
        raise ValueError("max_link_pct must be in [0, 100]")
    if not (0 <= min_stop_pct <= 100):
        raise ValueError("min_stop_pct must be in [0, 100]")
    if stopwords is None:
        from ..functions.text import STOPWORDS

        stopwords = STOPWORDS["en"]
    pre = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.coalesce(F.col(html_col), F.lit("")), _SCRIPT_PAT, " "
            ),
            _STYLE_PAT,
            " ",
        ),
        _COMMENT_PAT,
        " ",
    )
    blocks = (
        spread(df)
        .select(
            F.col(id_col),
            F.posexplode(F.split(pre, BLOCK_SPLIT_PATTERN)).alias(
                "__pos", "__raw"
            ),
        )
        .select(
            id_col,
            "__pos",
            "__raw",
            _clean_text(F.col("__raw")).alias("__txt"),
        )
        .select(
            id_col,
            "__pos",
            "__txt",
            F.length("__txt").cast("long").alias("__len"),
            # sum of cleaned-anchor-content lengths: the numerator of the
            # link-density ratio (per-element cleaning is genuinely
            # per-extracted-anchor work, not a rematerializable column)
            F.aggregate(
                F.transform(
                    F.regexp_extract_all(
                        F.col("__raw"), F.lit(_ANCHOR_PAT), F.lit(1)
                    ),
                    lambda x: F.length(_clean_text(x)).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("__link_chars"),
            F.filter(
                F.split(F.lower(F.col("__txt")), "[^a-z]+"),
                lambda t: t != "",
            ).alias("__toks"),
        )
    )
    stops = F.array(*[F.lit(w) for w in stopwords])
    blocks = blocks.select(
        id_col,
        "__pos",
        "__txt",
        "__len",
        F.size("__toks").cast("long").alias("__n_tok"),
        F.size(
            F.filter(F.col("__toks"), lambda t: F.array_contains(stops, t))
        )
        .cast("long")
        .alias("__n_stop"),
        "__link_chars",
    )
    good = (
        (F.col("__len") >= int(min_chars))
        & (F.col("__link_chars") * 100 <= F.col("__len") * int(max_link_pct))
        & (F.col("__n_tok") > 0)
        & (F.col("__n_stop") * 100 >= F.col("__n_tok") * int(min_stop_pct))
    )
    return (
        blocks.withColumn("__good", good)
        .groupBy(id_col)
        .agg(
            F.count(F.when(F.col("__len") > 0, 1)).alias("n_blocks"),
            F.count(F.when(F.col("__good"), 1)).alias("n_good"),
            F.coalesce(
                F.sum(F.when(F.col("__good"), F.col("__len"))), F.lit(0)
            )
            .cast("long")
            .alias("main_chars"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__good"),
                                F.struct(
                                    F.col("__pos").alias("p"),
                                    F.col("__txt").alias("t"),
                                ),
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
                "\n",
            ).alias(out_col),
        )
    )


def extract_html_metadata(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Page-level metadata for crawl routing/profiling — the fields every
    crawl pipeline wants BEFORE spending extraction/quality compute:

    - ``title``: first ``<title>`` element, tag-stripped/entity-decoded/
      whitespace-collapsed (NULL when absent or empty),
    - ``meta_description``: the ``<meta name="description">`` content
      attribute (either attribute order),
    - ``html_lang``: the ``<html lang=…>`` attribute, lower-cased — the
      declared-language prior for the LID gate,
    - ``canonical_url``: ``<link rel="canonical" href=…>`` — the dedup
      key the URL family (E172) canonicalizes toward,
    - ``n_anchors`` / ``n_scripts``: link/script element counts, the
      cheap chrome-vs-content signals.

    One zero-shuffle codegen projection; every pattern is Java∩RE2 (no
    backreferences/lookaround) so a SQL twin replays it byte-for-byte."""
    h = F.coalesce(F.col(html_col), F.lit(""))
    title = _clean_text(
        F.regexp_extract(h, r"(?is)<title[^>]*>(.*?)</title>", 1)
    )
    # attribute order varies in the wild: name-then-content and
    # content-then-name both occur; first non-empty wins
    desc_nc = F.regexp_extract(
        h,
        "(?is)<meta\\s[^>]*name\\s*=\\s*[\"']description[\"']"
        "[^>]*content\\s*=\\s*[\"']([^\"']*)",
        1,
    )
    desc_cn = F.regexp_extract(
        h,
        "(?is)<meta\\s[^>]*content\\s*=\\s*[\"']([^\"']*)[\"']"
        "[^>]*name\\s*=\\s*[\"']description[\"']",
        1,
    )
    lang = F.lower(
        F.regexp_extract(
            h, "(?is)<html\\s[^>]*lang\\s*=\\s*[\"']([a-zA-Z-]+)", 1
        )
    )
    canon = F.regexp_extract(
        h,
        "(?is)<link\\s[^>]*rel\\s*=\\s*[\"']canonical[\"']"
        "[^>]*href\\s*=\\s*[\"']([^\"']*)",
        1,
    )
    return spread(df).select(
        id_col,
        F.nullif(title, F.lit("")).alias("title"),
        F.nullif(
            F.coalesce(F.nullif(desc_nc, F.lit("")), desc_cn), F.lit("")
        ).alias("meta_description"),
        F.nullif(lang, F.lit("")).alias("html_lang"),
        F.nullif(canon, F.lit("")).alias("canonical_url"),
        F.regexp_count(h, F.lit(r"(?is)<a\b")).cast("long").alias("n_anchors"),
        F.regexp_count(h, F.lit(r"(?is)<script\b"))
        .cast("long")
        .alias("n_scripts"),
    )


def drop_repeated_blocks(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    group_col: str | None = None,
    min_docs: int = 3,
    out_col: str = "content_text",
) -> DataFrame:
    """Site-template boilerplate removal — the CROSS-DOCUMENT complement
    of :func:`extract_main_content`'s per-page classifier (and the
    block-level sibling of E50's span dedup): a block whose cleaned text
    appears in ``min_docs`` or more distinct documents (within
    ``group_col`` — typically the registered domain — or corpus-wide
    when None) is template chrome (header/footer/nav/cookie banner) and
    is dropped from every document; per-page classification can't catch
    a verbose footer that looks like prose, but no real content
    paragraph repeats across many pages.

    Returns one row per input row: ``(id_col, n_blocks, n_dropped,
    out_col)`` with surviving blocks joined by newlines in document
    order.  Scale shape: blocks explode once; the template test is one
    md5-fingerprint aggregate counting DISTINCT docs (shuffles 16-byte
    digests, never text) joined back to the block rows; one final
    groupBy reassembles.  Fingerprints are md5 so a SQL twin replays the
    verdicts exactly."""
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2")
    pre = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.coalesce(F.col(html_col), F.lit("")), _SCRIPT_PAT, " "
            ),
            _STYLE_PAT,
            " ",
        ),
        _COMMENT_PAT,
        " ",
    )
    gcols = [group_col] if group_col else []
    blocks = (
        spread(df)
        .select(
            id_col,
            *gcols,
            F.posexplode(F.split(pre, BLOCK_SPLIT_PATTERN)).alias(
                "__pos", "__raw"
            ),
        )
        .select(
            id_col,
            *gcols,
            "__pos",
            _clean_text(F.col("__raw")).alias("__txt"),
        )
        .where(F.length("__txt") > 0)
        .withColumn("__fp", F.md5(F.col("__txt")))
    )
    freq = (
        blocks.groupBy(*gcols, "__fp")
        .agg(F.count_distinct(F.col(id_col)).alias("__docs"))
        .where(F.col("__docs") >= int(min_docs))
        .select(*gcols, "__fp", F.lit(True).alias("__template"))
    )
    # null-safe on the group key: rows with a NULL group form their own
    # group (count_distinct already grouped them together above; a plain
    # equality join would silently never drop their template blocks)
    if group_col:
        cond = F.col(f"l.{group_col}").eqNullSafe(
            F.col(f"r.{group_col}")
        ) & (F.col("l.__fp") == F.col("r.__fp"))
        marked = (
            blocks.alias("l")
            .join(freq.alias("r"), cond, "left")
            .select("l.*", "r.__template")
        )
    else:
        marked = blocks.join(freq, ["__fp"], "left")
    kept_struct = F.when(
        F.col("__template").isNull(),
        F.struct(F.col("__pos").alias("p"), F.col("__txt").alias("t")),
    )
    per_doc = marked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.count(F.when(F.col("__template"), 1)).alias("n_dropped"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["t"]
            ),
            "\n",
        ).alias(out_col),
    )
    # docs whose html produced no non-empty blocks still get a row
    return (
        spread(df)
        .select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_blocks", F.lit(0)).cast("long").alias("n_blocks"),
            F.coalesce("n_dropped", F.lit(0)).cast("long").alias("n_dropped"),
            F.coalesce(out_col, F.lit("")).alias(out_col),
        )
    )
