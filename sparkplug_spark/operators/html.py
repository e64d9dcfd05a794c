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
    "extract_main_blocks",
    "blocks_to_markdown",
    "extract_html_metadata",
    "extract_image_refs",
    "image_text_pairs",
    "extract_links",
    "outlink_profile",
    "extract_opengraph",
    "crawl_frontier",
    "filter_by_policy",
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


def _strip_noise(col: Column) -> Column:
    """Remove script/style bodies and comments before block segmentation
    so their contents can never masquerade as page text."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.coalesce(col, F.lit("")), _SCRIPT_PAT, " "
            ),
            _STYLE_PAT,
            " ",
        ),
        _COMMENT_PAT,
        " ",
    )


def _link_chars(raw: Column) -> Column:
    """Sum of cleaned ``<a>``-content lengths in a raw block — the
    numerator of the jusText link-density ratio."""
    return F.aggregate(
        F.transform(
            F.regexp_extract_all(raw, F.lit(_ANCHOR_PAT), F.lit(1)),
            lambda x: F.length(_clean_text(x)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


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
    pre = _strip_noise(F.col(html_col))
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
            # per-extracted-anchor cleaning is genuinely per-element work,
            # not a rematerializable column
            _link_chars(F.col("__raw")).alias("__link_chars"),
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


#: Sentinel pair used by :func:`extract_main_blocks` to carry the opening
#: tag's type across the split (U+0001/U+0002 — stripped from the input
#: first, so page text can never forge a block boundary).
_SENT_A, _SENT_B = "\x01", "\x02"

#: Typed opening tags → type token carried through the sentinel.  The
#: heading pattern keeps its level digit via ``$1``; everything else in
#: ``BLOCK_SPLIT_PATTERN`` (including all closing tags) becomes an
#: untyped boundary afterwards.
_TYPED_TAGS = (
    (r"(?i)<(h[1-6])\b[^>]*>", "$1"),
    (r"(?i)<(?:li|dt|dd)\b[^>]*>", "li"),
    (r"(?i)<pre\b[^>]*>", "pre"),
    (r"(?i)<(?:td|th|caption)\b[^>]*>", "td"),
    (r"(?i)<p\b[^>]*>", "p"),
)


def extract_main_blocks(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_chars: int = 80,
    max_link_pct: int = 30,
    min_stop_pct: int = 25,
    stopwords: Sequence[str] | None = None,
) -> DataFrame:
    """Structure-preserving main-content extraction — the markdown-shape
    tier of :func:`extract_main_content` (same jusText classification, but
    kept blocks come back TYPED and ORDERED instead of flattened to
    prose, because block structure measurably helps code/reasoning
    training data).  Returns one row per KEPT block:
    ``(id_col, block_pos, block_type, heading_level, text)`` with
    ``block_type`` in ``heading|list|code|table|para`` (``heading_level``
    1-6 for headings, 0 otherwise) and ``block_pos`` the block's index in
    the page's original segmentation (gaps mark dropped chrome).

    A block's type is the innermost typed element that OPENED it
    (``h1-6``/``li,dt,dd``/``pre``/``td,th,caption``/``p``); fragments
    split by any other block boundary default to ``para``.  Gates:
    ``para`` blocks pass the full jusText battery (length, link density,
    stopword density); typed structural blocks (heading/list/code/table)
    pass on ``len >= 1`` plus the link-density gate alone — headings and
    code are legitimately short and stopword-poor, but a link-farm
    ``<li>`` is still chrome.  All-integer arithmetic, Java∩RE2 regexes,
    zero Python — a SQL twin replays every row.

    Scale shape: identical to :func:`extract_main_content` minus its
    final groupBy — a pure explode + projection, zero shuffle."""
    if min_chars < 1:
        raise ValueError("min_chars must be >= 1")
    if not (0 <= max_link_pct <= 100):
        raise ValueError("max_link_pct must be in [0, 100]")
    if not (0 <= min_stop_pct <= 100):
        raise ValueError("min_stop_pct must be in [0, 100]")
    if stopwords is None:
        from ..functions.text import STOPWORDS

        stopwords = STOPWORDS["en"]
    pre = _strip_noise(F.col(html_col))
    # page text can never forge a boundary: the sentinel alphabet is
    # removed before any tagging
    pre = F.regexp_replace(pre, f"[{_SENT_A}{_SENT_B}]", " ")
    for pat, repl in _TYPED_TAGS:
        pre = F.regexp_replace(pre, pat, f"{_SENT_A}{repl}{_SENT_B}")
    pre = F.regexp_replace(pre, BLOCK_SPLIT_PATTERN, f"{_SENT_A}{_SENT_B}")
    frags = (
        spread(df)
        .select(
            F.col(id_col),
            F.posexplode(F.split(pre, _SENT_A)).alias("__pos", "__frag"),
        )
        .select(
            id_col,
            "__pos",
            F.when(
                F.instr("__frag", _SENT_B) > 0,
                F.lower(F.substring_index("__frag", _SENT_B, 1)),
            )
            .otherwise(F.lit(""))
            .alias("__tag"),
            F.when(
                F.instr("__frag", _SENT_B) > 0,
                F.expr(f"substring(__frag, instr(__frag, '{_SENT_B}') + 1)"),
            )
            .otherwise(F.col("__frag"))
            .alias("__raw"),
        )
    )
    typed = frags.select(
        id_col,
        "__pos",
        F.when(F.col("__tag").rlike("^h[1-6]$"), F.lit("heading"))
        .when(F.col("__tag") == "li", F.lit("list"))
        .when(F.col("__tag") == "pre", F.lit("code"))
        .when(F.col("__tag") == "td", F.lit("table"))
        .otherwise(F.lit("para"))
        .alias("block_type"),
        F.when(
            F.col("__tag").rlike("^h[1-6]$"),
            F.substring("__tag", 2, 1).cast("int"),
        )
        .otherwise(F.lit(0))
        .alias("heading_level"),
        _clean_text(F.col("__raw")).alias("__txt"),
        _link_chars(F.col("__raw")).alias("__link_chars"),
    ).select(
        id_col,
        "__pos",
        "block_type",
        "heading_level",
        "__txt",
        "__link_chars",
        F.length("__txt").cast("long").alias("__len"),
        F.filter(
            F.split(F.lower(F.col("__txt")), "[^a-z]+"), lambda t: t != ""
        ).alias("__toks"),
    )
    stops = F.array(*[F.lit(w) for w in stopwords])
    scored = typed.select(
        id_col,
        "__pos",
        "block_type",
        "heading_level",
        "__txt",
        "__link_chars",
        "__len",
        F.size("__toks").cast("long").alias("__n_tok"),
        F.size(
            F.filter(F.col("__toks"), lambda t: F.array_contains(stops, t))
        )
        .cast("long")
        .alias("__n_stop"),
    )
    link_ok = (
        F.col("__link_chars") * 100 <= F.col("__len") * int(max_link_pct)
    )
    para_good = (
        (F.col("__len") >= int(min_chars))
        & link_ok
        & (F.col("__n_tok") > 0)
        & (F.col("__n_stop") * 100 >= F.col("__n_tok") * int(min_stop_pct))
    )
    struct_good = (F.col("__len") >= 1) & link_ok
    keep = F.when(F.col("block_type") == "para", para_good).otherwise(
        struct_good
    )
    return scored.where(keep).select(
        id_col,
        F.col("__pos").cast("long").alias("block_pos"),
        "block_type",
        "heading_level",
        F.col("__txt").alias("text"),
    )


def blocks_to_markdown(
    blocks: DataFrame,
    id_col: str = "doc_id",
    out_col: str = "markdown",
) -> DataFrame:
    """Reassemble :func:`extract_main_blocks` rows into one markdown-shape
    document per id: headings get ``#``·level prefixes, list items ``- ``,
    code blocks a 4-space indent, table cells ``| … |``, paragraphs pass
    through; blocks join with blank lines in ``block_pos`` order.  One
    groupBy on the id — the reassembly shuffle
    :func:`extract_main_blocks` deliberately skipped."""
    line = (
        F.when(
            F.col("block_type") == "heading",
            F.concat(
                F.repeat(F.lit("#"), F.col("heading_level")),
                F.lit(" "),
                F.col("text"),
            ),
        )
        .when(
            F.col("block_type") == "list",
            F.concat(F.lit("- "), F.col("text")),
        )
        .when(
            F.col("block_type") == "code",
            F.concat(F.lit("    "), F.col("text")),
        )
        .when(
            F.col("block_type") == "table",
            F.concat(F.lit("| "), F.col("text"), F.lit(" |")),
        )
        .otherwise(F.col("text"))
    )
    return (
        blocks.select(
            id_col,
            F.struct(F.col("block_pos").alias("p"), line.alias("t")).alias(
                "__b"
            ),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("__b")), lambda s: s["t"]
                ),
                "\n\n",
            ).alias(out_col),
        )
    )


_IMG_TAG_PAT = r"(?is)<img\b[^>]*>"
_FIGURE_PAT = r"(?is)<figure\b[^>]*>.*?</figure>"
_FIGCAP_PAT = r"(?is)<figcaption\b[^>]*>(.*?)</figcaption>"


def _attr(tag: Column, name: str) -> Column:
    """Quoted attribute value out of one tag's raw text ('' when absent —
    unquoted attribute values are out of scope, documented)."""
    return F.regexp_extract(
        tag, rf"(?is)\b{name}\s*=\s*[\"']([^\"']*)", 1
    )


def extract_image_refs(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per ``<img>`` element with a non-empty ``src``:
    ``(id_col, img_pos, src, alt, title, figcaption, caption)`` — the
    caption-candidate extraction that turns a crawl into image–text
    training pairs (LAION shape).  ``img_pos`` numbers the page's img
    tags in document order from 0; ``alt``/``title`` are the tag's own
    attributes (entity-decoded, whitespace-collapsed, NULL when empty);
    ``figcaption`` is the caption of an enclosing ``<figure>`` matched
    RELATIONALLY by (page, src) — smallest caption wins when one src
    appears in several figures — and ``caption`` is the first non-empty
    of figcaption, alt, title (NULL when no candidate).

    Script/style/comment noise is removed first, so a commented-out img
    never emits a row.  All patterns are Java∩RE2; the figure match is a
    narrow (id, src, caption) aggregate joined back — no nested-DOM
    parsing, no Python, one explode + one small join."""
    pre = _strip_noise(F.col(html_col))
    # ONE html scan extracts both tag arrays; the (small) arrays-only
    # frame is what fans out to the img and figure consumers — persisted
    # and released via the caller-visible eager output (the
    # fan-out-intermediates invariant, without caching raw page bytes)
    base = (
        spread(df)
        .select(
            F.col(id_col),
            F.regexp_extract_all(pre, F.lit(_IMG_TAG_PAT), F.lit(0)).alias(
                "__imgs"
            ),
            F.regexp_extract_all(pre, F.lit(_FIGURE_PAT), F.lit(0)).alias(
                "__figs"
            ),
        )
        .persist()
    )
    imgs = (
        base.select(
            id_col,
            F.posexplode(F.col("__imgs")).alias("img_pos", "__tag"),
        )
        .select(
            id_col,
            F.col("img_pos").cast("long").alias("img_pos"),
            _attr(F.col("__tag"), "src").alias("src"),
            F.nullif(_clean_text(_attr(F.col("__tag"), "alt")), F.lit(""))
            .alias("alt"),
            F.nullif(_clean_text(_attr(F.col("__tag"), "title")), F.lit(""))
            .alias("title"),
        )
        .where(F.col("src") != "")
    )
    figcaps = (
        base.select(
            id_col,
            F.explode(F.col("__figs")).alias("__fig"),
        )
        .select(
            id_col,
            F.regexp_extract(
                "__fig", r"(?is)<img\b[^>]*\bsrc\s*=\s*[\"']([^\"']*)", 1
            ).alias("src"),
            F.nullif(
                _clean_text(
                    F.regexp_extract("__fig", _FIGCAP_PAT, 1)
                ),
                F.lit(""),
            ).alias("__cap"),
        )
        .where((F.col("src") != "") & F.col("__cap").isNotNull())
        .groupBy(id_col, "src")
        .agg(F.min("__cap").alias("figcaption"))
    )
    out = imgs.join(figcaps, [id_col, "src"], "left").select(
        id_col,
        "img_pos",
        "src",
        "alt",
        "title",
        "figcaption",
        F.coalesce("figcaption", "alt", "title").alias("caption"),
    )
    from ..caching import materialize_release

    return materialize_release(out, base)


def image_text_pairs(
    pages: DataFrame,
    images: DataFrame,
    html_col: str = "html",
    page_id_col: str = "doc_id",
    url_col: str = "url",
    require_caption: bool = True,
) -> DataFrame:
    """Join the HTML lane to the decoded-image lane: extract ``<img>``
    references (+captions) from ``pages``, canonicalize both the ``src``
    attributes and the ``images`` table's ``url_col`` (E172 — tracking
    params, case, www, default ports all fold), and inner-join on the
    canonical URL — the step that turns a crawl plus an image store into
    ``(page, caption, image…)`` multimodal training pairs.

    Returns one row per matched reference: ``(page_id_col, img_pos,
    image_url, caption)`` plus every non-url column of ``images``
    (typically the decoded payload/dhash columns).  ``require_caption``
    drops caption-less references BEFORE the join (the LAION discipline —
    a pair without text trains nothing).  ``images`` should be unique per
    canonical URL (a duplicate fans the join out faithfully).

    Scale shape: references and image rows shuffle once each, keyed on
    the canonical URL; no broadcast assumption (at crawl scale both sides
    are big).  Nothing moves image bytes except the matched rows."""
    from .urls import canonicalize_urls

    refs = extract_image_refs(pages, html_col=html_col, id_col=page_id_col)
    if require_caption:
        refs = refs.where(F.col("caption").isNotNull())
    refs = canonicalize_urls(refs, url_col="src", out_col="__canon").where(
        F.col("__canon").isNotNull()
    )
    img_cols = [c for c in images.columns if c != url_col]
    imgs = (
        canonicalize_urls(images, url_col=url_col, out_col="__canon")
        .where(F.col("__canon").isNotNull())
        .select("__canon", *img_cols)
    )
    return refs.join(imgs, "__canon").select(
        page_id_col,
        "img_pos",
        F.col("__canon").alias("image_url"),
        "caption",
        *img_cols,
    )


_A_ELEMENT_PAT = r"(?is)<a\b[^>]*>.*?</a>"
_A_INNER_PAT = r"(?is)<a\b[^>]*>(.*?)</a>"


def extract_links(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per ``<a>`` element with a non-empty ``href``:
    ``(id_col, link_pos, href, anchor_text, rel)`` — the link-graph
    extraction a crawl pipeline feeds into frontier scheduling and
    PageRank-family ranking.  ``link_pos`` numbers the page's anchor
    elements in document order from 0; ``anchor_text`` is the element's
    inner text (tag-stripped, entity-decoded, whitespace-collapsed,
    NULL when empty); ``rel`` is the lower-cased rel attribute (NULL
    when absent) so callers can drop ``nofollow``/``sponsored``/``ugc``
    edges before graph construction.

    Script/style/comment noise is removed first (a commented-out anchor
    emits nothing).  Pure explode + projection, Java∩RE2 patterns, zero
    Python, zero shuffle."""
    pre = _strip_noise(F.col(html_col))
    return (
        spread(df)
        .select(
            F.col(id_col),
            F.posexplode(
                F.regexp_extract_all(pre, F.lit(_A_ELEMENT_PAT), F.lit(0))
            ).alias("link_pos", "__el"),
        )
        .select(
            id_col,
            F.col("link_pos").cast("long").alias("link_pos"),
            _attr(F.col("__el"), "href").alias("href"),
            F.nullif(
                _clean_text(F.regexp_extract("__el", _A_INNER_PAT, 1)),
                F.lit(""),
            ).alias("anchor_text"),
            F.nullif(F.lower(_attr(F.col("__el"), "rel")), F.lit("")).alias(
                "rel"
            ),
        )
        .where(F.col("href") != "")
    )


def extract_opengraph(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    properties: tuple[str, ...] = (
        "title", "description", "image", "type", "url",
    ),
) -> DataFrame:
    """OpenGraph card fields per page: ``(id_col, og_title,
    og_description, og_image, og_type, og_url)`` — publishers curate
    these for link previews, so they're routinely the CLEANEST
    title/summary/image a crawl gets (feeds E242's image–text pairing
    with an editor-written caption candidate and E237's routing with a
    canonical-ish url).

    Each ``<meta property="og:x" content=…>`` is matched in BOTH
    attribute orders (first non-empty wins, like the E237 battery),
    values entity-decoded the standard way; absent properties are NULL.
    One zero-shuffle codegen projection, Java∩RE2 patterns."""
    h = F.coalesce(F.col(html_col), F.lit(""))

    def prop(name: str):
        pc = F.regexp_extract(
            h,
            "(?is)<meta\\s[^>]*property\\s*=\\s*[\"']og:" + name
            + "[\"'][^>]*content\\s*=\\s*[\"']([^\"']*)",
            1,
        )
        cp = F.regexp_extract(
            h,
            "(?is)<meta\\s[^>]*content\\s*=\\s*[\"']([^\"']*)[\"']"
            "[^>]*property\\s*=\\s*[\"']og:" + name + "[\"']",
            1,
        )
        val = F.coalesce(F.nullif(pc, F.lit("")), F.nullif(cp, F.lit("")))
        for ent, ch in (
            ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&#39;", "'"), ("&amp;", "&"),
        ):
            val = F.replace(val, F.lit(ent), F.lit(ch))
        return val.alias(f"og_{name}")

    return df.select(F.col(id_col), *[prop(n) for n in properties])


def outlink_profile(
    df: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-page outbound-link profile: ``(id_col, n_links, n_nofollow,
    n_internal, n_external, internal_ppm)`` — the link-spam / SEO-farm
    signal quality pipelines gate on (a page whose links are ~100%
    cross-domain nofollow spray reads like a link farm; thousands of
    ~100% internal links read like tag-cloud chrome).

    ``internal`` means the href resolves within the page's REGISTERED
    domain (eTLD+1 via the shared suffix table): relative hrefs and
    same-domain absolute hrefs both count; ``n_nofollow`` counts rel
    TOKENS (``rel="external nofollow"`` counts, ``nofollowish``
    doesn't).  Pages with zero links keep a row of zeros — "no links
    at all" is a signal too.  ``internal_ppm`` is exact BIGINT div
    (NULL on link-less pages, never 0/0).

    Plan: the page domain is computed ONCE per page and rides the
    anchor explode, so the whole profile is explode → id-keyed
    aggregate — no join back to the page table, pages never shuffle
    (only id+counter rows do)."""
    from .urls import MULTI_LABEL_SUFFIXES, _registered_domain
    from .urls import _HOST_RE as _U_HOST_RE

    page_host = F.lower(F.regexp_extract(F.col(url_col), _U_HOST_RE, 1))
    page_dom = F.when(
        page_host != "", _registered_domain(page_host, MULTI_LABEL_SUFFIXES)
    )
    pre = _strip_noise(F.col(html_col))
    exploded = spread(df).select(
        F.col(id_col),
        page_dom.alias("__pdom"),
        F.explode_outer(
            F.regexp_extract_all(pre, F.lit(_A_ELEMENT_PAT), F.lit(0))
        ).alias("__el"),
    )
    href = _attr(F.col("__el"), "href")
    rel = F.lower(_attr(F.col("__el"), "rel"))
    href_host = F.lower(F.regexp_extract(href, _U_HOST_RE, 1))
    is_relative = ~href.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
    href_dom = F.when(
        href_host != "",
        _registered_domain(href_host, MULTI_LABEL_SUFFIXES),
    )
    is_link = F.col("__el").isNotNull() & (href != "")
    internal = F.when(
        is_relative, F.lit(True)
    ).otherwise(href_dom.eqNullSafe(F.col("__pdom")))
    nofollow = F.coalesce(
        F.array_contains(F.split(rel, r"[ ,]+"), "nofollow"),
        F.lit(False),
    )
    per_link = exploded.select(
        id_col,
        F.when(is_link, 1).otherwise(0).alias("__n"),
        F.when(is_link & nofollow, 1).otherwise(0).alias("__nf"),
        F.when(is_link & internal, 1).otherwise(0).alias("__int"),
    )
    agg = per_link.groupBy(id_col).agg(
        F.sum("__n").alias("n_links"),
        F.sum("__nf").alias("n_nofollow"),
        F.sum("__int").alias("n_internal"),
    )
    return agg.select(
        id_col,
        "n_links",
        "n_nofollow",
        "n_internal",
        (F.col("n_links") - F.col("n_internal")).alias("n_external"),
        F.expr(
            "CASE WHEN n_links > 0 "
            "THEN n_internal * 1000000L div n_links END"
        ).alias("internal_ppm"),
    )


def discovered_targets(
    pages: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    drop_rel: Sequence[str] = ("nofollow", "sponsored", "ugc"),
) -> DataFrame:
    """The per-URL discovery aggregate :func:`crawl_frontier` is built
    on — ``(url, n_refs, first_doc, first_pos)`` from one batch of
    fetched pages: followable links, canonical targets, reference
    counts and the deterministic min-(page, position) discoverer.

    Both aggregates are COMMUTATIVE (count adds, first = min struct),
    which is what makes the streaming frontier store's merge-on-write
    fold exact: folding per-batch aggregates equals aggregating all
    pages at once, independent of batch order or boundaries."""
    links = extract_links(pages, html_col=html_col, id_col=id_col)
    if drop_rel:
        drop_arr = F.array(*[F.lit(t.lower()) for t in drop_rel])
        toks = F.filter(
            F.split(F.coalesce(F.col("rel"), F.lit("")), " "),
            lambda t: t != "",
        )
        links = links.where(F.size(F.array_intersect(toks, drop_arr)) == 0)
    from .urls import canonicalize_urls

    return (
        canonicalize_urls(links, url_col="href", out_col="url")
        .where(F.col("url").isNotNull())
        .groupBy("url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_refs"),
            F.min(
                F.struct(
                    F.col(id_col).alias("d"), F.col("link_pos").alias("p")
                )
            ).alias("__first"),
        )
        .select(
            "url",
            "n_refs",
            F.col("__first.d").alias("first_doc"),
            F.col("__first.p").alias("first_pos"),
        )
    )


def merge_frontier_targets(
    stored: DataFrame, batch: DataFrame
) -> DataFrame:
    """Fold a batch's discovery aggregates into stored ones: counts
    ADD, the first-discoverer takes the min (page, position) struct —
    both commutative, so any batching reproduces the one-shot
    aggregate."""
    return (
        stored.unionByName(batch)
        .groupBy("url")
        .agg(
            F.sum("n_refs").cast("long").alias("n_refs"),
            F.min(
                F.struct(
                    F.col("first_doc").alias("d"),
                    F.col("first_pos").alias("p"),
                )
            ).alias("__first"),
        )
        .select(
            "url",
            "n_refs",
            F.col("__first.d").alias("first_doc"),
            F.col("__first.p").alias("first_pos"),
        )
    )


def frontier_from_store(
    targets: DataFrame,
    crawled: DataFrame,
    url_col: str = "url",
    per_domain_cap: int = 1000,
) -> DataFrame:
    """Serve the crawl frontier from a maintained discovery store:
    anti-join the already-crawled set and apply the per-domain md5-race
    cap AT SERVE TIME (the store itself stays uncapped and un-filtered,
    so a growing crawled set or a retuned cap never needs a store
    rebuild).  Output schema matches :func:`crawl_frontier`."""
    from .urls import canonicalize_urls, cap_per_domain

    seen = (
        canonicalize_urls(crawled, url_col=url_col, out_col="__canon")
        .where(F.col("__canon").isNotNull())
        .select(F.col("__canon").alias("url"))
        .distinct()
    )
    fresh = targets.join(seen, "url", "left_anti")
    return cap_per_domain(
        fresh, url_col="url", cap=per_domain_cap, id_col="url"
    ).select(
        "url", "n_refs", "first_doc", "first_pos", "url_domain",
        "domain_rank",
    )


def crawl_frontier(
    pages: DataFrame,
    crawled: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    url_col: str = "url",
    per_domain_cap: int = 1000,
    drop_rel: Sequence[str] = ("nofollow", "sponsored", "ugc"),
) -> DataFrame:
    """Build the next crawl frontier from fetched pages: extract links,
    drop opted-out edge kinds (``rel`` is a space-separated token list —
    any token in ``drop_rel`` drops the edge), canonicalize targets
    (E172), collapse to one row per target URL with its reference count
    and deterministic first discoverer, anti-join the already-crawled
    set, and cap per registered domain (E171's md5-race cap — politeness
    and anti-spider-trap in one knob).

    Returns ``(url, n_refs, first_doc, first_pos, url_domain,
    domain_rank)``: ``n_refs`` counts followable references,
    ``(first_doc, first_pos)`` is the smallest (page id, link position)
    that discovered the URL — a stable provenance pointer.

    Scale shape: link rows shuffle once keyed on the canonical URL (the
    aggregate), the crawled set joins as a second URL-keyed shuffle
    (both sides are url+count tuples, never page bytes), and the domain
    cap is one bounded window — the standard frontier shape at ~10^11
    discovered URLs per snapshot."""
    from .urls import canonicalize_urls

    targets = discovered_targets(
        pages, html_col=html_col, id_col=id_col, drop_rel=drop_rel
    )
    seen = (
        canonicalize_urls(crawled, url_col=url_col, out_col="__canon")
        .where(F.col("__canon").isNotNull())
        .select(F.col("__canon").alias("url"))
        .distinct()
    )
    fresh = targets.join(seen, "url", "left_anti")
    from .urls import cap_per_domain

    return cap_per_domain(
        fresh, url_col="url", cap=per_domain_cap, id_col="url"
    ).select(
        "url", "n_refs", "first_doc", "first_pos", "url_domain",
        "domain_rank",
    )


def filter_by_policy(
    df: DataFrame,
    robots_col: str = "meta_robots",
    deny: Sequence[str] = ("noindex", "noai", "noimageai"),
    license_col: str | None = None,
    allow_licenses: Sequence[str] | None = None,
    flag_only: bool = False,
) -> DataFrame:
    """Usage-policy gate — the opt-out filter a crawl pipeline runs
    BEFORE spending any extraction/quality compute: drop pages whose
    robots directives contain any denied token (``noindex``, ``noai``,
    ``noimageai`` by default; matching is on the comma-separated token
    list, trimmed and lower-cased, so ``NoIndex , nofollow`` denies) and,
    when ``allow_licenses`` is given, keep only pages whose
    ``license_col`` value is in the allowlist (NULL license drops —
    licensing must be AFFIRMATIVE under an allowlist policy).

    A NULL/absent robots value passes the deny gate (no directive = no
    opt-out, the robots-exclusion default).  ``flag_only=True`` appends a
    ``policy_ok`` boolean instead of filtering — the audit shape.  Pure
    projection + filter, zero shuffle, no Python."""
    if not deny:
        raise ValueError("deny must name at least one directive token")
    toks = F.filter(
        F.transform(
            F.split(F.lower(F.coalesce(F.col(robots_col), F.lit(""))), ","),
            lambda t: F.trim(t),
        ),
        lambda t: t != "",
    )
    deny_arr = F.array(*[F.lit(t.lower()) for t in deny])
    ok = F.size(F.array_intersect(toks, deny_arr)) == 0
    if allow_licenses is not None:
        if license_col is None:
            raise ValueError("allow_licenses requires license_col")
        # coalesce: a NULL license must DENY (boolean false, not NULL) so
        # the flag_only audit column is never three-valued
        ok = ok & F.coalesce(
            F.col(license_col).isin(*[str(x) for x in allow_licenses]),
            F.lit(False),
        )
    if flag_only:
        return df.withColumn("policy_ok", ok)
    return df.where(ok)


def extract_html_metadata(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    policy: bool = False,
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

    ``policy=True`` appends the usage-policy fields
    :func:`filter_by_policy` gates on (opt-in so the base schema stays
    stable):

    - ``meta_robots``: the ``<meta name="robots">`` content value (either
      attribute order), lower-cased and whitespace-collapsed — the
      noindex/noai opt-out surface,
    - ``license_url``: ``<link rel="license" href=…>`` — the license
      microdata an allowlist policy checks.

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
    cols = [
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
    ]
    if policy:
        robots_nc = F.regexp_extract(
            h,
            "(?is)<meta\\s[^>]*name\\s*=\\s*[\"']robots[\"']"
            "[^>]*content\\s*=\\s*[\"']([^\"']*)",
            1,
        )
        robots_cn = F.regexp_extract(
            h,
            "(?is)<meta\\s[^>]*content\\s*=\\s*[\"']([^\"']*)[\"']"
            "[^>]*name\\s*=\\s*[\"']robots[\"']",
            1,
        )
        robots = F.trim(
            F.regexp_replace(
                F.lower(
                    F.coalesce(F.nullif(robots_nc, F.lit("")), robots_cn)
                ),
                "[ \t\n\r\f\x0b]+",
                " ",
            )
        )
        lic = F.regexp_extract(
            h,
            "(?is)<link\\s[^>]*rel\\s*=\\s*[\"']license[\"']"
            "[^>]*href\\s*=\\s*[\"']([^\"']*)",
            1,
        )
        cols += [
            F.nullif(robots, F.lit("")).alias("meta_robots"),
            F.nullif(lic, F.lit("")).alias("license_url"),
        ]
    return spread(df).select(id_col, *cols)


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
    pre = _strip_noise(F.col(html_col))
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
