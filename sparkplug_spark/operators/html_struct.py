"""Structured extraction from HTML/markdown: tables, heading outlines,
fenced code blocks, and schema.org JSON-LD islands.

These are the "keep the structure" complement of the prose lane
(:mod:`.html`'s jusText-shape main-content extractor flattens a page to
paragraphs; this module pulls out the parts whose VALUE is their
structure): data tables become relational rows for table-QA /
table-to-text corpora, heading outlines give section paths for
retrieval chunking, fenced code blocks feed code-data lanes with a
language tag, and JSON-LD gives typed page entities (Product, Article,
Recipe…) without NLP.

Scale shape shared by all four: one ``regexp_extract_all`` explodes
bounded match lists per document, per-field regexes project the
children — zero UDF, zero shuffle beyond the explode (output rows are
collocated with their document), whole-stage codegen throughout.  No
counterpart in the reference engine (indix/sparkplug is a rules
engine); the operators follow the public crawl-pipeline shape
(Common Crawl table corpora, The Stack's fence extraction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..partitioning import spread
from .html import _clean_text, _strip_noise

__all__ = [
    "extract_tables",
    "extract_headings",
    "chunk_by_sections",
    "extract_code_blocks",
    "extract_jsonld",
    "table_profile",
    "NUMERIC_CELL_PAT",
]

_TABLE_PAT = r"(?is)<table\b[^>]*>.*?</table\s*>"
_TR_PAT = r"(?is)<tr\b[^>]*>.*?</tr\s*>"
_CELL_PAT = r"(?is)<t[dh]\b[^>]*>.*?</t[dh]\s*>"
_HEADING_PAT = r"(?is)<h[1-6]\b[^>]*>.*?</h[1-6]\s*>"
_FENCE_PAT = r"(?s)```[^\n]*\n.*?```"
_JSONLD_PAT = (
    r"(?is)<script\b[^>]*type\s*=\s*[\"']application/ld\+json[\"']"
    r"[^>]*>.*?</script\s*>"
)


def _pos_blocks(
    df: DataFrame, src: Column, id_col: str, pattern: str, pos: str
) -> DataFrame:
    """Explode regex matches of ``pattern`` over ``src`` with their
    in-document order — the shared skeleton of every extractor here."""
    return spread(df).select(
        F.col(id_col),
        F.posexplode(
            F.regexp_extract_all(
                F.coalesce(src, F.lit("")), F.lit(pattern), F.lit(0)
            )
        ).alias(pos, "__blk"),
    )


def extract_tables(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode every ``<table>`` into relational cells: ``(id_col,
    table_pos, row_pos, col_pos, cell_text, is_header)`` — the shape
    table-QA / table-to-text corpora train on, and the input to
    "does this page carry DATA" quality signals (cells per table,
    header coverage).

    ``is_header`` marks ``<th>`` cells; ``cell_text`` is tag-stripped,
    entity-decoded and whitespace-collapsed (empty cells NULL).
    Script/style/comment bodies are removed BEFORE block matching so a
    ``<table`` inside a script string or comment can't phantom-match.
    Nested tables: the non-greedy block match truncates an outer table
    at its inner ``</table>`` — inner cells still extract (under the
    outer table's index, rows in document order), a documented
    flattening, not silent loss.  Rowspan/colspan are NOT expanded:
    ``col_pos`` is the CELL index in its row, not the visual grid
    column."""
    tables = _pos_blocks(
        df, _strip_noise(F.col(html_col)), id_col, _TABLE_PAT, "table_pos"
    )
    rows = tables.select(
        id_col,
        "table_pos",
        F.posexplode(
            F.regexp_extract_all("__blk", F.lit(_TR_PAT), F.lit(0))
        ).alias("row_pos", "__row"),
    )
    cells = rows.select(
        id_col,
        "table_pos",
        "row_pos",
        F.posexplode(
            F.regexp_extract_all("__row", F.lit(_CELL_PAT), F.lit(0))
        ).alias("col_pos", "__cell"),
    )
    return cells.select(
        id_col,
        F.col("table_pos").cast("long").alias("table_pos"),
        F.col("row_pos").cast("long").alias("row_pos"),
        F.col("col_pos").cast("long").alias("col_pos"),
        F.nullif(_clean_text(F.col("__cell")), F.lit("")).alias(
            "cell_text"
        ),
        F.lower(F.col("__cell")).startswith("<th").alias("is_header"),
    )


def extract_headings(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document heading outline: ``(id_col, heading_pos, level,
    text, section_path)`` where ``section_path`` joins the NEAREST
    preceding heading of each shallower level with `` > `` — the
    breadcrumb retrieval chunkers attach to every section ("Setup >
    Install > Linux") so a chunk keeps its context after splitting.

    Levels are 1–6 from the tag; heading text is cleaned like table
    cells; empty headings are kept (NULL text) so positions stay
    stable.  Script/style/comment bodies are removed before matching.
    The path windows run over HEADING rows only (a handful per
    document), partitioned by document — one narrow shuffle of the
    outline rows, never the pages."""
    heads = _pos_blocks(
        df, _strip_noise(F.col(html_col)), id_col, _HEADING_PAT,
        "heading_pos",
    )
    heads = heads.select(
        id_col,
        F.col("heading_pos").cast("long").alias("heading_pos"),
        F.regexp_extract("__blk", r"(?i)^<h([1-6])", 1)
        .cast("int")
        .alias("level"),
        F.nullif(_clean_text(F.col("__blk")), F.lit("")).alias("text"),
    )
    return _with_section_paths(heads, id_col, "heading_pos").select(
        id_col, "heading_pos", "level", "text", "section_path"
    )


def _with_section_paths(
    heads: DataFrame, id_col: str, pos_col: str
) -> DataFrame:
    """Append ``section_path`` to heading-shaped rows ``(id_col,
    pos_col, level, text)``: the nearest preceding heading of each
    shallower level joined with `` > `` — shared by
    :func:`extract_headings` and :func:`chunk_by_sections` (which
    builds its heading rows from the chunk split instead of re-parsing
    the page).  Rows with NULL ``level`` (preamble chunks) pass through
    with a NULL path."""
    w = (
        Window.partitionBy(id_col)
        .orderBy(pos_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # nearest preceding ancestor per level: last_value(text at level l),
    # but only while no heading of level <= l has appeared SINCE it —
    # track (pos, text) pairs and keep the max-pos candidate whose
    # position beats every shallower reset
    out = heads
    for lv in range(1, 7):
        out = out.withColumn(
            f"__a{lv}",
            F.max(
                F.when(
                    F.col("level") == lv,
                    F.struct(F.col(pos_col).alias("p"), F.col("text")),
                )
            ).over(w),
        )
    # ancestor level l is valid for a level-L row iff l < L and its pos
    # is after every ancestor of level < l (monotone chain)
    path_parts = []
    prev_pos = F.lit(-1).cast("long")
    for lv in range(1, 6):
        a = F.col(f"__a{lv}")
        valid = (
            (F.col("level") > lv)
            & a.isNotNull()
            & (a["p"] > prev_pos)
            & (a["p"] < F.col(pos_col))
        )
        path_parts.append(F.when(valid, a["text"]))
        prev_pos = F.when(valid, a["p"]).otherwise(prev_pos)
    section_path = F.when(
        F.col("level").isNotNull(),
        F.nullif(
            F.concat_ws(" > ", *path_parts, F.col("text")), F.lit("")
        ),
    )
    return out.withColumn("section_path", section_path).drop(
        *[f"__a{lv}" for lv in range(1, 7)]
    )


def chunk_by_sections(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Section-aware chunking: split the page at heading boundaries into
    ``(id_col, chunk_pos, level, title, section_path, text, n_chars)``
    rows — the RAG-shape chunker where each chunk keeps its breadcrumb
    ("Setup > Install > Linux") instead of a blind fixed-size window
    cutting mid-topic.

    Chunk 0 is the preamble before the first heading (NULL level/title/
    path; emitted only when it has text); chunk i>0 starts at heading i
    and carries that heading's cleaned text as ``title``, the breadcrumb
    as ``section_path`` (same ancestor chain as
    :func:`extract_headings`, computed here WITHOUT re-parsing the
    page), and the cleaned body text between this heading and the next.
    Sentinel-proof: the split sentinel (U+0001) is stripped from input
    first, so pages can't forge boundaries.  One explode + one window
    over chunk rows — pages themselves never shuffle twice."""
    sent = "\x01"
    src = F.regexp_replace(
        _strip_noise(F.col(html_col)), "[\x01]", " "
    )
    marked = F.regexp_replace(src, r"(?i)<h([1-6])\b", sent + "<h$1")
    chunks = spread(df).select(
        F.col(id_col),
        F.posexplode(F.split(marked, sent)).alias("chunk_pos", "__c"),
    )
    head_elem = F.regexp_extract(
        "__c", r"(?is)^(<h[1-6]\b[^>]*>.*?</h[1-6]\s*>)", 1
    )
    level = F.nullif(
        F.regexp_extract("__c", r"(?i)^<h([1-6])", 1), F.lit("")
    ).cast("int")
    body_raw = F.when(
        F.col("chunk_pos") == 0, F.col("__c")
    ).otherwise(F.expr("substring(__c, length(__h) + 1)"))
    chunks = (
        chunks.withColumn("__h", head_elem)
        .withColumn("level", level)
        .withColumn(
            "text", F.nullif(_clean_text(body_raw), F.lit(""))
        )
        .withColumn(
            "title",
            F.when(
                level.isNotNull(),
                F.nullif(_clean_text(F.col("__h")), F.lit("")),
            ),
        )
    )
    # drop empty preambles (pos 0 with no text); keep empty SECTIONS
    # (a heading with no body is still a real section)
    chunks = chunks.where(
        (F.col("chunk_pos") > 0) | F.col("text").isNotNull()
    )
    pathed = _with_section_paths(
        chunks.withColumnRenamed("title", "text2").withColumnRenamed(
            "text", "body"
        ).withColumnRenamed("text2", "text"),
        id_col,
        "chunk_pos",
    )
    return pathed.select(
        id_col,
        F.col("chunk_pos").cast("long").alias("chunk_pos"),
        "level",
        F.col("text").alias("title"),
        "section_path",
        F.col("body").alias("text"),
        F.coalesce(F.length("body"), F.lit(0)).cast("long").alias(
            "n_chars"
        ),
    )


def extract_code_blocks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Markdown fenced code blocks: ``(id_col, block_pos, lang,
    n_lines, n_chars, code)`` — the extraction step of every
    code-data lane over crawled markdown/README corpora (The Stack v2
    shape): the fence's info string becomes ``lang`` (lowercased first
    token, NULL when bare), the body keeps its bytes verbatim (code is
    whitespace-sensitive — no cleaning), ``n_lines`` counts newline-
    delimited lines of the body.

    Only triple-backtick fences are matched (indented code blocks are
    ambiguous against quoted text in crawled data and are skipped by
    most production extractors too).  An unclosed fence never matches
    (the non-greedy pattern requires the closing fence), so truncated
    documents yield fewer blocks, not garbage."""
    blocks = _pos_blocks(df, F.col(text_col), id_col, _FENCE_PAT, "block_pos")
    info = F.regexp_extract("__blk", r"^```([^\n]*)\n", 1)
    lang = F.lower(
        F.nullif(F.regexp_extract(F.trim(info), r"^(\S+)", 1), F.lit(""))
    )
    body = F.regexp_replace(
        F.regexp_replace("__blk", r"^```[^\n]*\n", ""), r"```$", ""
    )
    return blocks.select(
        id_col,
        F.col("block_pos").cast("long").alias("block_pos"),
        lang.alias("lang"),
        (
            F.length(body)
            - F.length(F.regexp_replace(body, r"\n", ""))
        ).cast("long").alias("n_lines"),
        F.length(body).cast("long").alias("n_chars"),
        body.alias("code"),
    )


def extract_jsonld(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """schema.org JSON-LD islands (``<script type="application/
    ld+json">``): ``(id_col, block_pos, jsonld_type, name, item_url,
    raw)`` — the typed-entity layer (Product/Article/Recipe/FAQ…)
    publishers embed for search engines, and the cheapest page-level
    metadata a crawl pipeline gets for free (no NLP, no rendering).

    ``jsonld_type``/``name``/``item_url`` are pulled with JSON-path
    projection (``@type``, ``name``, ``url``), tolerating a top-level
    array by falling back to the first element; malformed JSON yields
    NULL fields with the raw block preserved for quarantine."""
    blocks = _pos_blocks(df, F.col(html_col), id_col, _JSONLD_PAT, "block_pos")
    raw = F.trim(
        F.regexp_replace(
            F.regexp_replace("__blk", r"(?is)^<script\b[^>]*>", ""),
            r"(?is)</script\s*>$",
            "",
        )
    )
    blocks = blocks.withColumn("raw", raw)
    pick = lambda field: F.coalesce(  # noqa: E731
        F.get_json_object("raw", f"$['{field}']"),
        F.get_json_object("raw", f"$[0]['{field}']"),
    )
    return blocks.select(
        id_col,
        F.col("block_pos").cast("long").alias("block_pos"),
        pick("@type").alias("jsonld_type"),
        pick("name").alias("name"),
        pick("url").alias("item_url"),
        "raw",
    )


#: what counts as a numeric cell for :func:`table_profile` — integers /
#: decimals with optional sign and ,/. separators; frozen so SQL twins
#: embed the identical pattern.
NUMERIC_CELL_PAT = r"^[-+]?[0-9]+([.,][0-9]+)*$"


def table_profile(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-table data-quality profile: ``(id_col, table_pos, n_rows,
    n_cols, n_cells, n_header, n_body, n_numeric, numeric_ppm)`` — the
    "does this page carry DATA" signal over :func:`extract_tables`
    output: a high numeric share across a header-covered grid reads
    like a real data table worth keeping for table corpora; a 1-column
    text grid reads like layout chrome.

    ``n_body`` counts non-header cells with text; ``n_numeric`` counts
    body cells matching :data:`NUMERIC_CELL_PAT`; ``numeric_ppm`` is
    exact BIGINT div over the body (NULL when no body text).  One
    id+table-keyed aggregate over the cell rows — pages themselves
    never shuffle twice."""
    cells = extract_tables(df, html_col, id_col)
    is_body = ~F.col("is_header") & F.col("cell_text").isNotNull()
    is_num = is_body & F.col("cell_text").rlike(NUMERIC_CELL_PAT)
    agg = cells.groupBy(id_col, "table_pos").agg(
        (F.max("row_pos") + 1).alias("n_rows"),
        (F.max("col_pos") + 1).alias("n_cols"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.col("is_header").cast("long")).alias("n_header"),
        F.sum(is_body.cast("long")).alias("n_body"),
        F.sum(is_num.cast("long")).alias("n_numeric"),
    )
    return agg.withColumn(
        "numeric_ppm",
        F.expr(
            "CASE WHEN n_body > 0 "
            "THEN n_numeric * 1000000L div n_body END"
        ),
    )
