"""Code-corpus operators: per-file shape/comment statistics and license
detection — the screening tier every code-corpus recipe runs before
training (The Stack / StarCoder-style pipelines filter on line-length
percentiles, comment density, alphanumeric fraction, and license
allowlists before anything else touches the files).

No reference counterpart (the reference is a 387-LoC rule engine,
``SparkPlug.scala:1-159``); semantics follow the public corpus recipes:
Kocetkov et al. 2022 (The Stack: license allowlist + SPDX tags), Li et
al. 2023 (StarCoder §3: line-length / alpha-fraction gates).

Scale notes: both operators are narrow zero-UDF per-row projections —
regex + array expressions whole-stage-codegen compiles; nothing
shuffles.  Every emitted ratio is exact integer ppm/milli (BIGINT
``div``) so DuckDB twins reproduce values bit-for-bit.  Line arrays are
materialized ONCE per row before any ``F.transform``/``F.filter``
consumes them (per-element re-evaluation discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import spread

__all__ = ["code_stats", "detect_license", "pack_repo_context"]

#: a trimmed line starting with one of these reads as a comment in the
#: big language families: #(py/sh/rb), //(c/js/go/rust), --(sql/lua/hs),
#: * or /* (C-style block bodies/openers)
_COMMENT_START = r"^(#|//|--|\*|/\*)"

#: canonical detector phrases, matched lowercase within the file header
#: (precedence order: first hit wins)
_LICENSE_PHRASES: tuple[tuple[str, str], ...] = (
    ("permission is hereby granted", "MIT"),
    ("apache license", "Apache-2.0"),
    ("gnu general public license", "GPL"),
    ("redistribution and use in source and binary forms", "BSD"),
    ("mozilla public license", "MPL-2.0"),
)


def code_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-file code-shape statistics: ``(id_col, n_lines,
    n_comment_lines, comment_ppm, max_line_len, mean_line_len_milli,
    n_identifiers, alpha_ppm, tab_indent_lines, space_indent_lines)``.

    The StarCoder-style gate inputs: files whose max/mean line length
    explodes are minified/generated, near-zero alpha fraction is data
    blobs, near-zero comment density correlates with low quality,
    mixed tab/space indentation flags auto-converted sources.  All
    ratios exact integer ppm/milli — floor division on non-negative
    operands, so Spark ``div`` and DuckDB ``//`` agree."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    base = spread(df).select(
        F.col(id_col),
        txt.alias("__t"),
        F.split(txt, "\n").alias("__lines"),
    )
    # strip leading blanks once; the comment filter consumes this array
    base = base.select(
        id_col,
        "__t",
        "__lines",
        F.transform(
            F.col("__lines"),
            lambda l: F.regexp_replace(l, "^[ \t]+", ""),
        ).alias("__stripped"),
    )
    n_lines = F.size(F.col("__lines"))
    n_comment = F.size(
        F.filter(F.col("__stripped"), lambda s: s.rlike(_COMMENT_START))
    )
    text_len = F.length(F.col("__t"))
    # total non-newline chars = len(text) - (n_lines - 1); exact
    mean_milli = F.expr(
        "(length(__t) - (size(__lines) - 1)) * 1000L"
        " div greatest(size(__lines), 1)"
    )
    return base.select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        n_comment.cast("long").alias("n_comment_lines"),
        F.expr(
            "size(filter(__stripped, s -> s rlike '^(#|//|--|\\\\*|/\\\\*)'))"
            " * 1000000L div greatest(size(__lines), 1)"
        ).alias("comment_ppm"),
        F.array_max(
            F.transform(F.col("__lines"), F.length)
        ).cast("long").alias("max_line_len"),
        mean_milli.cast("long").alias("mean_line_len_milli"),
        F.size(
            F.regexp_extract_all(
                F.col("__t"),
                F.lit(r"[A-Za-z_][A-Za-z0-9_]*"),
                F.lit(0),  # whole match: idx MUST be explicit (r10 gotcha)
            )
        ).cast("long").alias("n_identifiers"),
        F.expr(
            "length(regexp_replace(__t, '[^A-Za-z0-9]', ''))"
            " * 1000000L div greatest(length(__t), 1)"
        ).alias("alpha_ppm"),
        F.size(
            F.filter(F.col("__lines"), lambda l: l.startswith("\t"))
        ).cast("long").alias("tab_indent_lines"),
        F.size(
            F.filter(F.col("__lines"), lambda l: l.startswith("    "))
        ).cast("long").alias("space_indent_lines"),
    )


def detect_license(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    header_chars: int = 400,
) -> DataFrame:
    """License screening: ``(id_col, spdx_tag, license_guess, license)``
    — the machine-readable ``SPDX-License-Identifier`` tag when present
    (authoritative, taken verbatim), else a first-match phrase guess
    over the lowercased ``header_chars``-char file header; ``license``
    coalesces the two, NULL when neither fires (the row a
    permissive-only corpus recipe drops or routes to review).

    Zero-shuffle projection; phrase precedence is fixed so the verdict
    is deterministic across engines."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    head = F.lower(F.substring(txt, 1, int(header_chars)))
    spdx = F.nullif(
        F.regexp_extract(
            txt, r"SPDX-License-Identifier:\s*([A-Za-z0-9.+-]+)", 1
        ),
        F.lit(""),
    )
    guess = F.lit(None).cast("string")
    for phrase, tag in reversed(_LICENSE_PHRASES):
        guess = F.when(head.contains(phrase), F.lit(tag)).otherwise(guess)
    return spread(df).select(
        F.col(id_col),
        spdx.alias("spdx_tag"),
        guess.alias("license_guess"),
        F.coalesce(spdx, guess).alias("license"),
    )


def pack_repo_context(
    df: DataFrame,
    repo_col: str = "repo",
    path_col: str = "path",
    text_col: str = "text",
    block_tokens: int = 2048,
) -> DataFrame:
    """Repo-context training blocks (the StarCoder2-style sample shape:
    a model that sees whole-repository context learns cross-file
    structure a file-shuffled corpus destroys): files group by
    repository, order by path, and pack greedily in that order into
    blocks of at most ``block_tokens`` whitespace tokens — an
    over-budget file forms its own block, never split.  Each file is
    rendered under a ``<<<FILE: path>>>`` header; blocks join files
    with newlines.

    Returns ``(repo_col, block_idx, n_files, n_block_tokens, text)``,
    blocks numbered from 0 in path order.  Token accounting covers file
    CONTENT only (headers are sentinel tokens a tokenizer maps to
    specials; documented).

    Scale shape: ONE shuffle groups each repository's files (they must
    co-locate — that is the semantics), then the same all-integer
    ``F.aggregate`` greedy fold as sentence chunking (E251) assigns
    blocks with no window and no Python, and one (repo, block) groupBy
    reassembles.  Repositories are the natural unit of parallelism; a
    monorepo bigger than executor memory is the caller's cue to
    pre-split by top-level directory."""
    if block_tokens < 1:
        raise ValueError("block_tokens must be >= 1")
    txt = F.coalesce(F.col(text_col), F.lit(""))
    base = spread(df).select(
        F.col(repo_col).alias("__repo"),
        F.col(path_col).alias("__path"),
        txt.alias("__text"),
        F.size(
            F.filter(
                F.split(txt, "[ \t\n]+"), lambda t: t != F.lit("")
            )
        )
        .cast("long")
        .alias("__n"),
    )
    # one row per repo: files in path order (struct sort = field order,
    # path first), token counts materialized alongside
    per_repo = base.groupBy("__repo").agg(
        F.sort_array(
            F.collect_list(F.struct("__path", "__text", "__n"))
        ).alias("__files")
    )
    per_repo = per_repo.select(
        "__repo",
        "__files",
        F.transform(F.col("__files"), lambda f: f["__n"]).alias(
            "__counts"
        ),
    )
    zero = F.struct(
        F.lit(0).cast("long").alias("idx"),
        F.lit(0).cast("long").alias("used"),
        F.array().cast("array<long>").alias("out"),
    )
    budget = int(block_tokens)
    assigned = per_repo.select(
        "__repo",
        "__files",
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
                    F.array_append(acc["out"], acc["idx"] + 1).alias(
                        "out"
                    ),
                )
            ),
            lambda acc: acc["out"],
        ).alias("__assign"),
    )
    rows = assigned.select(
        "__repo",
        F.posexplode(
            F.arrays_zip(
                F.col("__files").alias("f"), F.col("__assign").alias("g")
            )
        ).alias("__pos", "__z"),
    ).select(
        "__repo",
        "__pos",
        F.col("__z.g").alias("block_idx"),
        F.col("__z.f.__n").alias("__n"),
        F.concat(
            F.lit("<<<FILE: "),
            F.col("__z.f.__path"),
            F.lit(">>>\n"),
            F.col("__z.f.__text"),
        ).alias("__rendered"),
    )
    return (
        rows.groupBy("__repo", "block_idx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum("__n").cast("long").alias("n_block_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__pos", "__rendered"))
                    ),
                    lambda x: x["__rendered"],
                ),
                "\n",
            ).alias("text"),
        )
        .select(
            F.col("__repo").alias(repo_col),
            F.col("block_idx").cast("long").alias("block_idx"),
            "n_files",
            "n_block_tokens",
            "text",
        )
    )
