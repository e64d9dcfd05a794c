"""robots.txt parsing + URL matching: the crawl-side half of the
usage-policy family (E245 gates on in-page ``<meta name="robots">``;
this module gates on the site-wide exclusion file every crawler is
required to fetch first — RFC 9309).

Both halves are pure relational string work — explode lines, window
the group structure, broadcast the (tiny) rule table under the URL
scan — so verdicts value-hash on any engine.  Wildcard patterns
(``*``/``$`` inside rule paths, a Google extension) are deliberately
out of scope: rules are plain path PREFIXES per the original standard,
and a rule containing ``*`` or ``$`` is surfaced by
:func:`parse_robots_txt` with ``has_wildcard=true`` so callers can
quarantine rather than mis-match them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import spread

__all__ = ["parse_robots_txt", "match_robots", "robots_sitemaps"]

_DIRECTIVE_PAT = (
    r"(?i)^(user-agent|allow|disallow|crawl-delay|sitemap)\s*:\s*(.*)$"
)
_URL_PATH_PAT = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)"


def parse_robots_txt(
    df: DataFrame,
    text_col: str = "robots_txt",
    host_col: str = "host",
) -> DataFrame:
    """Parse one robots.txt body per row into rule rows:
    ``(host_col, group_id, agent, directive, path, has_wildcard)`` —
    one row per (user-agent × allow/disallow rule) combination within a
    group.

    Grouping follows RFC 9309: consecutive ``User-agent`` lines share
    one group (their rules apply to every named agent); a ``User-agent``
    line after any rule line starts a NEW group.  Comments (``#`` to end
    of line) and unknown directives are ignored; agents lower-case;
    rule paths keep their case (URL paths are case-sensitive).  An
    empty-value ``Disallow:`` is kept as a ``path=''`` row — the
    matcher ignores it (empty Disallow = no restriction, per spec).
    ``Crawl-delay`` lines (the de-facto politeness extension) surface as
    ``directive='crawl-delay'`` rows with the value in ``path`` — the
    frontier's per-domain rate knob; :func:`match_robots` considers
    ONLY allow/disallow rows.  Group-independent ``Sitemap`` lines are
    NOT rule rows — read them with :func:`robots_sitemaps`.

    One explode + two windows keyed on the host — robots files are KB,
    so even a full CC host list is a light shuffle."""
    from pyspark.sql import Window

    lines = (
        spread(df)
        .select(
            F.col(host_col).alias("host"),
            F.posexplode(
                F.split(F.coalesce(F.col(text_col), F.lit("")), "\r\n|\n")
            ).alias("__ln", "__raw"),
        )
        .select(
            "host",
            "__ln",
            F.trim(F.regexp_replace("__raw", "#.*$", "")).alias("__line"),
        )
        .select(
            "host",
            "__ln",
            F.lower(
                F.regexp_extract("__line", _DIRECTIVE_PAT, 1)
            ).alias("__kind"),
            F.trim(F.regexp_extract("__line", _DIRECTIVE_PAT, 2)).alias(
                "__val"
            ),
        )
        .where(F.col("__kind") != "")
    )
    w = Window.partitionBy("host").orderBy("__ln")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grouped = lines.select(
        "host",
        "__ln",
        "__kind",
        "__val",
        F.sum(
            F.when(
                (F.col("__kind") == "user-agent")
                & (
                    F.coalesce(F.lag("__kind").over(w), F.lit(""))
                    != "user-agent"
                ),
                1,
            ).otherwise(0)
        )
        .over(wsum)
        .alias("group_id"),
    )
    agents = (
        grouped.where(F.col("__kind") == "user-agent")
        .select(
            "host", "group_id", F.lower(F.col("__val")).alias("agent")
        )
        .distinct()
    )
    rules = grouped.where(
        F.col("__kind").isin("allow", "disallow", "crawl-delay")
    ).select(
        "host",
        "group_id",
        F.col("__kind").alias("directive"),
        F.col("__val").alias("path"),
        F.col("__val").rlike(r"[*$]").alias("has_wildcard"),
    )
    return agents.join(rules, ["host", "group_id"]).select(
        "host",
        F.col("group_id").cast("long").alias("group_id"),
        "agent",
        "directive",
        "path",
        "has_wildcard",
    )


def robots_sitemaps(
    df: DataFrame,
    text_col: str = "robots_txt",
    host_col: str = "host",
) -> DataFrame:
    """Extract the group-independent ``Sitemap:`` lines as
    ``(host_col, sitemap_url)`` rows — the crawl-seed surface robots.txt
    doubles as (comments stripped, values trimmed, empties dropped)."""
    lines = spread(df).select(
        F.col(host_col).alias("host"),
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\r\n|\n")
        ).alias("__raw"),
    )
    cleaned = F.trim(F.regexp_replace("__raw", "#.*$", ""))
    url = F.trim(
        F.regexp_extract(cleaned, r"(?i)^sitemap\s*:\s*(.*)$", 1)
    )
    return (
        lines.select("host", url.alias("sitemap_url"))
        .where(F.col("sitemap_url") != "")
    )


def match_robots(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Append the robots verdict to every URL row: ``(…urls columns,
    matched_path, matched_directive, allowed)``.

    Group selection per RFC 9309: the rules for ``agent`` (exact
    product-token match, case-insensitive) when that host names it,
    else the ``*`` group, else no rules (allowed).  Matching: a rule
    applies when its path is a PREFIX of the URL's path (empty rule
    paths and wildcard rules are ignored — see
    :func:`parse_robots_txt`); the LONGEST matching path wins, an
    ``allow`` beats a ``disallow`` at equal length (equal-length
    prefixes of one string are identical, so the tie is well-defined);
    no match ⇒ allowed.  A URL with no path component matches as ``/``.

    Scale shape: the rule table (KB per host) broadcasts under the URL
    scan — verdicts are one broadcast join + one aggregate keyed on the
    URL row, the corpus never reshuffles."""
    a = str(agent).lower()
    exact = rules.where(F.col("agent") == a)
    star = rules.where(F.col("agent") == "*").join(
        exact.select("host").distinct(), "host", "left_anti"
    )
    chosen = (
        exact.unionByName(star)
        .where(
            F.col("directive").isin("allow", "disallow")
            & (F.col("path") != "")
            & ~F.col("has_wildcard")
        )
        .select("host", "directive", "path")
        .distinct()
    )
    upath = F.coalesce(
        F.nullif(F.regexp_extract(F.col(url_col), _URL_PATH_PAT, 1), F.lit("")),
        F.lit("/"),
    )
    left = spread(urls).withColumn("__path", upath)
    cand = left.join(
        F.broadcast(chosen.withColumnsRenamed({"host": host_col})),
        [host_col],
        "left",
    ).withColumn(
        "__hit",
        F.when(
            F.col("path").isNotNull()
            & F.expr("startswith(__path, path)"),
            F.struct(
                F.length("path").alias("l"),
                (F.col("directive") == "allow").cast("int").alias("a"),
                F.col("path").alias("p"),
                F.col("directive").alias("d"),
            ),
        ),
    )
    best = cand.groupBy(*[F.col(c) for c in urls.columns]).agg(
        F.max("__hit").alias("__best")
    )
    return best.select(
        *urls.columns,
        F.col("__best.p").alias("matched_path"),
        F.col("__best.d").alias("matched_directive"),
        F.coalesce(F.col("__best.d") != "disallow", F.lit(True)).alias(
            "allowed"
        ),
    )
