"""robots.txt parsing + URL matching: the crawl-side half of the
usage-policy family (E245 gates on in-page ``<meta name="robots">``;
this module gates on the site-wide exclusion file every crawler is
required to fetch first — RFC 9309).

Both halves are pure relational string work — explode lines, window
the group structure, broadcast the (tiny) rule table under the URL
scan — so verdicts value-hash on any engine.  Wildcard patterns are
MATCHED per RFC 9309 §2.2.3: ``*`` in a rule path matches any
character sequence and a TRAILING ``$`` anchors the end of the URL
path (a mid-path ``$`` is literal — the spec only gives ``$`` meaning
as the final octet).  Wildcard rules are compiled to anchored regexes
ONCE in the rule table (never per URL row); :func:`parse_robots_txt`
still surfaces ``has_wildcard`` so callers that want the stricter
prefix-only standard can filter before matching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..partitioning import spread

__all__ = [
    "parse_robots_txt",
    "match_robots",
    "robots_sitemaps",
    "parse_sitemaps",
    "parse_feeds",
    "frontier_schedule",
]

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


def frontier_schedule(
    frontier: DataFrame,
    delays: DataFrame | None = None,
    host_col: str = "host",
    url_col: str = "url",
    default_delay: int = 1,
) -> DataFrame:
    """Turn a crawl frontier into a POLITE fetch plan: every URL gets a
    per-host ``fetch_slot`` (0, 1, 2, … in deterministic md5-race order
    — reproducible across runs/engines, no hot-page bias) and
    ``eta_seconds = fetch_slot · crawl_delay(host)``, the earliest
    offset a crawler honoring the host's ``Crawl-delay`` may issue the
    request.  Sorting the plan by ``eta_seconds`` interleaves hosts
    automatically — the slow 10-second-delay host's queue drains in
    parallel with thousands of fast hosts instead of blocking a worker.

    ``delays`` is an optional ``(host, crawl_delay)`` table (e.g. the
    ``crawl-delay`` rows of :func:`parse_robots_txt`, cast to long);
    hosts without a row use ``default_delay`` seconds.  Non-positive
    delays clamp to ``default_delay`` (a ``Crawl-delay: 0`` still means
    "be polite", not "hammer").

    One shuffle on the host (inherent: per-host sequencing IS a
    grouping); the delay table is KB-scale and broadcasts."""
    from pyspark.sql import Window

    if default_delay <= 0:
        raise ValueError("default_delay must be positive")
    w = Window.partitionBy(host_col).orderBy(
        F.md5(F.col(url_col)), F.col(url_col)
    )
    out = spread(frontier).withColumn(
        "fetch_slot", (F.row_number().over(w) - 1).cast("long")
    )
    if delays is not None:
        d = delays.select(
            F.col(host_col),
            F.col("crawl_delay").cast("long").alias("__delay"),
        )
        out = out.join(F.broadcast(d), [host_col], "left")
    else:
        out = out.withColumn("__delay", F.lit(None).cast("long"))
    delay = F.when(
        F.col("__delay") > 0, F.col("__delay")
    ).otherwise(F.lit(int(default_delay)))
    return out.withColumn(
        "eta_seconds", (F.col("fetch_slot") * delay).cast("long")
    ).drop("__delay")


def parse_sitemaps(
    df: DataFrame,
    xml_col: str = "sitemap_xml",
    host_col: str = "host",
) -> DataFrame:
    """Parse sitemap XML bodies (the documents :func:`robots_sitemaps`
    points at — sitemaps.org protocol) into one row per entry:
    ``(host_col, entry_pos, kind, loc, lastmod, changefreq,
    priority_milli)``.

    Both document shapes are handled: ``<urlset>`` page entries
    (``kind='url'``) and ``<sitemapindex>`` child-sitemap entries
    (``kind='sitemap'`` — feed their ``loc`` back through the fetcher;
    big sites nest one level of index over ~50k-URL leaf files).
    ``<loc>`` values are trimmed and the five XML built-in entities
    decoded (``&amp;`` last, so ``&amp;lt;`` stays ``&lt;`` — the
    standard double-escape rule); ``priority`` (``0.0``–``1.0`` per
    spec) is returned as INTEGER milli-units via string math — never a
    float cast, so any engine reproduces it bit-for-bit; absent
    optional fields are NULL.

    Pure relational work — ``regexp_extract_all`` explodes entry blocks,
    per-field regexes project the children — zero UDF, zero shuffle,
    parallel over whatever partitioning the sitemap table already has."""
    entry_pat = r"(?s)<(?:url|sitemap)\b[^>]*>.*?</(?:url|sitemap)\s*>"
    blocks = spread(df).select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.regexp_extract_all(
                F.coalesce(F.col(xml_col), F.lit("")), F.lit(entry_pat),
                F.lit(0),
            )
        ).alias("entry_pos", "__blk"),
    )
    field = lambda tag: F.nullif(  # noqa: E731
        F.trim(
            F.regexp_extract(
                "__blk", rf"(?s)<{tag}\b[^>]*>(.*?)</{tag}\s*>", 1
            )
        ),
        F.lit(""),
    )
    loc = field("loc")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&amp;", "&"),  # &amp; LAST (double-escape rule)
    ):
        loc = F.replace(loc, F.lit(ent), F.lit(ch))
    pr = field("priority")
    pr_int = F.coalesce(
        F.nullif(F.regexp_extract(pr, r"^(\d+)", 1), F.lit("")),
        F.lit("0"),
    ).cast("long")
    pr_frac = F.rpad(
        F.regexp_extract(pr, r"^\d*\.(\d+)$", 1), 3, "0"
    )
    priority_milli = F.when(
        pr.rlike(r"^\d*(\.\d+)?$") & (pr != ""),
        pr_int * 1000
        + F.coalesce(
            F.nullif(pr_frac, F.lit("")).substr(1, 3).cast("long"),
            F.lit(0),
        ),
    )
    return blocks.select(
        "host",
        F.col("entry_pos").cast("long").alias("entry_pos"),
        F.when(F.col("__blk").startswith("<url"), F.lit("url"))
        .otherwise(F.lit("sitemap"))
        .alias("kind"),
        loc.alias("loc"),
        field("lastmod").alias("lastmod"),
        F.lower(field("changefreq")).alias("changefreq"),
        priority_milli.alias("priority_milli"),
    )


def parse_feeds(
    df: DataFrame,
    xml_col: str = "feed_xml",
    host_col: str = "host",
) -> DataFrame:
    """Parse RSS 2.0 / Atom feed bodies into one row per entry:
    ``(host_col, entry_pos, kind, title, link, guid, published)`` —
    the third crawl-seed surface next to robots' Sitemap lines (E248)
    and sitemap documents (E256): feeds announce NEW urls with
    timestamps, which is how an incremental crawl finds fresh content
    without re-walking a site.

    Both dialects in one pass (feeds in the wild mislabel constantly):
    ``<item>`` blocks parse RSS-style (``<link>url</link>``, ``<guid>``,
    ``<pubDate>``), ``<entry>`` blocks Atom-style (``<link href=…/>``,
    ``<id>``, ``<published>``/``<updated>`` — published preferred);
    ``kind`` records which.  Titles are entity-decoded like sitemap
    locs; absent fields are NULL.  Same zero-UDF explode + per-field
    regex shape as :func:`parse_sitemaps`."""
    entry_pat = r"(?is)<(?:item|entry)\b[^>]*>.*?</(?:item|entry)\s*>"
    blocks = spread(df).select(
        F.col(host_col).alias("host"),
        F.posexplode(
            F.regexp_extract_all(
                F.coalesce(F.col(xml_col), F.lit("")), F.lit(entry_pat),
                F.lit(0),
            )
        ).alias("entry_pos", "__blk"),
    )
    field = lambda tag: F.nullif(  # noqa: E731
        F.trim(
            F.regexp_extract(
                "__blk", rf"(?is)<{tag}\b[^>]*>(.*?)</{tag}\s*>", 1
            )
        ),
        F.lit(""),
    )
    is_rss = F.lower(F.col("__blk")).startswith("<item")
    title = field("title")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&amp;", "&"),  # &amp; LAST (double-escape rule)
    ):
        title = F.replace(title, F.lit(ent), F.lit(ch))
    atom_href = F.nullif(
        F.regexp_extract(
            "__blk",
            r"(?is)<link\b[^>]*href\s*=\s*[\"']([^\"']*)[\"']",
            1,
        ),
        F.lit(""),
    )
    link = F.when(is_rss, field("link")).otherwise(atom_href)
    guid = F.when(is_rss, field("guid")).otherwise(field("id"))
    published = F.when(is_rss, field("pubDate")).otherwise(
        F.coalesce(field("published"), field("updated"))
    )
    return blocks.select(
        "host",
        F.col("entry_pos").cast("long").alias("entry_pos"),
        F.when(is_rss, F.lit("rss")).otherwise(F.lit("atom")).alias(
            "kind"
        ),
        title.alias("title"),
        link.alias("link"),
        guid.alias("guid"),
        published.alias("published"),
    )


def match_robots(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    host_col: str = "host",
) -> DataFrame:
    """Append the robots verdict to EVERY URL row (duplicates
    preserved, non-groupable column types fine — the verdict is a
    per-row projection, never an aggregate): ``(…urls columns,
    matched_path, matched_directive, allowed)``.

    Group selection per RFC 9309: the rules for ``agent`` (exact
    product-token match, case-insensitive) when that host names it,
    else the ``*`` group, else no rules (allowed).  Matching: a plain
    rule applies when its path is a PREFIX of the URL's path; a
    wildcard rule (``*`` = any sequence, trailing ``$`` = end anchor,
    mid-path ``$`` literal) applies when its compiled anchored regex
    matches from the start.  Empty rule paths are ignored (empty
    Disallow = no restriction, per spec).  The rule with the MOST
    PATTERN OCTETS wins (the spec's "most specific match"; wildcard
    octets count as written, the de-facto Googlebot rule), an
    ``allow`` beats a ``disallow`` at equal length, then path
    descending for a deterministic final tie; no match ⇒ allowed.
    A URL with no path component matches as ``/``.

    Scale shape: rules fold to ONE array-of-structs row per host (a
    KB-scale aggregate of the rule table only) with wildcard regexes
    compiled in the table, then broadcast-join under the URL scan —
    the corpus itself never reshuffles, and each URL row scans its
    host's rule array once."""
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
        )
        .select("host", "directive", "path", "has_wildcard")
        .distinct()
    )
    # Compile wildcard paths to anchored Java/RE2-portable regexes ONCE
    # in the (tiny) rule table: trailing $ → anchor, remaining specials
    # escaped, * → .* — never recompiled per URL row.
    anchored = F.col("path").endswith("$")
    body = F.when(
        anchored, F.expr("substring(path, 1, length(path) - 1)")
    ).otherwise(F.col("path"))
    esc = F.regexp_replace(body, r"([.^$+?()\[\]{}|\\])", r"\\$1")
    pattern = F.concat(
        F.lit("^"),
        F.regexp_replace(esc, r"\*", ".*"),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    host_rules = chosen.groupBy("host").agg(
        F.collect_list(
            F.struct(
                F.length("path").alias("l"),
                (F.col("directive") == "allow").cast("int").alias("a"),
                F.col("path").alias("p"),
                F.col("directive").alias("d"),
                F.col("has_wildcard").alias("w"),
                pattern.alias("re"),
            )
        ).alias("__rules")
    )
    upath = F.coalesce(
        F.nullif(F.regexp_extract(F.col(url_col), _URL_PATH_PAT, 1), F.lit("")),
        F.lit("/"),
    )
    left = spread(urls).withColumn("__path", upath)
    joined = left.join(
        F.broadcast(host_rules.withColumnsRenamed({"host": host_col})),
        [host_col],
        "left",
    )
    hits = F.filter(
        F.col("__rules"),
        lambda r: F.when(
            r["w"], F.regexp_like(F.col("__path"), r["re"])
        ).otherwise(F.col("__path").startswith(r["p"])),
    )
    best = F.array_max(
        F.transform(
            hits,
            lambda r: F.struct(
                r["l"].alias("l"),
                r["a"].alias("a"),
                r["p"].alias("p"),
                r["d"].alias("d"),
            ),
        )
    )
    return joined.withColumn("__best", best).select(
        *urls.columns,
        F.col("__best.p").alias("matched_path"),
        F.col("__best.d").alias("matched_directive"),
        F.coalesce(F.col("__best.d") != "disallow", F.lit(True)).alias(
            "allowed"
        ),
    )
