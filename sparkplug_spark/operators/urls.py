"""Web-corpus URL operators: URL parsing, registered-domain extraction,
blocklist filtering, and per-domain capping.

Every crawl-derived pipeline (C4, RefinedWeb, Gopher's MassiveWeb) starts
here: group pages by the *registered domain* (eTLD+1 — ``news.bbc.co.uk``
and ``www.bbc.co.uk`` are both ``bbc.co.uk``), drop blocked domains and
disallowed schemes, then cap each domain's contribution so one mirror
farm can't dominate the corpus mixture.

Design (100 TB):
- Parsing is pure ``regexp_extract`` + array ops — a narrow codegen'd
  projection, no UDF, no shuffle, and expressible identically in ANSI SQL
  (the oracle re-derives every field with the same regexes, so the parse
  semantics themselves are value-hash-checked cross-engine).  We avoid
  ``parse_url`` deliberately: it is JVM-``java.net.URL`` behavior that no
  other engine reproduces bit-for-bit.
- The public-suffix handling is a deliberately SMALL multi-label suffix
  table (the common ccTLD second-level registries), compiled into the
  expression as a literal ``IN`` list — a full Mozilla PSL would be a
  broadcast-joined dimension table; the composition point is the same.
- Blocklist filtering is a literal ``IN`` filter for driver-held lists
  (the normal case: curated lists of 1e2-1e5 domains fit in the plan /
  a broadcast); per-domain caps reuse :func:`sample_per_key`'s
  deterministic md5-race window — one shuffle on the domain.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import hash60

__all__ = [
    "MULTI_LABEL_SUFFIXES",
    "TRACKING_PARAMS",
    "extract_url_parts",
    "filter_urls",
    "cap_per_domain",
    "canonicalize_urls",
    "surt_keys",
    "tld_report",
]

#: Query parameters that never change page content — stripped during
#: canonicalization (any ``utm_``-prefixed name is stripped as well).
TRACKING_PARAMS: tuple[str, ...] = (
    "fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "ref", "igshid",
)

#: Common multi-label public suffixes (second-level registries).  A row's
#: registered domain keeps THREE labels when its last two labels match one
#: of these, else two.  Deliberately small and frozen so the oracle SQL can
#: embed the identical list; swap in the full PSL as a broadcast dim table
#: if you need exhaustive ccTLD coverage.
MULTI_LABEL_SUFFIXES: tuple[str, ...] = (
    "ac.uk", "co.in", "co.jp", "co.kr", "co.nz", "co.uk", "co.za",
    "com.au", "com.br", "com.cn", "com.mx", "com.sg", "com.tr",
    "gov.uk", "ne.jp", "net.au", "or.jp", "org.au", "org.uk",
)

# Scheme / host / path / query regexes.  Kept RE2-simple (no lookarounds)
# so Spark's regexp_extract and DuckDB's regexp_extract agree; group 1 is
# the captured field in each.
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
# host: after scheme + optional userinfo, up to :port, /path, ?query or #frag
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]*)"
# path: the first /-rooted run after the authority
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _registered_domain(
    host: Column, suffixes: Sequence[str]
) -> Column:
    """eTLD+1 from a lowercased host via label slicing (no UDF)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # Clamp slice starts to 1: Spark array slicing errors on start=0, and
    # although the CaseWhen guards below never *select* these branches for
    # 1-/2-label hosts, expression totality must not depend on evaluation
    # order (codegen is free to evaluate eagerly).
    last2 = F.array_join(
        F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), "."
    )
    last3 = F.array_join(
        F.slice(labels, F.greatest(n - 2, F.lit(1)), 3), "."
    )
    return (
        F.when((n >= 3) & last2.isin(*suffixes), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def extract_url_parts(
    df: DataFrame,
    url_col: str = "url",
    suffixes: Sequence[str] = MULTI_LABEL_SUFFIXES,
    prefix: str = "url_",
) -> DataFrame:
    """Add ``{prefix}scheme/host/domain/path/query`` columns parsed from
    ``url_col``.  Pure projection (regexp + array ops): no shuffle, stays
    inside whole-stage codegen, and the identical expressions run on any
    ANSI engine — parse semantics are oracle-checked, not
    ``java.net.URL``-defined.

    ``{prefix}host`` is lowercased with port/userinfo stripped;
    ``{prefix}domain`` is the registered domain (eTLD+1 under the
    compiled-in ``suffixes`` table); empty captures become NULL (a URL
    with no ``://`` parses to all-NULL parts, letting callers quarantine
    malformed rows with one ``IS NULL`` filter)."""
    url = F.col(url_col)
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    empty_null = lambda c: F.when(c != "", c)  # noqa: E731
    host = empty_null(host)
    return df.select(
        "*",
        empty_null(F.lower(F.regexp_extract(url, _SCHEME_RE, 1))).alias(
            f"{prefix}scheme"
        ),
        host.alias(f"{prefix}host"),
        F.when(
            host.isNotNull(), _registered_domain(host, suffixes)
        ).alias(f"{prefix}domain"),
        empty_null(F.regexp_extract(url, _PATH_RE, 1)).alias(f"{prefix}path"),
        empty_null(F.regexp_extract(url, _QUERY_RE, 1)).alias(f"{prefix}query"),
    )


def filter_urls(
    df: DataFrame,
    url_col: str = "url",
    block_domains: Iterable[str] = (),
    allow_schemes: Iterable[str] = ("http", "https"),
    block_path_tokens: Iterable[str] = (),
    suffixes: Sequence[str] = MULTI_LABEL_SUFFIXES,
    prefix: str = "url_",
) -> DataFrame:
    """Keep rows whose URL parses, whose scheme is allowed, whose
    registered domain is NOT in ``block_domains``, and whose path contains
    none of ``block_path_tokens`` (case-insensitive substring, the C4
    "bad-words in URL" rule).  Adds the parsed ``{prefix}*`` columns.

    One codegen'd filter — blocklists are driver-held literals (curated
    lists are small); for a multi-million-row blocklist join on
    ``{prefix}domain`` against a broadcast table instead."""
    block_domains = sorted({d.lower() for d in block_domains})
    allow_schemes = sorted({s.lower() for s in allow_schemes})
    block_path_tokens = sorted({t.lower() for t in block_path_tokens})
    if not allow_schemes:
        raise ValueError("allow_schemes must be non-empty")
    out = (
        df
        if f"{prefix}domain" in df.columns
        else extract_url_parts(df, url_col, suffixes=suffixes, prefix=prefix)
    )
    keep = (
        F.col(f"{prefix}domain").isNotNull()
        & F.col(f"{prefix}scheme").isin(*allow_schemes)
    )
    if block_domains:
        keep &= ~F.col(f"{prefix}domain").isin(*block_domains)
    for tok in block_path_tokens:
        keep &= ~F.coalesce(
            F.lower(F.col(f"{prefix}path")).contains(tok), F.lit(False)
        )
    return out.filter(keep)


def canonicalize_urls(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "url_canon",
    strip_www: bool = True,
    tracking_params: Sequence[str] = TRACKING_PARAMS,
) -> DataFrame:
    """Add ``out_col`` with the canonical form of ``url_col`` — the key
    every crawl dedup joins on (the same page arrives as ``http://WWW.
    Example.com:80/a/?utm_source=x#frag`` and ``https://example.com/a``
    from different seed lists; canonicalization folds the noise so exact
    dedup can do the rest):

    - scheme and host lowercased; ``www.`` prefix dropped (``strip_www``);
      default ports (``:80`` http, ``:443`` https) removed, others kept
    - fragment removed; trailing slashes trimmed from the path
    - query parameters: any ``utm_``-prefixed name and every name in
      ``tracking_params`` dropped; survivors SORTED and rejoined, so
      param order cannot split a dedup group

    Unparseable URLs (no ``://``) canonicalize to NULL.  Pure projection:
    regex + array lambdas, no UDF, no shuffle — and the identical
    expressions run on any ANSI engine, so the canonicalization itself is
    value-hash-checkable.  Compose with
    :func:`~.dedup.dedup_exact`-style races on ``out_col`` for the actual
    page dedup."""
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(
        url, r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?[^/:?#]*:([0-9]+)", 1
    )
    path = F.regexp_replace(F.regexp_extract(url, _PATH_RE, 1), "/+$", "")
    query = F.regexp_extract(url, _QUERY_RE, 1)
    keep_params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != "")
                & ~F.split(p, "=")[0].startswith("utm_")
                & ~F.split(p, "=")[0].isin(*tracking_params),
            )
        ),
        "&",
    )
    drop_port = (
        (port == "")
        | ((scheme == F.lit("http")) & (port == "80"))
        | ((scheme == F.lit("https")) & (port == "443"))
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(drop_port, F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        path,
        F.when(keep_params == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), keep_params)
        ),
    )
    return df.withColumn(
        out_col, F.when((scheme != "") & (host != ""), canon)
    )


def surt_keys(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "urlkey",
    strip_www: bool = True,
) -> DataFrame:
    """Add ``out_col`` with the SURT key (Sort-friendly URI Reordering
    Transform — the key format of every CDX crawl index, pywb and the
    Common Crawl index included): host labels REVERSED and comma-joined,
    then ``)`` + lowercased path (``/`` when absent) + ``?`` + the
    alphabetically sorted query — ``http://www.Example.co.uk/A?b=2&a=1``
    → ``uk,co,example)/a?a=1&b=2``.

    Reversing the host makes one registered domain's captures a single
    CONTIGUOUS key range, so a sorted index answers "everything under
    example.com" with one range scan instead of a full pass — the same
    reason to feed ``out_col`` to :func:`~..sources.write_sorted` when
    persisting a capture table.  Scheme, port, userinfo and fragment are
    dropped (SURT folds protocol/port variants of one resource);
    ``strip_www`` additionally folds the ``www.`` alias like
    :func:`canonicalize_urls` does.  Unparseable URLs key to NULL.  Pure
    zero-shuffle projection, expressible identically in ANSI SQL."""
    url = F.col(url_col)
    host = F.lower(F.regexp_extract(url, _HOST_RE, 1))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.lower(
        F.coalesce(
            F.nullif(F.regexp_extract(url, _PATH_RE, 1), F.lit("")),
            F.lit("/"),
        )
    )
    query = F.lower(F.regexp_extract(url, _QUERY_RE, 1))
    sorted_q = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda p: p != "")),
        "&",
    )
    key = F.concat(
        rev_host,
        F.lit(")"),
        path,
        F.when(sorted_q == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), sorted_q)
        ),
    )
    return df.withColumn(out_col, F.when(host != "", key))


def cap_per_domain(
    df: DataFrame,
    url_col: str = "url",
    cap: int = 1000,
    id_col: str = "doc_id",
    suffixes: Sequence[str] = MULTI_LABEL_SUFFIXES,
    prefix: str = "url_",
) -> DataFrame:
    """Keep at most ``cap`` rows per registered domain, chosen by the
    deterministic md5-race order (same discipline as
    :func:`~.cleaning.sample_per_key`): reproducible across engines,
    runs, and partitionings, unbiased w.r.t. storage order.  Adds the
    parsed ``{prefix}*`` columns plus ``domain_rank``.

    One shuffle on the domain.  At crawl scale domains are the canonical
    skew key (one CDN hostname can be 1% of the corpus) — the window
    shuffle is bounded by ``cap`` rows retained per key, and AQE's skew
    split handles the read side; rows beyond the cap are filtered before
    any downstream wide column is carried."""
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    out = (
        df
        if f"{prefix}domain" in df.columns
        else extract_url_parts(df, url_col, suffixes=suffixes, prefix=prefix)
    )
    order = hash60(F.col(id_col).cast("string"))
    w = Window.partitionBy(f"{prefix}domain").orderBy(order, F.col(id_col))
    return (
        out.withColumn("domain_rank", F.row_number().over(w))
        .filter(F.col("domain_rank") <= cap)
    )


def tld_report(
    df: DataFrame,
    url_col: str = "url",
    suffixes: Sequence[str] = MULTI_LABEL_SUFFIXES,
) -> DataFrame:
    """Corpus composition by public suffix: ``(tld, n_rows, share_ppm)``
    — the geography/registry audit run before fixing a corpus mixture
    (a crawl that's 40% ``.ru`` when the target is English-web needs
    rebalancing BEFORE quality filtering hides the skew).

    ``tld`` is the public suffix under the same table
    :func:`extract_url_parts` uses (``co.uk`` counts as one suffix, not
    ``uk``); unparseable URLs land in a ``tld IS NULL`` quarantine row
    so the share column always sums to 1e6.  ``share_ppm`` is exact
    BIGINT div.  One map-side-combined aggregate over ≤ |registry|
    partial rows + a 1-row broadcast total — the corpus never
    shuffles."""
    host = F.lower(F.regexp_extract(F.col(url_col), _HOST_RE, 1))
    dom = F.when(host != "", _registered_domain(host, suffixes))
    # suffix = registered domain minus its first label
    tld = F.nullif(
        F.regexp_extract(dom, r"^[^.]+\.(.+)$", 1), F.lit("")
    )
    counts = (
        df.select(tld.alias("tld"))
        .groupBy("tld")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    # total via a single-partition window over the ≤|registry| count
    # rows — NOT crossJoin(broadcast(counts.agg(...))), which would
    # re-execute the full corpus aggregate a second time
    return (
        counts.withColumn(
            "__total", F.sum("n_rows").over(Window.partitionBy())
        )
        .select(
            "tld",
            "n_rows",
            F.expr("n_rows * 1000000L div __total").alias("share_ppm"),
        )
    )
