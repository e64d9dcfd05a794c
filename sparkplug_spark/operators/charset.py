"""Charset detection + payload decoding: the step between a WARC
``payload`` (raw bytes) and every text operator downstream.  Crawled
pages lie about their encoding constantly; the industry-standard
precedence (WHATWG encoding sniff, simplified) is

1. byte-order mark (UTF-8 / UTF-16LE / UTF-16BE — certain),
2. the transport ``Content-Type: …; charset=…`` header,
3. an in-document ``<meta charset=…>`` / http-equiv declaration,
4. fall back to UTF-8 (the modern-web prior).

:func:`detect_charset` is a pure zero-shuffle codegen projection
(binary prefix compares + two regexes — the meta scan reads a bounded
prefix of the payload, so a 100 MB page doesn't drag a full-body regex
pass), emitting the normalized label AND which tier decided, so
corpus-level encoding audits are one groupBy.  :func:`decode_payload`
applies the verdict with Python's codec registry in one Arrow pass —
the only part that genuinely needs Python (the JVM's ``decode()``
can't take a per-row charset), with undecodable bytes replaced, never
raised.  No counterpart in the reference engine (a rules engine);
behavior follows the public WHATWG sniffing order.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .multimodal import repartition_for_media

__all__ = ["detect_charset", "decode_payload", "CHARSET_ALIASES"]

#: label normalization (lowercased input → canonical) — the handful of
#: aliases that dominate crawled data; unknown labels pass through
#: lowercased so the audit can count them.
CHARSET_ALIASES: dict[str, str] = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "latin1": "iso-8859-1",
    "latin-1": "iso-8859-1",
    "iso8859-1": "iso-8859-1",
    "iso-8859-1": "iso-8859-1",
    "cp1252": "windows-1252",
    "windows-1252": "windows-1252",
    "win-1252": "windows-1252",
    "ascii": "us-ascii",
    "us-ascii": "us-ascii",
    "shift-jis": "shift_jis",
    "shift_jis": "shift_jis",
    "sjis": "shift_jis",
    "gb2312": "gbk",
    "gbk": "gbk",
    "euc-kr": "euc-kr",
    "big5": "big5",
    "koi8-r": "koi8-r",
    "utf-16": "utf-16",
    "utf-16le": "utf-16le",
    "utf-16be": "utf-16be",
}

_CHARSET_TOKEN = r"charset\s*=\s*[\"']?\s*([A-Za-z0-9._-]+)"
_META_RE = r"(?is)<meta\b[^>]{0,256}?" + _CHARSET_TOKEN


def _normalize(label):
    """Fold a raw charset token through :data:`CHARSET_ALIASES` as a
    column expression (lowercase, then a literal CASE chain — tiny)."""
    low = F.lower(label)
    out = low
    for raw in sorted(CHARSET_ALIASES):
        out = F.when(low == raw, F.lit(CHARSET_ALIASES[raw])).otherwise(out)
    return out


def detect_charset(
    df: DataFrame,
    payload_col: str = "payload",
    header_col: str | None = None,
    meta_scan_bytes: int = 4096,
) -> DataFrame:
    """Append ``charset`` (normalized label) and ``charset_source``
    (``'bom'|'header'|'meta'|'default'``) to every row.

    BOMs are matched on the raw binary prefix (UTF-8 ``EF BB BF``,
    UTF-16LE ``FF FE``, UTF-16BE ``FE FF`` — 16LE checked before 16BE
    so ``FF FE`` can't half-match).  The header tier reads
    ``header_col`` (e.g. ``content_type`` from :func:`~..sources.warc.
    read_warc`) when given; the meta tier regex-scans only the first
    ``meta_scan_bytes`` of the payload decoded permissively — encoding
    declarations live in ``<head>``, and bounding the scan keeps the
    regex cost flat regardless of page size."""
    p = F.col(payload_col)
    bom8 = F.substring(p, 1, 3) == F.lit(b"\xef\xbb\xbf")
    bom16le = F.substring(p, 1, 2) == F.lit(b"\xff\xfe")
    bom16be = F.substring(p, 1, 2) == F.lit(b"\xfe\xff")
    head_txt = F.decode(
        F.substring(p, 1, int(meta_scan_bytes)), "ISO-8859-1"
    )
    meta = F.nullif(
        F.regexp_extract(head_txt, _META_RE, 1), F.lit("")
    )
    header = None
    if header_col is not None:
        header = F.nullif(
            F.regexp_extract(
                F.coalesce(F.col(header_col), F.lit("")),
                r"(?i)" + _CHARSET_TOKEN,
                1,
            ),
            F.lit(""),
        )
    charset = F.when(bom8, F.lit("utf-8"))
    charset = charset.when(bom16le, F.lit("utf-16le"))
    charset = charset.when(bom16be, F.lit("utf-16be"))
    source = F.when(bom8 | bom16le | bom16be, F.lit("bom"))
    if header is not None:
        charset = charset.when(header.isNotNull(), _normalize(header))
        source = source.when(header.isNotNull(), F.lit("header"))
    charset = charset.when(meta.isNotNull(), _normalize(meta)).otherwise(
        F.lit("utf-8")
    )
    source = source.when(meta.isNotNull(), F.lit("meta")).otherwise(
        F.lit("default")
    )
    return df.select(
        "*",
        F.when(p.isNotNull(), charset).alias("charset"),
        F.when(p.isNotNull(), source).alias("charset_source"),
    )


def decode_payload(
    df: DataFrame,
    payload_col: str = "payload",
    charset_col: str = "charset",
    out_col: str = "text",
) -> DataFrame:
    """Decode each row's ``payload_col`` with its (detected or stored)
    ``charset_col`` into ``out_col`` — one Arrow pass, BOM stripped,
    malformed byte sequences replaced with U+FFFD (never raised: a
    mojibake page should reach the quality gates, which will drop it,
    not kill a 100 TB scan).  Unknown charset labels fall back to
    UTF-8; NULL payloads decode to NULL."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.StringType())]
    )
    names = [f.name for f in df.schema.fields]

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import codecs

        def dec(payload, label):
            if payload is None:
                return None
            b = bytes(payload)
            cs = (label or "utf-8").lower()
            try:
                codecs.lookup(cs)
            except LookupError:
                cs = "utf-8"
            if b[:3] == b"\xef\xbb\xbf" and cs == "utf-8":
                b = b[3:]
            elif b[:2] in (b"\xff\xfe", b"\xfe\xff") and cs in (
                "utf-16le",
                "utf-16be",
            ):
                # bare "utf-16" consumes its own BOM in Python; the
                # endian-explicit labels would render it as U+FEFF/FFFE
                b = b[2:]
            return b.decode(cs, errors="replace")

        for pdf in it:
            if len(pdf) == 0:
                continue
            out = pdf.copy()
            out[out_col] = [
                dec(p, c)
                for p, c in zip(pdf[payload_col], pdf[charset_col])
            ]
            yield out

    return repartition_for_media(df).mapInPandas(kernel, out_schema)
