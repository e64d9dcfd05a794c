"""CDX(J) crawl-index source: the lookup sidecar every Common-Crawl
snapshot ships next to its WARC files (one line per capture:
``<urlkey> <timestamp> <json>``) and the cheapest way to SELECT what to
fetch — filter captures by mime/status/language/digest over the ~300 GB
index instead of scanning ~100 TB of archives, then read only the
matching (filename, offset, length) byte ranges.

Parsing is pure relational string work over ``spark.read.text`` lines —
one regexp splits the three fields, ``get_json_object`` pulls the
typed attributes — so the whole ingest is a zero-UDF codegen'd
projection with file-level parallelism (the index is itself sharded
into ~300 gzip files per snapshot, which Spark's text source splits
and distributes natively; gzip members stay one-task-per-file, the
same parallelism contract as :mod:`.warc`).

No counterpart in the reference engine (indix/sparkplug is a rules
engine); the CDXJ line format follows the public pywb/Common Crawl
index spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["CDX_SCHEMA", "read_cdx", "cdxj_line"]

CDX_SCHEMA = T.StructType(
    [
        T.StructField("urlkey", T.StringType()),
        T.StructField("capture_ts", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("status", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("warc_filename", T.StringType()),
        T.StructField("warc_offset", T.LongType()),
        T.StructField("warc_length", T.LongType()),
        T.StructField("languages", T.StringType()),
    ]
)

_LINE_RE = r"^(\S+)\s+(\d{14})\s+(\{.*\})\s*$"


def read_cdx(
    spark: SparkSession,
    path: str,
    on_error: str = "skip",
) -> DataFrame:
    """Read CDXJ index lines at ``path`` (glob ok, ``.gz`` ok — the text
    source inflates gzip transparently) into :data:`CDX_SCHEMA` rows.

    Malformed lines (no 14-digit timestamp, or a JSON payload without a
    ``url``) are dropped when ``on_error='skip'`` (the index-scan
    default: one corrupt line must not kill a 300-file scan) or kept as
    all-NULL-except-``urlkey`` rows with ``on_error='keep'`` for
    quarantine counting.  Numeric attributes (``status``, ``offset``,
    ``length``) arrive as JSON strings per the CDXJ spec and are cast
    to BIGINT here; a non-numeric value becomes NULL, never an error."""
    if on_error not in ("skip", "keep"):
        raise ValueError("on_error must be 'skip' or 'keep'")
    lines = spark.read.text(path)
    j = F.regexp_extract("value", _LINE_RE, 3)
    ts = F.nullif(F.regexp_extract("value", _LINE_RE, 2), F.lit(""))
    fields = {
        "capture_ts": ts,
        "url": F.get_json_object(j, "$.url"),
        "mime": F.get_json_object(j, "$.mime"),
        "status": F.get_json_object(j, "$.status").cast("long"),
        "digest": F.get_json_object(j, "$.digest"),
        "warc_filename": F.get_json_object(j, "$.filename"),
        "warc_offset": F.get_json_object(j, "$.offset").cast("long"),
        "warc_length": F.get_json_object(j, "$.length").cast("long"),
        "languages": F.get_json_object(j, "$.languages"),
    }
    bad = fields["capture_ts"].isNull() | fields["url"].isNull()
    if on_error == "skip":
        urlkey = F.regexp_extract("value", _LINE_RE, 1)
    else:
        # keep: blank every parsed field on malformed rows so quarantine
        # is one IS NULL filter, preserving the raw first token for triage
        urlkey = F.regexp_extract("value", r"^(\S+)", 1)
        fields = {k: F.when(~bad, c) for k, c in fields.items()}
    out = lines.select(
        F.nullif(urlkey, F.lit("")).alias("urlkey"),
        *[c.alias(k) for k, c in fields.items()],
    )
    if on_error == "skip":
        return out.where(
            F.col("capture_ts").isNotNull() & F.col("url").isNotNull()
        )
    return out


def cdxj_line(
    urlkey,
    capture_ts,
    url,
    mime,
    status,
    digest,
    filename,
    offset,
    length,
):
    """Column expression building one spec-shaped CDXJ line from column
    parts — the fixture/round-trip writer twin of :func:`read_cdx`
    (numbers serialized as JSON strings, matching the pywb format)."""
    q = lambda c: F.concat(F.lit('"'), c, F.lit('"'))  # noqa: E731
    return F.concat(
        urlkey,
        F.lit(" "),
        capture_ts,
        F.lit(' {"url": '),
        q(url),
        F.lit(', "mime": '),
        q(mime),
        F.lit(', "status": '),
        q(status.cast("string")),
        F.lit(', "digest": '),
        q(digest),
        F.lit(', "length": '),
        q(length.cast("string")),
        F.lit(', "offset": '),
        q(offset.cast("string")),
        F.lit(', "filename": '),
        q(filename),
        F.lit("}"),
    )
