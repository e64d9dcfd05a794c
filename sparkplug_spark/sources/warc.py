"""WARC/1.0 source tier: pure-Python Common-Crawl-style ingestion.

Completes the crawl-to-corpus story the extension inventory builds
toward: ``read_warc`` turns an archive of WARC files (plain or gzip,
including the multi-member gzip framing Common Crawl ships — one gzip
member per record, concatenated) into typed rows
``(warc_file, record_id, record_type, target_uri, warc_date,
http_status, content_type, content_length, payload)`` ready for the
HTML main-content / quality / dedup lanes.  The reference has no
sources beyond JSON rules (``SparkPlugHelper.scala:8-12``); this tier
is brief-driven, following the same pure-Python-parser pattern as the
codec family (PNG/JPEG/GIF/FLAC).

Scale shape: WARC archives are *many ~1 GB files* by construction —
Common Crawl publishes ~64k files per snapshot — so FILE-level
parallelism is the natural split, exactly what every production WARC
processor does.  Files land one-per-row via the ``binaryFile`` source
and parse inside an Arrow ``mapInPandas`` kernel (records never
round-trip through the driver); downstream operators see an ordinary
DataFrame with a binary payload column.  A 100 TB snapshot is ~100k
tasks of bounded memory — the per-file working set is one decompressed
record stream.

Format notes (ISO 28500): a record is ``WARC/1.0`` + CRLF-separated
named headers + CRLF + exactly ``Content-Length`` block bytes + CRLF
CRLF.  For ``response`` records the block is an HTTP/1.x message whose
body (after the first blank line) is the page payload.  Parsing is
Content-Length-driven, never delimiter-scanning, so payloads containing
``\\r\\n\\r\\n`` or nested ``WARC/1.0`` text survive byte-exact.
Transfer-encoded bodies are returned as stored (Common Crawl strips
chunking at capture time); decoding is a consumer concern.
"""

from __future__ import annotations

import uuid
import zlib
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "read_warc",
    "read_wet",
    "index_warc_offsets",
    "read_warc_ranges",
    "warcinfo_metadata",
    "parse_warc_records",
    "warc_response_record",
    "warc_conversion_record",
    "warc_record",
    "gzip_member",
    "WARC_SCHEMA",
]

WARC_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType(), False),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("record_type", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("content_length", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

_GZIP_MAGIC = b"\x1f\x8b"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream — Common Crawl
    frames one member per record; members simply concatenate."""
    out = []
    while data:
        d = zlib.decompressobj(wbits=47)  # 32+15: gzip or zlib header
        out.append(d.decompress(data))
        out.append(d.flush())
        data = d.unused_data
        if not d.eof and not d.unused_data:
            raise ValueError("truncated gzip member in WARC stream")
    return b"".join(out)


def _norm_content_type(raw: str | None) -> str | None:
    """``text/html; charset=utf-8`` → ``text/html`` (lower-cased) —
    media-type parameters belong to decoding, not routing."""
    if raw is None:
        return None
    return raw.split(";", 1)[0].strip().lower() or None


def parse_warc_records(
    data: bytes, source: str = "", on_error: str = "raise"
) -> Iterator[dict]:
    """Yield one dict per WARC record in ``data`` (gzip auto-detected).

    ``on_error='raise'`` (default) raises ``ValueError`` with the file
    and byte offset on any malformed record; ``'skip'`` abandons the
    rest of the file from the first malformed record (WARC framing is
    length-prefixed, so a bad Content-Length poisons every later
    offset — records BEFORE the fault are still yielded)."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    if data[:2] == _GZIP_MAGIC:
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate extra blank lines between records
        while pos < n and data[pos : pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        while pos < n and data[pos : pos + 1] == b"\n":
            pos += 1
        if pos >= n:
            return
        try:
            if not data.startswith(b"WARC/", pos):
                raise ValueError("expected WARC/ version line")
            hdr_end = data.find(b"\r\n\r\n", pos)
            sep = 4
            if hdr_end == -1:
                hdr_end = data.find(b"\n\n", pos)
                sep = 2
            if hdr_end == -1:
                raise ValueError("unterminated WARC header block")
            headers: dict[str, str] = {}
            lines = data[pos:hdr_end].decode("utf-8", "replace").splitlines()
            for line in lines[1:]:
                if ":" not in line:
                    continue
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
            if "content-length" not in headers:
                raise ValueError("missing Content-Length header")
            clen = int(headers["content-length"])
            body_start = hdr_end + sep
            if body_start + clen > n:
                raise ValueError(
                    f"record body overruns file (need {clen} bytes)"
                )
            block = data[body_start : body_start + clen]
        except ValueError as exc:
            if on_error == "skip":
                return
            raise ValueError(f"{source} @ byte {pos}: {exc}") from exc
        rtype = headers.get("warc-type")
        rec = {
            "warc_file": source,
            "record_id": headers.get("warc-record-id"),
            "record_type": rtype,
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "http_status": None,
            "content_type": _norm_content_type(headers.get("content-type")),
            "content_length": len(block),
            "payload": block,
        }
        if rtype == "response" and block[:5] == b"HTTP/":
            http_end = block.find(b"\r\n\r\n")
            hsep = 4
            if http_end == -1:
                http_end = block.find(b"\n\n")
                hsep = 2
            if http_end != -1:
                head = block[:http_end].decode("utf-8", "replace")
                hlines = head.splitlines()
                status_parts = hlines[0].split()
                if len(status_parts) >= 2 and status_parts[1].isdigit():
                    rec["http_status"] = int(status_parts[1])
                for line in hlines[1:]:
                    if ":" not in line:
                        continue
                    k, v = line.split(":", 1)
                    if k.strip().lower() == "content-type":
                        rec["content_type"] = _norm_content_type(v)
                        break
                payload = block[http_end + hsep :]
                rec["payload"] = payload
                rec["content_length"] = len(payload)
        yield rec
        pos = body_start + clen
    return


def _read_uri_bytes(uri: str) -> bytes:
    """Read one archive's bytes inside the task. ``binaryFile`` paths are
    URIs (``file:/…``); bare paths also accepted. Non-local schemes would
    need a filesystem client here — route those through
    ``via_binary=True`` instead."""
    if "://" in uri or uri.startswith("file:"):
        from urllib.parse import unquote, urlparse

        parsed = urlparse(uri)
        if parsed.scheme not in ("file", ""):
            raise ValueError(
                f"kernel-side read supports local files only (got "
                f"{parsed.scheme!r}); call read_warc(..., via_binary=True)"
            )
        uri = unquote(parsed.path)
    with open(uri, "rb") as fh:
        return fh.read()


def _auto_via_binary(path: str) -> bool:
    """Lane router for ``via_binary=None``: the kernel-side ``open()``
    only works for local files, so any non-local scheme (s3/hdfs/…)
    must ship bytes through binaryFile's content column instead —
    decided driver-side from the user's path string, before listing."""
    from urllib.parse import urlparse

    return urlparse(path).scheme not in ("", "file")


def read_warc(
    spark: SparkSession,
    path: str,
    on_error: str = "raise",
    record_types: Iterable[str] | None = None,
    via_binary: bool | None = None,
) -> DataFrame:
    """Read WARC file(s) at ``path`` (glob ok; ``.warc`` and
    ``.warc.gz``) into a DataFrame of :data:`WARC_SCHEMA` rows.

    ``record_types`` filters record kinds inside the kernel (e.g.
    ``("response",)`` — Common Crawl files interleave request/response/
    metadata triples, and dropping them before Arrow serialization
    saves 2/3 of the transfer).

    Plan shape for local paths: list paths via ``binaryFile`` with the
    content column PRUNED, repartition the path strings (so a handful
    of fixture files still fan out — at ~64k archives/snapshot the
    shuffle moves only ~64k strings, never bytes), then open each
    archive inside the Arrow kernel.  ``via_binary=True`` instead
    ships bytes through the ``binaryFile`` content column with NO
    repartition (binaryFile already yields >= one partition per large
    file) — works on ANY Hadoop-supported filesystem.  The default
    (``None``) picks automatically: a non-local ``path`` scheme
    (s3/hdfs/…, where the kernel has no filesystem client) routes to
    the bytes lane, anything local to the path lane; pass an explicit
    bool to override."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    if via_binary is None:
        via_binary = _auto_via_binary(path)
    wanted = tuple(record_types) if record_types is not None else None

    def recs_of(data: bytes, source: str) -> list[dict]:
        return [
            r
            for r in parse_warc_records(data, source=source, on_error=on_error)
            if wanted is None or r["record_type"] in wanted
        ]

    if via_binary:
        files = spark.read.format("binaryFile").load(path).select(
            "path", "content"
        )

        def parse_bin(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for _, row in pdf.iterrows():
                    recs = recs_of(bytes(row["content"]), row["path"])
                    if recs:
                        yield pd.DataFrame(recs)

        return files.mapInPandas(parse_bin, WARC_SCHEMA)

    paths = spark.read.format("binaryFile").load(path).select("path")
    paths = paths.repartition(F.col("path"))  # strings only

    def parse_paths(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                recs = recs_of(_read_uri_bytes(p), p)
                if recs:
                    yield pd.DataFrame(recs)

    return paths.mapInPandas(parse_paths, WARC_SCHEMA)


def read_wet(
    spark: SparkSession,
    path: str,
    on_error: str = "raise",
    via_binary: bool | None = None,
) -> DataFrame:
    """Read WET-shape archives (Common Crawl's pre-extracted-text
    companion: ``conversion`` records whose block is the page text) into
    ``(warc_file, record_id, target_uri, warc_date, text)`` rows — the
    lane that skips HTML extraction entirely when the crawl provider
    already ran it.

    Same framing/parallelism as :func:`read_warc` (WET files are WARC
    files); only ``conversion`` records survive, and the payload is
    decoded as UTF-8 text (WET is text by definition; undecodable bytes
    are replaced, never raised, matching every production WET consumer)."""
    recs = read_warc(
        spark,
        path,
        on_error=on_error,
        record_types=("conversion",),
        via_binary=via_binary,
    )
    return recs.select(
        "warc_file",
        "record_id",
        "target_uri",
        "warc_date",
        F.decode(F.col("payload"), "UTF-8").alias("text"),
    )


def warcinfo_metadata(records: DataFrame) -> DataFrame:
    """Explode ``warcinfo`` records (the per-archive provenance header
    every Common Crawl file leads with — software, hostname, format,
    isPartOf…) into ``(warc_file, record_id, key, value)`` rows.

    Takes :func:`read_warc` output (any record mix — non-warcinfo rows
    are filtered here); the block is ``key: value`` lines (the
    ``application/warc-fields`` format), parsed relationally: split
    lines, split on the first colon, trim.  Lines without a colon are
    skipped (continuation folding is not part of the fields Common Crawl
    emits).  Pure projection + explode, zero Python, zero shuffle."""
    lines = records.where(F.col("record_type") == "warcinfo").select(
        "warc_file",
        "record_id",
        F.explode(
            F.split(F.decode(F.col("payload"), "UTF-8"), "\r\n|\n")
        ).alias("__line"),
    )
    return lines.where(F.col("__line").contains(":")).select(
        "warc_file",
        "record_id",
        F.trim(F.substring_index("__line", ":", 1)).alias("key"),
        F.trim(
            F.expr("substring(__line, instr(__line, ':') + 1)")
        ).alias("value"),
    )


# --- writer helpers (fixtures, tests, round-trip oracles) ---------------


def warc_record(
    record_type: str,
    block: bytes,
    target_uri: str | None = None,
    warc_date: str = "2026-01-01T00:00:00Z",
    record_id: str | None = None,
    content_type: str | None = None,
) -> bytes:
    """Serialize one WARC/1.0 record (CRLF framing, exact
    Content-Length)."""
    rid = record_id or f"<urn:uuid:{uuid.uuid4()}>"
    lines = [
        b"WARC/1.0",
        b"WARC-Type: " + record_type.encode(),
        b"WARC-Record-ID: " + rid.encode(),
        b"WARC-Date: " + warc_date.encode(),
    ]
    if target_uri is not None:
        lines.append(b"WARC-Target-URI: " + target_uri.encode())
    if content_type is not None:
        lines.append(b"Content-Type: " + content_type.encode())
    lines.append(b"Content-Length: " + str(len(block)).encode())
    return b"\r\n".join(lines) + b"\r\n\r\n" + block + b"\r\n\r\n"


def warc_response_record(
    target_uri: str,
    payload: bytes,
    status: int = 200,
    content_type: str = "text/html",
    warc_date: str = "2026-01-01T00:00:00Z",
    record_id: str | None = None,
    http_headers: Iterable[tuple[str, str]] = (),
) -> bytes:
    """Serialize a ``response`` record wrapping an HTTP/1.1 message."""
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(
        status, "Status"
    )
    head = [f"HTTP/1.1 {status} {reason}", f"Content-Type: {content_type}"]
    head += [f"{k}: {v}" for k, v in http_headers]
    head.append(f"Content-Length: {len(payload)}")
    block = ("\r\n".join(head) + "\r\n\r\n").encode() + payload
    return warc_record(
        "response",
        block,
        target_uri=target_uri,
        warc_date=warc_date,
        record_id=record_id,
        content_type="application/http; msgtype=response",
    )


def warc_conversion_record(
    target_uri: str,
    text: bytes,
    warc_date: str = "2026-01-01T00:00:00Z",
    record_id: str | None = None,
) -> bytes:
    """Serialize a WET-shape ``conversion`` record (the block IS the
    extracted text, ``Content-Type: text/plain``)."""
    return warc_record(
        "conversion",
        text,
        target_uri=target_uri,
        warc_date=warc_date,
        record_id=record_id,
        content_type="text/plain",
    )


def gzip_member(data: bytes) -> bytes:
    """Compress ``data`` as ONE gzip member (mtime pinned to 0 so fixture
    bytes are deterministic); concatenate members for the Common Crawl
    per-record framing."""
    co = zlib.compressobj(9, zlib.DEFLATED, 31)
    return co.compress(data) + co.flush()


def _member_spans(data) -> Iterator[tuple[int, int, bytes]]:
    """Walk a multi-member gzip buffer yielding ``(offset, compressed
    length, decompressed bytes)`` per member — the byte spans a CDX
    index records.  Zero-copy slicing via memoryview (a 1 GB archive
    walks in O(n), not O(n²))."""
    mv = memoryview(data)
    pos = 0
    while pos < len(mv):
        d = zlib.decompressobj(wbits=47)
        chunk = d.decompress(mv[pos:]) + d.flush()
        if not d.eof:
            raise ValueError(f"truncated gzip member at offset {pos}")
        consumed = (len(mv) - pos) - len(d.unused_data)
        yield pos, consumed, chunk
        pos += consumed


def index_warc_offsets(
    spark: SparkSession,
    path: str,
    on_error: str = "raise",
) -> DataFrame:
    """Build a byte-range index over gzip-framed WARC archives — the
    CDX-builder side of :func:`~.cdx.read_cdx`: one row per gzip member
    ``(warc_file, member_offset, member_length, record_id, record_type,
    target_uri, warc_date, http_status, content_type,
    content_length)``, i.e. everything a capture index needs EXCEPT the
    payload, at ~100 B/record instead of shipping page bytes.
    Feed selected rows to :func:`read_warc_ranges` to fetch only the
    matching members — the scan-the-index-not-the-archives access
    pattern that makes a 100 TB snapshot queryable.

    Requires the one-member-per-record gzip framing Common Crawl ships
    (a plain ``.warc`` has no member boundaries to index; range access
    there needs record-offset bookkeeping at WRITE time).  Same path
    parallelism as :func:`read_warc`'s default lane: only path strings
    shuffle, each task walks its archive once."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    paths = spark.read.format("binaryFile").load(path).select("path")
    paths = paths.repartition(F.col("path"))  # strings only

    def index_one(uri: str) -> list[dict]:
        data = _read_uri_bytes(uri)
        if data[:2] != _GZIP_MAGIC:
            raise ValueError(
                f"{uri}: not gzip-framed; member indexing needs the "
                "one-member-per-record framing"
            )
        out = []
        for off, clen, chunk in _member_spans(data):
            recs = list(
                parse_warc_records(chunk, source=uri, on_error=on_error)
            )
            for r in recs:
                out.append(
                    {
                        "warc_file": uri,
                        "member_offset": off,
                        "member_length": clen,
                        "record_id": r["record_id"],
                        "record_type": r["record_type"],
                        "target_uri": r["target_uri"],
                        "warc_date": r["warc_date"],
                        "http_status": r["http_status"],
                        "content_type": r["content_type"],
                        "content_length": r["content_length"],
                    }
                )
        return out

    schema = T.StructType(
        [
            T.StructField("warc_file", T.StringType()),
            T.StructField("member_offset", T.LongType()),
            T.StructField("member_length", T.LongType()),
            T.StructField("record_id", T.StringType()),
            T.StructField("record_type", T.StringType()),
            T.StructField("target_uri", T.StringType()),
            T.StructField("warc_date", T.StringType()),
            T.StructField("http_status", T.IntegerType()),
            T.StructField("content_type", T.StringType()),
            T.StructField("content_length", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                try:
                    rows = index_one(p)
                except Exception:
                    if on_error == "raise":
                        raise
                    continue
                if rows:
                    yield pd.DataFrame(rows)

    return paths.mapInPandas(kernel, schema)


def read_warc_ranges(
    spark: SparkSession,
    ranges: DataFrame,
    file_col: str = "warc_file",
    offset_col: str = "member_offset",
    length_col: str = "member_length",
    on_error: str = "raise",
) -> DataFrame:
    """Fetch ONLY the byte ranges in ``ranges`` (``(file, offset,
    length)`` rows — an :func:`index_warc_offsets` / CDX selection) and
    parse them into :data:`WARC_SCHEMA` rows.

    This is the production Common-Crawl access pattern: filter the
    ~100 GB index relationally, then read the few matching gzip members
    with seeks instead of streaming ~100 TB of archives.  I/O is
    exactly Σ selected ``member_length`` bytes.  The kernel sorts each
    Arrow batch by file and reuses one open handle per file, so a
    thousand ranges into one archive cost one open + ordered seeks.
    Local filesystems only (kernel-side ``open``): on object stores,
    serve ranges through your fetch layer or fall back to
    :func:`read_warc` ``via_binary=True`` full-file reads."""
    if on_error not in ("raise", "skip"):
        raise ValueError("on_error must be 'raise' or 'skip'")
    from ..partitioning import spread

    sel = spread(
        ranges.select(
            F.col(file_col).alias("__f"),
            F.col(offset_col).cast("long").alias("__o"),
            F.col(length_col).cast("long").alias("__l"),
        )
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["__f", "__o"])
            cur_path, fh = None, None
            try:
                for f, o, ln in zip(pdf["__f"], pdf["__o"], pdf["__l"]):
                    if f != cur_path:
                        if fh is not None:
                            fh.close()
                        local = f
                        if "://" in local or local.startswith("file:"):
                            from urllib.parse import unquote, urlparse

                            parsed = urlparse(local)
                            if parsed.scheme not in ("file", ""):
                                raise ValueError(
                                    "range reads are local-only (got "
                                    f"{parsed.scheme!r})"
                                )
                            local = unquote(parsed.path)
                        fh = open(local, "rb")
                        cur_path = f
                    fh.seek(int(o))
                    blob = fh.read(int(ln))
                    try:
                        if blob[:2] == _GZIP_MAGIC:
                            blob = _gunzip_members(blob)
                        recs = list(
                            parse_warc_records(
                                blob, source=f, on_error=on_error
                            )
                        )
                    except Exception:
                        if on_error == "raise":
                            raise
                        continue
                    if recs:
                        yield pd.DataFrame(recs)
            finally:
                if fh is not None:
                    fh.close()

    return sel.mapInPandas(kernel, WARC_SCHEMA)
