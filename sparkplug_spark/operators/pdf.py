"""Library-free PDF text extraction (the E122/E125/E126 codec-lane
precedent applied to documents): a sequential object walker + FlateDecode
(stdlib zlib) + a BT/ET text-operator interpreter, run as one Arrow pass
over byte-sized partitions — the next-largest real corpus slice after
HTML.  No reference counterpart (the reference is a 387-LoC rule engine,
``SparkPlug.scala:1-159``); semantics follow the public PDF 1.7 spec
(ISO 32000-1 §7.3 objects, §7.4.4 FlateDecode, §9.4 text objects).

Scale notes: parsing is a narrow per-row ``mapInPandas`` projection —
no shuffle; partitions are sized by payload BYTES via
``repartition_for_media`` so a shard of scanned books cannot OOM an
executor that got 200 of them in one parquet row group.  Malformed
documents quarantine to NULL (never raise): at 100 TB a single corrupt
byte range must not kill a stage.

Boundaries (documented, contract-tested): FlateDecode and uncompressed
streams only (no LZW/DCT/CCITT), no encryption, no xref streams
(PDF 1.5 compressed object streams) — the walker scans objects
sequentially, which also survives the broken-xref files real crawls
contain; text extraction concatenates show-string operators with
Td/TD/T*/Tm/'/" treated as line breaks, with no font/CMap decoding
(standard-encoding latin text — the fixture/oracle tier — round-trips
exactly; exotic CMaps degrade to the raw string bytes).
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "pdf_text",
    "parse_pdf_text",
    "build_pdf",
    "pdf_images",
    "parse_pdf_images",
]


_HDR_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)\b")
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode\b")
_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R\b")
_PAGES_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R\b")
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:[^\[\]]|\[[^\]]*\])*)\]")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R\b")
_TYPE_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_TYPE_PAGES_RE = re.compile(rb"/Type\s*/Pages\b")
_CONTENTS_RE = re.compile(
    rb"/Contents\s*(?:(\d+)\s+\d+\s+R|\[((?:[^\[\]])*)\])"
)


def _walk_objects(buf: bytes) -> dict[int, tuple[bytes, bytes | None]]:
    """Sequential object scan: ``{obj_num: (dict_bytes, stream_bytes)}``.

    The scanner JUMPS past each stream body (located via /Length when it
    is a direct integer, else the next ``endstream``), so binary stream
    content containing ``obj`` can never desynchronize the walk — and a
    file whose xref table is wrong (ubiquitous in crawled PDFs) still
    parses, because the xref is never consulted."""
    out: dict[int, tuple[bytes, bytes | None]] = {}
    pos = 0
    while True:
        m = _HDR_RE.search(buf, pos)
        if m is None:
            break
        start = m.end()
        stream_kw = buf.find(b"stream", start)
        endobj = buf.find(b"endobj", start)
        if endobj == -1:
            endobj = len(buf)
        if stream_kw != -1 and stream_kw < endobj:
            head = buf[start:stream_kw]
            # stream data begins after the keyword's EOL (spec: CRLF or LF)
            data_start = stream_kw + len(b"stream")
            if buf[data_start : data_start + 2] == b"\r\n":
                data_start += 2
            elif buf[data_start : data_start + 1] == b"\n":
                data_start += 1
            lm = _LENGTH_RE.search(head)
            if lm is not None:
                data_end = data_start + int(lm.group(1))
                if buf.find(b"endstream", data_end) == -1:
                    # declared length is a lie; fall back to the keyword
                    data_end = buf.find(b"endstream", data_start)
            else:
                data_end = buf.find(b"endstream", data_start)
            if data_end == -1:
                break
            out[int(m.group(1))] = (head, buf[data_start:data_end])
            pos = buf.find(b"endobj", data_end)
            pos = data_end if pos == -1 else pos + len(b"endobj")
        else:
            out[int(m.group(1))] = (buf[start:endobj], None)
            pos = endobj + len(b"endobj")
    return out


def _page_order(buf: bytes, objs: dict[int, tuple[bytes, bytes | None]]) -> list[int]:
    """Page object numbers in document order: trailer /Root → catalog
    /Pages → recursive /Kids walk; falls back to file order of
    /Type /Page objects when the tree is unresolvable."""
    rm = _ROOT_RE.search(buf)
    if rm is not None and int(rm.group(1)) in objs:
        pm = _PAGES_RE.search(objs[int(rm.group(1))][0])
        if pm is not None:
            pages: list[int] = []
            seen: set[int] = set()

            def walk(n: int) -> None:
                if n in seen or n not in objs:
                    return
                seen.add(n)
                head = objs[n][0]
                if _TYPE_PAGES_RE.search(head):
                    km = _KIDS_RE.search(head)
                    if km is not None:
                        for r in _REF_RE.finditer(km.group(1)):
                            walk(int(r.group(1)))
                elif _TYPE_PAGE_RE.search(head):
                    pages.append(n)

            walk(int(pm.group(1)))
            if pages:
                return pages
    # fallback: file order
    return [n for n, (head, _) in objs.items() if _TYPE_PAGE_RE.search(head)]


_OCTAL = b"01234567"
_ESC_MAP = {
    ord("n"): b"\n",
    ord("r"): b"\r",
    ord("t"): b"\t",
    ord("b"): b"\b",
    ord("f"): b"\f",
    ord("("): b"(",
    ord(")"): b")",
    ord("\\"): b"\\",
}


def _extract_lines(data: bytes) -> list[str]:
    """Interpret the text operators of ONE content stream: show-strings
    (Tj / ' / \" / TJ) append to the current line; Td/TD/T*/Tm and the
    '/\" EOL side effect flush it.  Empty lines are dropped (our
    line-break rule is positional-op based, not baseline math)."""
    lines: list[str] = []
    cur: list[bytes] = []

    def flush() -> None:
        if cur:
            s = b"".join(cur)
            if s:
                lines.append(s.decode("latin-1"))
            cur.clear()

    i, n = 0, len(data)
    pending: bytes | None = None  # most recent string operand
    while i < n:
        c = data[i : i + 1]
        if c == b"(":
            # literal string: escapes + balanced unescaped parens
            i += 1
            depth = 1
            out = bytearray()
            while i < n and depth > 0:
                b = data[i]
                if b == 0x5C:  # backslash
                    i += 1
                    if i >= n:
                        break
                    e = data[i]
                    if e in _OCTAL:
                        o = bytearray([e])
                        i += 1
                        while i < n and len(o) < 3 and data[i] in _OCTAL:
                            o.append(data[i])
                            i += 1
                        out.append(int(o.decode(), 8) & 0xFF)
                        continue
                    if e == 0x0A:  # line continuation
                        i += 1
                        continue
                    if e == 0x0D:
                        i += 1
                        if i < n and data[i] == 0x0A:
                            i += 1
                        continue
                    out += _ESC_MAP.get(e, bytes([e]))
                    i += 1
                    continue
                if b == 0x28:
                    depth += 1
                elif b == 0x29:
                    depth -= 1
                    if depth == 0:
                        i += 1
                        break
                out.append(b)
                i += 1
            pending = bytes(out)
            continue
        if c == b"<" and data[i : i + 2] != b"<<":
            j = data.find(b">", i + 1)
            if j == -1:
                break
            hx = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : j])
            if len(hx) % 2:
                hx += b"0"
            pending = bytes.fromhex(hx.decode())
            i = j + 1
            continue
        if c == b"[":
            # TJ array: collect the strings, ignore kerning numbers
            j = i + 1
            parts: list[bytes] = []
            while j < n and data[j : j + 1] != b"]":
                if data[j : j + 1] == b"(":
                    # reuse the literal-string scanner via recursion on a
                    # slice: find the balanced close accounting escapes
                    depth = 1
                    k = j + 1
                    out = bytearray()
                    while k < n and depth > 0:
                        b = data[k]
                        if b == 0x5C and k + 1 < n:
                            e = data[k + 1]
                            if e in _OCTAL:
                                o = bytearray([e])
                                k += 2
                                while (
                                    k < n and len(o) < 3 and data[k] in _OCTAL
                                ):
                                    o.append(data[k])
                                    k += 1
                                out.append(int(o.decode(), 8) & 0xFF)
                                continue
                            out += _ESC_MAP.get(e, bytes([e]))
                            k += 2
                            continue
                        if b == 0x28:
                            depth += 1
                        elif b == 0x29:
                            depth -= 1
                            if depth == 0:
                                k += 1
                                break
                        out.append(b)
                        k += 1
                    parts.append(bytes(out))
                    j = k
                    continue
                if data[j : j + 1] == b"<":
                    e2 = data.find(b">", j + 1)
                    if e2 == -1:
                        break
                    hx = re.sub(rb"[^0-9A-Fa-f]", b"", data[j + 1 : e2])
                    if len(hx) % 2:
                        hx += b"0"
                    parts.append(bytes.fromhex(hx.decode()))
                    j = e2 + 1
                    continue
                j += 1
            pending = b"".join(parts)
            i = j + 1
            continue
        if c.isalpha() or c in (b"'", b'"', b"*"):
            # operator token
            j = i
            while j < n and (data[j : j + 1].isalpha() or data[j : j + 1] in (b"'", b'"', b"*")):
                j += 1
            op = data[i:j]
            if op == b"Tj" and pending is not None:
                cur.append(pending)
                pending = None
            elif op == b"TJ" and pending is not None:
                cur.append(pending)
                pending = None
            elif op in (b"'", b'"') and pending is not None:
                flush()
                cur.append(pending)
                pending = None
            elif op in (b"Td", b"TD", b"Tm") or op == b"T*":
                flush()
            i = j
            continue
        i += 1
    flush()
    return lines


def parse_pdf_text(buf: bytes) -> tuple[int | None, str | None]:
    """``(n_pages, text)`` of one PDF, or ``(None, None)`` for malformed
    input — never raises.  Pages' lines join with newline; pages join
    with newline."""
    try:
        if not buf.startswith(b"%PDF"):
            return None, None
        objs = _walk_objects(buf)
        pages = _page_order(buf, objs)
        if not pages:
            return None, None
        page_texts: list[str] = []
        for pn in pages:
            head, _ = objs[pn]
            cm = _CONTENTS_RE.search(head)
            if cm is None:
                page_texts.append("")
                continue
            refs = (
                [int(cm.group(1))]
                if cm.group(1) is not None
                else [int(r.group(1)) for r in _REF_RE.finditer(cm.group(2))]
            )
            lines: list[str] = []
            for ref in refs:
                if ref not in objs:
                    continue
                chead, cdata = objs[ref]
                if cdata is None:
                    continue
                if _FLATE_RE.search(chead):
                    cdata = zlib.decompress(cdata)
                elif b"/Filter" in chead:
                    # unsupported filter (LZW/DCT/CCITT/...): skip the
                    # stream rather than interpret compressed bytes as
                    # text operators — documented boundary
                    continue
                lines.extend(_extract_lines(cdata))
            page_texts.append("\n".join(lines))
        return len(pages), "\n".join(page_texts)
    except Exception:
        return None, None


def pdf_text(
    df: DataFrame,
    pdf_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document PDF text: ``(id_col, n_pages, text)`` — both NULL for
    malformed/unparseable files (quarantine, never raise).  One Arrow
    pass over byte-sized partitions; compose with the text-quality /
    dedup tiers exactly like the HTML lane's ``main_content``."""
    from .multimodal import repartition_for_media

    id_type = df.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("n_pages", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            ids, np_, tx = [], [], []
            for _, row in pdf.iterrows():
                p = row.iloc[1]
                n, t = parse_pdf_text(bytes(p) if p is not None else b"")
                ids.append(row.iloc[0])
                np_.append(n)
                tx.append(t)
            out = pd.DataFrame({"id": ids, "n_pages": np_, "text": tx})
            out["n_pages"] = out["n_pages"].astype("Int64")
            yield out

    return (
        repartition_for_media(df.select(F.col(id_col), F.col(pdf_col)))
        .mapInPandas(batches, schema=schema)
        .withColumnRenamed("id", id_col)
    )


_SUBTYPE_IMAGE_RE = re.compile(rb"/Subtype\s*/Image\b")
_WIDTH_RE = re.compile(rb"/Width\s+(\d+)\b")
_HEIGHT_RE = re.compile(rb"/Height\s+(\d+)\b")
_DCT_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/DCTDecode\b")


def parse_pdf_images(
    buf: bytes,
) -> list[tuple[int, int | None, int | None, str, bytes | None]]:
    """Embedded image XObjects of one PDF as
    ``(image_idx, width, height, codec, payload)`` — never raises.

    ``codec`` is ``jpeg`` for /DCTDecode (payload = the raw JFIF bytes,
    exactly as stored — PDF embeds whole JPEG files, so they feed the
    E122 baseline decoder / dHash lane directly), ``raw`` for
    /FlateDecode or unfiltered sample streams (payload = the inflated
    sample bytes), and ``unsupported`` (NULL payload) for other filters
    (JPXDecode/CCITT...).  ``image_idx`` orders by object number —
    deterministic under any partitioning.  Malformed files yield no
    rows (document-level quarantine is :func:`parse_pdf_text`'s job)."""
    try:
        if not buf.startswith(b"%PDF"):
            return []
        objs = _walk_objects(buf)
        out = []
        idx = 0
        for num in sorted(objs):
            head, data = objs[num]
            if data is None or not _SUBTYPE_IMAGE_RE.search(head):
                continue
            wm = _WIDTH_RE.search(head)
            hm = _HEIGHT_RE.search(head)
            w = int(wm.group(1)) if wm else None
            h = int(hm.group(1)) if hm else None
            if _DCT_RE.search(head):
                out.append((idx, w, h, "jpeg", data))
            elif _FLATE_RE.search(head):
                try:
                    out.append((idx, w, h, "raw", zlib.decompress(data)))
                except Exception:
                    out.append((idx, w, h, "unsupported", None))
            elif b"/Filter" in head:
                out.append((idx, w, h, "unsupported", None))
            else:
                out.append((idx, w, h, "raw", data))
            idx += 1
        return out
    except Exception:
        return []


def pdf_images(
    df: DataFrame,
    pdf_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Embedded images of every PDF: ``(id_col, image_idx, width,
    height, codec, image)`` rows — the bridge from the document lane
    into the multimodal lane (``jpeg`` payloads go straight to the E122
    decoder → E177 dHash → E178 near-dup pairs; figure/chart corpora
    and PDF image-text pairs start here).  One Arrow pass over
    byte-sized partitions; malformed documents contribute no rows."""
    from .multimodal import repartition_for_media

    id_type = df.schema[id_col].dataType
    schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("image_idx", T.LongType()),
            T.StructField("width", T.LongType()),
            T.StructField("height", T.LongType()),
            T.StructField("codec", T.StringType()),
            T.StructField("image", T.BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            recs = []
            for _, row in pdf.iterrows():
                p = row.iloc[1]
                for idx, w, h, codec, payload in parse_pdf_images(
                    bytes(p) if p is not None else b""
                ):
                    recs.append((row.iloc[0], idx, w, h, codec, payload))
            out = pd.DataFrame(
                recs,
                columns=["id", "image_idx", "width", "height", "codec", "image"],
            )
            out["image_idx"] = out["image_idx"].astype("Int64")
            out["width"] = out["width"].astype("Int64")
            out["height"] = out["height"].astype("Int64")
            yield out

    return (
        repartition_for_media(df.select(F.col(id_col), F.col(pdf_col)))
        .mapInPandas(batches, schema=schema)
        .withColumnRenamed("id", id_col)
    )


# --- writer helper (fixtures, tests, arithmetic oracles) -----------------


def _esc_literal(s: bytes) -> bytes:
    return (
        s.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def build_pdf(
    pages: list[list[tuple[str, str]]],
    compress: bool = True,
    images: list[tuple[str, int, int, bytes]] | None = None,
) -> bytes:
    """Serialize a minimal valid PDF: one content stream per page, each
    line a ``(mode, text)`` pair with mode ``lit`` (escaped literal +
    Tj), ``hex`` (hex string + Tj) or ``tj`` (two-part TJ array with a
    kerning number between) — deterministic bytes for fixtures and
    round-trip oracles (the EXIF ``build_exif_jpeg`` pattern).

    ``images`` appends image XObjects ``(mode, width, height, payload)``
    with mode ``jpeg`` (/DCTDecode, payload stored verbatim), ``raw``
    (/FlateDecode over the samples) or ``rawplain`` (no filter).  They
    are standalone objects (not drawn by any page's content stream) —
    the extractor is object-driven, which matches how it must behave on
    real files whose draw operators it does not rasterize."""
    objs: list[bytes] = []  # bodies, 1-indexed
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )  # 2
    for i, lines in enumerate(pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /Contents {content_num} 0 R "
                f"/MediaBox [0 0 612 792] /Resources << /Font << /F1 "
                f"{font_num} 0 R >> >> >>"
            ).encode()
        )
        ops = [b"BT", b"/F1 12 Tf", b"72 720 Td"]
        for j, (mode, text) in enumerate(lines):
            if j > 0:
                ops.append(b"0 -14 TD")
            raw = text.encode("latin-1")
            if mode == "hex":
                ops.append(b"<" + raw.hex().encode() + b"> Tj")
            elif mode == "tj":
                a, b = raw[:7], raw[7:]
                ops.append(
                    b"[(" + _esc_literal(a) + b") -250 ("
                    + _esc_literal(b) + b")] TJ"
                )
            else:
                ops.append(b"(" + _esc_literal(raw) + b") Tj")
        ops.append(b"ET")
        data = b"\n".join(ops)
        if compress:
            data = zlib.compress(data, 6)
            head = (
                f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
            )
        else:
            head = f"<< /Length {len(data)} >>".encode()
        objs.append(head + b"\nstream\n" + data + b"\nendstream")
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for mode, w, h, payload in images or []:
        if mode == "jpeg":
            data, filt = payload, " /Filter /DCTDecode"
        elif mode == "raw":
            data, filt = zlib.compress(payload, 6), " /Filter /FlateDecode"
        else:
            data, filt = payload, ""
        head = (
            f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/ColorSpace /DeviceRGB /BitsPerComponent 8"
            f"{filt} /Length {len(data)} >>"
        ).encode()
        objs.append(head + b"\nstream\n" + data + b"\nendstream")

    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(buf))
        buf += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += f"xref\n0 {len(objs) + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(buf)
