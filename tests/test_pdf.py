"""PDF text-extraction lane: writer/parser round trip, string-escape and
page-tree semantics, documented filter boundaries, NULL quarantine, and
the Spark operator contract."""

import zlib

import pytest
from pyspark.sql import functions as F

from sparkplug_spark.operators.pdf import (
    _extract_lines,
    build_pdf,
    parse_pdf_images,
    parse_pdf_text,
    pdf_images,
    pdf_text,
)


class TestRoundTrip:
    PAGES = [
        [("lit", "hello (world) \\ test"), ("tj", "doc 4 page 1 of 2")],
        [("hex", "second page line"), ("lit", "tail")],
    ]
    WANT = "hello (world) \\ test\ndoc 4 page 1 of 2\nsecond page line\ntail"

    @pytest.mark.parametrize("compress", [True, False])
    def test_round_trip(self, compress):
        n, t = parse_pdf_text(build_pdf(self.PAGES, compress=compress))
        assert n == 2
        assert t == self.WANT

    def test_single_page_short_tj(self):
        # TJ split point beyond the string length → empty second part
        n, t = parse_pdf_text(build_pdf([[("tj", "abc")]]))
        assert (n, t) == (1, "abc")

    def test_empty_page(self):
        n, t = parse_pdf_text(build_pdf([[("lit", "a")], []]))
        assert (n, t) == (2, "a\n")


class TestContentStreamOps:
    def test_octal_and_named_escapes(self):
        assert _extract_lines(rb"BT (A\101\012B\tC) Tj ET") == ["AA\nB\tC"]

    def test_nested_balanced_parens(self):
        assert _extract_lines(b"BT (a (nested (deep)) b) Tj ET") == [
            "a (nested (deep)) b"
        ]

    def test_hex_odd_length_pads_zero(self):
        # '4' pads to 0x40 = '@'
        assert _extract_lines(b"BT <48 65 6C 6C 6F 4> Tj ET") == ["Hello@"]

    def test_tj_array_ignores_kerning(self):
        assert _extract_lines(b"BT [(Hel) -250 (lo) 120 (!)] TJ ET") == [
            "Hello!"
        ]

    def test_quote_ops_break_lines(self):
        assert _extract_lines(b"BT (a) Tj (b) ' (c) \" ET") == ["a", "b", "c"]

    def test_td_tstar_tm_break_lines(self):
        data = b"BT (a) Tj 0 -14 Td (b) Tj T* (c) Tj 1 0 0 1 72 700 Tm (d) Tj ET"
        assert _extract_lines(data) == ["a", "b", "c", "d"]

    def test_inline_dict_does_not_eat_text(self):
        # << >> (BDC property lists) must not be read as hex strings
        assert _extract_lines(b"/P << /MCID 0 >> BDC BT (x) Tj ET EMC") == [
            "x"
        ]


class TestQuarantine:
    @pytest.mark.parametrize(
        "buf",
        [
            b"",
            b"not a pdf",
            b"%PDF-1.4\ngarbage",  # header but no objects
            b"%PDF-1.4\n1 0 obj << /Type /Catalog >> endobj",  # no pages
        ],
    )
    def test_malformed_is_null(self, buf):
        assert parse_pdf_text(buf) == (None, None)

    def test_unsupported_filter_skips_stream(self):
        buf = build_pdf([[("lit", "keep")]], compress=False)
        # graft a second bogus-filter content stream onto the page object
        bogus = (
            b"9 0 obj\n<< /Length 5 /Filter /LZWDecode >>\n"
            b"stream\n\x80\x81\x82\x83\x84\nendstream\nendobj\n"
        )
        patched = buf.replace(
            b"/Contents 4 0 R", b"/Contents [4 0 R 9 0 R]"
        ) + bogus
        assert parse_pdf_text(patched) == (1, "keep")

    def test_lying_length_falls_back_to_endstream(self):
        buf = build_pdf([[("lit", "ok")]], compress=False)
        # corrupt the declared /Length upward; keyword search must recover
        assert b"/Length " in buf
        n, t = parse_pdf_text(
            buf.replace(b"/Length ", b"/Length 9", 1)
            if b"/Length 9" not in buf
            else buf
        )
        # parse may degrade but must not raise; the unpatched file parses
        assert parse_pdf_text(buf) == (1, "ok")
        assert n is None or isinstance(t, (str, type(None)))


class TestPageTree:
    def test_nested_pages_nodes(self):
        # hand-build: catalog -> Pages(Kids=[Pages(Kids=[p1]), p2])
        objs = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>",
            b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 3 0 R /Contents 6 0 R >>",
            b"<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>",
            b"<< /Length 14 >>\nstream\nBT (one) Tj ET\nendstream",
            b"<< /Length 14 >>\nstream\nBT (two) Tj ET\nendstream",
        ]
        buf = bytearray(b"%PDF-1.4\n")
        for num, body in enumerate(objs, start=1):
            buf += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
        buf += b"trailer\n<< /Size 8 /Root 1 0 R >>\n%%EOF\n"
        assert parse_pdf_text(bytes(buf)) == (2, "one\ntwo")


class TestImages:
    def test_real_jpeg_stored_verbatim(self):
        # a REAL (EXIF-bearing) JPEG must come back byte-identical —
        # PDF embeds whole JPEG files under /DCTDecode
        from sparkplug_spark.operators.exif import build_exif_jpeg

        jpg = build_exif_jpeg(orientation=3, width=32, height=16)
        buf = build_pdf(
            [[("lit", "fig 1")]], images=[("jpeg", 32, 16, jpg)]
        )
        (row,) = parse_pdf_images(buf)
        assert row == (0, 32, 16, "jpeg", jpg)

    def test_flate_and_plain_raw(self):
        samples = bytes(range(48))
        buf = build_pdf(
            [],
            images=[("raw", 4, 4, samples), ("rawplain", 2, 2, b"RGBRGBRGBRGB")],
        )
        got = parse_pdf_images(buf)
        assert got[0] == (0, 4, 4, "raw", samples)
        assert got[1] == (1, 2, 2, "raw", b"RGBRGBRGBRGB")

    def test_unsupported_filter_null_payload(self):
        buf = build_pdf([], images=[("rawplain", 1, 1, b"x")])
        patched = buf.replace(
            b"/BitsPerComponent 8 /Length",
            b"/BitsPerComponent 8 /Filter /JPXDecode /Length",
        )
        (row,) = parse_pdf_images(patched)
        assert row[3] == "unsupported" and row[4] is None

    def test_malformed_yields_no_rows(self):
        assert parse_pdf_images(b"%PDF-1.4\ngarbage") == []
        assert parse_pdf_images(b"") == []

    def test_operator(self, spark):
        buf = build_pdf(
            [[("lit", "t")]],
            images=[("jpeg", 3, 2, b"JJ"), ("raw", 1, 1, b"abc")],
        )
        df = spark.createDataFrame(
            [(1, buf), (2, b"junk")], "doc_id long, payload binary"
        )
        rows = sorted(
            pdf_images(df).collect(), key=lambda r: r["image_idx"]
        )
        assert len(rows) == 2
        assert rows[0]["codec"] == "jpeg" and bytes(rows[0]["image"]) == b"JJ"
        assert rows[1]["codec"] == "raw" and bytes(rows[1]["image"]) == b"abc"


class TestOperator:
    def test_pdf_text_operator(self, spark):
        rows = [
            (1, build_pdf([[("lit", "alpha")], [("hex", "beta")]])),
            (2, b"broken"),
            (3, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["doc_id"]: r for r in pdf_text(df).collect()}
        assert out[1]["n_pages"] == 2 and out[1]["text"] == "alpha\nbeta"
        assert out[2]["n_pages"] is None and out[2]["text"] is None
        assert out[3]["n_pages"] is None and out[3]["text"] is None

    def test_operator_schema(self, spark):
        df = spark.createDataFrame(
            [(1, b"x")], "doc_id long, payload binary"
        )
        out = pdf_text(df)
        assert [f.name for f in out.schema.fields] == [
            "doc_id",
            "n_pages",
            "text",
        ]
        assert out.schema["n_pages"].dataType.typeName() == "long"
