"""EXIF extraction (E253): library-free TIFF/IFD walking over JPEG APP1
segments, both byte orders, quarantine-friendly NULLs."""

import pytest

from sparkplug_spark.operators import image_exif, parse_exif
from sparkplug_spark.operators.exif import build_exif_jpeg


class TestParseExif:
    def test_round_trip_little_endian(self):
        b = build_exif_jpeg(
            orientation=6, width=18, height=16, make="ACME", model="Cam 9",
            datetime_original="2026:01:02 03:04:05",
        )
        r = parse_exif(b)
        assert r == {
            "orientation": 6, "image_width": 18, "image_height": 16,
            "make": "ACME", "model": "Cam 9",
            "datetime_original": "2026:01:02 03:04:05",
        }

    def test_round_trip_big_endian(self):
        b = build_exif_jpeg(
            orientation=3, width=640, height=480, make="Umbra",
            model="X", datetime_original="2025:12:31 23:59:59",
            big_endian=True,
        )
        r = parse_exif(b)
        assert r["orientation"] == 3 and r["image_width"] == 640
        assert r["make"] == "Umbra" and r["model"] == "X"
        assert r["datetime_original"] == "2025:12:31 23:59:59"

    def test_partial_fields(self):
        r = parse_exif(build_exif_jpeg(orientation=8))
        assert r["orientation"] == 8
        assert r["make"] is None and r["datetime_original"] is None

    def test_short_inline_ascii(self):
        # <=4 byte ASCII values store inline, not behind an offset
        r = parse_exif(build_exif_jpeg(orientation=1, make="AB"))
        assert r["make"] == "AB"

    def test_no_exif_and_garbage_yield_nulls(self):
        for payload in (b"\xff\xd8\xff\xd9", b"garbage", b"", b"II"):
            assert all(v is None for v in parse_exif(payload).values())

    def test_bare_tiff_accepted(self):
        jpeg = build_exif_jpeg(orientation=5, width=7)
        tiff = jpeg[12:-2]  # strip SOI+APP1 header and EOI
        r = parse_exif(tiff)
        assert r["orientation"] == 5 and r["image_width"] == 7

    def test_truncated_offsets_are_safe(self):
        b = build_exif_jpeg(
            orientation=2, make="LongMakerName",
            datetime_original="2026:01:01 00:00:00",
        )
        for cut in (14, 20, 30, len(b) - 6):
            parse_exif(b[:cut])  # must not raise


class TestImageExif:
    def test_dataframe_pass(self, spark):
        rows = [
            (1, build_exif_jpeg(orientation=6, make="ACME")),
            (2, b"\xff\xd8\xff\xd9"),
            (3, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["doc_id"]: r for r in image_exif(df).collect()}
        assert out[1]["orientation"] == 6 and out[1]["make"] == "ACME"
        assert out[2]["orientation"] is None
        assert out[3]["orientation"] is None

    def test_empty_input_never_raises(self, spark):
        # a zero-row Arrow batch must not KeyError in the kernel
        df = spark.createDataFrame([], "doc_id long, payload binary")
        out = image_exif(df)
        assert out.collect() == []
        assert [f.name for f in out.schema.fields][:2] == [
            "doc_id", "orientation",
        ]
