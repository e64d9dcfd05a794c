"""EXIF metadata extraction: a library-free TIFF/IFD walker for the
image lane.

Every production image pipeline reads EXIF BEFORE perceptual work —
orientation decides whether dHash sees the pixels a viewer would
(a rotated re-upload hashes differently until normalized), capture
timestamps drive dedup tie-breaks and temporal splits, and camera
make/model is a provenance/stratification key.  This module parses the
EXIF APP1 segment of a JPEG (or a bare TIFF header) with the same
pure-Python discipline as the codec family (PNG/JPEG/GIF/FLAC): byte
walking, no libraries, malformed input → NULL fields for quarantine,
never an exception in the row path.

Format notes (EXIF 2.x / TIFF 6.0): APP1 = ``FF E1 <len> 'Exif\\0\\0'``
+ a TIFF stream — ``II``/``MM`` byte order, magic 42, IFD0 offset; an
IFD is ``count`` 12-byte entries ``(tag, type, count, value-or-offset)``
(values ≤ 4 bytes inline, else offset into the TIFF stream); the Exif
sub-IFD hangs off tag 0x8769.  Parsed tags: Orientation (0x0112),
Make (0x010F), Model (0x0110), ImageWidth/Length (0x0100/0x0101),
DateTimeOriginal (0x9003, sub-IFD).

Scale shape: one Arrow ``mapInPandas`` pass over byte-sized partitions
(``repartition_for_media``); output is ~60 B/row of typed fields — the
scan that decides which images are worth decoding at all.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["parse_exif", "image_exif", "EXIF_SCHEMA"]

EXIF_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("orientation", T.IntegerType()),
        T.StructField("image_width", T.LongType()),
        T.StructField("image_height", T.LongType()),
        T.StructField("make", T.StringType()),
        T.StructField("model", T.StringType()),
        T.StructField("datetime_original", T.StringType()),
    ]
)

_TAG_WIDTH = 0x0100
_TAG_HEIGHT = 0x0101
_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_EXIF_IFD = 0x8769
_TAG_DATETIME_ORIGINAL = 0x9003


def _find_tiff(data: bytes) -> bytes | None:
    """Locate the TIFF stream: bare TIFF passes through; JPEG walks the
    segment chain to the EXIF APP1 (stops at SOS — EXIF precedes image
    data by spec)."""
    if data[:2] in (b"II", b"MM"):
        return data
    if data[:2] != b"\xff\xd8":
        return None
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # standalone
            pos += 2
            continue
        if marker == 0xDA:  # SOS: entropy-coded data follows
            return None
        seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        if seg_len < 2 or pos + 2 + seg_len > n:
            return None
        if marker == 0xE1 and data[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return data[pos + 10 : pos + 2 + seg_len]
        pos += 2 + seg_len
    return None


def _read_ifd(tiff: bytes, off: int, endian: str) -> dict[int, tuple]:
    """One IFD as {tag: (type, count, raw value field, value offset)}."""
    out: dict[int, tuple] = {}
    if off + 2 > len(tiff):
        return out
    (count,) = struct.unpack(endian + "H", tiff[off : off + 2])
    for i in range(count):
        e = off + 2 + 12 * i
        if e + 12 > len(tiff):
            break
        tag, typ, cnt = struct.unpack(endian + "HHI", tiff[e : e + 8])
        out[tag] = (typ, cnt, tiff[e + 8 : e + 12])
    return out


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _value(tiff: bytes, entry: tuple, endian: str):
    typ, cnt, raw = entry
    size = _TYPE_SIZE.get(typ)
    if size is None:
        return None
    total = size * cnt
    if total <= 4:
        buf = raw[:total]
    else:
        (off,) = struct.unpack(endian + "I", raw)
        if off + total > len(tiff):
            return None
        buf = tiff[off : off + total]
    if typ == 2:  # ASCII, NUL-terminated
        return buf.split(b"\x00", 1)[0].decode("ascii", "replace") or None
    if typ == 3:
        return struct.unpack(endian + "H", buf[:2])[0]
    if typ == 4:
        return struct.unpack(endian + "I", buf[:4])[0]
    return None


def parse_exif(data: bytes) -> dict:
    """EXIF fields out of JPEG/TIFF bytes; every field None when absent
    or malformed (quarantine-friendly — never raises on bad input)."""
    none = {
        "orientation": None,
        "image_width": None,
        "image_height": None,
        "make": None,
        "model": None,
        "datetime_original": None,
    }
    try:
        tiff = _find_tiff(bytes(data)) if data else None
        if tiff is None or len(tiff) < 8:
            return none
        order = tiff[:2]
        endian = "<" if order == b"II" else ">" if order == b"MM" else None
        if endian is None:
            return none
        magic, ifd0 = struct.unpack(endian + "HI", tiff[2:8])
        if magic != 42:
            return none
        ifd = _read_ifd(tiff, ifd0, endian)
        out = dict(none)
        if _TAG_ORIENTATION in ifd:
            v = _value(tiff, ifd[_TAG_ORIENTATION], endian)
            out["orientation"] = int(v) if v is not None else None
        if _TAG_WIDTH in ifd:
            v = _value(tiff, ifd[_TAG_WIDTH], endian)
            out["image_width"] = int(v) if v is not None else None
        if _TAG_HEIGHT in ifd:
            v = _value(tiff, ifd[_TAG_HEIGHT], endian)
            out["image_height"] = int(v) if v is not None else None
        if _TAG_MAKE in ifd:
            out["make"] = _value(tiff, ifd[_TAG_MAKE], endian)
        if _TAG_MODEL in ifd:
            out["model"] = _value(tiff, ifd[_TAG_MODEL], endian)
        if _TAG_EXIF_IFD in ifd:
            p = _value(tiff, ifd[_TAG_EXIF_IFD], endian)
            if isinstance(p, int):
                sub = _read_ifd(tiff, p, endian)
                if _TAG_DATETIME_ORIGINAL in sub:
                    out["datetime_original"] = _value(
                        tiff, sub[_TAG_DATETIME_ORIGINAL], endian
                    )
        return out
    except Exception:
        return none


def image_exif(
    df: DataFrame,
    image_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-image EXIF fields: ``(id_col, orientation, image_width,
    image_height, make, model, datetime_original)`` — all NULL for
    images without (or with malformed) EXIF.  One Arrow pass over
    byte-sized partitions; compose the orientation with decode/dHash
    BEFORE perceptual dedup (a rotated re-upload is the same image)."""
    from .multimodal import repartition_for_media

    id_type = df.schema[id_col].dataType
    schema = T.StructType(
        [T.StructField("id", id_type)] + EXIF_SCHEMA.fields[1:]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                # pd.DataFrame([]) has no columns — the astype/select
                # below would KeyError, breaking the never-raise contract
                continue
            recs = []
            for _, row in pdf.iterrows():
                p = row.iloc[1]
                r = parse_exif(bytes(p) if p is not None else b"")
                r["id"] = row.iloc[0]
                recs.append(r)
            out = pd.DataFrame(recs)
            out["orientation"] = out["orientation"].astype("Int32")
            out["image_width"] = out["image_width"].astype("Int64")
            out["image_height"] = out["image_height"].astype("Int64")
            yield out[
                [
                    "id",
                    "orientation",
                    "image_width",
                    "image_height",
                    "make",
                    "model",
                    "datetime_original",
                ]
            ]

    return (
        repartition_for_media(df.select(F.col(id_col), F.col(image_col)))
        .mapInPandas(batches, schema=schema)
        .withColumnRenamed("id", id_col)
    )


# --- writer helper (fixtures, tests, arithmetic oracles) -----------------


def build_exif_jpeg(
    orientation: int = 1,
    width: int = 0,
    height: int = 0,
    make: str = "",
    model: str = "",
    datetime_original: str = "",
    big_endian: bool = False,
) -> bytes:
    """Serialize a minimal JPEG wrapping ONE EXIF APP1 segment with the
    parsed tag set — deterministic bytes for fixtures and round-trip
    oracles (empty string/zero fields are omitted from the IFD)."""
    endian = ">" if big_endian else "<"

    entries: list[tuple[int, int, int, bytes | int]] = []
    strings: list[bytes] = []

    def _ascii_entry(tag: int, text: str) -> None:
        raw = text.encode("ascii") + b"\x00"
        entries.append((tag, 2, len(raw), raw))

    if width:
        entries.append((_TAG_WIDTH, 3, 1, width))
    if height:
        entries.append((_TAG_HEIGHT, 3, 1, height))
    if make:
        _ascii_entry(_TAG_MAKE, make)
    if model:
        _ascii_entry(_TAG_MODEL, model)
    if orientation:
        entries.append((_TAG_ORIENTATION, 3, 1, orientation))
    sub_entries: list[tuple[int, int, int, bytes | int]] = []
    if datetime_original:
        raw = datetime_original.encode("ascii") + b"\x00"
        sub_entries.append((_TAG_DATETIME_ORIGINAL, 2, len(raw), raw))

    n0 = len(entries) + (1 if sub_entries else 0)
    ifd0_off = 8
    ifd0_end = ifd0_off + 2 + 12 * n0 + 4
    sub_off = ifd0_end
    sub_end = sub_off + (2 + 12 * len(sub_entries) + 4 if sub_entries else 0)
    data_off = sub_end

    def _pack(ifd, data_cursor):
        out = struct.pack(endian + "H", len(ifd))
        blobs = b""
        for tag, typ, cnt, val in sorted(ifd):
            out += struct.pack(endian + "HHI", tag, typ, cnt)
            if typ == 2:
                if cnt <= 4:
                    out += val.ljust(4, b"\x00")
                else:
                    out += struct.pack(endian + "I", data_cursor + len(blobs))
                    blobs += val
            elif typ == 3:
                out += struct.pack(endian + "H", val) + b"\x00\x00"
            else:
                out += struct.pack(endian + "I", val)
        return out, blobs

    full = list(entries)
    if sub_entries:
        full.append((_TAG_EXIF_IFD, 4, 1, sub_off))
    sub_blob_off = data_off
    ifd0_bytes, blobs0 = _pack(full, sub_blob_off)
    ifd0_bytes += struct.pack(endian + "I", 0)
    tiff = (
        (b"MM" if big_endian else b"II")
        + struct.pack(endian + "HI", 42, ifd0_off)
        + ifd0_bytes
    )
    if sub_entries:
        sub_bytes, blobs1 = _pack(sub_entries, sub_blob_off + len(blobs0))
        sub_bytes += struct.pack(endian + "I", 0)
        tiff += sub_bytes + blobs0 + blobs1
    else:
        tiff += blobs0
    app1_body = b"Exif\x00\x00" + tiff
    return (
        b"\xff\xd8"
        + b"\xff\xe1"
        + struct.pack(">H", 2 + len(app1_body))
        + app1_body
        + b"\xff\xd9"
    )
