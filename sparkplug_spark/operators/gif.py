"""Native GIF decode, zero imaging libraries (pure Python + numpy).

Decoder: GIF87a/89a — logical screen + global/local color tables, LZW
decompression (variable code width, clear/EOI codes, 12-bit dictionary),
Adam-style 4-pass interlacing, and extension-block skipping.  Returns
the FIRST frame as (h, w, 3) uint8 RGB (animated GIFs: later frames are
deltas against disposal state — compositing them is the Pillow
boundary, the first frame is always complete for the screen region it
covers).  Transparency is treated as its palette color.

Encoder: a real LZW compressor (dictionary growth, width bumps, clear
on overflow) used to build deterministic fixtures; emits GIF89a with a
global color table, optional interlace.

Scale notes: like the other codecs, decode runs per-file inside an
Arrow ``mapInPandas`` batch; the LZW loop is O(pixels).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "encode_gif"]


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out: list[int] = []
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise NotImplementedError("GIF: LZW stream truncated")
            acc |= data[pos] << nbits  # LSB-first packing
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise NotImplementedError("GIF: invalid LZW code")
        out.extend(entry)
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out[:n_pixels]


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )
    out = np.empty_like(rows)
    out[order] = rows
    return out


def decode_gif(payload: bytes) -> np.ndarray:
    """Decode the first frame of a GIF to (h, w, 3) uint8 RGB."""
    p = payload if payload is not None else b""
    if len(p) < 13 or p[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF byte stream")
    sw, sh, packed, _bg, _aspect = struct.unpack_from("<HHBBB", p, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(p, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    while pos < len(p):
        marker = p[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(p) and p[pos] != 0:
                pos += 1 + p[pos]
            pos += 1
            continue
        if marker != 0x2C:
            raise NotImplementedError(f"GIF: unknown block 0x{marker:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", p, pos)
        pos += 9
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(p, np.uint8, n * 3, pos).reshape(-1, 3)
            pos += n * 3
        if ct is None:
            raise NotImplementedError("GIF: image without a color table")
        if w <= 0 or h <= 0:
            raise NotImplementedError("GIF: empty image descriptor")
        min_code = p[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise NotImplementedError("GIF: invalid LZW minimum code size")
        chunks = bytearray()
        while pos < len(p) and p[pos] != 0:
            ln = p[pos]
            chunks += p[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1  # block terminator
        idx = np.array(
            _lzw_decode(bytes(chunks), min_code, w * h), dtype=np.int64
        ).reshape(h, w)
        if ipacked & 0x40:
            idx = _deinterlace(idx)
        if idx.max(initial=0) >= len(ct):
            raise NotImplementedError("GIF: palette index out of range")
        return ct[idx]  # first frame only (see module docstring)
    raise NotImplementedError("GIF: no image data found")


# ---------------------------------------------------------------------------
# Minimal encoder (test fixtures)
# ---------------------------------------------------------------------------


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear, width)
    cur = b""
    for i in indices:
        nxt = cur + bytes([i])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur], width)
        table[nxt] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= (1 << 12):
            emit(clear, width)
            table = {bytes([j]): j for j in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        cur = bytes([i])
    if cur:
        emit(table[cur], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    indices: np.ndarray, palette: np.ndarray, interlace: bool = False
) -> bytes:
    """Encode an index raster (h, w) + palette (n, 3) uint8 as GIF89a."""
    idx = np.asarray(indices)
    pal = np.asarray(palette, dtype=np.uint8)
    if len(pal) > 256:
        raise ValueError("GIF palettes hold at most 256 entries")
    h, w = idx.shape
    bits = max(2, int(len(pal) - 1).bit_length())
    size_field = bits - 1
    n_entries = 1 << bits
    pal_full = np.zeros((n_entries, 3), dtype=np.uint8)
    pal_full[: len(pal)] = pal

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += pal_full.tobytes()
    ipacked = 0x40 if interlace else 0
    out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, ipacked)
    rows = idx
    if interlace:
        order = (
            list(range(0, h, 8))
            + list(range(4, h, 8))
            + list(range(2, h, 4))
            + list(range(1, h, 2))
        )
        rows = idx[order]
    data = _lzw_encode([int(v) for v in rows.reshape(-1)], bits)
    out += bytes([bits])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
