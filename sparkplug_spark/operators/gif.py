"""Native GIF decode, zero imaging libraries (pure Python + numpy).

Decoder: GIF87a/89a — logical screen + global/local color tables, LZW
decompression (variable code width, clear/EOI codes, 12-bit dictionary),
Adam-style 4-pass interlacing, Graphic Control Extensions, and FULL
animation compositing: :func:`decode_gif_frames` renders every frame
onto the logical-screen canvas honoring per-frame transparency and the
GIF89a disposal methods (none/keep, restore-to-background,
restore-to-previous), returning (delay_ms, RGB) per frame.
:func:`decode_gif` keeps the single-image fast path (first image
descriptor at its own region size).  Transparency composites as
"leave the canvas pixel"; restore-to-background fills the frame region
with the logical background color (the deterministic RGB reading of the
spec's "restore to background" — we render opaque RGB, not RGBA).

Encoder: a real LZW compressor (dictionary growth, width bumps, clear
on overflow) used to build deterministic fixtures; emits GIF89a with a
global color table, optional interlace; :func:`encode_gif_anim` writes
multi-frame animations with per-frame GCE blocks (delay, disposal,
transparent index) and sub-region placement.

Scale notes: like the other codecs, decode runs per-file inside an
Arrow ``mapInPandas`` batch; the LZW loop is O(pixels) and compositing
O(frames × region pixels).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_gif", "decode_gif_frames", "encode_gif", "encode_gif_anim"]


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


def decode_gif_frames(payload: bytes) -> list[tuple[int, np.ndarray]]:
    """Decode ALL frames of a (possibly animated) GIF, composited onto
    the logical screen: returns ``[(delay_ms, (sh, sw, 3) uint8 RGB),
    ...]`` in presentation order.

    GIF89a semantics honored per frame: the Graphic Control Extension's
    transparency index (transparent pixels leave the canvas unchanged),
    delay (centiseconds → ms), and disposal method — 0/1 keep, 2
    restore the frame region to the logical background color, 3 restore
    the canvas to its pre-frame state.  The canvas starts as the
    background color (global-palette background index, else black)."""
    p = payload if payload is not None else b""
    if len(p) < 13 or p[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF byte stream")
    sw, sh, packed, bg, _aspect = struct.unpack_from("<HHBBB", p, 6)
    if sw <= 0 or sh <= 0:
        raise NotImplementedError("GIF: empty logical screen")
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(p, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    bg_rgb = (
        gct[bg] if gct is not None and bg < len(gct) else np.zeros(3, np.uint8)
    )
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:, :] = bg_rgb
    frames: list[tuple[int, np.ndarray]] = []
    # pending GCE state, consumed by the next image descriptor
    disposal, transparent, delay_ms = 0, None, 0
    while pos < len(p):
        marker = p[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            label = p[pos]
            pos += 1
            if label == 0xF9 and pos < len(p) and p[pos] >= 4:
                gflags, delay_cs, tidx = struct.unpack_from(
                    "<BHB", p, pos + 1
                )
                disposal = (gflags >> 2) & 0x07
                transparent = tidx if gflags & 0x01 else None
                delay_ms = delay_cs * 10
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
        if w <= 0 or h <= 0 or left + w > sw or top + h > sh:
            raise NotImplementedError("GIF: frame region outside the screen")
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
        prev = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = ct[idx][mask]
        else:
            region[:, :] = ct[idx]
        frames.append((delay_ms, canvas.copy()))
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_rgb
        elif disposal == 3:
            canvas = prev
        disposal, transparent, delay_ms = 0, None, 0
    if not frames:
        raise NotImplementedError("GIF: no image data found")
    return frames


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


def encode_gif_anim(
    frames: list[dict],
    palette: np.ndarray,
    screen: tuple[int, int] | None = None,
    background: int = 0,
) -> bytes:
    """Encode a multi-frame GIF89a animation fixture.  Each frame dict:

    - ``indices``: (h, w) palette-index raster (required)
    - ``left``/``top``: placement on the logical screen (default 0)
    - ``delay_cs``: GCE delay in centiseconds (default 10)
    - ``disposal``: 0..3 (default 0)
    - ``transparent``: palette index rendered transparent (default None)

    ``screen`` defaults to frame 0's size.  One global color table;
    deterministic byte stream (same LZW encoder as :func:`encode_gif`)."""
    if not frames:
        raise ValueError("frames must be non-empty")
    pal = np.asarray(palette, dtype=np.uint8)
    if len(pal) > 256:
        raise ValueError("GIF palettes hold at most 256 entries")
    h0, w0 = np.asarray(frames[0]["indices"]).shape
    sw, sh = (screen or (w0, h0))
    bits = max(2, int(len(pal) - 1).bit_length())
    n_entries = 1 << bits
    pal_full = np.zeros((n_entries, 3), dtype=np.uint8)
    pal_full[: len(pal)] = pal

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (bits - 1), background, 0)
    out += pal_full.tobytes()
    for fr in frames:
        idx = np.asarray(fr["indices"])
        h, w = idx.shape
        left = int(fr.get("left", 0))
        top = int(fr.get("top", 0))
        if left + w > sw or top + h > sh:
            raise ValueError("frame region outside the logical screen")
        transparent = fr.get("transparent")
        gflags = (int(fr.get("disposal", 0)) & 0x07) << 2
        tidx = 0
        if transparent is not None:
            gflags |= 0x01
            tidx = int(transparent)
        out += bytes([0x21, 0xF9, 0x04])
        out += struct.pack("<BHB", gflags, int(fr.get("delay_cs", 10)), tidx)
        out += b"\x00"
        out += bytes([0x2C]) + struct.pack("<HHHHB", left, top, w, h, 0)
        data = _lzw_encode([int(v) for v in idx.reshape(-1)], bits)
        out += bytes([bits])
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
