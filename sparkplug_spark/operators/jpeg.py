"""Baseline JPEG codec with zero imaging libraries (pure numpy).

Decoder: ITU T.81 baseline sequential DCT — marker parse (DQT/SOF0/DHT/
DRI/SOS), Huffman entropy decode with byte-unstuffing and restart
markers, dequantize, zigzag, 2-D IDCT (orthonormal DCT-II basis matmul),
chroma upsample (sample replication) for 4:2:0 / 4:2:2 / 4:4:4, JFIF
YCbCr→RGB.  Progressive (SOF2), arithmetic coding, 12-bit precision and
hierarchical modes raise ``NotImplementedError`` — that is the remaining
Pillow boundary.

Encoder: a minimal spec-compliant baseline writer used to build
deterministic test fixtures (grayscale or 4:4:4 RGB).  It emits CUSTOM
canonical Huffman tables (every symbol at one code length) in DHT, which
any conforming decoder — including this one and Pillow — reads from the
stream, so the fixture never depends on the Annex K defaults.

Exactness contract used by the oracle query: a uniform 8x8 block has
only a DC coefficient (8·(v-128)); choosing v so the DC survives
quantization exactly (v ≡ 0 mod q/8 after level shift) makes
decode(encode(v)) == v bit-exactly — a lossy codec pinned on its
lossless subspace.

Scale notes: decode is per-file Python inside an Arrow ``mapInPandas``
batch — each payload is independent, cost bounded by image size, and the
Spark-side plumbing (schema, byte-sized partitions, batch iteration) is
shared with every other decoder tier in ``multimodal.py``.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg_baseline"]

#: zigzag order: index i holds the (row*8+col) position of scan element i.
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

def _dct_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis M: forward F = M f M^T, inverse
    f = M^T F M."""
    n = np.arange(8)
    k = n[:, None]
    M = np.cos((2 * n[None, :] + 1) * k * np.pi / 16.0)
    M[0] *= np.sqrt(1.0 / 2.0)
    return M * 0.5


_M = _dct_basis()


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.bits = (self.bits << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    return  # restart marker: caller resyncs
                else:
                    # EOI or next segment: pad with zeros
                    self.bits = (self.bits << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bits = (self.bits << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
            if self.nbits < n:
                # inside padding at stream end
                self.bits <<= n - self.nbits
                self.nbits = n
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        # discard consumed bits: without this mask the accumulator grows
        # into an unbounded bignum and every refill shifts it — O(n²) in
        # entropy-stream size, minutes on a real-world image
        self.bits &= (1 << self.nbits) - 1
        return v

    def resync(self) -> None:
        """Skip to just after the next RST marker and reset bit state."""
        self.bits = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise NotImplementedError("JPEG: expected restart marker")


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol map from the DHT BITS/HUFFVAL lists."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise NotImplementedError("JPEG: invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: map t-bit magnitude v to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG to a (h, w, ch) uint8 array (ch = 1 or 3,
    RGB order).  Raises ``NotImplementedError`` for non-baseline modes."""
    d = payload
    if len(d) < 4 or d[0:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG byte stream")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            raise NotImplementedError("JPEG: marker expected")
        marker = d[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", d, pos)
        body = d[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(body, np.uint8, 64, i).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(body, ">u2", 64, i).astype(np.int32)
                    i += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = bytes(body[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/SOF1 (huffman seq.)
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise NotImplementedError("JPEG: only 8-bit precision")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "JPEG: progressive/arithmetic/hierarchical modes need "
                "Pillow (decoder='real')"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise NotImplementedError("JPEG: SOS before SOF")
            ns = body[0]
            # decode-correctly-or-raise contract: the MCU walk below
            # assumes ONE interleaved scan covering every frame
            # component.  A spec-legal multi-scan baseline file (one SOS
            # per component) or a non-interleaved scan of a subsampled
            # component uses a different data-unit order — decoding it
            # here would yield silently wrong pixels, so raise instead.
            if ns != len(frame["comps"]):
                raise NotImplementedError(
                    "JPEG: non-interleaved / multi-scan baseline needs "
                    "Pillow (decoder='real')"
                )
            if ns == 1 and (
                frame["comps"][0]["h"] != 1 or frame["comps"][0]["v"] != 1
            ):
                raise NotImplementedError(
                    "JPEG: subsampled single-component scan needs Pillow"
                )
            scan = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tdta >> 4, tdta & 0xF))
            data_start = pos + seglen
            return _decode_scan(
                d, data_start, frame, scan, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seglen
    raise NotImplementedError("JPEG: no scan data found")


def _decode_scan(d, pos, frame, scan, qt, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for c in comps:
        planes[c["id"]] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
    pred = {c["id"]: 0 for c in comps}
    r = _BitReader(d, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.resync()
                for k in pred:
                    pred[k] = 0
            for comp, td, ta in scan:
                q = qt[comp["tq"]]
                dc_tab = huff_dc[td]
                ac_tab = huff_ac[ta]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = _huff_decode(r, dc_tab)
                        diff = _extend(r.read(t), t)
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, ac_tab)
                            rr, ss = rs >> 4, rs & 0xF
                            if ss == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise NotImplementedError(
                                    "JPEG: AC index overflow"
                                )
                            zz[k] = _extend(r.read(ss), ss)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = zz * q
                        block = block.reshape(8, 8)
                        pix = _M.T @ block @ _M + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    # upsample to full resolution by sample replication, crop to (h, w)
    out = []
    for c in comps:
        p = planes[c["id"]]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(
                np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(np.round(out[0]), 0, 255).astype(np.uint8)[:, :, None]
    if len(out) != 3:
        raise NotImplementedError("JPEG: expected 1 or 3 components")
    Y, Cb, Cr = out
    R = Y + 1.402 * (Cr - 128.0)
    G = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    B = Y + 1.772 * (Cb - 128.0)
    rgb = np.stack([R, G, B], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Minimal baseline encoder (test fixtures)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per spec


def _flat_huffman(symbols: list[int]) -> tuple[list[int], list[int]]:
    """Canonical table with every symbol at one code length L (smallest L
    with room for len(symbols) codes, leaving the all-ones code unused)."""
    L = 1
    while (1 << L) - 1 < len(symbols):
        L += 1
    bits = [0] * 16
    bits[L - 1] = len(symbols)
    return bits, sorted(symbols)


def _mag(v: int) -> tuple[int, int]:
    """(category, magnitude bits) for a signed coefficient, per T.81."""
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    if v >= 0:
        return t, v
    return t, v + (1 << t) - 1


def encode_jpeg_baseline(
    arr: np.ndarray,
    quant_dc: int = 16,
    quant_ac: int = 32,
    sampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 as baseline JPEG
    (custom flat Huffman tables, uniform quant: ``quant_dc`` for DC,
    ``quant_ac`` for every AC position).  ``sampling`` is ``"4:4:4"`` or
    ``"4:2:0"`` (RGB only; 2x2-mean chroma downsample, interleaved
    2x2-Y MCUs); ``restart_interval`` > 0 emits DRI + RSTn markers every
    that many MCUs.  Uniform-valued 8x8 blocks round-trip EXACTLY when
    8·(v-128) is a multiple of ``quant_dc`` — the lossless subspace the
    oracle query pins."""
    a = np.asarray(arr)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, nc = a.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg_baseline expects gray or RGB")
    if sampling not in ("4:4:4", "4:2:0"):
        raise ValueError("sampling must be '4:4:4' or '4:2:0'")
    sub = sampling == "4:2:0" and nc == 3
    a = a.astype(np.float64)
    if nc == 3:
        R, G, B = a[:, :, 0], a[:, :, 1], a[:, :, 2]
        Y = 0.299 * R + 0.587 * G + 0.114 * B
        Cb = -0.168736 * R - 0.331264 * G + 0.5 * B + 128.0
        Cr = 0.5 * R - 0.418688 * G - 0.081312 * B + 128.0
        planes = [Y, Cb, Cr]
    else:
        planes = [a[:, :, 0]]
    q = np.full(64, quant_ac, dtype=np.int32)
    q[0] = quant_dc

    # sampling factors per component and MCU geometry
    if sub:
        hv = [(2, 2), (1, 1), (1, 1)]
        mw, mh = 16, 16
    else:
        hv = [(1, 1)] * len(planes)
        mw, mh = 8, 8
    mcux = (w + mw - 1) // mw
    mcuy = (h + mh - 1) // mh

    def pad_to(p, th, tw):
        pp = np.zeros((th, tw))
        sh, sw = p.shape
        pp[:sh, :sw] = p
        if th > sh:
            pp[sh:, :sw] = p[-1:, :]
        if tw > sw:
            pp[:, sw:] = pp[:, sw - 1 : sw]
        return pp

    prepped = []
    for ci, p in enumerate(planes):
        ch, cv = hv[ci]
        if sub and ci > 0:
            # 2x2 box-mean chroma downsample (pad odd dims first)
            p = pad_to(p, (h + 1) // 2 * 2, (w + 1) // 2 * 2)
            p = (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
        prepped.append(pad_to(p, mcuy * cv * 8, mcux * ch * 8))

    # entropy-code all MCUs, collecting symbols first for the tables
    dc_syms: set[int] = set()
    ac_syms: set[int] = set()
    preds = [0] * len(prepped)
    coded = []
    mcu_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                coded.append(("RST",))
                preds = [0] * len(prepped)
            for ci, p in enumerate(prepped):
                ch, cv = hv[ci]
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        blk = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                        F = _M @ blk @ _M.T
                        zz = np.round(F.reshape(-1)[_ZIGZAG] / q).astype(
                            np.int64
                        )
                        diff = int(zz[0]) - preds[ci]
                        preds[ci] = int(zz[0])
                        t, mbits = _mag(diff)
                        dc_syms.add(t)
                        acs = []
                        run = 0
                        nz = np.nonzero(zz[1:])[0]
                        last_nz = (nz[-1] + 1) if len(nz) else 0
                        for k in range(1, last_nz + 1):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                if run == 16:
                                    acs.append((0xF0, 0, 0))
                                    ac_syms.add(0xF0)
                                    run = 0
                                continue
                            t2, mb2 = _mag(v)
                            sym = (run << 4) | t2
                            acs.append((sym, t2, mb2))
                            ac_syms.add(sym)
                            run = 0
                        if last_nz < 63:
                            acs.append((0x00, 0, 0))
                            ac_syms.add(0x00)
                        coded.append(("BLK", t, mbits, acs))
            mcu_idx += 1
    dc_bits, dc_vals = _flat_huffman(sorted(dc_syms))
    ac_bits, ac_vals = _flat_huffman(sorted(ac_syms))
    dc_tab = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(dc_bits[length - 1]):
            dc_tab[dc_vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    ac_tab = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(ac_bits[length - 1]):
            ac_tab[ac_vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1

    entropy = bytearray()
    wtr = _BitWriter()
    rst_n = 0
    for item in coded:
        if item[0] == "RST":
            wtr.flush()
            entropy += bytes(wtr.out)
            entropy += bytes([0xFF, 0xD0 + rst_n])
            rst_n = (rst_n + 1) % 8
            wtr = _BitWriter()
            continue
        _, t, mbits, acs = item
        ln, cd = dc_tab[t]
        wtr.write(cd, ln)
        wtr.write(mbits, t)
        for sym, t2, mb2 in acs:
            ln, cd = ac_tab[sym]
            wtr.write(cd, ln)
            wtr.write(mb2, t2)
    wtr.flush()
    entropy += bytes(wtr.out)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    zz_q = np.zeros(64, dtype=np.int32)
    zz_q[:] = q  # quant table is stored in zigzag scan order
    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in zz_q))
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        ch, cv = hv[ci]
        sof += bytes([ci + 1, (ch << 4) | cv, 0])  # shared quant table 0
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00] + dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10] + ac_bits) + bytes(ac_vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bytes(entropy)
    out += b"\xff\xd9"
    return out
