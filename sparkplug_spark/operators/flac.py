"""Native FLAC codec support, zero audio libraries (pure Python + numpy).

Decoder: full baseline FLAC subset — STREAMINFO parse, frame headers
(UTF-8 frame numbers, all block-size/sample-rate/sample-size codes),
subframe types CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32), Rice-coded
residuals (4- and 5-bit parameters, escape partitions), wasted bits, and
all four channel assignments (independent, left/side, right/side,
mid/side).  FLAC is lossless, so decode is BIT-EXACT against the source
PCM — the property the tests pin.  CRC-8/CRC-16 fields are parsed past,
not validated (a corrupt stream fails structurally instead).  Ogg-FLAC
raises ``NotImplementedError``.

Encoder: a minimal spec-conformant writer for test fixtures — verbatim,
constant, or fixed-order-1 Rice-coded subframes, independent or
left/side stereo, multiple frames with a short final block.  Real CRCs
are emitted so the fixtures also decode in any conforming player.

Scale notes: like the image codecs, decode runs per-file inside an Arrow
``mapInPandas`` batch; each payload is independent and the bit reader is
O(stream size).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_flac", "encode_flac"]

#: fixed-predictor coefficients by order (s[i] = e + Σ c_j·s[i-1-j])
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


class _Bits:
    """MSB-first bit reader over bytes; O(n) via consumed-bit masking."""

    def __init__(self, data: bytes, pos_bytes: int = 0):
        self.data = data
        self.pos = pos_bytes
        self.acc = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            if self.pos >= len(self.data):
                raise NotImplementedError("FLAC: truncated bitstream")
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.n += 8
        self.n -= nbits
        v = (self.acc >> self.n) & ((1 << nbits) - 1)
        self.acc &= (1 << self.n) - 1
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        return v - (1 << nbits) if v >= (1 << (nbits - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.n = 0
        self.acc = 0


def _read_utf8_number(b: _Bits) -> int:
    """Frame/sample number: UTF-8-style variable-length coding."""
    first = b.read(8)
    if first < 0x80:
        return first
    n = 0
    mask = 0x40
    while first & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise NotImplementedError("FLAC: invalid UTF-8 frame number")
    v = first & (mask - 1)
    for _ in range(n):
        c = b.read(8)
        if c & 0xC0 != 0x80:
            raise NotImplementedError("FLAC: invalid UTF-8 continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residual(b: _Bits, blocksize: int, order: int) -> list[int]:
    method = b.read(2)
    if method > 1:
        raise NotImplementedError("FLAC: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = b.read(4)
    nparts = 1 << po
    if blocksize % nparts:
        raise NotImplementedError("FLAC: partition order mismatch")
    out: list[int] = []
    for p in range(nparts):
        count = (blocksize >> po) - (order if p == 0 else 0)
        if count < 0:
            raise NotImplementedError("FLAC: partition smaller than order")
        param = b.read(pbits)
        if param == escape:
            raw = b.read(5)
            for _ in range(count):
                out.append(b.read_signed(raw) if raw else 0)
        else:
            for _ in range(count):
                q = b.read_unary()
                r = b.read(param) if param else 0
                v = (q << param) | r
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _read_subframe(b: _Bits, blocksize: int, bps: int) -> list[int]:
    if b.read(1) != 0:
        raise NotImplementedError("FLAC: invalid subframe padding bit")
    stype = b.read(6)
    wasted = 0
    if b.read(1):
        wasted = 1 + b.read_unary()
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = b.read_signed(bps)
        samples = [v] * blocksize
    elif stype == 1:  # VERBATIM
        samples = [b.read_signed(bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [b.read_signed(bps) for _ in range(order)]
        resid = _read_residual(b, blocksize, order)
        samples = list(warm)
        coefs = _FIXED_COEFS[order]
        for e in resid:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(e + pred)
    elif stype >= 32:  # LPC order 1-32
        order = (stype & 31) + 1
        warm = [b.read_signed(bps) for _ in range(order)]
        prec = b.read(4)
        if prec == 15:
            raise NotImplementedError("FLAC: invalid LPC precision")
        prec += 1
        shift = b.read_signed(5)
        if shift < 0:
            raise NotImplementedError("FLAC: negative LPC shift")
        coefs = [b.read_signed(prec) for _ in range(order)]
        resid = _read_residual(b, blocksize, order)
        samples = list(warm)
        for e in resid:
            acc = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(e + (acc >> shift))
    else:
        raise NotImplementedError(f"FLAC: reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


#: block-size codes 2-5 and 8-15 → fixed sizes
_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608}
for _i in range(8, 16):
    _BLOCKSIZES[_i] = 256 << (_i - 8)
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def decode_flac(payload: bytes):
    """Decode a FLAC stream to (samples int32 (n, channels), sample_rate,
    bits_per_sample).  Bit-exact (lossless codec); raises
    ``NotImplementedError`` for Ogg-FLAC or structural problems."""
    p = payload if payload is not None else b""
    if p[:4] == b"OggS":
        raise NotImplementedError(
            "Ogg-encapsulated FLAC needs librosa/ffmpeg — plug the call here"
        )
    if len(p) < 42 or p[:4] != b"fLaC":
        raise NotImplementedError("not a FLAC byte stream")
    # metadata blocks; STREAMINFO is always first
    pos = 4
    streaminfo = None
    while pos + 4 <= len(p):
        hdr = p[pos]
        last = hdr & 0x80
        btype = hdr & 0x7F
        (blen,) = struct.unpack(">I", b"\x00" + p[pos + 1 : pos + 4])
        body = p[pos + 4 : pos + 4 + blen]
        if btype == 0:
            if len(body) < 34:
                raise NotImplementedError("FLAC: truncated STREAMINFO")
            sb = _Bits(body)
            sb.read(16)  # min block
            sb.read(16)  # max block
            sb.read(24)  # min frame
            sb.read(24)  # max frame
            rate = sb.read(20)
            nch = sb.read(3) + 1
            bps = sb.read(5) + 1
            total = sb.read(36)
            streaminfo = (rate, nch, bps, total)
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise NotImplementedError("FLAC: missing STREAMINFO")
    rate, nch, bps, total = streaminfo

    channels_out: list[list[int]] = [[] for _ in range(nch)]
    b = _Bits(p, pos)
    while b.pos < len(p) or b.n >= 14:
        # sync
        try:
            sync = b.read(14)
        except NotImplementedError:
            break
        if sync != 0x3FFE:
            raise NotImplementedError("FLAC: lost frame sync")
        b.read(1)  # reserved
        b.read(1)  # blocking strategy
        bs_code = b.read(4)
        sr_code = b.read(4)
        ch_code = b.read(4)
        ss_code = b.read(3)
        b.read(1)  # reserved
        _read_utf8_number(b)
        if bs_code == 0:
            raise NotImplementedError("FLAC: reserved block size code")
        elif bs_code == 6:
            blocksize = b.read(8) + 1
        elif bs_code == 7:
            blocksize = b.read(16) + 1
        else:
            blocksize = _BLOCKSIZES[bs_code]
        if sr_code == 12:
            b.read(8)
        elif sr_code in (13, 14):
            b.read(16)
        elif sr_code == 15:
            raise NotImplementedError("FLAC: invalid sample rate code")
        fbps = bps if ss_code == 0 else _SAMPLE_SIZES.get(ss_code)
        if fbps is None:
            raise NotImplementedError("FLAC: reserved sample size code")
        b.read(8)  # header CRC-8 (not validated)

        if ch_code < 8:
            n_sub = ch_code + 1
            if n_sub != nch:
                raise NotImplementedError("FLAC: channel count mismatch")
            subs = [_read_subframe(b, blocksize, fbps) for _ in range(n_sub)]
        elif ch_code in (8, 9, 10):
            if nch != 2:
                raise NotImplementedError("FLAC: stereo decorrelation on non-stereo")
            if ch_code == 8:  # left/side
                left = _read_subframe(b, blocksize, fbps)
                side = _read_subframe(b, blocksize, fbps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _read_subframe(b, blocksize, fbps + 1)
                right = _read_subframe(b, blocksize, fbps)
                subs = [[s + r for s, r in zip(side, right)], right]
            else:  # mid/side
                mid = _read_subframe(b, blocksize, fbps)
                side = _read_subframe(b, blocksize, fbps + 1)
                subs = [[], []]
                for mv, sv in zip(mid, side):
                    m2 = (mv << 1) | (sv & 1)
                    subs[0].append((m2 + sv) >> 1)
                    subs[1].append((m2 - sv) >> 1)
        else:
            raise NotImplementedError("FLAC: reserved channel assignment")
        for c in range(nch):
            channels_out[c].extend(subs[c])
        b.align()
        if b.pos + 2 > len(p):
            raise NotImplementedError("FLAC: truncated frame footer")
        b.pos += 2  # frame CRC-16 (not validated)
        if total and len(channels_out[0]) >= total:
            break

    n = min(len(c) for c in channels_out)
    if total:
        n = min(n, total)
    out = np.empty((n, nch), dtype=np.int64)
    for c in range(nch):
        out[:, c] = channels_out[c][:n]
    return out.astype(np.int32), rate, bps


# ---------------------------------------------------------------------------
# Minimal encoder (test fixtures)
# ---------------------------------------------------------------------------


class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def write_signed(self, v: int, nbits: int) -> None:
        self.write(v & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self) -> None:
        while self.n:
            self.write(0, 1)


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1) & 0xFFFF
    return crc


def _utf8_number(n: int) -> bytes:
    """General UTF-8-style coding (1-7 bytes), mirroring the decoder."""
    if n < 0x80:
        return bytes([n])
    tail = []
    nbytes = 2
    while n >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    for _ in range(nbytes - 1):
        tail.append(0x80 | (n & 0x3F))
        n >>= 6
    prefix = (0xFF << (8 - nbytes)) & 0xFF
    return bytes([prefix | n] + tail[::-1])


def _write_subframe(
    w: _BitW, samples: list[int], bps: int, mode: str
) -> None:
    w.write(0, 1)
    if mode == "constant":
        w.write(0, 6)
        w.write(0, 1)
        w.write_signed(samples[0], bps)
    elif mode == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for s in samples:
            w.write_signed(s, bps)
    elif mode == "fixed1":
        w.write(8 + 1, 6)  # fixed order 1
        w.write(0, 1)
        w.write_signed(samples[0], bps)
        # residuals e_i = s_i - s_{i-1}, rice parameter chosen crudely
        resid = [samples[i] - samples[i - 1] for i in range(1, len(samples))]
        w.write(0, 2)  # 4-bit rice
        w.write(0, 4)  # partition order 0
        mx = max((abs(e) for e in resid), default=0)
        param = max(1, mx.bit_length())
        if param > 14:
            param = 14
        w.write(param, 4)
        for e in resid:
            z = (abs(e) << 1) - 1 if e < 0 else e << 1  # zigzag
            w.write_unary(z >> param)
            w.write(z & ((1 << param) - 1), param)
    else:
        raise ValueError(f"unknown subframe mode {mode}")


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 8000,
    bps: int = 16,
    block_size: int = 16,
    mode: str = "verbatim",
    stereo_mode: str = "independent",
) -> bytes:
    """Encode (n,) or (n, ch) int samples as a conformant FLAC stream.
    ``mode``: 'verbatim' | 'constant' (requires constant blocks) |
    'fixed1'; ``stereo_mode``: 'independent' | 'left_side' (2ch only)."""
    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    n, nch = a.shape
    if stereo_mode == "left_side" and nch != 2:
        raise ValueError("left_side needs 2 channels")

    out = bytearray(b"fLaC")
    si = _BitW()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = bytes(si.out) + b"\x00" * 16  # md5 zeroed (unverified)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    frame_no = 0
    for start in range(0, n, block_size):
        blk = a[start : start + block_size]
        bs = len(blk)
        hdr = _BitW()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)
        hdr.write(0, 1)  # fixed blocksize strategy
        hdr.write(7, 4)  # 16-bit blocksize-1 follows
        hdr.write(0, 4)  # sample rate from STREAMINFO
        ch_code = 8 if stereo_mode == "left_side" else nch - 1
        hdr.write(ch_code, 4)
        hdr.write(0, 3)  # bps from STREAMINFO
        hdr.write(0, 1)
        hdr.align()
        head = bytes(hdr.out) + _utf8_number(frame_no) + struct.pack(
            ">H", bs - 1
        )
        head += bytes([_crc8(head)])

        w = _BitW()
        if stereo_mode == "left_side":
            left = blk[:, 0].tolist()
            side = (blk[:, 0] - blk[:, 1]).tolist()
            _write_subframe(w, left, bps, mode)
            _write_subframe(w, side, bps + 1, mode)
        else:
            for c in range(nch):
                _write_subframe(w, blk[:, c].tolist(), bps, mode)
        w.align()
        frame = head + bytes(w.out)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
    return bytes(out)
