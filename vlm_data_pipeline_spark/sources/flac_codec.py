"""Pure-Python FLAC decoder (RFC 9639) — the compressed-audio sibling of
``wav_codec``, closing the "compressed formats are a seam" gap for the
one format an offline implementation can be RESPONSIBLE about: unlike
mp3/aac (whose ISO Huffman/window tables cannot be reproduced from
memory without risking a self-consistent wrong reading), a FLAC stream
carries its own ground truth — a CRC-8 over every frame header, a
CRC-16 over every frame, and an MD5 of the fully decoded sample stream
in STREAMINFO. This decoder VERIFIES all three, so any misreading of
the spec fails loudly instead of silently mis-decoding.

Coverage: STREAMINFO + skipped metadata blocks; fixed and variable
blocking; all four subframe types (CONSTANT, VERBATIM, FIXED orders
0-4, LPC orders 1-32); Rice/Rice2 residual partitions incl. escape
partitions; wasted bits; independent channels and all three stereo
decorrelation modes (left/side, right/side, mid/side); 8-32 bit
samples. Output is the ``wav_codec`` convention: float64 in [-1, 1)
shaped (n_frames, n_channels). Malformed input raises ValueError (the
robust skip policy); there are deliberately NO NotImplementedError
seams left in this format.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

__all__ = ["decode_flac", "encode_flac", "FlacAudio"]


class FlacAudio:
    __slots__ = ("sample_rate", "n_channels", "bits_per_sample", "samples")

    def __init__(self, sample_rate, n_channels, bits_per_sample, samples):
        self.sample_rate = sample_rate
        self.n_channels = n_channels
        self.bits_per_sample = bits_per_sample
        # float64 ndarray, shape (n_frames, n_channels), values in [-1, 1)
        self.samples = samples

    @property
    def n_frames(self) -> int:
        return self.samples.shape[0]

    @property
    def duration_s(self) -> float:
        return self.n_frames / self.sample_rate


# CRC-8, polynomial x^8 + x^2 + x + 1 (0x07), init 0 — frame headers.
_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

# CRC-16, polynomial x^16 + x^15 + x^2 + 1 (0x8005), init 0 — whole frame.
_CRC16_TABLE = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8_TABLE[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = ((c << 8) & 0xFFFF) ^ _CRC16_TABLE[((c >> 8) ^ b) & 0xFF]
    return c


class _Bits:
    """MSB-first bit reader over the raw stream (no byte unstuffing —
    FLAC, unlike JPEG, has none)."""

    __slots__ = ("data", "pos")  # pos in BITS

    def __init__(self, data: bytes, byte_pos: int = 0):
        self.data = data
        self.pos = byte_pos * 8

    def u(self, n: int) -> int:
        """Read n bits as an unsigned int."""
        end = self.pos + n
        if end > len(self.data) * 8:
            raise ValueError("truncated FLAC bitstream")
        v = 0
        pos = self.pos
        while n:
            byte = self.data[pos >> 3]
            avail = 8 - (pos & 7)
            take = avail if avail < n else n
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            pos += take
            n -= take
        self.pos = pos
        return v

    def s(self, n: int) -> int:
        """Read n bits as a two's-complement signed int."""
        v = self.u(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        """Count 0 bits until the terminating 1 bit."""
        q = 0
        while self.u(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    @property
    def byte_pos(self) -> int:
        if self.pos & 7:
            raise ValueError("bit reader not byte-aligned")
        return self.pos >> 3


_BLOCKSIZE = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
              8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
              13: 8192, 14: 16384, 15: 32768}
_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
          7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000}
_BPS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
# FIXED predictor coefficients by order (RFC 9639 §9.2.1)
_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _coded_number(bits: _Bits) -> int:
    """The UTF-8-like frame/sample number coding (1-7 bytes, ≤36 bits)."""
    b0 = bits.u(8)
    if b0 < 0x80:
        return b0
    lead = 0
    m = 0x80
    while b0 & m:
        lead += 1
        m >>= 1
    if lead < 2 or lead > 7:
        raise ValueError("invalid FLAC coded number")
    v = b0 & (0xFF >> (lead + 1))
    for _ in range(lead - 1):
        c = bits.u(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.u(2)
    if method > 1:
        raise ValueError(f"reserved FLAC residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = bits.u(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("FLAC partition count does not divide blocksize")
    if (blocksize >> porder) < order:
        # the first partition holds (blocksize>>porder) - order samples
        raise ValueError("FLAC predictor order exceeds first partition")
    out = []
    for p in range(nparts):
        n = blocksize >> porder
        if p == 0:
            n -= order
        param = bits.u(pbits)
        if param == escape:
            width = bits.u(5)
            for _ in range(n):
                out.append(bits.s(width) if width else 0)
        else:
            for _ in range(n):
                q = bits.unary()
                v = (q << param) | bits.u(param)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.u(1):
        raise ValueError("nonzero FLAC subframe padding bit")
    code = bits.u(6)
    wasted = 0
    if bits.u(1):
        wasted = bits.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC wasted bits exceed sample size")
    if code == 0:  # CONSTANT
        v = bits.s(eff)
        out = [v] * blocksize
    elif code == 1:  # VERBATIM
        out = [bits.s(eff) for _ in range(blocksize)]
    elif 8 <= code <= 12:  # FIXED, order 0-4
        order = code & 7
        if order > blocksize:
            raise ValueError("FLAC fixed order exceeds blocksize")
        out = [bits.s(eff) for _ in range(order)]
        res = _residual(bits, blocksize, order)
        coef = _FIXED[order]
        for r in res:
            pred = 0
            for j, c in enumerate(coef):
                pred += c * out[-1 - j]
            out.append(r + pred)
    elif code >= 32:  # LPC, order 1-32
        order = (code & 31) + 1
        if order > blocksize:
            raise ValueError("FLAC LPC order exceeds blocksize")
        out = [bits.s(eff) for _ in range(order)]
        prec = bits.u(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC precision code")
        prec += 1
        shift = bits.s(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [bits.s(prec) for _ in range(order)]
        res = _residual(bits, blocksize, order)
        for r in res:
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * out[-1 - j]
            out.append(r + (acc >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {code:#08b}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(content: bytes) -> FlacAudio:
    """Decode a native FLAC stream; verifies every frame-header CRC-8,
    every frame CRC-16, and (when present) the STREAMINFO MD5 of the
    decoded samples."""
    if len(content) < 42 or content[:4] != b"fLaC":
        raise ValueError("not a FLAC stream: missing fLaC magic")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(content):
            raise ValueError("truncated FLAC metadata")
        hdr = content[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        blen = int.from_bytes(content[pos + 1 : pos + 4], "big")
        body = content[pos + 4 : pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("truncated FLAC metadata block")
        if btype == 0:
            if blen != 34:
                raise ValueError("bad STREAMINFO length")
            streaminfo = body
        elif btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("FLAC stream without STREAMINFO")
    si = _Bits(streaminfo)
    si.u(16)  # min blocksize
    si.u(16)  # max blocksize
    si.u(24)  # min framesize
    si.u(24)  # max framesize
    rate = si.u(20)
    nch = si.u(3) + 1
    bps = si.u(5) + 1
    total = si.u(36)
    md5 = streaminfo[18:34]
    if rate == 0:
        raise ValueError("FLAC sample rate 0")

    channels: list[list[int]] = [[] for _ in range(nch)]
    while pos < len(content):
        frame_start = pos
        bits = _Bits(content, pos)
        sync = bits.u(14)
        if sync != 0x3FFE:
            raise ValueError(f"bad FLAC frame sync at byte {pos}")
        if bits.u(1):
            raise ValueError("nonzero FLAC frame reserved bit")
        bits.u(1)  # blocking strategy
        bs_code = bits.u(4)
        sr_code = bits.u(4)
        ch_code = bits.u(4)
        ss_code = bits.u(3)
        if bits.u(1):
            raise ValueError("nonzero FLAC frame reserved bit 2")
        _coded_number(bits)
        if bs_code == 0:
            raise ValueError("reserved FLAC blocksize code 0")
        elif bs_code == 6:
            blocksize = bits.u(8) + 1
        elif bs_code == 7:
            blocksize = bits.u(16) + 1
        else:
            blocksize = _BLOCKSIZE[bs_code]
        if sr_code == 12:
            bits.u(8)
        elif sr_code in (13, 14):
            bits.u(16)
        elif sr_code == 15:
            raise ValueError("invalid FLAC sample-rate code 15")
        crc8 = bits.u(8)
        hdr_end = bits.byte_pos if bits.pos % 8 == 0 else None
        # header is byte-aligned by construction (14+1+1+4+4+4+3+1 = 32
        # bits + whole-byte fields), so byte_pos is exact
        if hdr_end is None:
            raise ValueError("FLAC frame header not byte-aligned")
        if _crc8(content[frame_start : hdr_end - 1]) != crc8:
            raise ValueError("FLAC frame header CRC-8 mismatch")
        # semantic header checks AFTER the CRC: a corrupted header should
        # report as corruption, not as a spurious format violation
        if ss_code == 0:
            fbps = bps
        elif ss_code == 3:
            raise ValueError("reserved FLAC sample-size code 3")
        else:
            fbps = _BPS[ss_code]
        if fbps != bps:
            raise ValueError("frame sample size != STREAMINFO")

        if ch_code < 8:
            fch = ch_code + 1
            if fch != nch:
                raise ValueError("frame channel count != STREAMINFO")
            subs = [
                _subframe(bits, blocksize, bps) for _ in range(fch)
            ]
        elif ch_code in (8, 9, 10):
            if nch != 2:
                raise ValueError("stereo decorrelation in non-stereo stream")
            # the SIDE channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _subframe(bits, blocksize, bps)
                side = _subframe(bits, blocksize, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # side/right
                side = _subframe(bits, blocksize, bps + 1)
                right = _subframe(bits, blocksize, bps)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _subframe(bits, blocksize, bps)
                side = _subframe(bits, blocksize, bps + 1)
                lr = []
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    lr.append(((m + s) >> 1, (m - s) >> 1))
                subs = [[p[0] for p in lr], [p[1] for p in lr]]
        else:
            raise ValueError(f"reserved FLAC channel assignment {ch_code}")

        bits.align()
        crc16 = bits.u(16)
        end = bits.byte_pos
        if _crc16(content[frame_start : end - 2]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        for c in range(nch):
            channels[c].extend(subs[c])
        pos = end

    n = len(channels[0])
    if total and n < total:
        raise ValueError(f"truncated FLAC stream: {n}/{total} samples")
    if total:
        channels = [ch[:total] for ch in channels]
        n = total

    # MD5 self-check over interleaved little-endian signed samples
    if md5 != b"\x00" * 16:
        nbytes = (bps + 7) // 8
        buf = bytearray()
        for i in range(n):
            for c in range(nch):
                buf += int(channels[c][i]).to_bytes(
                    nbytes, "little", signed=True
                )
        if hashlib.md5(bytes(buf)).digest() != md5:
            raise ValueError("FLAC MD5 mismatch: decoded samples corrupt")

    arr = np.array(channels, dtype=np.float64).T / float(1 << (bps - 1))
    return FlacAudio(rate, nch, bps, arr)


class _BitsW:
    """MSB-first bit writer (encoder side)."""

    __slots__ = ("acc", "n", "out")

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def u(self, v: int, n: int) -> None:
        acc, nb = self.acc, self.n
        for i in range(n - 1, -1, -1):
            acc = (acc << 1) | ((v >> i) & 1)
            nb += 1
            if nb == 8:
                self.out.append(acc)
                acc, nb = 0, 0
        self.acc, self.n = acc, nb

    def s(self, v: int, n: int) -> None:
        self.u(v & ((1 << n) - 1), n)

    def align(self) -> None:
        while self.n:
            self.u(0, 1)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


def _write_coded_number(bw: _BitsW, v: int) -> None:
    """The UTF-8-like frame-number coding (inverse of _coded_number)."""
    if v < 0x80:
        bw.u(v, 8)
        return
    # find the smallest n-byte form (2-7 bytes, 6 payload bits per tail)
    for nbytes in range(2, 8):
        if v < (1 << (5 * nbytes + 1)) or nbytes == 7:
            break
    lead_bits = 7 - nbytes
    tail = [(v >> (6 * i)) & 0x3F for i in range(nbytes - 1)][::-1]
    head = v >> (6 * (nbytes - 1))
    bw.u((0xFF << (lead_bits + 1)) & 0xFF | head, 8)
    for t in tail:
        bw.u(0x80 | t, 8)


def encode_flac(samples, sample_rate: int, bps: int = 16) -> bytes:
    """Minimal native-FLAC writer: VERBATIM subframes (no prediction —
    the lossless-container use this engine needs for fixture/sink
    round-trips, not a compressor), independent channels, 4096-sample
    frames, full CRC-8/CRC-16/STREAMINFO-MD5 so decode_flac's
    self-verification passes. ``samples``: (n_frames, n_channels) int
    array (or 1-D mono) of signed values fitting ``bps`` bits."""
    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, nch = arr.shape
    if not (1 <= nch <= 8):
        raise ValueError("1-8 channels")
    if n == 0:
        raise ValueError("empty FLAC input")
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if arr.min() < lo or arr.max() > hi:
        raise ValueError(f"samples out of range for {bps}-bit FLAC")
    ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}.get(bps)
    if ss_code is None:
        raise ValueError(f"unsupported bits-per-sample {bps}")

    block = 4096
    nbytes = (bps + 7) // 8
    md5 = hashlib.md5()
    md5.update(
        b"".join(
            int(v).to_bytes(nbytes, "little", signed=True)
            for row in arr for v in row
        )
    )
    # RFC 9639 §8.2: STREAMINFO min/max block size must be >= 16. The
    # LAST frame is allowed to be shorter than the declared minimum, so
    # for inputs under 16 samples we still declare 16 and write the one
    # short frame (ADVICE r11: declaring min(4096, n) < 16 produced a
    # technically non-conforming stream strict decoders may reject).
    decl_block = max(16, min(block, n))
    si = _BitsW()
    si.u(decl_block, 16)
    si.u(decl_block, 16)
    si.u(0, 24)
    si.u(0, 24)
    si.u(sample_rate, 20)
    si.u(nch - 1, 3)
    si.u(bps - 1, 5)
    si.u(n, 36)
    info = si.bytes() + md5.digest()
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info

    for fno, start in enumerate(range(0, n, block)):
        blk = arr[start : start + block]
        bs = blk.shape[0]
        hw = _BitsW()
        hw.u(0x3FFE, 14)  # sync
        hw.u(0, 1)  # reserved
        hw.u(0, 1)  # fixed blocking
        hw.u(7, 4)  # blocksize: 16-bit value follows
        hw.u(0, 4)  # sample rate: from STREAMINFO
        hw.u(nch - 1, 4)  # independent channels
        hw.u(ss_code, 3)
        hw.u(0, 1)  # reserved
        _write_coded_number(hw, fno)
        hw.u(bs - 1, 16)
        hdr = hw.bytes()
        hdr += bytes([_crc8(hdr)])
        bw = _BitsW()
        for c in range(nch):
            bw.u(0, 1)  # padding
            bw.u(1, 6)  # VERBATIM
            bw.u(0, 1)  # no wasted bits
            for v in blk[:, c]:
                bw.s(int(v), bps)
        bw.align()
        frame = hdr + bw.bytes()
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)
