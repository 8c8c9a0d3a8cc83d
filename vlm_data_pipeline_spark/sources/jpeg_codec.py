"""Minimal pure-Python baseline JPEG decoder (S8 decode path).

JPEG is a public spec (ITU-T T.81 / ISO 10918-1): marker segments, DQT
quantization tables, DHT canonical Huffman tables, SOF0 geometry, one
interleaved entropy-coded scan of 8×8 DCT blocks. The subset here —
baseline + extended-sequential Huffman (SOF0/SOF1) and progressive
Huffman (SOF2, spectral selection + successive approximation, T.81
Annex G), 8-bit samples, grayscale and 3-component YCbCr with any
integer sampling factors (4:4:4, 4:2:2, 4:2:0), restart markers — is
the dominant VLM-corpus format (the reference reads .jpg throughout,
e.g. sunrgbd_processor.py:195-215), using only stdlib ``struct`` +
numpy. 12-bit samples (SOF1/SOF2) decode natively and convert to the
8-bit row contract with round(v*255/4095). Lossless sequential (SOF3,
T.81 Annex H — the DNG/medical profile) decodes natively at 2-16 bit
precision: per-sample Huffman-coded differences against the seven
Annex-H predictors, modulo-2^16 reconstruction, point transform,
SSSS=16 special case; see _decode_lossless_scan for its documented
seams (no restarts, 1x1 sampling only). Hierarchical mode (T.81 Annex
J) decodes the NON-EXPANSIVE lossless refinement profile natively —
DHP + an SOF3 first frame + SOF7 differential correction frames at the
same resolution (the "lossy-capable base + lossless correction" shape
medical/DNG profiles actually use): each SOF7 sample is a Huffman-coded
correction added to the reference modulo 2^16, Ss=0 (no predictor).
EXP resolution expansion (J.8 interpolation), differential DCT frames
(SOF5/6), and arithmetic coding remain capability gaps →
NotImplementedError (inject Pillow/cv2) — arithmetic needs T.81 Table
D.3's exact 113-row state machine, which cannot be responsibly
reproduced from memory (a self-consistent wrong table would round-trip
tests yet silently mis-decode real files). Corrupt data → ValueError
(the robust skip policy), same contract as png_codec/bmp_codec.

Progressive design: each SOS scan deposits quantized coefficients into
per-component int32 arrays (zigzag order) — interleaved-MCU traversal
for multi-component DC scans, the component's own ceil(dim/8) raster
for single-component scans, EOBRUN + correction-bit refinement per
G.1.2.2/G.1.2.3 — and reconstruction (dequantize → IDCT → upsample →
color convert) happens once at EOI via the same vectorized tail the
baseline path uses. Since baseline and progressive transmit the SAME
quantized coefficients, a progressive re-encoding decodes
bit-identically to its baseline sibling (pinned in
tests/test_jpeg_codec.py::test_progressive_matches_baseline_*).

Output matches the shared rows-of-channel-ints codec contract
(``multimodal._decode_pixels``): top-down rows, 8-bit samples, RGB for
color / single channel for grayscale — so every pixel consumer (luma
stats, aHash/pHash) is codec-agnostic, pinned by the
same-pixels-same-hash tests in tests/test_jpeg_codec.py.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "JpegImage"]

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# IDCT basis: spatial = A.T @ coeffs @ A, A[u, x] = c_u/2 · cos((2x+1)uπ/16)
_A = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class JpegImage:
    __slots__ = ("width", "height", "bit_depth", "channels", "rows")

    def __init__(self, width, height, bit_depth, channels, rows):
        self.width = width
        self.height = height
        self.bit_depth = bit_depth
        self.channels = channels
        # rows: list[list[int]] — each row is width*channels channel values
        self.rows = rows

    def pixel(self, x: int, y: int) -> tuple[int, ...]:
        c = self.channels
        row = self.rows[y]
        return tuple(row[x * c : (x + 1) * c])


class _Huff:
    """Canonical Huffman table: (code_length, code) → symbol."""

    __slots__ = ("lut", "max_len")

    def __init__(self, counts: list[int], symbols: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        self.max_len = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                if k >= len(symbols):
                    raise ValueError("DHT symbol count mismatch")
                self.lut[(length, code)] = symbols[k]
                self.max_len = length
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first reader over an UNSTUFFED entropy segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("entropy data exhausted mid-block")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _Huff) -> int:
        length = 0
        code = 0
        while length < table.max_len:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t received bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _split_entropy(buf: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from ``start``: unstuff 0xFF00, split on RSTn,
    stop at any other marker. Returns (segments, next_marker_offset)."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(buf)
    while i < n:
        b = buf[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = buf[i + 1]
        if m == 0x00:  # stuffed literal FF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # restart marker: segment boundary
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif m == 0xFF:  # fill byte
            i += 1
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def _decode_block(
    r: _BitReader,
    dc_tab: _Huff,
    ac_tab: _Huff,
    qt: np.ndarray,
    pred: int,
) -> tuple[np.ndarray, int]:
    """One 8×8 block: DC diff + RLE AC coefficients → dequantized,
    de-zigzagged spatial samples (pre-level-shift)."""
    t = r.decode(dc_tab)
    diff = _extend(r.receive(t), t)
    dc = pred + diff
    coeffs = np.zeros(64, dtype=np.float64)
    coeffs[0] = dc * qt[0]
    k = 1
    while k < 64:
        rs = r.decode(ac_tab)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        coeffs[k] = _extend(r.receive(size), size) * qt[k]
        k += 1
    block = np.zeros((8, 8), dtype=np.float64)
    block.flat[ZIGZAG] = coeffs  # de-zigzag
    return _A.T @ block @ _A, dc


class _ProgState:
    """Quantized-coefficient accumulator for a progressive (SOF2) frame.

    Every scan deposits bits into per-component int32 arrays in ZIGZAG
    order; nothing is dequantized until ``reconstruct`` at EOI, so scan
    order / spectral banding / successive approximation all compose the
    way T.81 Annex G specifies. Multi-component (necessarily DC) scans
    traverse the MCU grid like a baseline scan; single-component scans
    traverse the component's own ceil(dim/8) raster — the MCU-padding
    blocks exist only in the interleaved grid, so the arrays are
    allocated at the padded size and non-interleaved scans write the
    top-left sub-grid.
    """

    __slots__ = (
        "frame", "max_h", "max_v", "mcus_x", "mcus_y",
        "by_id", "coefs", "dims", "any_scan", "seen", "prec",
    )

    def __init__(self, frame):
        height, width, comps, self.prec = frame
        self.frame = frame
        self.max_h = max(c[1] for c in comps)
        self.max_v = max(c[2] for c in comps)
        self.mcus_x = -(-width // (8 * self.max_h))
        self.mcus_y = -(-height // (8 * self.max_v))
        self.by_id = {c[0]: c for c in comps}
        self.coefs: dict[int, np.ndarray] = {}
        self.dims: dict[int, tuple[int, int]] = {}
        for cid, ch, cv, _tq in comps:
            self.coefs[cid] = np.zeros(
                (self.mcus_y * cv, self.mcus_x * ch, 64), dtype=np.int32
            )
            comp_w = -(-width * ch // self.max_h)
            comp_h = -(-height * cv // self.max_v)
            self.dims[cid] = (-(-comp_h // 8), -(-comp_w // 8))
        # Per-component bitmap of coefficient indices covered by a FIRST
        # (Ah=0) scan. A refinement scan (Ah>0) arriving before its first
        # scan would deposit correction bits onto never-initialized
        # coefficients — silently wrong pixels — so it must raise
        # ValueError like every other corruption class (robust-skip
        # contract).
        self.seen = {c[0]: bytearray(64) for c in comps}
        self.any_scan = False

    def decode_scan(self, scan, ss, se, ah, al, htables, restart_interval, segs):
        if not (0 <= ss <= se <= 63) or al > 13 or ah > 14:
            raise ValueError("bad progressive scan parameters")
        for cs, _td, _ta in scan:
            if cs not in self.by_id:
                raise ValueError("scan references unknown component")
        if ah > 0:
            for cs, _td, _ta in scan:
                if not all(self.seen[cs][ss:se + 1]):
                    raise ValueError(
                        "progressive refinement scan precedes first scan "
                        f"for component {cs} band {ss}..{se}"
                    )
        if ss == 0:
            if se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            self._dc_scan(scan, ah, al, htables, restart_interval, segs)
        else:
            if len(scan) != 1:
                raise ValueError(
                    "progressive AC scan must be single-component"
                )
            self._ac_scan(
                scan[0], ss, se, ah, al, htables, restart_interval, segs
            )
        if ah == 0:
            for cs, _td, _ta in scan:
                for k in range(ss, se + 1):
                    self.seen[cs][k] = 1
        self.any_scan = True

    # -- DC scans (interleaved or single-component) --------------------

    def _dc_scan(self, scan, ah, al, htables, restart_interval, segs):
        first = ah == 0
        tabs = {}
        for cs, td, _ta in scan:
            if first:
                if (0, td) not in htables:
                    raise ValueError("missing DC Huffman table")
                tabs[cs] = htables[(0, td)]
        preds = {cs: 0 for cs, _, _ in scan}
        interleaved = len(scan) > 1
        if interleaved:
            units = self.mcus_x * self.mcus_y
        else:
            bh, bw = self.dims[scan[0][0]]
            units = bh * bw
        reader = _BitReader(segs[0])
        seg_idx = 0
        for u in range(units):
            if restart_interval and u > 0 and u % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError("missing restart segment")
                reader = _BitReader(segs[seg_idx])
                preds = {cs: 0 for cs, _, _ in scan}
            if interleaved:
                my, mx = divmod(u, self.mcus_x)
                for cs, _td, _ta in scan:
                    _cid, ch, cv, _tq = self.by_id[cs]
                    coef = self.coefs[cs]
                    for by in range(cv):
                        for bx in range(ch):
                            self._dc_unit(
                                coef, my * cv + by, mx * ch + bx,
                                reader, tabs.get(cs), preds, cs, first, al,
                                self.prec,
                            )
            else:
                cs = scan[0][0]
                _bh, bw = self.dims[cs]
                by, bx = divmod(u, bw)
                self._dc_unit(
                    self.coefs[cs], by, bx,
                    reader, tabs.get(cs), preds, cs, first, al, self.prec,
                )

    @staticmethod
    def _dc_unit(coef, by, bx, reader, tab, preds, cs, first, al, prec):
        if first:
            t = reader.decode(tab)
            # DC categories: 0..11 at 8-bit, 0..15 at 12-bit (F.1.2.1.1)
            if t > (11 if prec == 8 else 15):
                raise ValueError("DC magnitude category out of range")
            preds[cs] += _extend(reader.receive(t), t)
            v = preds[cs] << al  # arithmetic point transform
            if not -(1 << 31) <= v < (1 << 31):
                # only reachable on corrupt data: a legal stream keeps
                # DC within 12(+Al) bits; don't overflow the int32 store
                raise ValueError("DC predictor out of range")
            coef[by, bx, 0] = v
        elif reader.read_bit():
            coef[by, bx, 0] |= 1 << al  # two's-complement OR per G.1.2.1

    # -- AC scans (always single-component) ----------------------------

    def _ac_scan(self, comp, ss, se, ah, al, htables, restart_interval, segs):
        cs, _td, ta = comp
        if (1, ta) not in htables:
            raise ValueError("missing AC Huffman table")
        tab = htables[(1, ta)]
        coef = self.coefs[cs]
        bh, bw = self.dims[cs]
        reader = _BitReader(segs[0])
        seg_idx = 0
        eobrun = 0
        for u in range(bh * bw):
            if restart_interval and u > 0 and u % restart_interval == 0:
                seg_idx += 1
                if seg_idx >= len(segs):
                    raise ValueError("missing restart segment")
                reader = _BitReader(segs[seg_idx])
                eobrun = 0
            by, bx = divmod(u, bw)
            blk = coef[by, bx]
            if ah == 0:
                eobrun = self._ac_first(blk, ss, se, al, tab, reader, eobrun)
            else:
                eobrun = self._ac_refine(blk, ss, se, al, tab, reader, eobrun)

    @staticmethod
    def _ac_first(blk, ss, se, al, tab, reader, eobrun):
        """G.1.2.2: first AC scan of a band — RLE + EOBRUN, magnitudes
        arrive pre-shifted by the sign-magnitude point transform."""
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = reader.decode(tab)
            run, size = rs >> 4, rs & 0x0F
            if size == 0:
                if run < 15:  # EOBn: run of (1<<run)+ext end-of-band blocks
                    eobrun = (1 << run) - 1
                    if run:
                        eobrun += reader.receive(run)
                    break
                k += 16  # ZRL
                continue
            k += run
            if k > se:
                raise ValueError("AC run past end of spectral band")
            blk[k] = _extend(reader.receive(size), size) << al
            k += 1
        return eobrun

    @staticmethod
    def _ac_refine(blk, ss, se, al, tab, reader, eobrun):
        """G.1.2.3: refinement AC scan — newly-significant coefficients
        carry a sign bit; already-nonzero coefficients consume one
        correction bit each as the run advances across them."""
        p1 = 1 << al
        m1 = -1 << al
        k = ss
        if eobrun == 0:
            while k <= se:
                rs = reader.decode(tab)
                run, size = rs >> 4, rs & 0x0F
                newval = 0
                if size != 0:
                    if size != 1:
                        raise ValueError(
                            "invalid refinement magnitude category"
                        )
                    newval = p1 if reader.read_bit() else m1
                elif run != 15:
                    eobrun = 1 << run  # includes the current block
                    if run:
                        eobrun += reader.receive(run)
                    break
                # advance over `run` zero-history coefficients, applying
                # correction bits to already-nonzero ones along the way
                while k <= se:
                    if blk[k] != 0:
                        if reader.read_bit() and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] > 0 else m1
                    else:
                        if run == 0:
                            break
                        run -= 1
                    k += 1
                if newval != 0:
                    if k > se:
                        raise ValueError("refinement run past end of band")
                    blk[k] = newval
                k += 1
        if eobrun > 0:
            while k <= se:  # correction bits only, to end of band
                if blk[k] != 0 and reader.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
                k += 1
            eobrun -= 1
        return eobrun

    # -- final reconstruction at EOI ------------------------------------

    def reconstruct(self, qtables) -> JpegImage:
        height, width, comps, prec = self.frame
        full = []
        for cid, ch, cv, tq in comps:
            if tq not in qtables:
                raise ValueError("missing quantization table")
            if self.max_v % cv or self.max_h % ch:
                raise NotImplementedError(
                    f"non-integer chroma subsampling ratio ({ch}x{cv} vs "
                    f"{self.max_h}x{self.max_v} max)"
                )
            qt = qtables[tq]
            deq = self.coefs[cid].astype(np.float64) * qt[None, None, :]
            bh, bw = deq.shape[:2]
            nat = np.zeros((bh, bw, 64), dtype=np.float64)
            nat[:, :, ZIGZAG] = deq  # de-zigzag
            # same dgemm per 8x8 block as the baseline path → the same
            # quantized coefficients decode bit-identically either way
            spatial = _A.T @ nat.reshape(bh, bw, 8, 8) @ _A
            plane = (
                spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
                + float(1 << (prec - 1))
            )
            plane = np.repeat(
                np.repeat(plane, self.max_v // cv, axis=0),
                self.max_h // ch, axis=1,
            )
            full.append(plane[:height, :width])
        return _planes_to_image(full, width, height, prec)


def decode_jpeg(content: bytes) -> JpegImage:
    """Decode a baseline or progressive JFIF/EXIF JPEG to 8-bit channel
    rows (RGB or grayscale)."""
    if len(content) < 4 or content[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _Huff] = {}  # (class, id)
    restart_interval = 0
    frame = None  # (height, width, comps) comps: (id, h, v, tq)
    progressive = False
    lossless = False
    differential = False
    hier = None  # (height, width, ncomp, prec) from DHP — hierarchical mode
    hier_planes = None  # output-domain component planes across frames
    prog: _ProgState | None = None
    i = 2
    n = len(content)
    while i < n:
        if content[i] != 0xFF:
            raise ValueError(f"expected marker at {i}")
        marker = content[i + 1] if i + 1 < n else None
        if marker is None:
            raise ValueError("truncated marker")
        if marker == 0xD9:  # EOI
            if hier is not None:
                if hier_planes is None:
                    raise ValueError("hierarchical JPEG with no decoded frame")
                hh, hw, _hn, hp = hier
                return _planes_to_image8(hier_planes, hw, hh, hp)
            if prog is not None and prog.any_scan:
                return prog.reconstruct(qtables)
            raise ValueError("EOI before SOS: no image data")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            raise ValueError("truncated segment header")
        seglen = struct.unpack(">H", content[i + 2 : i + 4])[0]
        if seglen < 2 or i + 2 + seglen > n:
            raise ValueError("bad segment length")
        body = content[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                p += 1
                if pq == 0:
                    vals = list(body[p : p + 64])
                    p += 64
                else:
                    vals = [
                        struct.unpack(">H", body[p + 2 * j : p + 2 * j + 2])[0]
                        for j in range(64)
                    ]
                    p += 128
                if len(vals) != 64:
                    raise ValueError("truncated DQT")
                qtables[tq] = np.array(vals, dtype=np.float64)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                counts = list(body[p + 1 : p + 17])
                if len(counts) != 16:
                    raise ValueError("truncated DHT")
                total = sum(counts)
                syms = body[p + 17 : p + 17 + total]
                if len(syms) != total:
                    raise ValueError("truncated DHT symbols")
                htables[(tc, th)] = _Huff(counts, syms)
                p += 17 + total
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec = body[0]
            if prec == 12 and marker == 0xC0:
                # T.81: baseline (SOF0) is defined for 8-bit only
                raise ValueError("12-bit precision is illegal in SOF0")
            if prec not in (8, 12):
                raise NotImplementedError(
                    "only 8- and 12-bit JPEG samples supported"
                )
            h, w = struct.unpack(">HH", body[1:5])
            if h == 0 or w == 0:
                raise ValueError("zero image dimension")
            nc = body[5]
            if nc not in (1, 3):
                raise NotImplementedError(
                    "only grayscale/YCbCr JPEG supported (CMYK needs an "
                    "injected decoder)"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
                if (hv >> 4) == 0 or (hv & 0x0F) == 0:
                    raise ValueError("zero sampling factor")
            if hier is not None:
                raise NotImplementedError(
                    "DCT frames inside hierarchical mode not supported — "
                    "lossless refinement profile (SOF3 + SOF7) only"
                )
            frame = (h, w, comps, prec)
            progressive = marker == 0xC2
            if progressive:
                prog = _ProgState(frame)
        elif marker == 0xC3:  # SOF3 lossless sequential Huffman (Annex H)
            prec = body[0]
            if not (2 <= prec <= 16):
                raise ValueError(f"illegal lossless precision {prec}")
            h, w = struct.unpack(">HH", body[1:5])
            if h == 0 or w == 0:
                raise ValueError("zero image dimension")
            nc = body[5]
            if nc not in (1, 3):
                raise NotImplementedError(
                    "only 1- and 3-component lossless JPEG supported"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
                if (hv >> 4) == 0 or (hv & 0x0F) == 0:
                    raise ValueError("zero sampling factor")
            frame = (h, w, comps, prec)
            lossless = True
            differential = False
        elif marker == 0xC7:  # SOF7 differential lossless (Annex J frame)
            if hier is None:
                raise ValueError("differential frame (SOF7) outside DHP")
            if hier_planes is None:
                raise ValueError("differential frame with no reference")
            prec = body[0]
            if prec != hier[3]:
                raise ValueError("differential frame precision != DHP")
            h, w = struct.unpack(">HH", body[1:5])
            if (h, w) != (hier[0], hier[1]):
                raise NotImplementedError(
                    "resolution change between hierarchical frames "
                    "(needs EXP upsampling) not supported"
                )
            nc = body[5]
            if nc != hier[2]:
                raise ValueError("differential frame component count != DHP")
            comps = []
            for c in range(nc):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
                if hv != 0x11:
                    raise NotImplementedError(
                        "subsampled hierarchical lossless not supported"
                    )
            frame = (h, w, comps, prec)
            lossless = True
            differential = True
        elif marker in (0xC5, 0xC6, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "arithmetic JPEG and differential DCT frames need an "
                "injected decoder (Pillow/cv2); Huffman sequential + "
                "progressive + lossless (SOF3) + hierarchical lossless "
                "refinement (DHP/SOF7) only"
            )
        elif marker == 0xDE:  # DHP — hierarchical mode (T.81 Annex J)
            prec = body[0]
            if not (2 <= prec <= 16):
                raise ValueError(f"illegal DHP precision {prec}")
            h, w = struct.unpack(">HH", body[1:5])
            if h == 0 or w == 0:
                raise ValueError("zero image dimension in DHP")
            nc = body[5]
            if nc not in (1, 3):
                raise NotImplementedError(
                    "only 1- and 3-component hierarchical JPEG supported"
                )
            hier = (h, w, nc, prec)
        elif marker == 0xDF:  # EXP — reference expansion before a frame
            raise NotImplementedError(
                "EXP (hierarchical resolution expansion, J.8 interpolation)"
                " not supported — non-expansive refinement profile only"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[0:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if len(body) < 4 + 2 * ns:
                raise ValueError("truncated SOS header")
            scan = []
            for c in range(ns):
                cs, td_ta = body[1 + 2 * c : 3 + 2 * c]
                scan.append((cs, td_ta >> 4, td_ta & 0x0F))
            segs, nxt = _split_entropy(content, i + 2 + seglen)
            if lossless:
                ss = body[1 + 2 * ns]  # predictor selector (H.1.2.1)
                pt = body[3 + 2 * ns] & 0x0F  # Al = point transform
                if body[3 + 2 * ns] >> 4:  # Ah must be 0 in lossless
                    raise ValueError(
                        "nonzero Ah in lossless SOS (T.81 H.1: "
                        "successive approximation is DCT-only)"
                    )
                if hier is None:
                    return _decode_lossless_scan(
                        frame, scan, htables, restart_interval, segs, ss, pt
                    )
                # hierarchical: accumulate this frame, keep parsing
                if differential:
                    if pt != 0:
                        raise NotImplementedError(
                            "nonzero point transform in a differential "
                            "lossless frame not supported"
                        )
                    hier_planes = _lossless_scan_planes(
                        frame, scan, htables, restart_interval, segs,
                        ss, pt, ref=hier_planes,
                    )
                else:
                    if hier_planes is not None:
                        raise ValueError(
                            "second non-differential frame in "
                            "hierarchical mode"
                        )
                    if (frame[0], frame[1]) != (hier[0], hier[1]):
                        raise NotImplementedError(
                            "first hierarchical frame smaller than DHP "
                            "(needs EXP upsampling) not supported"
                        )
                    rx = _lossless_scan_planes(
                        frame, scan, htables, restart_interval, segs, ss, pt
                    )
                    hier_planes = [
                        [[v << pt for v in row] for row in p] for p in rx
                    ]  # output domain: Rx * 2^Pt (H.2)
                i = nxt
                continue
            if not progressive:
                return _decode_scan(
                    frame, scan, qtables, htables, restart_interval, segs
                )
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahl = body[3 + 2 * ns]
            prog.decode_scan(
                scan, ss, se, ahl >> 4, ahl & 0x0F,
                htables, restart_interval, segs,
            )
            i = nxt
            continue
        i += 2 + seglen
    if prog is not None and prog.any_scan:
        # missing EOI but scans decoded: tolerate (browsers do), data is whole
        return prog.reconstruct(qtables)
    raise ValueError("no SOS marker: truncated JPEG")


def _decode_lossless_scan(
    frame, scan, htables, restart_interval, segs, sel: int, pt: int
) -> JpegImage:
    """One interleaved lossless (SOF3) scan per T.81 Annex H.

    Each sample codes a Huffman(SSSS) + extra-bits difference (the DC
    coefficient machinery, incl. the SSSS=16 → +32768-no-bits special
    case) against a prediction chosen by ``sel`` (Ss, 1-7). Boundary
    rules (H.1.2.2): the scan's first sample predicts 2^(P-Pt-1); the
    rest of the first line uses Ra; the first sample of every other
    line uses Rb. All reconstruction is modulo 2^16; decoder output is
    Rx·2^Pt (the point-transform inverse). Components are emitted as-is
    (no YCbCr transform: lossless JPEG carries no JFIF color model —
    DNG/medical payloads are raw component planes), then mapped to the
    codec-wide 8-bit rows contract with round(v·255/(2^P−1)).

    Capability seams (NotImplementedError, not corruption): restart
    intervals (H.1.2.2's mid-line prediction reset interacts with the
    first-line rule ambiguously enough that an offline implementation
    risks a self-consistent wrong reading) and sampling factors other
    than 1×1 (interleaved lossless MCUs with subsampling are absent
    from every DNG/medical profile this engine targets)."""
    height, width, _comps, prec = frame
    planes = _lossless_scan_planes(
        frame, scan, htables, restart_interval, segs, sel, pt
    )
    out = [
        [[v << pt for v in row] for row in p] for p in planes
    ]  # decoder output is Rx * 2^Pt (H.2)
    return _planes_to_image8(out, width, height, prec)


def _lossless_scan_planes(
    frame, scan, htables, restart_interval, segs, sel: int, pt: int, ref=None
):
    """Shared entropy+reconstruction core for lossless scans.

    ``ref is None``: a NON-differential scan (T.81 Annex H) — samples
    predict from neighbours per ``sel`` and the returned planes hold Rx
    (point-transformed domain, NOT yet shifted by 2^Pt).

    ``ref`` given (a list of per-component 2D int planes in the OUTPUT
    sample domain): a DIFFERENTIAL scan (SOF7, hierarchical mode, T.81
    Annex J) — there is no spatial predictor (Ss must be 0); each
    decoded value is a correction added to the reference sample modulo
    2^16, and the returned planes are output-domain samples."""
    height, width, comps, prec = frame
    by_id = {c[0]: c for c in comps}
    if len(scan) != len(comps):
        raise NotImplementedError(
            "multi-scan (non-interleaved) lossless JPEG not supported"
        )
    if ref is not None:
        if sel != 0:
            raise ValueError(
                f"differential lossless scan requires Ss=0, got {sel}"
            )
    elif not (1 <= sel <= 7):
        raise ValueError(f"illegal lossless predictor {sel}")
    if pt >= prec:
        raise ValueError(f"point transform {pt} >= precision {prec}")
    if restart_interval:
        raise NotImplementedError(
            "restart intervals in lossless JPEG not supported"
        )
    tabs = []
    for cs, td, _ta in scan:
        if cs not in by_id:
            raise ValueError("scan references unknown component")
        cid, ch, cv, _tq = by_id[cs]
        if ch != 1 or cv != 1:
            raise NotImplementedError(
                "subsampled lossless JPEG not supported (1x1 only)"
            )
        if (0, td) not in htables:
            raise ValueError("missing Huffman table")
        tabs.append(htables[(0, td)])
    if len(segs) > 1:
        # RSTn markers split the entropy stream; with DRI absent/zero
        # reading only segs[0] would silently drop everything after the
        # first RSTn — corrupt input, fail loudly (ADVICE r10).
        raise ValueError(
            "RST marker in lossless scan with no/zero restart interval"
        )
    reader = _BitReader(segs[0])
    ncomp = len(scan)
    planes = [[[0] * width for _ in range(height)] for _ in range(ncomp)]
    default = 1 << (prec - pt - 1)
    for y in range(height):
        for x in range(width):
            for c in range(ncomp):
                t = reader.decode(tabs[c])
                if t == 16:  # H.2: SSSS=16 → diff 32768, no extra bits
                    diff = 32768
                elif t > 16:
                    raise ValueError(f"illegal lossless SSSS {t}")
                else:
                    diff = _extend(reader.receive(t), t)
                p = planes[c]
                if ref is not None:
                    px = ref[c][y][x]  # Annex J: correction vs reference
                elif y == 0 and x == 0:
                    px = default
                elif y == 0:
                    px = p[0][x - 1]  # first line: Ra
                elif x == 0:
                    px = p[y - 1][0]  # first column: Rb
                else:
                    ra, rb, rc = p[y][x - 1], p[y - 1][x], p[y - 1][x - 1]
                    if sel == 1:
                        px = ra
                    elif sel == 2:
                        px = rb
                    elif sel == 3:
                        px = rc
                    elif sel == 4:
                        px = ra + rb - rc
                    elif sel == 5:
                        px = ra + ((rb - rc) >> 1)
                    elif sel == 6:
                        px = rb + ((ra - rc) >> 1)
                    else:
                        px = (ra + rb) >> 1
                p[y][x] = (px + diff) & 0xFFFF
    return planes


def _planes_to_image8(planes, width, height, prec) -> JpegImage:
    """Map OUTPUT-domain component planes (already 2^Pt-shifted) to the
    codec-wide 8-bit rows contract with round(v·255/(2^P−1))."""
    maxv = (1 << prec) - 1

    def to8(v: int) -> int:
        v = maxv if v > maxv else v
        return round(v * 255 / maxv) if prec != 8 else v

    if len(planes) == 1:
        rows = [[to8(v) for v in planes[0][y]] for y in range(height)]
        return JpegImage(width, height, 8, 1, rows)
    rows = [
        [
            to8(planes[c][y][x])
            for x in range(width)
            for c in range(3)
        ]
        for y in range(height)
    ]
    return JpegImage(width, height, 8, 3, rows)


def _decode_scan(frame, scan, qtables, htables, restart_interval, segs) -> JpegImage:
    height, width, comps, prec = frame
    by_id = {c[0]: c for c in comps}
    if len(scan) != len(comps):
        raise NotImplementedError(
            "multi-scan (non-interleaved) baseline JPEG not supported"
        )
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = -(-width // (8 * max_h))
    mcus_y = -(-height // (8 * max_v))
    planes: dict[int, np.ndarray] = {}
    meta = []  # (cid, h, v, qt, dc_tab, ac_tab)
    for cs, td, ta in scan:
        if cs not in by_id:
            raise ValueError("scan references unknown component")
        cid, ch, cv, tq = by_id[cs]
        if max_h % ch != 0 or max_v % cv != 0:
            # legal but exotic (e.g. 3x1 luma vs 2x1 chroma): np.repeat
            # upsampling below needs integer ratios — a capability gap,
            # not corruption, so surface it as the documented seam
            raise NotImplementedError(
                f"non-integer chroma subsampling ratio ({ch}x{cv} vs "
                f"{max_h}x{max_v} max)"
            )
        if tq not in qtables:
            raise ValueError("missing quantization table")
        if (0, td) not in htables or (1, ta) not in htables:
            raise ValueError("missing Huffman table")
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8), dtype=np.float64)
        meta.append((cid, ch, cv, qtables[tq], htables[(0, td)], htables[(1, ta)]))

    preds = {m[0]: 0 for m in meta}
    seg_idx = 0
    reader = _BitReader(segs[0])
    n_mcus = mcus_x * mcus_y
    for m_i in range(n_mcus):
        if restart_interval and m_i > 0 and m_i % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                raise ValueError("missing restart segment")
            reader = _BitReader(segs[seg_idx])
            preds = {m[0]: 0 for m in meta}
        my, mx = divmod(m_i, mcus_x)
        for cid, ch, cv, qt, dct, act in meta:
            plane = planes[cid]
            for by in range(cv):
                for bx in range(ch):
                    block, preds[cid] = _decode_block(
                        reader, dct, act, qt, preds[cid]
                    )
                    y0 = (my * cv + by) * 8
                    x0 = (mx * ch + bx) * 8
                    plane[y0 : y0 + 8, x0 : x0 + 8] = block

    # level shift, upsample to full geometry, crop
    full = []
    for cid, ch, cv, _, _, _ in meta:
        p = planes[cid] + float(1 << (prec - 1))
        p = np.repeat(np.repeat(p, max_v // cv, axis=0), max_h // ch, axis=1)
        full.append(p[:height, :width])
    return _planes_to_image(full, width, height, prec)


def _planes_to_image(
    full: list[np.ndarray], width: int, height: int, prec: int = 8
) -> JpegImage:
    """Shared tail: level-shifted full-geometry planes → rows contract.

    12-bit frames decode to their native [0, 4095] samples first (the
    value T.81 defines), then convert to the codec-wide 8-bit row
    contract with round(v * 255 / 4095) — a separate bit-depth
    conversion step, so the spec-defined sample is what gets rounded.
    """
    maxv = (1 << prec) - 1
    half = float(1 << (prec - 1))

    def to8(ch_: np.ndarray) -> np.ndarray:
        native = np.clip(np.round(ch_), 0, maxv)
        if prec == 8:
            return native
        return np.round(native * 255.0 / maxv)

    if len(full) == 1:
        out = to8(full[0]).astype(np.int64)
        return JpegImage(width, height, 8, 1, out.tolist())

    y, cb, cr = full
    r = y + 1.402 * (cr - half)
    g = y - 0.344136 * (cb - half) - 0.714136 * (cr - half)
    b = y + 1.772 * (cb - half)
    rgb = np.stack([to8(ch_) for ch_ in (r, g, b)], axis=2).astype(np.int64)
    rows = [rgb[j].reshape(-1).tolist() for j in range(height)]
    return JpegImage(width, height, 8, 3, rows)
