"""Baseline JPEG decoder: round-trips against a minimal test-side
encoder (T.81 forward path with unit quantization tables and custom
canonical Huffman tables), subsampling/restart/grayscale coverage,
malformed-input policy, and the codec-agnostic same-pixels-same-hash
contract vs PNG."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from vlm_data_pipeline_spark.sources.jpeg_codec import _A, decode_jpeg

# ---------------------------------------------------------------------------
# Minimal baseline encoder (test oracle). Unit quant tables keep coeff
# error ≤ 0.5, so decoded pixels sit within a couple of counts of the
# source — and EXACTLY on it for flat blocks (DC-only, integer DC).
# ---------------------------------------------------------------------------

ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# DC symbols 0..11 all at length 4; AC: EOB, ZRL and every (run, size)
# for size 1..11 at length 9 (178 symbols ≤ 2^9) — a valid (incomplete)
# canonical code the decoder must rebuild from DHT alone.
DC_COUNTS = [0, 0, 0, 12] + [0] * 12
DC_SYMS = bytes(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 12)
]
AC_COUNTS = [0] * 8 + [len(_AC_SYMS)] + [0] * 7
AC_SYMS = bytes(_AC_SYMS)


def _canonical_encode_map(counts, symbols):
    enc = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            enc[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return enc


DC_ENC = _canonical_encode_map(DC_COUNTS, DC_SYMS)
AC_ENC = _canonical_encode_map(AC_COUNTS, AC_SYMS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value, n):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self):
        while self.nbits:
            self.put(1, 1)  # pad with 1s per T.81
        return bytes(self.out)


def _cat(v):
    return 0 if v == 0 else abs(v).bit_length()


def _encode_block(bw, spatial, pred):
    coeffs = _A @ (spatial.astype(np.float64) - 128.0) @ _A.T
    q = np.round(coeffs).astype(np.int64)
    zz = [int(q.flat[ZZ[i]]) for i in range(64)]
    diff = zz[0] - pred
    t = _cat(diff)
    ln, code = DC_ENC[t]
    bw.put(code, ln)
    if t:
        bw.put(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            ln, code = AC_ENC[0xF0]
            bw.put(code, ln)
            run -= 16
        s = _cat(zz[k])
        ln, code = AC_ENC[(run << 4) | s]
        bw.put(code, ln)
        v = zz[k]
        bw.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ln, code = AC_ENC[0x00]
        bw.put(code, ln)
    return zz[0]


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _pad_to_blocks(plane, bh, bw_):
    h, w = plane.shape
    return np.pad(plane, ((0, bh - h), (0, bw_ - w)), mode="edge")


def _prep_planes(pixels, sampling):
    """Shared forward path: RGB→YCbCr, chroma downsample, MCU padding.
    Returns (h, w, padded planes, per-comp factors, max_h, max_v,
    mcus_x, mcus_y)."""
    px = np.asarray(pixels, dtype=np.float64)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px]
        factors = [(1, 1)]
    else:
        r, g, b = px[..., 0], px[..., 1], px[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        sh, sv = sampling
        if (sh, sv) != (1, 1):
            hh = -(-h // sv) * sv
            ww = -(-w // sh) * sh
            cb = _pad_to_blocks(cb, hh, ww).reshape(
                hh // sv, sv, ww // sh, sh
            ).mean(axis=(1, 3))
            cr = _pad_to_blocks(cr, hh, ww).reshape(
                hh // sv, sv, ww // sh, sh
            ).mean(axis=(1, 3))
        planes = [y, cb, cr]
        factors = [(sampling[0], sampling[1]), (1, 1), (1, 1)]
    max_h = max(f[0] for f in factors)
    max_v = max(f[1] for f in factors)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    padded = []
    for p, (fh, fv) in zip(planes, factors):
        padded.append(_pad_to_blocks(p, mcus_y * fv * 8, mcus_x * fh * 8))
    return h, w, padded, factors, max_h, max_v, mcus_x, mcus_y


def encode_jpeg(pixels, sampling=(1, 1), restart_interval=0):
    """pixels: (h, w) grayscale or (h, w, 3) RGB uint8; sampling applies
    to chroma (1,1)=4:4:4, (2,2)=4:2:0 via box-average downsample."""
    h, w, padded, factors, max_h, max_v, mcus_x, mcus_y = _prep_planes(
        pixels, sampling
    )
    ncomp = len(padded)
    gray = ncomp == 1

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # unit table, id 0
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        fh, fv = factors[ci]
        sof += bytes([ci + 1, (fh << 4) | fv, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_COUNTS) + DC_SYMS)
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_COUNTS) + AC_SYMS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    preds = [0] * ncomp
    entropy = bytearray()
    rst = 0
    for m_i in range(mcus_x * mcus_y):
        if restart_interval and m_i > 0 and m_i % restart_interval == 0:
            entropy += bw.flush()
            entropy += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
            preds = [0] * ncomp
        my, mx = divmod(m_i, mcus_x)
        for ci in range(ncomp):
            fh, fv = factors[ci]
            for by in range(fv):
                for bx in range(fh):
                    y0 = (my * fv + by) * 8
                    x0 = (mx * fh + bx) * 8
                    preds[ci] = _encode_block(
                        bw, padded[ci][y0 : y0 + 8, x0 : x0 + 8], preds[ci]
                    )
    entropy += bw.flush()
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive (SOF2) encoder: same quantized coefficients as the baseline
# encoder, transmitted as DC-first/DC-refine interleaved scans plus
# per-component spectral AC bands with one successive-approximation stage
# (Al=1 first pass, Ah=1/Al=0 refinement) — T.81 Annex G forward path.
# Because the coefficients are identical, decode(progressive) must equal
# decode(baseline) exactly.
# ---------------------------------------------------------------------------


def _zz_blocks(plane):
    """Quantized (unit table) zigzag coefficients for every 8x8 block."""
    bh, bw_ = plane.shape[0] // 8, plane.shape[1] // 8
    out = np.zeros((bh, bw_, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw_):
            sp = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            q = np.round(_A @ (sp - 128.0) @ _A.T).astype(np.int64)
            out[by, bx] = [q.flat[ZZ[i]] for i in range(64)]
    return out


def _emit_ac_first(bw, zz, ss, se, al):
    """One block of a first AC scan: sign-magnitude point transform,
    RLE with ZRL, EOB0 terminator."""
    vals = {
        k: (1 if zz[k] > 0 else -1) * (abs(int(zz[k])) >> al)
        for k in range(ss, se + 1)
    }
    run = 0
    for k in range(ss, se + 1):
        v = vals[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = AC_ENC[0xF0]
            bw.put(code, ln)
            run -= 16
        s = _cat(v)
        ln, code = AC_ENC[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run > 0:
        ln, code = AC_ENC[0x00]  # EOB0
        bw.put(code, ln)


def _emit_ac_refine(bw, zz, ss, se, ah, al):
    """One block of a refinement AC scan (jcphuff-style): newly
    significant coefficients emit (run,1)+sign, history coefficients
    buffer correction bits flushed after each symbol, trailing
    content folds into EOB0."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = 0  # index AFTER the last newly-significant coefficient
    for i, a in enumerate(absv):
        if a == 1:
            eob = i + 1
    run = 0
    pend: list[int] = []
    for i, a in enumerate(absv):
        if a == 0:
            run += 1
            continue
        while run > 15 and i < eob:
            ln, code = AC_ENC[0xF0]
            bw.put(code, ln)
            run -= 16
            for bit in pend:
                bw.put(bit, 1)
            pend = []
        if a > 1:  # already significant at Ah precision: correction bit
            pend.append(a & 1)
            continue
        # newly significant (a == 1)
        ln, code = AC_ENC[(run << 4) | 1]
        bw.put(code, ln)
        bw.put(1 if zz[ss + i] > 0 else 0, 1)
        for bit in pend:
            bw.put(bit, 1)
        pend = []
        run = 0
    if run > 0 or pend:
        ln, code = AC_ENC[0x00]  # EOB0
        bw.put(code, ln)
        for bit in pend:
            bw.put(bit, 1)


def encode_jpeg_progressive(
    pixels, sampling=(1, 1), refine=True, restart_interval=0
):
    """Progressive encoding of the SAME quantized coefficients the
    baseline encoder produces. refine=True adds a successive-
    approximation stage (Al=1 then Ah=1/Al=0); refine=False sends
    full-precision spectral bands (Al=0 only). restart_interval > 0
    emits RSTn every N MCUs (DC scans) / N blocks (AC scans) with
    predictor/EOBRUN state reset, per T.81 DRI semantics."""
    h, w, padded, factors, max_h, max_v, mcus_x, mcus_y = _prep_planes(
        pixels, sampling
    )
    ncomp = len(padded)
    zzs = [_zz_blocks(p) for p in padded]
    # per-component non-interleaved block dims (ceil of scaled dims / 8)
    nidims = []
    for fh, fv in factors:
        cw = -(-w * fh // max_h)
        chh = -(-h * fv // max_v)
        nidims.append((-(-chh // 8), -(-cw // 8)))

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        fh, fv = factors[ci]
        sof += bytes([ci + 1, (fh << 4) | fv, 0])
    out += _seg(0xC2, sof)  # SOF2
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_COUNTS) + DC_SYMS)
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_COUNTS) + AC_SYMS)

    def sos(comps, ss, se, ah, al):
        body = bytes([len(comps)])
        for ci in comps:
            body += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    al0 = 1 if refine else 0
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))

    class _SegWriter:
        """Flush + emit RSTn every `restart_interval` units; the caller
        resets its predictor state when next_unit returns True."""

        def __init__(self):
            self.bw = _BitWriter()
            self.rst = 0

        def next_unit(self, u):
            nonlocal out
            if restart_interval and u > 0 and u % restart_interval == 0:
                out += self.bw.flush()
                out += bytes([0xFF, 0xD0 + (self.rst % 8)])
                self.rst += 1
                self.bw = _BitWriter()
                return True
            return False

        def finish(self):
            nonlocal out
            out += self.bw.flush()

    # scan 1: DC first, interleaved, Al=al0
    out += sos(list(range(ncomp)), 0, 0, 0, al0)
    w = _SegWriter()
    preds = [0] * ncomp
    for m_i in range(mcus_x * mcus_y):
        if w.next_unit(m_i):
            preds = [0] * ncomp
        my, mx = divmod(m_i, mcus_x)
        for ci in range(ncomp):
            fh, fv = factors[ci]
            for by in range(fv):
                for bx in range(fh):
                    dc = int(zzs[ci][my * fv + by, mx * fh + bx, 0]) >> al0
                    diff = dc - preds[ci]
                    preds[ci] = dc
                    t = _cat(diff)
                    ln, code = DC_ENC[t]
                    w.bw.put(code, ln)
                    if t:
                        w.bw.put(diff if diff > 0 else diff + (1 << t) - 1, t)
    w.finish()

    if refine:
        # scan 2: DC refinement, interleaved, Ah=1 Al=0 (raw bits)
        out += sos(list(range(ncomp)), 0, 0, 1, 0)
        w = _SegWriter()
        for m_i in range(mcus_x * mcus_y):
            w.next_unit(m_i)
            my, mx = divmod(m_i, mcus_x)
            for ci in range(ncomp):
                fh, fv = factors[ci]
                for by in range(fv):
                    for bx in range(fh):
                        w.bw.put(
                            int(zzs[ci][my * fv + by, mx * fh + bx, 0]) & 1, 1
                        )
        w.finish()

    # spectral AC bands per component, first pass at Al=al0
    for ss, se in ((1, 5), (6, 63)):
        for ci in range(ncomp):
            out += sos([ci], ss, se, 0, al0)
            w = _SegWriter()
            bh, bw_ = nidims[ci]
            for u in range(bh * bw_):
                w.next_unit(u)  # EOB0-only encoder: no cross-block state
                by, bx = divmod(u, bw_)
                _emit_ac_first(w.bw, zzs[ci][by, bx], ss, se, al0)
            w.finish()

    if refine:
        # AC refinement over the whole band, Ah=1 Al=0
        for ci in range(ncomp):
            out += sos([ci], 1, 63, 1, 0)
            w = _SegWriter()
            bh, bw_ = nidims[ci]
            for u in range(bh * bw_):
                w.next_unit(u)
                by, bx = divmod(u, bw_)
                _emit_ac_refine(w.bw, zzs[ci][by, bx], 1, 63, 1, 0)
            w.finish()

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_flat_gray_block_is_exact():
    img = np.full((8, 8), 77, dtype=np.uint8)
    d = decode_jpeg(encode_jpeg(img))
    assert (d.width, d.height, d.channels, d.bit_depth) == (8, 8, 1, 8)
    assert all(v == 77 for row in d.rows for v in row)


def test_gray_gradient_round_trip_within_unit_quant_error():
    img = np.add.outer(np.arange(16) * 3, np.arange(24) * 2).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(img))
    got = np.array(d.rows)
    assert got.shape == (16, 24)
    assert np.abs(got - img).max() <= 2


def test_rgb_444_round_trip():
    rng = np.random.default_rng(7)
    img = (rng.integers(0, 8, (16, 16, 3)) * 32 + 16).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(img))
    assert (d.width, d.height, d.channels) == (16, 16, 3)
    got = np.array(d.rows).reshape(16, 16, 3)
    # quant error + two color-space trips: small but nonzero
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 6


def test_rgb_420_flat_color_exact_mcu_geometry():
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[...] = (200, 80, 40)
    d = decode_jpeg(encode_jpeg(img, sampling=(2, 2)))
    got = np.array(d.rows).reshape(16, 16, 3)
    # flat blocks are DC-only; subsampled chroma of a flat image is exact,
    # so every pixel decodes to the same value within color-trip rounding
    assert len({tuple(p) for p in got.reshape(-1, 3)}) == 1
    assert np.abs(got[0, 0].astype(int) - np.array([200, 80, 40])).max() <= 2


def test_non_multiple_of_mcu_dimensions_crop():
    img = np.add.outer(np.arange(13) * 5, np.arange(11) * 7).astype(np.uint8) % 200
    d = decode_jpeg(encode_jpeg(img))
    assert (d.height, d.width) == (13, 11)
    assert np.abs(np.array(d.rows) - img).max() <= 2


def test_restart_markers_reset_predictors():
    img = np.add.outer(np.arange(8) * 2, np.arange(40)).astype(np.uint8)
    blob = encode_jpeg(img, restart_interval=2)
    assert any(
        blob[i] == 0xFF and 0xD0 <= blob[i + 1] <= 0xD7
        for i in range(len(blob) - 1)
    )
    d = decode_jpeg(blob)
    assert np.abs(np.array(d.rows) - img).max() <= 2


def test_same_pixels_same_ahash_as_png():
    """The codec-agnostic contract: a high-contrast pattern encoded as
    PNG and as JPEG must produce the SAME 64-bit aHash (JPEG's ≤2-count
    rounding cannot flip cells of a 0/255 pattern)."""
    from tests.test_png_codec import encode_png

    from vlm_data_pipeline_spark.sources.multimodal import image_ahash_64

    img = np.zeros((64, 64), dtype=np.uint8)
    img[:, 32:] = 255
    img[:16, :16] = 255
    png = encode_png([list(r) for r in img], bit_depth=8, color_type=0)
    jpg = encode_jpeg(img)
    assert image_ahash_64(png) == image_ahash_64(jpg)


def test_decode_images_stage_handles_planted_jpeg(spark):
    """End-to-end through the mapInPandas decode stage: a JPEG payload
    rides the same binary-asset path as PNG/BMP and yields real scalar
    features."""
    from vlm_data_pipeline_spark.sources.multimodal import decode_images

    img = np.full((10, 12), 100, dtype=np.uint8)
    assets = spark.createDataFrame(
        [("jpg1", bytearray(encode_jpeg(img)))],
        "asset_id string, payload binary",
    )
    row = decode_images(assets).collect()[0]
    assert (row.width, row.height, row.channels) == (12, 10, 1)
    assert row.mean_luma == pytest.approx(100 / 255.0, abs=0.02)


def test_progressive_matches_baseline_gray():
    """Same quantized coefficients, two transmission orders → identical
    pixels. Exercises DC first+refine and banded AC first+refine."""
    img = np.add.outer(np.arange(16) * 3, np.arange(24) * 2).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img))
    assert (prog.width, prog.height, prog.channels) == (24, 16, 1)
    assert prog.rows == base.rows


def test_progressive_matches_baseline_rgb_420():
    """Color + 4:2:0: interleaved DC scans over the MCU grid, per-
    component AC bands over each component's own ceil(dim/8) raster
    (including the odd-block-count luma sub-grid of the padded MCU
    grid), successive approximation on."""
    rng = np.random.default_rng(11)
    img = (rng.integers(0, 8, (20, 17, 3)) * 32 + 16).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, sampling=(2, 2)))
    prog = decode_jpeg(encode_jpeg_progressive(img, sampling=(2, 2)))
    assert (prog.width, prog.height, prog.channels) == (17, 20, 3)
    assert prog.rows == base.rows


def test_progressive_spectral_only_no_refinement():
    """Al=0 everywhere: pure spectral selection without successive
    approximation — the second independent scan-script shape."""
    rng = np.random.default_rng(3)
    img = (rng.integers(0, 4, (13, 21, 3)) * 64 + 32).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img))
    prog = decode_jpeg(encode_jpeg_progressive(img, refine=False))
    assert prog.rows == base.rows


def test_progressive_restart_markers_reset_state():
    """RSTn inside progressive scans: predictor reset per interval in
    the DC scan, segment-reader reset in every scan — output must stay
    bit-identical to the unrestarted baseline decode."""
    rng = np.random.default_rng(5)
    img = (rng.integers(0, 8, (24, 19, 3)) * 32 + 16).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, sampling=(2, 2)))
    blob = encode_jpeg_progressive(
        img, sampling=(2, 2), restart_interval=3
    )
    assert any(
        blob[i] == 0xFF and 0xD0 <= blob[i + 1] <= 0xD7
        for i in range(len(blob) - 1)
    )
    prog = decode_jpeg(blob)
    assert prog.rows == base.rows


def test_progressive_truncated_scan_is_value_error():
    img = np.add.outer(np.arange(16), np.arange(16)).astype(np.uint8) * 4
    blob = encode_jpeg_progressive(img)
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 2])


def test_progressive_header_without_scans_is_value_error():
    blob = (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + _seg(0xC2, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    )
    with pytest.raises(ValueError):
        decode_jpeg(blob)


def test_arithmetic_coding_is_a_capability_gap():
    blob = (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + _seg(0xC9, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    )
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(blob)


def test_malformed_inputs_are_value_errors():
    for blob in [
        b"",
        b"\x00\x01",
        b"\xff\xd8",  # SOI only
        b"\xff\xd8\xff\xd9",  # SOI+EOI, no scan
        b"\xff\xd8" + _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0])),  # SOS w/o SOF
    ]:
        with pytest.raises(ValueError):
            decode_jpeg(blob)


def test_truncated_entropy_stream_is_value_error():
    img = np.add.outer(np.arange(16), np.arange(16)).astype(np.uint8) * 4
    blob = encode_jpeg(img)
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) - 40])


def test_progressive_refinement_before_first_scan_is_value_error():
    """ADVICE r7: a refinement scan (Ah>0) with no prior first scan for
    its (component, band) would deposit correction bits onto never-
    initialized coefficients — silently wrong pixels. The codec contract
    routes corruption to ValueError so robust.guard can skip it."""
    sof = bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    header = (
        b"\xff\xd8"
        + _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + _seg(0xC2, sof)
        + _seg(0xC4, bytes([0x00]) + bytes(DC_COUNTS) + DC_SYMS)
        + _seg(0xC4, bytes([0x10]) + bytes(AC_COUNTS) + AC_SYMS)
    )
    # DC refinement (Ss=0, Se=0, Ah=1) with no prior DC first scan.
    dc_refine = _seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10])) + b"\x00"
    with pytest.raises(ValueError, match="refinement scan precedes"):
        decode_jpeg(header + dc_refine + b"\xff\xd9")
    # AC refinement (Ss=1, Se=5, Ah=1) with no prior AC first scan for
    # that band.
    ac_refine = _seg(0xDA, bytes([1, 1, 0x00, 1, 5, 0x10])) + b"\x00"
    with pytest.raises(ValueError, match="refinement scan precedes"):
        decode_jpeg(header + ac_refine + b"\xff\xd9")


# ---------------------------------------------------------------------------
# 12-bit extended-sequential (SOF1) — grayscale forward path. DC diffs at
# 12-bit reach category 14+, so the DC table carries all 16 symbols.
# ---------------------------------------------------------------------------

DC16_COUNTS = [0, 0, 0, 0, 16] + [0] * 11
DC16_SYMS = bytes(range(16))
DC16_ENC = _canonical_encode_map(DC16_COUNTS, DC16_SYMS)
# AC sizes reach 14 at 12-bit precision (F.1.2.2.1): EOB, ZRL and every
# (run, size<=14) at length 10 — 226 symbols, a valid canonical code
_AC14_SYMS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 15)
]
AC14_COUNTS = [0] * 9 + [len(_AC14_SYMS)] + [0] * 6
AC14_SYMS = bytes(_AC14_SYMS)
AC14_ENC = _canonical_encode_map(AC14_COUNTS, AC14_SYMS)


def encode_jpeg_12bit_gray(pixels12):
    """(h, w) uint16 samples in [0, 4095] → SOF1 12-bit grayscale JPEG
    (unit quant table, level shift 2048)."""
    px = np.asarray(pixels12, dtype=np.float64)
    h, w = px.shape
    bh, bw_ = -(-h // 8), -(-w // 8)
    padded = _pad_to_blocks(px, bh * 8, bw_ * 8)

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = bytes([12]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    out += _seg(0xC1, sof)  # SOF1: extended sequential
    out += _seg(0xC4, bytes([0x00]) + bytes(DC16_COUNTS) + DC16_SYMS)
    out += _seg(0xC4, bytes([0x10]) + bytes(AC14_COUNTS) + AC14_SYMS)
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    bw = _BitWriter()
    pred = 0
    for m_i in range(bh * bw_):
        my, mx = divmod(m_i, bw_)
        block = padded[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
        coeffs = _A @ (block - 2048.0) @ _A.T
        q = np.round(coeffs).astype(np.int64)
        zz = [int(q.flat[ZZ[i]]) for i in range(64)]
        diff = zz[0] - pred
        pred = zz[0]
        t = _cat(diff)
        ln, code = DC16_ENC[t]
        bw.put(code, ln)
        if t:
            bw.put(diff if diff > 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = 0
        for k in range(1, 64):
            if zz[k]:
                last_nz = k
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                ln, code = AC_ENC[0xF0]
                bw.put(code, ln)
                run -= 16
            s = _cat(zz[k])
            ln, code = AC14_ENC[(run << 4) | s]
            bw.put(code, ln)
            v = zz[k]
            bw.put(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            ln, code = AC14_ENC[0x00]
            bw.put(code, ln)
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_12bit_flat_gray_is_exact():
    """A flat 12-bit field decodes to its exact 8-bit conversion:
    round(v * 255 / 4095)."""
    img = np.full((16, 16), 1234, dtype=np.uint16)
    d = decode_jpeg(encode_jpeg_12bit_gray(img))
    assert (d.width, d.height, d.channels) == (16, 16, 1)
    expect = round(1234 * 255 / 4095)  # = 77
    assert all(v == expect for row in d.rows for v in row)


def test_12bit_gradient_round_trip():
    """Gradient spanning the full 12-bit range: unit quantization makes
    the 12-bit reconstruction near-exact, so after the documented
    bit-depth conversion every sample lands within 1 of
    round(orig * 255 / 4095)."""
    img = np.add.outer(
        np.arange(16, dtype=np.float64) * 100,
        np.arange(24, dtype=np.float64) * 100,
    ).clip(0, 4095).astype(np.uint16)
    d = decode_jpeg(encode_jpeg_12bit_gray(img))
    got = np.array(d.rows, dtype=np.float64)
    expect = np.round(img.astype(np.float64) * 255.0 / 4095.0)
    assert np.abs(got - expect).max() <= 1.0


def test_12bit_dc_categories_above_11_are_exercised():
    """A 0→4095 block step forces a DC diff in category >= 13 — the
    range 8-bit tables cannot express — proving the decoder accepts
    the extended categories at 12-bit precision."""
    img = np.zeros((8, 16), dtype=np.uint16)
    img[:, 8:] = 4095
    blob = encode_jpeg_12bit_gray(img)
    d = decode_jpeg(blob)
    assert d.pixel(0, 0)[0] == 0
    assert d.pixel(15, 0)[0] == 255


def test_12bit_in_sof0_is_value_error():
    """T.81: baseline SOF0 is 8-bit only — a 12-bit SOF0 is corrupt,
    not a capability gap."""
    blob = bytearray(encode_jpeg_12bit_gray(np.full((8, 8), 100, np.uint16)))
    i = blob.index(b"\xff\xc1")
    blob[i + 1] = 0xC0
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg(bytes(blob))


def test_16bit_precision_still_a_capability_gap():
    blob = bytearray(encode_jpeg_12bit_gray(np.full((8, 8), 100, np.uint16)))
    i = blob.index(b"\xff\xc1")
    blob[i + 4] = 16  # precision byte of the SOF payload
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(blob))


# ---------------------------------------------------------------------------
# Lossless (SOF3, T.81 Annex H)
# ---------------------------------------------------------------------------

# difference categories 0..16, all at 5 bits — a valid canonical code
# (codes 0..16 of 32; the forbidden all-ones max-length code is unused)
LL_COUNTS = [0, 0, 0, 0, 17] + [0] * 11
LL_SYMS = bytes(range(17))
LL_ENC = _canonical_encode_map(LL_COUNTS, LL_SYMS)


def _ll_predict(plane, y, x, sel, default):
    if y == 0 and x == 0:
        return default
    if y == 0:
        return plane[0][x - 1]
    if x == 0:
        return plane[y - 1][0]
    ra, rb, rc = plane[y][x - 1], plane[y - 1][x], plane[y - 1][x - 1]
    return {
        1: ra,
        2: rb,
        3: rc,
        4: ra + rb - rc,
        5: ra + ((rb - rc) >> 1),
        6: rb + ((ra - rc) >> 1),
        7: (ra + rb) >> 1,
    }[sel]


def encode_jpeg_lossless(planes, precision, predictor, pt=0):
    """``planes``: list of (h, w) int lists of ALREADY point-transformed
    samples in [0, 2^(precision-pt)). Independent Annex-H encoder: the
    modulo-2^16 difference maps to (-32767, +32768], category SSSS with
    the SSSS=16/no-extra-bits special case, boundary predictions per
    H.1.2.2."""
    h = len(planes[0])
    w = len(planes[0][0])
    nc = len(planes)
    out = bytearray(b"\xff\xd8")
    sof = bytes([precision]) + struct.pack(">HH", h, w) + bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])
    out += _seg(0xC3, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(LL_COUNTS) + LL_SYMS)
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    out += _seg(0xDA, sos)
    bw = _BitWriter()
    default = 1 << (precision - pt - 1)
    recon = [[[0] * w for _ in range(h)] for _ in range(nc)]
    for y in range(h):
        for x in range(w):
            for c in range(nc):
                px = _ll_predict(recon[c], y, x, predictor, default)
                v = planes[c][y][x]
                recon[c][y][x] = v
                d = (v - px) & 0xFFFF
                if d == 32768:  # SSSS=16: no extra bits
                    ln, code = LL_ENC[16]
                    bw.put(code, ln)
                    continue
                signed = d - 65536 if d > 32768 else d
                t = _cat(signed)
                ln, code = LL_ENC[t]
                bw.put(code, ln)
                if t:
                    bw.put(
                        signed if signed > 0 else signed + (1 << t) - 1, t
                    )
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def test_lossless_hand_assembled_golden():
    """Bit-exact hand derivation, independent of the test encoder: a 4x2
    8-bit predictor-1 scan whose entropy bytes (0x1C 0x93 0xCD 0xAF)
    were assembled BY HAND from the spec — 2-bit canonical codes
    00/01/10/11 for categories 0-3, diffs (0,+1,-2,0 / Rb:-2,+4,-4,-1),
    28 data bits padded with 1s."""
    img = bytearray(b"\xff\xd8")
    img += _seg(0xC3, bytes([8]) + struct.pack(">HH", 2, 4) + bytes([1, 1, 0x11, 0]))
    img += _seg(0xC4, bytes([0x00]) + bytes([0, 4] + [0] * 14) + bytes([0, 1, 2, 3]))
    img += _seg(0xDA, bytes([1, 1, 0x00, 1, 0, 0x00]))
    img += bytes([0x1C, 0x93, 0xCD, 0xAF])
    img += b"\xff\xd9"
    got = decode_jpeg(bytes(img))
    assert (got.width, got.height, got.channels) == (4, 2, 1)
    assert got.rows == [[128, 129, 127, 127], [126, 130, 126, 125]]


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_lossless_gray_round_trip_every_predictor(predictor):
    rng = np.random.default_rng(100 + predictor)
    px = rng.integers(0, 256, size=(9, 7)).tolist()
    got = decode_jpeg(encode_jpeg_lossless([px], 8, predictor))
    assert got.rows == px  # lossless: EXACT, unlike every DCT test above


def test_lossless_rgb_round_trip_exact():
    """3-component lossless is raw component planes (no YCbCr): the RGB
    round-trip is bit-exact."""
    rng = np.random.default_rng(7)
    r, g, b = (rng.integers(0, 256, size=(5, 6)).tolist() for _ in range(3))
    got = decode_jpeg(encode_jpeg_lossless([r, g, b], 8, 4))
    assert (got.channels, got.width, got.height) == (3, 6, 5)
    for y in range(5):
        for x in range(6):
            assert got.rows[y][3 * x : 3 * x + 3] == [r[y][x], g[y][x], b[y][x]]


def test_lossless_16bit_with_ssss16_special_case():
    """16-bit precision: the scan's first sample is 0, so its modulo
    difference against the 2^15 default prediction is exactly 32768 —
    the SSSS=16 no-extra-bits special case — and full-range samples map
    to the 8-bit contract with round(v*255/65535)."""
    px = [[0, 65535, 32768], [12345, 54321, 1]]
    got = decode_jpeg(encode_jpeg_lossless([px], 16, 1))
    exp = [[round(v * 255 / 65535) for v in row] for row in px]
    assert got.rows == exp


def test_lossless_12bit_point_transform():
    """Pt=2: samples are encoded after >>2 and the decoder output is
    Rx<<2 mapped through the 12-bit contract conversion."""
    base = [[407, 1023, 0, 4092], [2048, 300, 3000, 16]]
    shifted = [[v >> 2 for v in row] for row in base]
    got = decode_jpeg(encode_jpeg_lossless([shifted], 12, 5, pt=2))
    exp = [
        [round(((v >> 2) << 2) * 255 / 4095) for v in row] for row in base
    ]
    assert got.rows == exp


def test_lossless_capability_seams():
    px = [[1, 2], [3, 4]]
    whole = encode_jpeg_lossless([px], 8, 1)
    # subsampled lossless: rewrite the SOF3 sampling byte (0x11 -> 0x21)
    sof_at = whole.find(bytes([0xFF, 0xC3]))
    sub = bytearray(whole)
    assert sub[sof_at + 11] == 0x11
    sub[sof_at + 11] = 0x21
    with pytest.raises(NotImplementedError, match="subsampled"):
        decode_jpeg(bytes(sub))
    # restart intervals: inject a DRI segment before SOS
    sos_at = whole.find(bytes([0xFF, 0xDA]))
    dri = whole[:sos_at] + _seg(0xDD, struct.pack(">H", 1)) + whole[sos_at:]
    with pytest.raises(NotImplementedError, match="restart"):
        decode_jpeg(dri)
    # predictor 0 is reserved for hierarchical differential scans
    bad = bytearray(whole)
    assert bad[sos_at + 7] == 1  # Ss byte of the 1-component SOS
    bad[sos_at + 7] = 0
    with pytest.raises(ValueError, match="predictor"):
        decode_jpeg(bytes(bad))
    # ADVICE r10: Ah must be 0 in lossless (successive approximation is
    # DCT-only) — set the high nibble of the AhAl byte
    ah = bytearray(whole)
    assert ah[sos_at + 9] == 0  # AhAl byte (pt=0 here)
    ah[sos_at + 9] = 0x10
    with pytest.raises(ValueError, match="Ah"):
        decode_jpeg(bytes(ah))
    # ADVICE r10: an RSTn splitting the entropy stream with DRI
    # absent/zero used to silently drop all data after the marker
    rst = whole[:-2] + b"\xff\xd0" + whole[-2:]
    with pytest.raises(ValueError, match="RST"):
        decode_jpeg(rst)


# ---------------------------------------------------------------------------
# Hierarchical (DHP + SOF3 base + SOF7 corrections, T.81 Annex J,
# non-expansive lossless refinement profile)
# ---------------------------------------------------------------------------


def _ll_entropy(diffs_mod16):
    """Entropy-code a stream of modulo-2^16 differences with the shared
    LL tables (category SSSS + extra bits, SSSS=16 special case)."""
    bw = _BitWriter()
    for d in diffs_mod16:
        if d == 32768:  # SSSS=16: no extra bits
            ln, code = LL_ENC[16]
            bw.put(code, ln)
            continue
        signed = d - 65536 if d > 32768 else d
        t = _cat(signed)
        ln, code = LL_ENC[t]
        bw.put(code, ln)
        if t:
            bw.put(signed if signed > 0 else signed + (1 << t) - 1, t)
    return bw.flush()


def encode_jpeg_hierarchical(stages, precision, predictor, pt=0):
    """Independent Annex-J encoder (non-expansive profile): ``stages[0]``
    is the base image's component planes in the Rx (point-transformed)
    domain, coded as an SOF3 frame with ``predictor``/``pt``; each later
    stage is a list of signed CORRECTION planes, coded as an SOF7
    differential frame (Ss=0, Pt=0, corrections modulo 2^16 against the
    running output-domain reconstruction). Returns (bytes, final
    output-domain planes)."""
    h, w, nc = len(stages[0][0]), len(stages[0][0][0]), len(stages[0])
    out = bytearray(b"\xff\xd8")
    sof = bytes([precision]) + struct.pack(">HH", h, w) + bytes([nc])
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])
    out += _seg(0xDE, sof)  # DHP: same syntax as SOF
    out += _seg(0xC4, bytes([0x00]) + bytes(LL_COUNTS) + LL_SYMS)
    out += _seg(0xC3, sof)
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    out += _seg(0xDA, sos)
    default = 1 << (precision - pt - 1)
    recon = [[[0] * w for _ in range(h)] for _ in range(nc)]
    diffs = []
    for y in range(h):
        for x in range(w):
            for c in range(nc):
                px = _ll_predict(recon[c], y, x, predictor, default)
                v = stages[0][c][y][x]
                recon[c][y][x] = v
                diffs.append((v - px) & 0xFFFF)
    out += _ll_entropy(diffs)
    ref = [[[v << pt for v in row] for row in p] for p in recon]
    for corr in stages[1:]:
        out += _seg(0xC7, sof)
        sos7 = bytes([nc])
        for c in range(nc):
            sos7 += bytes([c + 1, 0x00])
        sos7 += bytes([0, 0, 0])  # Ss=0 (no predictor), Se=0, AhAl=0
        out += _seg(0xDA, sos7)
        diffs = []
        for y in range(h):
            for x in range(w):
                for c in range(nc):
                    target = (ref[c][y][x] + corr[c][y][x]) & 0xFFFF
                    diffs.append((target - ref[c][y][x]) & 0xFFFF)
                    ref[c][y][x] = target
        out += _ll_entropy(diffs)
    out += b"\xff\xd9"
    return bytes(out), ref


def test_hierarchical_two_stage_gray_exact():
    """Coarse base + lossless correction reconstructs the original
    EXACTLY — the profile's whole point."""
    orig = [[17, 250, 3, 128], [99, 64, 200, 1], [255, 0, 77, 180]]
    base = [[v & 0xF0 for v in row] for row in orig]  # 4-bit-coarse base
    corr = [
        [orig[y][x] - base[y][x] for x in range(4)] for y in range(3)
    ]
    blob, final = encode_jpeg_hierarchical([[base], [corr]], 8, 1)
    got = decode_jpeg(blob)
    assert (got.width, got.height, got.channels) == (4, 3, 1)
    assert got.rows == orig
    assert [r for r in final[0]] == orig


def test_hierarchical_three_stage_rgb_exact():
    r = [[10, 20], [30, 40]]
    g = [[50, 60], [70, 80]]
    b = [[90, 100], [110, 120]]
    base = [[[v // 3 for v in row] for row in p] for p in (r, g, b)]
    c1 = [
        [[p[y][x] // 2 - bp[y][x] for x in range(2)] for y in range(2)]
        for p, bp in zip((r, g, b), base)
    ]
    # second correction closes the remaining gap exactly
    mid = [
        [[base[c][y][x] + c1[c][y][x] for x in range(2)] for y in range(2)]
        for c in range(3)
    ]
    c2 = [
        [[p[y][x] - mp[y][x] for x in range(2)] for y in range(2)]
        for p, mp in zip((r, g, b), mid)
    ]
    blob, _ = encode_jpeg_hierarchical([base, c1, c2], 8, 4)
    got = decode_jpeg(blob)
    assert got.channels == 3
    exp = [
        [v for x in range(2) for v in (r[y][x], g[y][x], b[y][x])]
        for y in range(2)
    ]
    assert got.rows == exp


def test_hierarchical_16bit_pt_base_plus_correction():
    """16-bit medical shape: the base frame carries Rx = v >> 2 (Pt=2),
    the SOF7 correction restores full precision, including a correction
    big enough to exercise wide SSSS categories."""
    orig = [[65535, 4], [32768, 40000]]
    base_rx = [[v >> 2 for v in row] for row in orig]  # Pt=2 domain
    base_out = [[v << 2 for v in row] for row in base_rx]
    corr = [
        [orig[y][x] - base_out[y][x] for x in range(2)] for y in range(2)
    ]
    blob, final = encode_jpeg_hierarchical(
        [[base_rx], [corr]], 16, 2, pt=2
    )
    got = decode_jpeg(blob)
    assert final[0] == orig
    exp = [[round(v * 255 / 65535) for v in row] for row in orig]
    assert got.rows == exp


def test_hierarchical_seams():
    base = [[1, 2], [3, 4]]
    corr = [[1, -1], [0, 2]]
    blob, _ = encode_jpeg_hierarchical([[base], [corr]], 8, 1)
    # EXP (resolution expansion) before the differential frame: refused
    at = blob.find(b"\xff\xc7")
    exp_blob = blob[:at] + _seg(0xDF, bytes([0x11])) + blob[at:]
    with pytest.raises(NotImplementedError, match="EXP"):
        decode_jpeg(exp_blob)
    # SOF7 with no DHP context: structural error
    sof = bytes([8]) + struct.pack(">HH", 2, 2) + bytes([1, 1, 0x11, 0])
    with pytest.raises(ValueError, match="outside DHP"):
        decode_jpeg(b"\xff\xd8" + _seg(0xC7, sof) + b"\xff\xd9")
    # DCT frame inside hierarchical mode: refused (lossless profile only)
    with pytest.raises(NotImplementedError, match="DCT frames inside"):
        decode_jpeg(
            b"\xff\xd8" + _seg(0xDE, sof) + _seg(0xC0, sof) + b"\xff\xd9"
        )
    # a second NON-differential frame: structural error
    twice = blob.replace(b"\xff\xc7", b"\xff\xc3")
    with pytest.raises(ValueError, match="second non-differential"):
        decode_jpeg(twice)
    # differential DCT (SOF5) is still a documented seam
    with pytest.raises(NotImplementedError, match="differential DCT"):
        decode_jpeg(
            b"\xff\xd8" + _seg(0xDE, sof) + _seg(0xC5, sof) + b"\xff\xd9"
        )
    # truncated hierarchical stream (DHP but no frame): corrupt
    with pytest.raises(ValueError, match="no decoded frame"):
        decode_jpeg(b"\xff\xd8" + _seg(0xDE, sof) + b"\xff\xd9")
