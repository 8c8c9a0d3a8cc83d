"""FLAC decoder: round-trips against an independent test-side encoder
(RFC 9639 forward path — bit-level subframe/Rice writers and
bitwise-computed CRCs, no shared tables with the decoder), stereo
decorrelation modes, wasted bits, escape partitions, and the
self-verification red paths (CRC-8, CRC-16, MD5)."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from vlm_data_pipeline_spark.sources.flac_codec import decode_flac


def _crc8_bitwise(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def _crc16_bitwise(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


class _BW:
    """MSB-first bit writer."""

    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def s(self, v: int, n: int) -> None:
        self.u(v & ((1 << n) - 1), n)

    def unary(self, q: int) -> None:
        for _ in range(q):
            self.u(0, 1)
        self.u(1, 1)

    def align(self) -> None:
        while self.n:
            self.u(0, 1)

    def bytes(self) -> bytes:
        assert self.n == 0
        return bytes(self.out)


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


def _rice(bw: _BW, vals, param: int) -> None:
    for v in vals:
        z = _zigzag(v)
        bw.unary(z >> param)
        bw.u(z & ((1 << param) - 1), param)


_FIXED = {0: [], 1: [1], 2: [2, -1]}


def _write_subframe(bw, samples, bps, kind, rice_param=4, wasted=0,
                    escape_width=None):
    bw.u(0, 1)  # padding
    if kind == "constant":
        bw.u(0, 6)
    elif kind == "verbatim":
        bw.u(1, 6)
    else:  # fixed order
        order = int(kind[-1])
        bw.u(8 + order, 6)
    if wasted:
        bw.u(1, 1)
        bw.unary(wasted - 1)
        samples = [v >> wasted for v in samples]
        eff = bps - wasted
    else:
        bw.u(0, 1)
        eff = bps
    if kind == "constant":
        assert len(set(samples)) == 1
        bw.s(samples[0], eff)
        return
    if kind == "verbatim":
        for v in samples:
            bw.s(v, eff)
        return
    order = int(kind[-1])
    coef = _FIXED[order]
    for v in samples[:order]:
        bw.s(v, eff)
    resid = []
    for i in range(order, len(samples)):
        pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coef))
        resid.append(samples[i] - pred)
    bw.u(0, 2)  # rice method 0 (4-bit params)
    bw.u(0, 4)  # partition order 0
    if escape_width is not None:
        bw.u(0xF, 4)
        bw.u(escape_width, 5)
        for r in resid:
            if escape_width:
                bw.s(r, escape_width)
            else:
                assert r == 0
    else:
        bw.u(rice_param, 4)
        _rice(bw, resid, rice_param)


def encode_flac(channels, rate, bps, kinds=None, assignment=None,
                blocksize=None, wasted=0, escape_width=None,
                rice_param=4):
    """channels: list of per-channel int sample lists (equal length).
    kinds: per-channel subframe kind (default verbatim). assignment:
    None=independent, or 'left_side'/'side_right'/'mid_side' (stereo).
    Single frame, fixed blocking, 16-bit blocksize header code."""
    nch = len(channels)
    n = len(channels[0])
    blocksize = blocksize or n
    assert blocksize == n, "single-frame encoder"
    kinds = kinds or ["verbatim"] * nch

    md5 = hashlib.md5()
    nbytes = (bps + 7) // 8
    for i in range(n):
        for c in range(nch):
            md5.update(int(channels[c][i]).to_bytes(nbytes, "little",
                                                    signed=True))

    # STREAMINFO
    si = _BW()
    si.u(blocksize, 16)
    si.u(blocksize, 16)
    si.u(0, 24)
    si.u(0, 24)
    si.u(rate, 20)
    si.u(nch - 1, 3)
    si.u(bps - 1, 5)
    si.u(n, 36)
    info = si.bytes() + md5.digest()
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(info).to_bytes(3, "big") + info

    # frame header (byte-aligned fields)
    if assignment is None:
        ch_code = nch - 1
    else:
        ch_code = {"left_side": 8, "side_right": 9, "mid_side": 10}[
            assignment
        ]
    ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
    hdr = bytearray([0xFF, 0xF8])  # sync + reserved0 + fixed blocking
    hdr.append((7 << 4) | 0)  # blocksize code 7 (u16 follows), rate: SI
    hdr.append((ch_code << 4) | (ss_code << 1))
    hdr.append(0)  # frame number 0 (coded number, single byte)
    hdr += struct.pack(">H", blocksize - 1)
    hdr.append(_crc8_bitwise(bytes(hdr)))

    bw = _BW()
    if assignment is None:
        for c in range(nch):
            _write_subframe(bw, channels[c], bps, kinds[c],
                            rice_param=rice_param, wasted=wasted,
                            escape_width=escape_width)
    else:
        left, right = channels
        side = [l - r for l, r in zip(left, right)]
        if assignment == "left_side":
            _write_subframe(bw, left, bps, kinds[0], rice_param=rice_param)
            _write_subframe(bw, side, bps + 1, kinds[1],
                            rice_param=rice_param)
        elif assignment == "side_right":
            _write_subframe(bw, side, bps + 1, kinds[0],
                            rice_param=rice_param)
            _write_subframe(bw, right, bps, kinds[1],
                            rice_param=rice_param)
        else:  # mid_side
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            _write_subframe(bw, mid, bps, kinds[0], rice_param=rice_param)
            _write_subframe(bw, side, bps + 1, kinds[1],
                            rice_param=rice_param)
    bw.align()
    body = bw.bytes()
    frame = bytes(hdr) + body
    frame += struct.pack(">H", _crc16_bitwise(frame))
    out += frame
    return bytes(out)


def _ints(au, bps):
    return np.rint(au.samples * (1 << (bps - 1))).astype(np.int64)


def test_verbatim_mono_16bit_round_trip():
    samples = [0, 1, -1, 32767, -32768, 12345, -12345, 7, -7, 100]
    au = decode_flac(encode_flac([samples], 44100, 16))
    assert (au.sample_rate, au.n_channels, au.bits_per_sample) == (
        44100, 1, 16,
    )
    assert _ints(au, 16)[:, 0].tolist() == samples


def test_constant_and_fixed_orders_round_trip():
    n = 48
    const = [-42] * n
    ramp = [3 * i - 20 for i in range(n)]  # fixed order 1/2 friendly
    au = decode_flac(
        encode_flac([const, ramp], 8000, 16, kinds=["constant", "fixed2"])
    )
    got = _ints(au, 16)
    assert got[:, 0].tolist() == const
    assert got[:, 1].tolist() == ramp
    au1 = decode_flac(encode_flac([ramp], 8000, 16, kinds=["fixed1"]))
    assert _ints(au1, 16)[:, 0].tolist() == ramp


@pytest.mark.parametrize(
    "assignment", ["left_side", "side_right", "mid_side"]
)
def test_stereo_decorrelation_exact(assignment):
    rng = np.random.default_rng(7)
    left = rng.integers(-1 << 15, 1 << 15, 64).tolist()
    right = rng.integers(-1 << 15, 1 << 15, 64).tolist()
    au = decode_flac(
        encode_flac([left, right], 48000, 16, assignment=assignment)
    )
    got = _ints(au, 16)
    assert got[:, 0].tolist() == left
    assert got[:, 1].tolist() == right


@pytest.mark.parametrize("bps", [8, 24])
def test_other_bit_depths(bps):
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    samples = [0, 1, -1, hi, lo, hi // 3, lo // 5]
    au = decode_flac(encode_flac([samples], 16000, bps))
    assert au.bits_per_sample == bps
    assert _ints(au, bps)[:, 0].tolist() == samples


def test_wasted_bits():
    samples = [v * 8 for v in [-100, 5, 99, 0, -1, 77]]  # 3 wasted bits
    au = decode_flac(encode_flac([samples], 8000, 16, wasted=3))
    assert _ints(au, 16)[:, 0].tolist() == samples


def test_escape_partition_raw_residuals():
    ramp = [5 * i for i in range(32)]
    au = decode_flac(
        encode_flac([ramp], 8000, 16, kinds=["fixed1"], escape_width=9)
    )
    assert _ints(au, 16)[:, 0].tolist() == ramp


def test_self_verification_red_paths():
    samples = list(range(-32, 32))
    blob = bytearray(encode_flac([samples], 8000, 16))
    with pytest.raises(ValueError, match="magic"):
        decode_flac(b"fLaK" + bytes(blob[4:]))
    # corrupt one entropy byte -> CRC-16 catches it
    bad = bytearray(blob)
    bad[-10] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    # corrupt a frame-header byte -> CRC-8 catches it
    hdr_at = len(blob) - (2 + 7 + (len(samples) * 16 + 14 + 7) // 8)
    bad2 = bytearray(blob)
    # locate the frame start: first 0xFF 0xF8 after the metadata
    at = bytes(blob).find(b"\xff\xf8", 4)
    bad2[at + 3] ^= 0x02  # flip a channel-assignment bit
    with pytest.raises(ValueError, match="CRC-8|channel|reserved"):
        decode_flac(bytes(bad2))
    # corrupt the STREAMINFO MD5 -> decoded-sample check fails
    bad3 = bytearray(blob)
    bad3[8 + 18] ^= 0xFF  # first MD5 byte inside STREAMINFO body
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad3))
    # truncated stream
    with pytest.raises(ValueError):
        decode_flac(bytes(blob[:-5]))


def test_zero_md5_skips_sample_check():
    samples = [1, 2, 3, 4]
    blob = bytearray(encode_flac([samples], 8000, 16))
    blob[8 + 18 : 8 + 34] = b"\x00" * 16  # MD5 unset = unknown
    au = decode_flac(bytes(blob))
    assert _ints(au, 16)[:, 0].tolist() == samples


def test_audio_features_stage_routes_flac_and_wav(spark):
    """The Spark audio stage decodes FLAC and WAV payloads side-by-side
    through the default decoder — no injection needed."""
    from vlm_data_pipeline_spark.sources.multimodal import audio_features
    from vlm_data_pipeline_spark.sources.wav_codec import encode_wav

    const = [16384] * 800  # exactly 0.5 after normalization
    flac = encode_flac([const], 8000, 16, kinds=["constant"])
    wav = encode_wav(np.full((400, 1), 0.25), 16000)
    assets = spark.createDataFrame(
        [("f1", bytearray(flac)), ("w1", bytearray(wav))],
        "asset_id string, payload binary",
    )
    out = {r.asset_id: r for r in audio_features(assets).collect()}
    assert out["f1"].sample_rate == 8000
    assert out["f1"].n_frames == 800
    assert out["f1"].rms == pytest.approx(0.5, abs=1e-9)
    assert out["f1"].peak == pytest.approx(0.5, abs=1e-9)
    assert out["w1"].sample_rate == 16000
    assert out["w1"].peak == pytest.approx(0.25, abs=1e-3)


def test_package_encoder_round_trip_multiframe():
    """The PACKAGE-side writer (verbatim, 4096-sample frames) must pass
    the decoder's full self-verification across multiple frames."""
    from vlm_data_pipeline_spark.sources.flac_codec import encode_flac as enc

    rng = np.random.default_rng(11)
    mono = rng.integers(-(1 << 15), 1 << 15, 5000)
    au = decode_flac(enc(mono, 22050, 16))
    assert au.n_frames == 5000 and au.n_channels == 1
    assert _ints(au, 16)[:, 0].tolist() == mono.tolist()
    stereo = rng.integers(-(1 << 7), 1 << 7, (300, 2))
    au2 = decode_flac(enc(stereo, 8000, 8))
    assert _ints(au2, 8).tolist() == stereo.tolist()
    with pytest.raises(ValueError, match="out of range"):
        enc([300], 8000, 8)


def test_package_encoder_short_input_declares_conforming_blocksize():
    """RFC 9639 §8.2: STREAMINFO min/max block size must be >= 16 even
    for inputs shorter than 16 samples — the (short) last frame is
    allowed below the declared minimum, a sub-16 declaration is not
    (ADVICE r11)."""
    from vlm_data_pipeline_spark.sources.flac_codec import encode_flac as enc

    blob = enc([1, -2, 3], 8000, 16)
    # STREAMINFO payload starts at byte 8: min blocksize u16, max u16
    assert int.from_bytes(blob[8:10], "big") == 16
    assert int.from_bytes(blob[10:12], "big") == 16
    au = decode_flac(blob)  # full CRC-8/CRC-16/MD5 self-verification
    assert _ints(au, 16)[:, 0].tolist() == [1, -2, 3]


def test_coded_number_writer_inverse():
    from vlm_data_pipeline_spark.sources.flac_codec import (
        _Bits,
        _BitsW,
        _coded_number,
        _write_coded_number,
    )

    for v in [0, 1, 127, 128, 255, 2047, 2048, 65535, 1 << 20, (1 << 31) - 1,
              (1 << 36) - 1]:
        bw = _BitsW()
        _write_coded_number(bw, v)
        assert _coded_number(_Bits(bw.bytes())) == v, v
