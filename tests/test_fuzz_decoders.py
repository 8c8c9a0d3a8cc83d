"""Fuzz the pure-Python binary decoders (pbwire / png_codec / hdf5lite)
against truncated and bit-flipped inputs, through the decode-failure
policy: a corrupted file must either decode or raise a normal Exception —
never hang, never kill the interpreter — so ``robust.guard(parse, "skip")``
always degrades it to zero rows. This is the property that lets a
1000-executor ingest shrug off one corrupt file in a million.

No Spark here: the decoders are plain Python, so hypothesis can hammer
them at full example counts.
"""

from __future__ import annotations

import os
import struct

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vlm_data_pipeline_spark.sources.hdf5lite import read_datasets
from vlm_data_pipeline_spark.sources.pbwire import (
    iter_fields,
    iter_tfrecords,
    parse_tf_example,
)
from vlm_data_pipeline_spark.sources.png_codec import decode_png
from vlm_data_pipeline_spark.sources.robust import guard

from .test_hdf5lite import make_hdf5
from .test_png_codec import encode_png


def _n(base: int) -> int:
    """Per-test example count: FUZZ_MAX_EXAMPLES=1000 overrides every
    test's baseline for deep sweeps (the round-6 verdict's acceptance
    run); unset, each test keeps its CI-speed default."""
    return max(base, int(os.environ.get("FUZZ_MAX_EXAMPLES", "0")))


def _corrupt(blob: bytes, cut: int, flip_at: int, flip_bit: int) -> bytes:
    """Truncate at ``cut`` (mod len+1), then flip one bit (if non-empty)."""
    out = bytearray(blob[: cut % (len(blob) + 1)])
    if out:
        out[flip_at % len(out)] ^= 1 << (flip_bit % 8)
    return bytes(out)


corruption = st.tuples(
    st.integers(min_value=0, max_value=2**31),
    st.integers(min_value=0, max_value=2**31),
    st.integers(min_value=0, max_value=7),
)


def _skip_never_raises(parse, blob: bytes) -> None:
    """The production contract: the guarded parser returns a list for ANY
    input bytes — every decode failure is an ordinary Exception."""
    rows = guard(lambda b: list(parse(b)) and [], "skip")(blob)
    assert rows == []


@settings(max_examples=_n(200), deadline=None)
@given(payloads=st.lists(st.binary(max_size=40), max_size=4), c=corruption)
def test_fuzz_tfrecords(payloads, c):
    framed = b"".join(
        struct.pack("<Q", len(p)) + b"\x00" * 4 + p + b"\x00" * 4 for p in payloads
    )
    blob = _corrupt(framed, *c)
    try:
        out = list(iter_tfrecords(blob))
        # whatever parses is well-formed framing; a flip inside a length
        # field re-frames everything after it, so content/lengths are
        # not comparable to the originals — no-crash IS the property
        assert all(isinstance(r, bytes) for r in out)
    except ValueError:
        pass
    _skip_never_raises(iter_tfrecords, blob)


@settings(max_examples=_n(200), deadline=None)
@given(blob=st.binary(max_size=120))
def test_fuzz_pb_wire_and_tf_example(blob):
    for parse in (iter_fields, parse_tf_example):
        try:
            r = parse(blob)
            if parse is iter_fields:
                list(r)
        except Exception as exc:  # decode failure must be a normalized one
            assert isinstance(exc, (ValueError, struct.error)), exc
        _skip_never_raises(parse, blob)


@settings(max_examples=_n(100), deadline=None)
@given(
    rows=st.lists(
        st.lists(st.integers(min_value=0, max_value=255), min_size=1, max_size=4),
        min_size=1,
        max_size=4,
    ).filter(lambda r: len({len(x) for x in r}) == 1),
    c=corruption,
)
def test_fuzz_png(rows, c):
    blob = _corrupt(encode_png(rows), *c)
    try:
        img = decode_png(blob)
        assert img.width > 0 and img.height > 0
    except Exception as exc:
        assert isinstance(exc, (ValueError, struct.error, IndexError)), exc
    _skip_never_raises(decode_png, blob)


@settings(max_examples=_n(60), deadline=None)
@given(
    n=st.integers(min_value=1, max_value=6),
    chunked=st.booleans(),
    c=corruption,
)
def test_fuzz_hdf5(n, chunked, c):
    arr = np.arange(n, dtype="<f8")
    blob = _corrupt(
        make_hdf5({"t": arr}, chunk_gzip={"t"} if chunked else frozenset()), *c
    )
    try:
        out = read_datasets(blob, ["t"])
        for v in out.values():
            assert isinstance(v, np.ndarray)
    except Exception as exc:
        assert not isinstance(exc, (SystemExit, KeyboardInterrupt)), exc
    _skip_never_raises(lambda b: read_datasets(b, ["t"]) and [], blob)


@settings(max_examples=_n(100), deadline=None)
@given(
    rows=st.lists(
        st.lists(st.integers(min_value=0, max_value=255), min_size=3, max_size=12),
        min_size=1,
        max_size=4,
    ).filter(
        lambda r: len({len(x) for x in r}) == 1 and len(r[0]) % 3 == 0
    ),
    c=corruption,
)
def test_fuzz_bmp(rows, c):
    from vlm_data_pipeline_spark.sources.bmp_codec import decode_bmp, encode_bmp

    blob = _corrupt(encode_bmp(rows), *c)
    try:
        img = decode_bmp(blob)
        assert img.width > 0 and img.height > 0
    except Exception as exc:  # decode failure must be a normalized one
        assert isinstance(exc, (ValueError, struct.error, IndexError)), exc
    _skip_never_raises(decode_bmp, blob)


@settings(max_examples=_n(100), deadline=None)
@given(
    n=st.integers(min_value=1, max_value=64),
    bits=st.sampled_from([8, 16, 32]),
    c=corruption,
)
def test_fuzz_wav(n, bits, c):
    import numpy as np

    from vlm_data_pipeline_spark.sources.wav_codec import decode_wav, encode_wav

    x = np.linspace(-0.9, 0.9, n)
    blob = _corrupt(encode_wav(x, 8000, bits=bits), *c)
    try:
        au = decode_wav(blob)
        assert au.sample_rate >= 1 and au.n_channels >= 1
    except Exception as exc:  # decode failure must be a normalized one
        assert isinstance(exc, (ValueError, struct.error)), exc
    _skip_never_raises(decode_wav, blob)


@settings(max_examples=_n(100), deadline=None)
@given(
    n=st.integers(min_value=1, max_value=3),
    w=st.integers(min_value=2, max_value=8),
    h=st.integers(min_value=2, max_value=8),
    c=corruption,
)
def test_fuzz_y4m(n, w, h, c):
    from vlm_data_pipeline_spark.sources.y4m_codec import decode_y4m, encode_y4m

    frames = [[[(x + y + f) % 256 for x in range(w)] for y in range(h)]
              for f in range(n)]
    blob = _corrupt(encode_y4m(frames), *c)
    try:
        v = decode_y4m(blob)
        assert v.width > 0 and v.height > 0
    except Exception as exc:  # decode failure must be a normalized one
        assert isinstance(exc, (ValueError, struct.error)), exc
    _skip_never_raises(decode_y4m, blob)


@settings(max_examples=_n(120), deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=60),
    gray=st.booleans(),
    c=corruption,
)
def test_fuzz_jpeg(seed, gray, c):
    from vlm_data_pipeline_spark.sources.jpeg_codec import decode_jpeg

    from .test_jpeg_codec import encode_jpeg

    rng = np.random.default_rng(seed)
    shape = (16, 16) if gray else (16, 16, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    blob = _corrupt(encode_jpeg(img), *c)
    _skip_never_raises(lambda b: [decode_jpeg(b)], blob)


@settings(max_examples=_n(120), deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=60),
    gray=st.booleans(),
    refine=st.booleans(),
    c=corruption,
)
def test_fuzz_jpeg_progressive(seed, gray, refine, c):
    """Corrupted multi-scan SOF2 streams must skip (ValueError /
    NotImplementedError), never crash — same contract as sequential."""
    from vlm_data_pipeline_spark.sources.jpeg_codec import decode_jpeg

    from .test_jpeg_codec import encode_jpeg_progressive

    rng = np.random.default_rng(seed)
    shape = (16, 16) if gray else (16, 16, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    blob = _corrupt(encode_jpeg_progressive(img, refine=refine), *c)
    _skip_never_raises(lambda b: [decode_jpeg(b)], blob)


@settings(max_examples=_n(120), deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=60),
    c=corruption,
)
def test_fuzz_jpeg_12bit(seed, c):
    """Corrupted 12-bit SOF1 streams (round-8 precision path: widened
    DC categories, 2048 level shift, 12->8 bit-depth conversion) must
    skip cleanly, never crash — same contract as the 8-bit paths."""
    from vlm_data_pipeline_spark.sources.jpeg_codec import decode_jpeg

    from .test_jpeg_codec import encode_jpeg_12bit_gray

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 4096, (16, 16), dtype=np.uint16)
    blob = _corrupt(encode_jpeg_12bit_gray(img), *c)
    _skip_never_raises(lambda b: [decode_jpeg(b)], blob)
