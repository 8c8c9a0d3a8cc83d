"""BMP codec: round-trips, row orders, palette, malformed-input policy,
and codec-agnostic pixel consumers (same pixels as PNG → same aHash)."""

from __future__ import annotations

import struct

import pytest

from vlm_data_pipeline_spark.sources.bmp_codec import (
    decode_bmp,
    encode_bmp,
)


def _rows(w, h, c=3):
    """Deterministic pixel pattern, distinct per (x, y, channel)."""
    return [
        [(x * 7 + y * 13 + ch * 29) % 256 for x in range(w) for ch in range(c)]
        for y in range(h)
    ]


def test_roundtrip_24bit():
    rows = _rows(5, 4)  # width 5 exercises row padding (15 bytes → 16)
    img = decode_bmp(encode_bmp(rows))
    assert (img.width, img.height, img.channels) == (5, 4, 3)
    assert img.rows == rows


def test_roundtrip_32bit_rgba():
    rows = _rows(3, 2, c=4)
    img = decode_bmp(encode_bmp(rows, channels=4))
    assert (img.width, img.height, img.channels) == (3, 2, 4)
    assert img.rows == rows


def test_top_down_and_bottom_up_agree():
    rows = _rows(4, 3)
    up = decode_bmp(encode_bmp(rows, top_down=False))
    down = decode_bmp(encode_bmp(rows, top_down=True))
    assert up.rows == down.rows == rows


def test_8bit_palette():
    # hand-build: 2×2, palette of 3 colors, bottom-up, row padded to 4
    pal = [(250, 10, 20), (0, 128, 255), (7, 7, 7)]
    pal_bytes = b"".join(bytes((b, g, r, 0)) for r, g, b in pal)
    data_off = 14 + 40 + len(pal_bytes)
    # bottom-up: file row 0 is image row 1
    pix = bytes([2, 1, 0, 0]) + bytes([0, 1, 0, 0])
    blob = (
        struct.pack("<2sIHHI", b"BM", data_off + len(pix), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, len(pix), 0, 0, 3, 0)
        + pal_bytes
        + pix
    )
    img = decode_bmp(blob)
    assert img.channels == 3
    assert img.rows == [
        [250, 10, 20, 0, 128, 255],       # top row    = indices 0, 1
        [7, 7, 7, 0, 128, 255],           # bottom row = indices 2, 1
    ]


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b[:20], "truncated"),
        (lambda b: b"XX" + b[2:], "not a BMP"),
        (lambda b: b[:28] + struct.pack("<H", 16) + b[30:], "unsupported bpp"),
        (lambda b: b[:-8], "truncated BMP pixel data"),
        (lambda b: b[:26] + struct.pack("<H", 2) + b[28:], "planes"),
    ],
)
def test_malformed_raises_value_error(mutate, msg):
    blob = encode_bmp(_rows(4, 4))
    with pytest.raises(ValueError, match=msg):
        decode_bmp(mutate(blob))


def test_compressed_rejected():
    blob = bytearray(encode_bmp(_rows(4, 4)))
    struct.pack_into("<I", blob, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="BI_RGB"):
        decode_bmp(bytes(blob))


def test_ahash_is_codec_agnostic():
    """The SAME pixels through PNG and BMP must produce the SAME aHash —
    cross-format near-dup detection is the point of the shared
    rows-of-channel-ints contract."""
    from tests.test_png_codec import encode_png

    from vlm_data_pipeline_spark.sources.multimodal import image_ahash_64

    rows = _rows(16, 16)  # RGB
    h_png = image_ahash_64(encode_png(rows, color_type=2))
    h_bmp = image_ahash_64(encode_bmp(rows))
    assert h_png == h_bmp

    # and a genuinely different image gets a different hash
    other = [[255 - v for v in row] for row in rows]
    assert image_ahash_64(encode_bmp(other)) != h_bmp


def test_default_decoder_handles_bmp():
    from vlm_data_pipeline_spark.sources.multimodal import (
        _default_image_decoder,
    )

    rows = [[10, 20, 30, 40, 50, 60]]  # 2×1 RGB
    out = _default_image_decoder("a", encode_bmp(rows))
    assert out["width"] == 2 and out["height"] == 1 and out["channels"] == 3
    assert out["mean_luma"] == pytest.approx(sum(rows[0]) / (6 * 255.0), abs=1e-6)


def test_non_png_bmp_still_raises():
    from vlm_data_pipeline_spark.sources.multimodal import image_ahash_64

    # JPEG magic now routes to the real baseline decoder, so garbage
    # after the SOI marker is corrupt DATA (ValueError → robust skip),
    # not a missing capability
    with pytest.raises(ValueError):
        image_ahash_64(b"\xff\xd8\xff\xe0 jpeg-ish")
    # genuinely unsupported formats still raise the capability error
    with pytest.raises(NotImplementedError, match="PNG/BMP"):
        image_ahash_64(b"GIF89a not a supported codec")
