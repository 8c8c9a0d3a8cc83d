"""PNG decode path (sources/png_codec.py): a test-side encoder writes real
PNG bytes (all five filter types), the library decodes them, and the
DEFAULT taskonomy mask parser reduces them end-to-end with no injected
fake and no PIL/cv2."""

from __future__ import annotations

import struct
import zlib

import pytest

from vlm_data_pipeline_spark.sources import taskonomy
from vlm_data_pipeline_spark.sources.png_codec import decode_png


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(rows, bit_depth=8, color_type=0, palette=None, filters=None):
    """Encode channel-value rows as a real PNG, cycling filter types so the
    decoder's unfiltering is actually exercised."""
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    height = len(rows)
    width = len(rows[0]) // channels
    bpp = channels * (bit_depth // 8)

    def to_bytes(row):
        if bit_depth == 8:
            return bytearray(row)
        out = bytearray()
        for v in row:
            out += struct.pack(">H", v)
        return out

    raw = bytearray()
    prev = bytearray(width * bpp)
    for y, row in enumerate(rows):
        line = to_bytes(row)
        f = (filters or [0, 1, 2, 3, 4])[y % len(filters or [0, 1, 2, 3, 4])]
        filt = bytearray(len(line))
        for x in range(len(line)):
            a = line[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                filt[x] = line[x]
            elif f == 1:
                filt[x] = (line[x] - a) & 0xFF
            elif f == 2:
                filt[x] = (line[x] - b) & 0xFF
            elif f == 3:
                filt[x] = (line[x] - ((a + b) >> 1)) & 0xFF
            else:
                filt[x] = (line[x] - _paeth(a, b, c)) & 0xFF
        raw.append(f)
        raw += filt
        prev = line

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    png = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if palette is not None:
        png += _chunk(b"PLTE", bytes(palette))
    png += _chunk(b"IDAT", zlib.compress(bytes(raw)))
    png += _chunk(b"IEND", b"")
    return png


def test_decode_gray8_all_filters():
    rows = [[(x * 7 + y * 13) % 256 for x in range(10)] for y in range(6)]
    img = decode_png(encode_png(rows))
    assert (img.width, img.height, img.channels) == (10, 6, 1)
    assert img.rows == rows


def test_decode_rgb8():
    rows = [
        [v for x in range(5) for v in (x * 20, y * 30, (x + y) % 256)]
        for y in range(4)
    ]
    img = decode_png(encode_png(rows, color_type=2))
    assert (img.width, img.height, img.channels) == (5, 4, 3)
    assert img.rows == rows
    assert img.pixel(2, 1) == (40, 30, 3)


def test_decode_gray16_depth():
    rows = [[1000 * y + 257 * x for x in range(4)] for y in range(3)]
    img = decode_png(encode_png(rows, bit_depth=16))
    assert img.rows == rows  # 16-bit samples survive exactly (depth maps)


def test_decode_palette():
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    rows = [[0, 1, 2], [2, 1, 0]]
    img = decode_png(encode_png(rows, color_type=3, palette=palette))
    assert img.channels == 3
    assert img.pixel(0, 0) == (255, 0, 0)
    assert img.pixel(2, 0) == (0, 0, 255)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x01" * 40)


def test_decode_rejects_zero_dimensions():
    """Round-6 fuzz falsifying example pinned: a 1x1 PNG with one bit
    flipped in the IHDR height field must raise ValueError, not decode to
    a silent zero-height image (the height*(stride+1) truncation check is
    vacuous at height=0)."""
    blob = bytearray(encode_png([[0]]))
    # IHDR layout: 8-byte sig, 4-byte len, 4-byte 'IHDR', width@16, height@20
    assert blob[12:16] == b"IHDR"
    blob[23] ^= 0x01  # height 1 -> 0
    with pytest.raises(ValueError, match="dimensions"):
        decode_png(bytes(blob))
    # and zero width, same contract
    blob2 = bytearray(encode_png([[0]]))
    blob2[19] ^= 0x01  # width 1 -> 0
    with pytest.raises(ValueError, match="dimensions"):
        decode_png(bytes(blob2))


def test_default_mask_parser_end_to_end(spark, tmp_path):
    """Real PNG bytes → default parser (no injection) → per-instance
    counts + AABBs, through the full binaryFile/mapInPandas stage."""
    mask = [[0] * 8 for _ in range(6)]
    for y in range(1, 4):        # instance 5: rows 1-3, cols 2-4 (9 px)
        for x in range(2, 5):
            mask[y][x] = 5
    mask[5][7] = 9               # instance 9: single pixel at (7,5)
    (tmp_path / "point_3_view_1_domain_segmentunlabeled.png").write_bytes(
        encode_png(mask)
    )

    pixels = taskonomy.read_instance_pixels(spark, str(tmp_path))
    rows = {r.instance_id: r for r in pixels.collect()}
    assert set(rows) == {5, 9}
    assert rows[5].n_pixels == 9
    assert (rows[5].x_min, rows[5].y_min, rows[5].x_max, rows[5].y_max) == (2, 1, 4, 3)
    assert rows[9].n_pixels == 1
    assert (rows[9].x_min, rows[9].y_min, rows[9].x_max, rows[9].y_max) == (7, 5, 7, 5)

    boxes = taskonomy.pixel_aabb_boxes(pixels, min_side=1, min_area=4).collect()
    assert len(boxes) == 1  # the single-pixel instance is filtered out


def test_instance_depth_boxes_end_to_end(spark, tmp_path):
    """F7 depth unprojection (taskonomy_processor.py:148-213) over REAL
    PNG bytes: 8-bit instance mask + 16-bit depth, paired by (point, view),
    checked against a numpy transliteration of the reference."""
    import numpy as np

    fx, fy, cx, cy = 20.0, 18.0, 16.0, 12.0
    h, w = 24, 32
    rng = [[0] * w for _ in range(h)]
    depth_mm = [[0] * w for _ in range(h)]
    # instance 3: a 10x8 patch at depth ~2m with a gradient; instance 7:
    # a small 2x2 patch (only 4 valid points → rejected by min_points)
    for y in range(5, 13):
        for x in range(4, 14):
            rng[y][x] = 3
            depth_mm[y][x] = 2000 + 10 * (x - 4) + 5 * (y - 5)
    for y in range(20, 22):
        for x in range(28, 30):
            rng[y][x] = 7
            depth_mm[y][x] = 1500
    # instance 9: valid size but all depths zero → rejected (no valid depth)
    for y in range(15, 19):
        for x in range(2, 10):
            rng[y][x] = 9

    (tmp_path / "point_4_view_2_domain_segmentunlabeled.png").write_bytes(
        encode_png(rng)
    )
    (tmp_path / "point_4_view_2_domain_depth_euclidean.png").write_bytes(
        encode_png(depth_mm, bit_depth=16)
    )

    inst = taskonomy.read_view_contents(spark, str(tmp_path), "*segmentunlabeled.png")
    dep = taskonomy.read_view_contents(spark, str(tmp_path), "*depth_euclidean.png")
    out = taskonomy.instance_depth_boxes(inst, dep, fx, fy, cx, cy).collect()
    assert [r.instance_id for r in out] == [3]
    r = out[0]
    assert (r.point_id, r.view_id) == (4, 2)

    # numpy reference (taskonomy_processor.py:194-205)
    im = np.array(rng)
    dm = np.array(depth_mm, dtype=np.float64) / 1000.0
    vs, us = np.where((im == 3) & (dm > 0) & (dm < 100))
    d = dm[vs, us]
    X = (us - cx) * d / fx
    Y = (vs - cy) * d / fy
    assert r.n_points == len(d)
    assert abs(r.x - (X.min() + X.max()) / 2) < 1e-12
    assert abs(r.y - (Y.min() + Y.max()) / 2) < 1e-12
    assert abs(r.z - (d.min() + d.max()) / 2) < 1e-12
    assert abs(r.xl - (X.max() - X.min())) < 1e-12
    assert abs(r.zl - (d.max() - d.min())) < 1e-12


def test_decode_palette_raw_indices():
    """apply_palette=False returns the raw 1-channel palette indices —
    the mask-reader path (cv2 IMREAD_GRAYSCALE semantics): instances whose
    palette RGB entries collide must stay distinct."""
    # palette entries 1 and 2 collide on the same RGB color
    palette = bytes([0, 0, 0, 7, 7, 7, 7, 7, 7])
    rows = [[0, 1, 2], [2, 1, 0]]
    img = decode_png(
        encode_png(rows, color_type=3, palette=palette), apply_palette=False
    )
    assert img.channels == 1
    assert img.rows == rows


def test_mask_parser_palette_collision(spark, tmp_path):
    """End-to-end: a palette mask whose entries share one RGB color still
    yields two distinct instances through the default parser."""
    palette = bytes([0, 0, 0, 9, 9, 9, 9, 9, 9])
    mask = [[0, 1, 1], [0, 2, 0]]
    (tmp_path / "point_1_view_1_domain_segmentunlabeled.png").write_bytes(
        encode_png(mask, color_type=3, palette=palette)
    )
    pixels = taskonomy.read_instance_pixels(spark, str(tmp_path))
    rows = {r.instance_id: r.n_pixels for r in pixels.collect()}
    assert rows == {1: 2, 2: 1}


def test_on_error_skip_and_decode_error_audit(spark, tmp_path):
    """A corrupt file in the tree: fail mode raises, skip mode yields the
    good file's rows, and file_decode_errors names the bad file with the
    exception text — the production triage loop."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from vlm_data_pipeline_spark.sources.robust import file_decode_errors
    from vlm_data_pipeline_spark.sources.taskonomy import _default_mask_parser

    good = [[0, 3], [3, 0]]
    (tmp_path / "point_1_view_1_domain_segmentunlabeled.png").write_bytes(
        encode_png(good)
    )
    (tmp_path / "point_2_view_1_domain_segmentunlabeled.png").write_bytes(
        b"\x89PNG but actually garbage"
    )

    with _pytest.raises(Exception):
        taskonomy.read_instance_pixels(spark, str(tmp_path)).collect()

    rows = taskonomy.read_instance_pixels(
        spark, str(tmp_path), on_error="skip"
    ).collect()
    assert {r.instance_id for r in rows} == {3}
    assert all("point_1" in r.path for r in rows)

    errs = file_decode_errors(
        spark, str(tmp_path), "*.png", _default_mask_parser
    ).collect()
    assert len(errs) == 1
    assert "point_2" in errs[0].path
    assert "ValueError" in errs[0].error

    with _pytest.raises(ValueError, match="on_error"):
        taskonomy.read_instance_pixels(spark, str(tmp_path), on_error="bogus")
