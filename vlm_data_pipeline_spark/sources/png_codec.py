"""Minimal pure-Python PNG decoder (S8/F7 decode path).

PNG is a public spec (RFC 2083 / ISO 15948): chunked container, IHDR
geometry, zlib-compressed IDAT, five per-scanline filters. The subset here
— bit depths 8 and 16, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), no interlace — covers every mask/depth PNG the
reference pipeline touches (8-bit instance/semantic masks, 16-bit depth,
taskonomy_processor.py:280-330) without Pillow/cv2, using only stdlib
``zlib``/``struct``.

Output is rows of per-pixel channel tuples flattened to ints — callers
reduce them (per-instance counts, AABBs, depth stats) INSIDE the decode
stage so executors ship kilobytes, not megapixels, into any shuffle.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["decode_png", "PngImage"]

_SIG = b"\x89PNG\r\n\x1a\n"

# channels per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngImage:
    __slots__ = ("width", "height", "bit_depth", "color_type", "channels", "rows")

    def __init__(self, width, height, bit_depth, color_type, channels, rows):
        self.width = width
        self.height = height
        self.bit_depth = bit_depth
        self.color_type = color_type
        self.channels = channels
        # rows: list[list[int]] — each row is width*channels channel values
        self.rows = rows

    def pixel(self, x: int, y: int) -> tuple[int, ...]:
        c = self.channels
        row = self.rows[y]
        return tuple(row[x * c : (x + 1) * c])


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(content: bytes, apply_palette: bool = True) -> PngImage:
    """Decode a non-interlaced PNG to integer channel rows.

    For color type 3 the palette is applied, yielding RGB rows. 16-bit
    samples stay 16-bit ints (the taskonomy depth encoding).
    ``apply_palette=False`` returns color-type-3 rows as the RAW 1-channel
    palette indices instead — what a mask reader wants (cv2
    IMREAD_GRAYSCALE semantics): distinct instances stay distinct even
    when their palette RGB entries collide.
    """
    if content[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    i = 8
    ihdr = None
    idat = bytearray()
    palette: bytes | None = None
    while i < len(content):
        (length,) = struct.unpack(">I", content[i : i + 4])
        ctype = content[i + 4 : i + 8]
        data = content[i + 8 : i + 8 + length]
        i += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            palette = data
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, bit_depth, color_type, comp, filt, interlace = ihdr
    # Dimension sanity BEFORE any geometry math: the spec forbids zero
    # dimensions, and height=0 would make the truncated-IDAT check below
    # vacuous — a bit-flipped IHDR would then decode to a silent empty
    # image instead of the contract's ValueError (round-6 fuzz finding).
    if width < 1 or height < 1:
        raise ValueError(f"invalid PNG dimensions {width}x{height}")
    if width > 1 << 24 or height > 1 << 24:
        raise ValueError(f"implausible PNG dimensions {width}x{height}")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if bit_depth not in (8, 16) or color_type not in _CHANNELS:
        raise ValueError(f"unsupported bit depth/color type {bit_depth}/{color_type}")

    channels = _CHANNELS[color_type]
    bpp = channels * (bit_depth // 8)  # filter unit: bytes per pixel
    stride = width * bpp
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        # normalize: every decode failure is a ValueError, so callers and
        # the on_error='skip' policy handle one exception family
        raise ValueError(f"corrupt IDAT stream: {exc}") from exc
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated IDAT")

    rows: list[list[int]] = []
    prev = bytearray(stride)
    pos = 0
    for _y in range(height):
        ftype = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if ftype == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + _paeth(a, prev[x], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown filter type {ftype}")
        prev = line
        if bit_depth == 8:
            vals = list(line)
        else:  # 16-bit big-endian samples
            vals = [
                (line[k] << 8) | line[k + 1] for k in range(0, stride, 2)
            ]
        rows.append(vals)

    if color_type == 3:
        if not apply_palette:
            return PngImage(width, height, bit_depth, color_type, 1, rows)
        if palette is None:
            raise ValueError("palette image missing PLTE")
        rgb_rows = []
        for row in rows:
            out: list[int] = []
            for idx in row:
                out.extend(palette[idx * 3 : idx * 3 + 3])
            rgb_rows.append(out)
        return PngImage(width, height, bit_depth, color_type, 3, rgb_rows)
    return PngImage(width, height, bit_depth, color_type, channels, rows)
