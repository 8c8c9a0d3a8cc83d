"""Pure-Python Y4M (YUV4MPEG2) decoder — the uncompressed VIDEO codec
completing the modality triad (PNG/BMP images, WAV audio, Y4M video):
every modality has a REAL stdlib decode path, with compressed containers
(mp4/mkv need ffmpeg) behind the injected-decoder seam.

Y4M is the interchange format ffmpeg/x264 pipelines use for raw video:
one ASCII header line (``YUV4MPEG2 W<w> H<h> F<num>:<den> [Ip A.. C..]``)
then per-frame ``FRAME[params]\\n`` markers followed by raw planar YUV.
Supported colorspaces: C420 (+jpeg/mpeg2/paldv variants), C422, C444,
Cmono. Luma planes come back as height×width lists of ints — the same
per-pixel convention the image codecs use, so frame-level consumers
(aHash for video near-dup, luma stats) are shared, not re-implemented.

Malformed input raises ValueError (normalized by ``sources.robust``).
"""

from __future__ import annotations

__all__ = ["decode_y4m", "Y4mVideo", "encode_y4m"]

_MAGIC = b"YUV4MPEG2"

# chroma plane size divisors (w_div, h_div) per colorspace family
_SUBSAMPLING = {
    "420": (2, 2),
    "422": (2, 1),
    "444": (1, 1),
    "mono": None,
}


class Y4mVideo:
    __slots__ = ("width", "height", "fps_num", "fps_den", "colorspace", "frames")

    def __init__(self, width, height, fps_num, fps_den, colorspace, frames):
        self.width = width
        self.height = height
        self.fps_num = fps_num
        self.fps_den = fps_den
        self.colorspace = colorspace
        # frames: list of dicts {"y": bytes (h*w), "u": bytes|None,
        # "v": bytes|None} — raw planes; luma_rows() adapts to the image
        # codecs' rows convention
        self.frames = frames

    @property
    def n_frames(self) -> int:
        return len(self.frames)

    @property
    def duration_s(self) -> float:
        return self.n_frames * self.fps_den / self.fps_num

    def luma_rows(self, frame_idx: int) -> list[list[int]]:
        """Frame's luma plane as height rows of width ints — the shared
        pixel contract of png_codec/bmp_codec (1-channel)."""
        y = self.frames[frame_idx]["y"]
        w = self.width
        return [list(y[r * w : (r + 1) * w]) for r in range(self.height)]


def _family(colorspace: str) -> str:
    if colorspace.startswith("420"):
        return "420"
    if colorspace.startswith("422"):
        return "422"
    if colorspace.startswith("444"):
        return "444"
    if colorspace.startswith("mono"):
        return "mono"
    raise ValueError(f"unsupported colorspace C{colorspace}")


def decode_y4m(content: bytes, max_frames: int | None = None) -> Y4mVideo:
    """Decode a YUV4MPEG2 stream; ``max_frames`` bounds work for probes
    (metadata + first-frame hashing shouldn't read a whole clip)."""
    nl = content.find(b"\n")
    if nl < 0 or not content.startswith(_MAGIC):
        raise ValueError("not a Y4M stream (missing YUV4MPEG2 header)")
    width = height = None
    fps_num, fps_den = 25, 1
    colorspace = "420jpeg"  # the spec's default
    for tok in content[len(_MAGIC) : nl].split():
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            width = int(t[1:])
        elif t.startswith("H"):
            height = int(t[1:])
        elif t.startswith("F"):
            num, _, den = t[1:].partition(":")
            fps_num, fps_den = int(num), int(den or "1")
        elif t.startswith("C"):
            colorspace = t[1:]
        # Ip/A../X.. params don't affect plane layout
    if not width or width <= 0 or not height or height <= 0:
        raise ValueError(f"invalid Y4M geometry W={width} H={height}")
    if fps_num <= 0 or fps_den <= 0:
        raise ValueError(f"invalid Y4M frame rate {fps_num}:{fps_den}")
    fam = _family(colorspace)
    sub = _SUBSAMPLING[fam]
    y_size = width * height
    if sub is None:
        c_size = 0
    else:
        if width % sub[0] or height % sub[1]:
            raise ValueError(
                f"C{colorspace} needs dimensions divisible by {sub}, "
                f"got {width}x{height}"
            )
        c_size = (width // sub[0]) * (height // sub[1])
    frame_bytes = y_size + 2 * c_size

    frames = []
    off = nl + 1
    while off < len(content):
        if max_frames is not None and len(frames) >= max_frames:
            break
        fnl = content.find(b"\n", off)
        if fnl < 0 or not content.startswith(b"FRAME", off):
            raise ValueError(f"missing FRAME marker at offset {off}")
        off = fnl + 1
        plane = content[off : off + frame_bytes]
        if len(plane) < frame_bytes:
            raise ValueError(
                f"truncated frame {len(frames)}: need {frame_bytes} bytes, "
                f"have {len(plane)}"
            )
        frames.append(
            {
                "y": plane[:y_size],
                "u": plane[y_size : y_size + c_size] if c_size else None,
                "v": plane[y_size + c_size :] if c_size else None,
            }
        )
        off += frame_bytes
    return Y4mVideo(width, height, fps_num, fps_den, colorspace, frames)


def encode_y4m(
    luma_frames: list[list[list[int]]],
    fps: tuple[int, int] = (25, 1),
    colorspace: str = "mono",
) -> bytes:
    """Minimal encoder (tests + fixtures): mono or 420 (chroma filled
    neutral 128) from luma row-lists. Round-trips through
    :func:`decode_y4m`."""
    if not luma_frames:
        raise ValueError("no frames")
    height = len(luma_frames[0])
    width = len(luma_frames[0][0])
    fam = _family(colorspace)
    header = (
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 "
        f"C{colorspace}\n"
    ).encode("ascii")
    sub = _SUBSAMPLING[fam]
    c_size = 0 if sub is None else (width // sub[0]) * (height // sub[1])
    out = bytearray(header)
    for rows in luma_frames:
        out += b"FRAME\n"
        for row in rows:
            out += bytes(row)
        out += b"\x80" * (2 * c_size)
    return bytes(out)
