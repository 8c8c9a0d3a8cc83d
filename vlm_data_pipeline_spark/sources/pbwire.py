"""Minimal pure-Python protobuf *wire-format* reader (S6 decode path).

The protobuf wire format is a public, stable spec
(https://protobuf.dev/programming-guides/encoding/): a message is a stream
of (tag, payload) records where tag = (field_number << 3) | wire_type and
wire types are 0 = varint, 1 = fixed64, 2 = length-delimited, 5 = fixed32.
That is all that's needed to read Objectron ``.pbdata`` files — so instead
of depending on the (absent-here) generated pb2 modules, this module walks
the wire records directly, using the field numbers from the vendored schema
(/root/reference/data_processing/objectron/schema/annotation_data.proto,
object.proto, a_r_capture_metadata.proto — cited for parity, not copied:
those are google's published Objectron schemas).

Only the reading half lives in the library; tests encode fixture messages
with their own tiny writer to prove end-to-end decode of real protobuf
bytes without the protobuf package.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import Any

__all__ = [
    "iter_fields",
    "packed_floats",
    "packed_varints",
    "parse_objectron_sequence",
    "parse_tf_example",
    "iter_tfrecords",
]


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if i >= len(buf):
            raise ValueError("truncated varint")
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def iter_fields(buf: bytes) -> Iterator[tuple[int, int, Any]]:
    """Yield (field_number, wire_type, value) over one message's records.

    value is an int for varint/fixed types' raw bits, bytes for LEN.
    Unknown fields are yielded too (callers skip what they don't know) —
    the same forward-compat behavior real protobuf has.
    """
    i, n = 0, len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            val, i = _read_varint(buf, i)
        elif wt == 1:
            if i + 8 > n:
                raise ValueError("truncated fixed64")
            val = int.from_bytes(buf[i : i + 8], "little")
            i += 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            if i + ln > n:
                # a silent short slice would hand downstream parsers a
                # plausible-looking but wrong payload
                raise ValueError("truncated LEN field")
            val = buf[i : i + ln]
            i += ln
        elif wt == 5:
            if i + 4 > n:
                raise ValueError("truncated fixed32")
            val = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        else:  # groups (3/4) are long-deprecated and absent from proto3
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def _f32(bits: int) -> float:
    return struct.unpack("<f", bits.to_bytes(4, "little"))[0]


def _f64(bits: int) -> float:
    return struct.unpack("<d", bits.to_bytes(8, "little"))[0]


def packed_floats(b: bytes) -> list[float]:
    """LEN payload of packed 32-bit floats → list[float]."""
    return list(struct.unpack(f"<{len(b) // 4}f", b[: len(b) // 4 * 4]))


# ---------------------------------------------------------------------------
# Objectron Sequence (annotation_data.proto)
# ---------------------------------------------------------------------------


def _parse_point3d(b: bytes) -> list[float]:
    # Point3D: x=1, y=2, z=3 (float)
    p = [0.0, 0.0, 0.0]
    for f, wt, v in iter_fields(b):
        if wt == 5 and 1 <= f <= 3:
            p[f - 1] = _f32(v)
    return p


def _parse_point2d(b: bytes) -> list[float]:
    # NormalizedPoint2D: x=1, y=2, depth=3 — the reference keeps (x, y)
    p = [0.0, 0.0]
    for f, wt, v in iter_fields(b):
        if wt == 5 and 1 <= f <= 2:
            p[f - 1] = _f32(v)
    return p


def _parse_keypoint(b: bytes) -> tuple[list[float] | None, list[float] | None]:
    # AnnotatedKeyPoint: id=1, point_3d=2, point_2d=3
    p3 = p2 = None
    for f, wt, v in iter_fields(b):
        if f == 2 and wt == 2:
            p3 = _parse_point3d(v)
        elif f == 3 and wt == 2:
            p2 = _parse_point2d(v)
    return p3, p2


def _parse_annotation(b: bytes) -> dict[str, Any]:
    # ObjectAnnotation: object_id=1, keypoints=2 (repeated), visibility=3
    out: dict[str, Any] = {
        "object_id": 0,
        "keypoints_3d": [],
        "keypoints_2d": [],
        "visibility": 0.0,
    }
    for f, wt, v in iter_fields(b):
        if f == 1 and wt == 0:
            out["object_id"] = v
        elif f == 2 and wt == 2:
            p3, p2 = _parse_keypoint(v)
            if p3 is not None:
                out["keypoints_3d"].append(p3)
            if p2 is not None:
                out["keypoints_2d"].append(p2)
        elif f == 3 and wt == 5:
            out["visibility"] = _f32(v)
    return out


def _parse_camera(b: bytes) -> dict[str, Any]:
    # ARCamera: image_resolution_width=5, image_resolution_height=6,
    # intrinsics=7 (packed float), view_matrix=9 (packed float)
    cam: dict[str, Any] = {
        "intrinsics": None,
        "view_matrix": None,
        "width": None,
        "height": None,
    }
    for f, wt, v in iter_fields(b):
        if f == 7 and wt == 2:
            cam["intrinsics"] = packed_floats(v)
        elif f == 9 and wt == 2:
            cam["view_matrix"] = packed_floats(v)
        elif f == 5 and wt == 0:
            cam["width"] = v
        elif f == 6 and wt == 0:
            cam["height"] = v
        elif f == 7 and wt == 5:  # unpacked fallback
            cam.setdefault("_intr", []).append(_f32(v))
        elif f == 9 and wt == 5:
            cam.setdefault("_view", []).append(_f32(v))
    if cam["intrinsics"] is None and "_intr" in cam:
        cam["intrinsics"] = cam.pop("_intr")
    if cam["view_matrix"] is None and "_view" in cam:
        cam["view_matrix"] = cam.pop("_view")
    return cam


def _parse_frame(b: bytes) -> dict[str, Any]:
    # FrameAnnotation: frame_id=1, annotations=2 (repeated), camera=3,
    # timestamp=4 (double)
    fr: dict[str, Any] = {
        "frame_id": 0,
        "timestamp": 0.0,
        "camera": None,
        "annotations": [],
    }
    for f, wt, v in iter_fields(b):
        if f == 1 and wt == 0:
            fr["frame_id"] = v
        elif f == 2 and wt == 2:
            fr["annotations"].append(_parse_annotation(v))
        elif f == 3 and wt == 2:
            fr["camera"] = _parse_camera(v)
        elif f == 4 and wt == 1:
            fr["timestamp"] = _f64(v)
    return fr


def _parse_object(b: bytes) -> dict[str, Any]:
    # Object (object.proto): id=1, category=2 (string)
    obj: dict[str, Any] = {"id": 0, "category": None}
    for f, wt, v in iter_fields(b):
        if f == 1 and wt == 0:
            obj["id"] = v
        elif f == 2 and wt == 2:
            obj["category"] = v.decode("utf-8", errors="replace")
    return obj


def parse_objectron_sequence(content: bytes) -> dict[str, Any]:
    """One ``.pbdata`` file = one Sequence message:
    objects=1 (repeated Object), frame_annotations=2 (repeated
    FrameAnnotation). Returns {"objects": [...], "frames": [...]}."""
    seq: dict[str, Any] = {"objects": [], "frames": []}
    for f, wt, v in iter_fields(content):
        if f == 1 and wt == 2:
            seq["objects"].append(_parse_object(v))
        elif f == 2 and wt == 2:
            seq["frames"].append(_parse_frame(v))
    return seq


# ---------------------------------------------------------------------------
# tf.Example / TFRecord (§2.11 tail — objectron/dataset/parser.py:16-108)
# ---------------------------------------------------------------------------
#
# tf.train.Example is an ordinary protobuf message (public TensorFlow
# schema, tensorflow/core/example/example.proto + feature.proto):
#   Example.features = 1 (Features)
#   Features.feature = 1 (map<string, Feature> — wire: repeated entries
#                         with key = 1, value = 2)
#   Feature.kind: bytes_list = 1, float_list = 2, int64_list = 3
#   BytesList.value = 1 (repeated bytes), FloatList.value = 1 (repeated
#   float, usually packed), Int64List.value = 1 (repeated varint).
# The same wire walker reads it — no tensorflow dependency.


def packed_varints(b: bytes) -> list[int]:
    """LEN payload of packed varints → list[int]."""
    out: list[int] = []
    i = 0
    while i < len(b):
        v, i = _read_varint(b, i)
        out.append(v)
    return out


def _parse_float_list(b: bytes) -> list[float]:
    vals: list[float] = []
    for f, wt, v in iter_fields(b):
        if f != 1:
            continue
        if wt == 2:  # packed
            vals.extend(packed_floats(v))
        elif wt == 5:  # unpacked element
            vals.append(_f32(v))
    return vals


def _parse_int64_list(b: bytes) -> list[int]:
    vals: list[int] = []
    for f, wt, v in iter_fields(b):
        if f != 1:
            continue
        if wt == 2:
            vals.extend(packed_varints(v))
        elif wt == 0:
            vals.append(v)
    return vals


def _parse_feature(b: bytes):
    for f, wt, v in iter_fields(b):
        if wt != 2:
            continue
        if f == 1:  # BytesList
            return [bv for ff, wwt, bv in iter_fields(v) if ff == 1 and wwt == 2]
        if f == 2:  # FloatList
            return _parse_float_list(v)
        if f == 3:  # Int64List
            return _parse_int64_list(v)
    return []


def parse_tf_example(buf: bytes) -> dict[str, list]:
    """Serialized tf.train.Example → {feature name: value list}.

    Value lists keep the wire kind: list[bytes] for bytes_list,
    list[float] for float_list, list[int] for int64_list — exactly the
    ``fm[name].<kind>_list.value`` views the reference parser reads."""
    features: dict[str, list] = {}
    for f, wt, v in iter_fields(buf):
        if f != 1 or wt != 2:  # Example.features
            continue
        for ff, wwt, entry in iter_fields(v):
            if ff != 1 or wwt != 2:  # Features.feature map entry
                continue
            key, val = None, []
            for ef, ewt, ev in iter_fields(entry):
                if ef == 1 and ewt == 2:
                    key = ev.decode("utf-8", errors="replace")
                elif ef == 2 and ewt == 2:
                    val = _parse_feature(ev)
            if key is not None:
                features[key] = val
    return features


def iter_tfrecords(content: bytes) -> Iterator[bytes]:
    """Iterate the records of a TFRecord file (public framing: u64-LE
    length, u32 length-crc, payload, u32 payload-crc). CRCs are not
    verified — corrupt files surface as parse errors downstream, and the
    masked-crc32c function would be the only new dependency."""
    i, n = 0, len(content)
    while i + 12 <= n:
        (length,) = struct.unpack("<Q", content[i : i + 8])
        start = i + 12
        # the trailing 4-byte payload CRC must be present too: a file cut
        # inside it is just as truncated as one cut inside the payload
        if start + length + 4 > n:
            raise ValueError("truncated TFRecord")
        yield content[start : start + length]
        i = start + length + 4
    if 0 < n - i < 12:
        # partial trailing header (file cut mid-framing) — symmetric with
        # the mid-payload case above, not silently ignorable
        raise ValueError("truncated TFRecord")
