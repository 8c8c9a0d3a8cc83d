"""Y4M video codec + video stages: round-trips, colorspace geometry,
malformed-input policy, and the shared-hash composition (video frame
hashes feeding the image near-dup pipeline)."""

from __future__ import annotations

import pytest

from vlm_data_pipeline_spark.sources.y4m_codec import decode_y4m, encode_y4m


def _frames(n=3, w=16, h=8):
    return [
        [[(x * 5 + y * 11 + f * 31) % 256 for x in range(w)] for y in range(h)]
        for f in range(n)
    ]


def test_roundtrip_mono():
    fr = _frames()
    v = decode_y4m(encode_y4m(fr, fps=(30, 1)))
    assert (v.width, v.height, v.n_frames) == (16, 8, 3)
    assert v.fps_num == 30 and v.duration_s == pytest.approx(0.1)
    for i in range(3):
        assert v.luma_rows(i) == fr[i]


def test_roundtrip_420_chroma_planes():
    fr = _frames(2)
    v = decode_y4m(encode_y4m(fr, colorspace="420jpeg"))
    assert v.colorspace == "420jpeg"
    assert v.luma_rows(0) == fr[0]
    assert len(v.frames[0]["u"]) == (16 // 2) * (8 // 2)
    assert v.frames[0]["u"] == b"\x80" * 32


def test_max_frames_probe():
    v = decode_y4m(encode_y4m(_frames(5)), max_frames=2)
    assert v.n_frames == 2


def test_default_fps_and_422():
    blob = encode_y4m(_frames(1), colorspace="422")
    v = decode_y4m(blob)
    assert len(v.frames[0]["u"]) == (16 // 2) * 8


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"XXXX" + b[4:], "not a Y4M"),
        (lambda b: b.replace(b"W16", b"W0"), "invalid Y4M geometry"),
        (lambda b: b.replace(b"Cmono", b"C410"), "unsupported colorspace"),
        (lambda b: b[:-10], "truncated frame"),
        (lambda b: b.replace(b"FRAME\n", b"FRUME\n", 1), "missing FRAME marker"),
        (lambda b: b.replace(b"W16", b"W15"), "divisible"),
    ],
)
def test_malformed_raises_value_error(mutate, msg):
    blob = encode_y4m(_frames(2), colorspace="420" if "divisible" in msg else "mono")
    with pytest.raises(ValueError, match=msg):
        decode_y4m(mutate(blob))


def test_odd_dims_rejected_for_420_only():
    odd = [[[10] * 15 for _ in range(8)]]
    with pytest.raises(ValueError, match="divisible"):
        decode_y4m(encode_y4m(odd, colorspace="420"))
    assert decode_y4m(encode_y4m(odd, colorspace="mono")).width == 15


def test_video_features_stage(spark):
    from vlm_data_pipeline_spark.sources.multimodal import video_features

    blob = encode_y4m(_frames(4), fps=(24, 1))
    assets = spark.createDataFrame(
        [("v1", bytearray(blob))], "asset_id string, payload binary"
    )
    row = video_features(assets).collect()[0]
    assert (row.width, row.height, row.n_frames) == (16, 8, 4)
    assert row.fps == pytest.approx(24.0)
    assert row.duration_s == pytest.approx(4 / 24, abs=1e-6)

    with pytest.raises(Exception, match="Y4M"):
        video_features(
            spark.createDataFrame(
                [("m", bytearray(b"\x00mp4"))], "asset_id string, payload binary"
            )
        ).collect()


def test_video_frame_hashes_feed_phash_near_pairs(spark):
    """The flagship composition: per-frame hashes from two videos that
    share frame content land in the SAME banded-hamming pipeline the
    image dedup uses — near-identical frames pair up, distinct don't."""
    from pyspark.sql import functions as F

    from vlm_data_pipeline_spark.sources.multimodal import (
        phash_near_pairs,
        video_frame_hashes,
    )

    base = _frames(2, w=16, h=16)
    # near-copy: one pixel lightly perturbed in frame 0
    near = [
        [[min(255, v + (1 if (x == y == 0 and f == 0) else 0))
          for x, v in enumerate(row)] for y, row in enumerate(fr)]
        for f, fr in enumerate(base)
    ]
    far = [
        [[255 - v for v in row] for row in fr] for fr in base
    ]
    assets = spark.createDataFrame(
        [
            ("vidA", bytearray(encode_y4m(base))),
            ("vidB", bytearray(encode_y4m(near))),
            ("vidC", bytearray(encode_y4m(far))),
        ],
        "asset_id string, payload binary",
    )
    hashes = video_frame_hashes(assets).select(
        F.concat_ws("#", "asset_id", F.col("frame_idx").cast("string")).alias(
            "asset_id"
        ),
        "phash",
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in phash_near_pairs(hashes, max_hamming=4).collect()
    }
    # same-content frames across A and B pair; inverted video C pairs with
    # nothing from A/B
    assert ("vidA#0", "vidB#0") in pairs or ("vidB#0", "vidA#0") in pairs
    assert ("vidA#1", "vidB#1") in pairs or ("vidB#1", "vidA#1") in pairs
    assert not any("vidC" in a and "vidA" in b or "vidA" in a and "vidC" in b
                   for a, b in pairs)


def test_video_frame_hashes_stride(spark):
    from vlm_data_pipeline_spark.sources.multimodal import video_frame_hashes

    blob = encode_y4m(_frames(6))
    assets = spark.createDataFrame(
        [("v", bytearray(blob))], "asset_id string, payload binary"
    )
    idx = sorted(
        r.frame_idx for r in video_frame_hashes(assets, stride=2).collect()
    )
    assert idx == [0, 2, 4]
    with pytest.raises(ValueError, match="stride"):
        video_frame_hashes(assets, stride=0)


def test_high_bit_depth_colorspaces_rejected():
    """C420p10/C444p16 are 2 bytes/sample — prefix matching would decode
    them as 8-bit garbage at half the true frame size; they must raise
    the unsupported-colorspace error instead."""
    blob = encode_y4m(_frames(1), colorspace="420")
    for cs in (b"C420p10", b"C444p16", b"C422p12"):
        bad = blob.replace(b"C420", cs, 1)
        with pytest.raises(ValueError, match="unsupported colorspace"):
            decode_y4m(bad)


def test_frame_stride_pushdown():
    """frame_stride keeps 1/k of the plane bytes but still counts and
    indexes the full stream (duration unchanged, true stream indices)."""
    v = decode_y4m(encode_y4m(_frames(6), fps=(30, 1)), frame_stride=3)
    assert v.total_frames == 6
    assert v.n_frames == 2
    assert v.frame_indices == [0, 3]
    assert v.duration_s == pytest.approx(0.2)
    assert v.luma_rows(0) == _frames(6)[0]
    assert v.luma_rows(1) == _frames(6)[3]
