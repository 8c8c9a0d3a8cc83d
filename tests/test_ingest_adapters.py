"""Ingest adapters for the six reference dataset formats (SURVEY §2.1).

Real files for everything stdlib-parseable (COCO JSON, SUN RGB-D text
matrices + annotation JSON, EmbodiedScan pickle, Hypersim CSV); injected
deterministic parsers for the binary formats whose decode libs aren't in
this container (HDF5, pbdata, PNG masks) — the Spark plumbing (binaryFile
fan-out, mapInPandas batching, schemas, joins, predicates) is exercised
for real in every case.
"""

from __future__ import annotations

import json
import pickle

import pytest
from pyspark.sql import functions as F

from vlm_data_pipeline_spark.schemas import FRAME


def same_shape(schema, expected=FRAME):
    """Name+type equality, ignoring nullability flags (not enforceable
    through lit()/joins and not part of the driver's compare)."""
    return schema.simpleString() == expected.simpleString()
from vlm_data_pipeline_spark.sources import (
    coco,
    hypersim,
    matterport,
    objectron,
    sunrgbd,
    taskonomy,
)

# ---------------------------------------------------------------- COCO (S3/J5)


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("coco")
    labels = {
        "images": [
            {"id": 1, "file_name": "a.jpg", "width": 640, "height": 480},
            {"id": 2, "file_name": "b.jpg", "width": 800, "height": 600},
            {"id": 3, "file_name": "c.jpg", "width": 640, "height": 480},
        ],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 7, "bbox": [10.0, 20.0, 100.0, 50.0], "area": 5000.0, "iscrowd": 0},
            {"id": 11, "image_id": 1, "category_id": 9, "bbox": [0.0, 0.0, 64.0, 48.0], "area": 3072.0, "iscrowd": 0},
            {"id": 12, "image_id": 2, "category_id": 99, "bbox": [5.0, 5.0, 10.0, 10.0], "area": 100.0, "iscrowd": 1},
        ],
        "categories": [{"id": 7, "name": "chair"}, {"id": 9, "name": "table"}],
    }
    (d / "labels.json").write_text(json.dumps(labels))
    return str(d / "labels.json")


def test_coco_frames(spark, coco_dir):
    frames = coco.coco_frames(spark, coco_dir, split="validation")
    assert same_shape(frames.schema)
    rows = {r.image_id: r for r in frames.collect()}
    assert len(rows) == 3
    im1 = rows["%012d" % 1]
    cats = sorted(b.category for b in im1.bounding_boxes_2d)
    assert cats == ["chair", "table"]
    chair = next(b for b in im1.bounding_boxes_2d if b.category == "chair")
    assert (chair.x_min, chair.y_min, chair.x_max, chair.y_max) == (10, 20, 110, 70)
    assert chair.area == 5000
    # unknown category id → "unknown"; annotation-less image keeps null boxes
    assert rows["%012d" % 2].bounding_boxes_2d[0].category == "unknown"
    assert rows["%012d" % 3].bounding_boxes_2d is None
    assert im1.camera.image_width == 640 and im1.camera.fx is None


def test_coco_heuristic_lift(spark, coco_dir):
    frames = coco.coco_frames(spark, coco_dir, split="validation")
    # plant depth stats: median 2 m, min 1, max 3 → sigma = 0.5
    with_depth = frames.withColumn(
        "depth_stats",
        F.expr(
            "named_struct('present', true, 'valid_pixels', 1000, 'total_pixels', 1000,"
            " 'min', cast(1.0 as double), 'max', cast(3.0 as double),"
            " 'median', cast(2.0 as double), 'mean', cast(2.0 as double))"
        ),
    )
    lifted = coco.heuristic_lift_2d_to_3d(with_depth)
    rows = {r.image_id: r for r in lifted.collect()}
    im1 = rows["%012d" % 1]
    assert im1.depth_type == "pseudo"
    chair = next(b for b in im1.bounding_boxes_3d if b.category == "chair")
    # fx = 0.7*640 = 448, cx = 320: center u = 60 → x = (60-320)*2/448
    assert chair.x == pytest.approx((60 - 320) * 2.0 / 448.0)
    assert chair.z == pytest.approx(2.0)
    # w3d = 100*2/448, h3d = 50*2/(0.7*480); z3d = max(0.8*min(w,h), 2*sigma)
    w3d, h3d = 100 * 2 / 448.0, 50 * 2 / 336.0
    assert chair.xl == pytest.approx(w3d) and chair.yl == pytest.approx(h3d)
    assert chair.zl == pytest.approx(max(0.8 * min(w3d, h3d), 1.0))
    assert chair.method == "depth_projection" and chair.confidence == 0.7
    # 10×10 box at 800px: w3d = 10*2/560 ≈ 0.036 < 0.05 → dropped, frame gone
    assert "%012d" % 2 not in rows


# -------------------------------------------------- SUN RGB-D (S9/S10/W5/P7)


@pytest.fixture(scope="module")
def sunrgbd_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("sunrgbd")
    for scene, (fx, fy, cx, cy) in {"scene_a": (520.0, 521.0, 320.5, 240.5),
                                    "scene_b": (530.0, 531.0, 321.0, 241.0)}.items():
        sd = root / scene
        (sd / "extrinsics").mkdir(parents=True)
        (sd / "annotation3Dfinal").mkdir()
        (sd / "intrinsics.txt").write_text(f"{fx} 0 {cx} 0 {fy} {cy} 0 0 1\n")
    # scene_a: two timestamp files — lexicographically last must win; 3x4 → pad
    sa = root / "scene_a"
    (sa / "extrinsics" / "20130101.txt").write_text(
        "9 0 0 0\n0 9 0 0\n0 0 9 0\n"
    )
    (sa / "extrinsics" / "20140101.txt").write_text(
        "1 0 0 0.5\n0 1 0 0.25\n0 0 1 0.125\n"
    )
    ann = {
        "objects": [
            {"name": "chair:occluded", "polygon": [
                {"X": [0.0, 1.0, 1.0, 0.0], "Z": [2.0, 2.0, 3.0, 3.0],
                 "Ymin": -1.0, "Ymax": 0.0, "rectangle": True}]},
            {"name": "skip_me", "polygon": [
                {"X": [0.0, 1.0], "Z": [2.0, 3.0], "Ymin": 0, "Ymax": 1,
                 "rectangle": True}]},
            {"name": "notrect", "polygon": [
                {"X": [0.0, 1.0, 1.0, 0.0], "Z": [2.0, 2.0, 3.0, 3.0],
                 "Ymin": 0, "Ymax": 1, "rectangle": False}]},
        ]
    }
    (sa / "annotation3Dfinal" / "index.json").write_text(json.dumps(ann))
    (root / "scene_b" / "annotation3Dfinal" / "index.json").write_text(
        json.dumps({"objects": []})
    )
    return str(root)


def test_sunrgbd_frames(spark, sunrgbd_dir):
    frames = sunrgbd.sunrgbd_frames(
        spark,
        intrinsics_pattern=f"{sunrgbd_dir}/*/intrinsics.txt",
        extrinsics_pattern=f"{sunrgbd_dir}/*/extrinsics/*.txt",
        annotation_pattern=f"{sunrgbd_dir}/*/annotation3Dfinal/index.json",
    )
    assert same_shape(frames.schema)
    rows = {r.scene_id: r for r in frames.collect()}
    a = rows["scene_a"]
    assert a.camera.fx == 520.0 and a.camera.cy == 240.5
    # W5: later timestamp file wins; 3x4 padded to 4x4
    assert a.camera.extrinsics[0][3] == 0.5
    assert a.camera.extrinsics[3] == [0.0, 0.0, 0.0, 1.0]
    # P7 + polygon math: one valid box, category modifier stripped
    assert len(a.bounding_boxes_3d) == 1
    box = a.bounding_boxes_3d[0]
    assert box.category == "chair"
    assert (box.x, box.y, box.z) == (0.5, -0.5, 2.5)
    assert (box.xl, box.yl, box.zl) == (1.0, 1.0, 1.0)
    assert rows["scene_b"].bounding_boxes_3d == []


# ------------------------------------------- Matterport / EmbodiedScan (S7/J1-3)


@pytest.fixture(scope="module")
def embodiedscan_pkl(tmp_path_factory):
    d = tmp_path_factory.mktemp("es")
    data = {
        "metainfo": {"categories": {"chair": 3, "table": 4}},
        "data_list": [
            {
                "sample_idx": "matterport3d/SCENE1/region0",
                "instances": [
                    {"bbox_id": 1, "bbox_3d": [1, 2, 3, 0.5, 0.6, 0.7, 0.0, 90.0, 0.0], "bbox_label_3d": 3},
                    {"bbox_id": 2, "bbox_3d": [4, 5, 6, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0], "bbox_label_3d": 99},
                    {"bbox_id": 3, "bbox_3d": [0, 0], "bbox_label_3d": 4},  # malformed
                ],
                "images": [
                    {"img_path": "matterport3d/SCENE1/matterport_color_images/f1_i0_0.jpg",
                     "visible_instance_ids": [1, 2, 3]},
                    {"img_path": "matterport3d/SCENE1/matterport_color_images/f2_i0_1.jpg",
                     "visible_instance_ids": []},
                ],
            },
            {"sample_idx": "scannet/other", "instances": [], "images": [
                {"img_path": "x/y.jpg", "visible_instance_ids": []}]},
        ],
    }
    p = d / "embodiedscan_infos_train.pkl"
    p.write_bytes(pickle.dumps(data))
    pose_dir = d / "poses"
    pose_dir.mkdir()
    (pose_dir / "f1_pose_0_0.txt").write_text(
        "1 0 0 7\n0 1 0 8\n0 0 1 9\n0 0 0 1\n"
    )
    return str(p), str(pose_dir)


def test_matterport_frames(spark, embodiedscan_pkl):
    pkl, pose_dir = embodiedscan_pkl
    frames = matterport.matterport_frames(spark, pkl, pose_pattern=f"{pose_dir}/*.txt")
    assert same_shape(frames.schema)
    rows = {r.frame_id: r for r in frames.collect()}
    assert set(rows) == {"f1_i0_0", "f2_i0_1"}  # scannet scene filtered out
    f1 = rows["f1_i0_0"]
    boxes = {b.object_id: b for b in f1.bounding_boxes_3d}
    # J2 semi-join dropped malformed bbox_id=3
    assert set(boxes) == {"1", "2"}
    # J3: label 3 → chair; unknown 99 → class_99 fallback
    assert boxes["1"].category == "chair"
    assert boxes["2"].category == "class_99"
    # F3: yaw 90 normalized to 0.5
    assert boxes["1"].yaw == pytest.approx(0.5)
    assert boxes["1"].label_id == 3
    # pose joined via _pose_ → _i filename remap
    assert f1.camera.extrinsics[0][3] == 7.0
    # frame with no visible instances: left join keeps it, boxes null
    assert rows["f2_i0_1"].bounding_boxes_3d is None
    assert rows["f2_i0_1"].camera.extrinsics is None
    assert f1.camera.fx == 1000.0


# ---------------------------------------------------- Hypersim (S4/S5/J9)


def test_hypersim_scene_parameter(spark, tmp_path):
    csv = tmp_path / "metadata_scene.csv"
    csv.write_text(
        "parameter_name,parameter_value\nmeters_per_asset_unit,0.0254\nother,1\n"
    )
    df = hypersim.scene_parameter(spark, str(csv), "meters_per_asset_unit")
    assert df.collect()[0][0] == pytest.approx(0.0254)
    missing = hypersim.scene_parameter(
        spark, str(csv), "not_there", default=1.0
    )
    assert missing.collect()[0][0] == 1.0


def test_hypersim_hdf5_plumbing(spark, tmp_path):
    (tmp_path / "cam_00.hdf5").write_bytes(b"fake-a")
    (tmp_path / "cam_01.hdf5").write_bytes(b"fake-b")

    def fake_parser(path, content, keys):
        return [
            {"path": path, "dataset": k,
             "shape": [2, 2], "values": [float(len(content))] * 4}
            for k in keys
        ]

    df = hypersim.read_hdf5_datasets(
        spark, str(tmp_path), ["camera_positions"], parser=fake_parser
    )
    rows = df.collect()
    assert len(rows) == 2
    assert all(r.dataset == "camera_positions" and r.shape == [2, 2] for r in rows)

    # the DEFAULT parser is real (hdf5lite) and fails loud on non-HDF5 bytes
    with pytest.raises(Exception, match="signature"):
        hypersim.read_hdf5_datasets(spark, str(tmp_path), ["k"]).collect()


def test_hypersim_nearest_keyframe(spark):
    frames = spark.createDataFrame(
        [("s", 0), ("s", 5), ("s", 7), ("s", 100)], "scene_id string, frame_id int"
    )
    keyframes = spark.createDataFrame(
        [("s", 0, "pose0"), ("s", 6, "pose6"), ("s", 90, "pose90")],
        "scene_id string, keyframe_id int, pose string",
    )
    got = {
        r.frame_id: r.pose
        for r in hypersim.nearest_keyframe_pose(frames, keyframes).collect()
    }
    # exact match preferred; |5-6|=1 beats |5-0|=5; tie 7→6 vs 8 none; 100→90
    assert got == {0: "pose0", 5: "pose6", 7: "pose6", 100: "pose90"}


# ---------------------------------------------------- Objectron (S6/P6/O3)


def test_objectron_pbdata_plumbing(spark, tmp_path):
    (tmp_path / "bike").mkdir()
    (tmp_path / "bike" / "batch-0_1.pbdata").write_bytes(b"\x01" * 40)

    def fake_parser(path, content, stride):
        kp = [[0.0, 0.0, 0.0]] * 9
        frames = []
        for i in range(0, 25, stride):  # stride applied in-parser
            frames.append(
                {
                    "path": path,
                    "frame_index": i,
                    "timestamp_us": 1000 * i,
                    "intrinsics": [1.0] * 9,
                    "view_matrix": [0.0] * 16,
                    "objects": [
                        {"category": "bike", "keypoints_3d": kp, "keypoints_2d": kp, "visibility": 1.0},
                        {"category": "bad", "keypoints_3d": kp[:3], "keypoints_2d": kp, "visibility": 1.0},
                    ]
                    if i < 20
                    else [{"category": "bad", "keypoints_3d": kp[:3], "keypoints_2d": kp, "visibility": 1.0}],
                }
            )
        return frames

    df = objectron.read_pbdata_frames(
        spark, str(tmp_path), stride=10, parser=fake_parser
    )
    df = objectron.parse_video_ids(objectron_filtered := objectron.objectron_filter(df))
    rows = df.collect()
    # frames 0,10,20 decoded; 20 has no valid object → P6 drops it
    assert sorted(r.frame_index for r in rows) == [0, 10]
    assert all(len(r.objects) == 1 and r.objects[0].category == "bike" for r in rows)
    assert rows[0].category == "bike" and rows[0].video_id == "batch-0_1"

def _pb_tag(field: int, wt: int) -> bytes:
    return _pb_varint((field << 3) | wt)


def _pb_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _pb_len(field: int, payload: bytes) -> bytes:
    return _pb_tag(field, 2) + _pb_varint(len(payload)) + payload


def _pb_f32(field: int, val: float) -> bytes:
    import struct

    return _pb_tag(field, 5) + struct.pack("<f", val)


def _encode_sequence() -> bytes:
    """Encode a real Objectron Sequence on the protobuf wire format: one
    object ('bike'), three frames; frame 0 and 2 carry the object with 9
    keypoints, frame 1 carries it with 3 (dropped by P6)."""
    import struct

    def point3d(x, y, z):
        return _pb_f32(1, x) + _pb_f32(2, y) + _pb_f32(3, z)

    def point2d(x, y):
        return _pb_f32(1, x) + _pb_f32(2, y) + _pb_f32(3, 0.5)

    def keypoint(x, y, z):
        return _pb_len(2, point3d(x, y, z)) + _pb_len(3, point2d(x / 10, y / 10))

    def annotation(n_kp):
        body = _pb_tag(1, 0) + _pb_varint(0)  # object_id = 0
        for j in range(n_kp):
            body += _pb_len(2, keypoint(float(j), float(j) * 2, 1.0))
        body += _pb_f32(3, 0.75)  # visibility
        return body

    def camera():
        intr = struct.pack("<9f", *[100.0, 0, 50, 0, 100, 60, 0, 0, 1])
        view = struct.pack("<16f", *([1.0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1]))
        return (
            _pb_len(7, intr)
            + _pb_len(9, view)
            + _pb_tag(5, 0) + _pb_varint(640)
            + _pb_tag(6, 0) + _pb_varint(480)
        )

    def frame(i, n_kp):
        body = _pb_tag(1, 0) + _pb_varint(i)  # frame_id
        body += _pb_len(2, annotation(n_kp))
        body += _pb_len(3, camera())
        body += _pb_tag(4, 1) + struct.pack("<d", 0.5 * i)  # timestamp
        return body

    obj = _pb_tag(1, 0) + _pb_varint(0) + _pb_len(2, b"bike")
    seq = _pb_len(1, obj)
    for i, n_kp in enumerate([9, 3, 9]):
        seq += _pb_len(2, frame(i, n_kp))
    return seq


def test_objectron_real_wire_decode(spark, tmp_path):
    """The DEFAULT parser decodes real protobuf bytes end-to-end — no
    injected fake, no protobuf package (sources/pbwire.py reads the public
    wire format directly)."""
    (tmp_path / "bike").mkdir()
    (tmp_path / "bike" / "batch-7_3.pbdata").write_bytes(_encode_sequence())

    df = objectron.read_pbdata_frames(spark, str(tmp_path), stride=1)
    rows = {r.frame_index: r for r in df.collect()}
    assert sorted(rows) == [0, 1, 2]
    assert rows[2].timestamp_us == 1_000_000
    assert rows[0].intrinsics == [100.0, 0, 50, 0, 100, 60, 0, 0, 1]
    assert len(rows[0].view_matrix) == 16 and rows[0].view_matrix[0] == 1.0
    objs = rows[0].objects
    assert len(objs) == 1 and objs[0].category == "bike"
    assert len(objs[0].keypoints_3d) == 9
    assert objs[0].keypoints_3d[3] == [3.0, 6.0, 1.0]
    assert len(objs[0].keypoints_2d) == 9
    assert abs(objs[0].keypoints_2d[3][0] - 0.3) < 1e-6
    assert abs(objs[0].visibility - 0.75) < 1e-6
    assert len(rows[1].objects[0].keypoints_3d) == 3

    # stride runs in-parser on the same real bytes
    strided = objectron.read_pbdata_frames(spark, str(tmp_path), stride=2)
    assert sorted(r.frame_index for r in strided.collect()) == [0, 2]

    # P6 + frame assembly over real-decoded rows
    frames = objectron.objectron_frames(
        objectron.parse_video_ids(objectron.objectron_filter(df))
    )
    out = frames.collect()
    assert sorted(r.frame_id for r in out) == ["0", "2"]
    assert out[0].camera.fx == 100.0 and out[0].bounding_boxes_3d[0].category == "bike"


def test_objectron_frames_box_math(spark, tmp_path):
    (tmp_path / "bike").mkdir()
    (tmp_path / "bike" / "batch-1_2.pbdata").write_bytes(b"\x01" * 10)

    # unit cube centered at (1, 2, 3) OpenGL; corners kp1..kp8 in the
    # Objectron layout: kp2-kp1 along x, kp3-kp1 along z, kp5-kp1 along y
    def corner(dx, dy, dz):
        return [1.0 + dx, 2.0 + dy, 3.0 + dz]

    kp = [
        [1.0, 2.0, 3.0],              # kp0: center
        corner(-0.5, -0.5, -0.5),     # kp1
        corner(0.5, -0.5, -0.5),      # kp2: +x  → width 1
        corner(-0.5, -0.5, 0.5),      # kp3: +z  → depth 1
        corner(0.5, -0.5, 0.5),       # kp4
        corner(-0.5, 1.5, -0.5),      # kp5: +2y → height 2
        corner(0.5, 1.5, -0.5),       # kp6
        corner(-0.5, 1.5, 0.5),       # kp7
        corner(0.5, 1.5, 0.5),        # kp8
    ]

    def fake_parser(path, content, stride):
        return [
            {
                "path": path,
                "frame_index": 0,
                "timestamp_us": 123456,
                "intrinsics": [500.0, 0.0, 320.0, 0.0, 510.0, 240.0, 0.0, 0.0, 1.0],
                "view_matrix": [float(i) for i in range(16)],
                "objects": [
                    {"category": "bike", "keypoints_3d": kp,
                     "keypoints_2d": kp, "visibility": 1.0}
                ],
            }
        ]

    parsed = objectron.parse_video_ids(
        objectron.objectron_filter(
            objectron.read_pbdata_frames(spark, str(tmp_path), parser=fake_parser)
        )
    )
    frames = objectron.objectron_frames(parsed)
    assert same_shape(frames.schema)
    row = frames.collect()[0]
    assert row.image_id == "batch-1_2_frame_0000"
    assert row.video_id == "batch-1_2" and row.timestamp == 123456
    box = row.bounding_boxes_3d[0]
    # OpenGL → CV: y and z flip
    assert (box.x, box.y, box.z) == (1.0, -2.0, -3.0)
    assert box.xl == pytest.approx(1.0)
    assert box.yl == pytest.approx(2.0)
    assert box.zl == pytest.approx(1.0)
    assert box.category == "bike"
    # camera: 9-float intrinsics unpacked; 4x4 view matrix reshaped
    assert row.camera.fx == 500.0 and row.camera.cy == 240.0
    assert row.camera.intrinsics[0] == [500.0, 0.0, 320.0]
    assert row.camera.extrinsics[1] == [4.0, 5.0, 6.0, 7.0]


# ---------------------------------------------------- Taskonomy (S8/S10/J10)


def test_taskonomy_listing_and_mode(spark, tmp_path):
    names = [
        "point_3_view_1_domain_rgb.png",
        "point_3_view_1_domain_segment_semantic.png",
        "point_12_view_0_domain_rgb.png",
    ]
    for n in names:
        (tmp_path / n).write_bytes(b"\x89PNG")

    listed = taskonomy.list_view_files(spark, str(tmp_path))
    rows = {r.path.split("/")[-1]: r for r in listed.collect()}
    assert rows["point_3_view_1_domain_rgb.png"].point_id == 3
    assert rows["point_3_view_1_domain_rgb.png"].view_id == 1
    assert rows["point_12_view_0_domain_rgb.png"].modality == "rgb"
    assert rows["point_3_view_1_domain_segment_semantic.png"].modality == "segment_semantic"

    def fake_parser(path, content):
        return [
            {"path": path, "instance_id": 1, "sem_class": 5, "n_pixels": 80,
             "x_min": 0, "y_min": 0, "x_max": 10, "y_max": 10},
            {"path": path, "instance_id": 1, "sem_class": 2, "n_pixels": 20,
             "x_min": 8, "y_min": 8, "x_max": 30, "y_max": 12},
            {"path": path, "instance_id": 2, "sem_class": 2, "n_pixels": 4,
             "x_min": 0, "y_min": 0, "x_max": 2, "y_max": 2},
        ]

    pixels = taskonomy.read_instance_pixels(spark, str(tmp_path), parser=fake_parser)
    mode = {
        r.instance_id: r.sem_class
        for r in taskonomy.dominant_semantic_class(
            pixels.filter(F.col("path").contains("point_3_view_1_domain_rgb"))
        ).collect()
    }
    assert mode == {1: 5, 2: 2}  # 80 px of class 5 beats 20 px of class 2

    boxes = {
        r.instance_id: r
        for r in taskonomy.pixel_aabb_boxes(
            pixels.filter(F.col("path").contains("point_3_view_1_domain_rgb"))
        ).collect()
    }
    # instance 1: AABB across tiles = (0,0,30,12), area 100 → kept
    assert (boxes[1].x_min, boxes[1].y_min, boxes[1].x_max, boxes[1].y_max) == (0, 0, 30, 12)
    # instance 2: 2×2, 4 px → dropped by 5px/100px² predicates
    assert 2 not in boxes


def _tf_feature_bytes(vals: list[bytes]) -> bytes:
    inner = b"".join(_pb_len(1, v) for v in vals)
    return _pb_len(1, inner)  # Feature.bytes_list


def _tf_feature_floats(vals: list[float]) -> bytes:
    import struct

    packed = b"".join(struct.pack("<f", v) for v in vals)
    return _pb_len(2, _pb_len(1, packed))  # Feature.float_list, packed


def _tf_feature_ints(vals: list[int]) -> bytes:
    packed = b"".join(_pb_varint(v) for v in vals)
    return _pb_len(3, _pb_len(1, packed))  # Feature.int64_list, packed


def _tf_example(features: dict[str, bytes]) -> bytes:
    entries = b"".join(
        _pb_len(1, _pb_len(1, k.encode()) + _pb_len(2, v))
        for k, v in features.items()
    )
    return _pb_len(1, entries)  # Example.features


def _tfrecord(records: list[bytes]) -> bytes:
    import struct

    out = bytearray()
    for r in records:
        out += struct.pack("<Q", len(r)) + b"\x00" * 4 + r + b"\x00" * 4
    return bytes(out)


def test_tf_example_frames_end_to_end(spark, tmp_path):
    """§2.11: a real TFRecord of real tf.Example wire bytes (encoded by
    this test, decoded by pbwire — no tensorflow anywhere) → frame rows
    with the reference parser's semantics: visibility > 0.1 gates
    instances, point_2d keeps (x, y) of the (-1, 9, 3) reshape, matrices
    reshape 4×4 row-major."""
    # two instances; the second is below the 0.1 visibility threshold
    p3 = [float(i) for i in range(27)] + [float(100 + i) for i in range(27)]
    p2 = [float(i) / 100 for i in range(27)] + [
        float(50 + i) / 100 for i in range(27)
    ]
    proj = [float(i) for i in range(16)]
    ex = _tf_example(
        {
            "image/id": _tf_feature_ints([7]),
            "image/width": _tf_feature_ints([640]),
            "image/height": _tf_feature_ints([480]),
            "image/encoded": _tf_feature_bytes([b"\x89PNGfake"]),
            "visibility": _tf_feature_floats([0.9, 0.05]),
            "point_2d": _tf_feature_floats(p2),
            "point_3d": _tf_feature_floats(p3),
            "camera/projection": _tf_feature_floats(proj),
        }
    )
    (tmp_path / "video0.tfrecord").write_bytes(_tfrecord([ex, ex]))

    frames = objectron.read_tf_example_frames(spark, str(tmp_path))
    rows = frames.orderBy("record_index").collect()
    assert len(rows) == 2
    r = rows[0]
    assert (r.image_id, r.image_width, r.image_height) == (7, 640, 480)
    assert bytes(r.image_encoded) == b"\x89PNGfake"
    assert r.visibility == [pytest.approx(0.9), pytest.approx(0.05)]
    # only the visible instance survives; 9 keypoints each
    assert len(r.instances_3d) == 1 and len(r.instances_3d[0]) == 9
    assert r.instances_3d[0][0] == [pytest.approx(0.0), pytest.approx(1.0), pytest.approx(2.0)]
    assert len(r.instances_2d) == 1 and len(r.instances_2d[0]) == 9
    # (x, y) only — the z of the first 2d point is dropped
    assert r.instances_2d[0][0] == [pytest.approx(0.0), pytest.approx(0.01)]
    assert r.projection[0] == [pytest.approx(v) for v in [0.0, 1.0, 2.0, 3.0]]
    assert r.projection[3][3] == pytest.approx(15.0)
    assert r.view is None
