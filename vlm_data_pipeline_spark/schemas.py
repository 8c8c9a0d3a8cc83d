"""Canonical schemas (SURVEY §1): one StructType superset covering every
per-dataset variant of the reference's unified per-image JSON record
(data_processing/utils.py:130-178, sunrgbd_processor.py:225-246;
variants: objectron_processor.py:214-239 adds video_id/timestamp,
matterport_processor.py:226-249 adds scene_id/label_id,
create_labeled_dataset.py:143-150 adds labeling_info).

Conventions (data_processing/README.md:356-366): camera frame, +X right,
+Y down, +Z forward; meters; angles stored normalized to [-1, 1]
(degrees/180, data_processing/utils.py:28-43); box centers camera-relative.
"""

from __future__ import annotations

from pyspark.sql import types as T

CAMERA = T.StructType(
    [
        T.StructField("fx", T.DoubleType()),
        T.StructField("fy", T.DoubleType()),
        T.StructField("cx", T.DoubleType()),
        T.StructField("cy", T.DoubleType()),
        T.StructField("image_width", T.IntegerType()),
        T.StructField("image_height", T.IntegerType()),
        # 3x3 / 4x4 matrices; nullable (COCO has none: coco_processor.py:370-379)
        T.StructField("intrinsics", T.ArrayType(T.ArrayType(T.DoubleType()))),
        T.StructField("extrinsics", T.ArrayType(T.ArrayType(T.DoubleType()))),
    ]
)

DEPTH_STATS = T.StructType(
    [
        T.StructField("present", T.BooleanType()),
        T.StructField("valid_pixels", T.IntegerType()),
        T.StructField("total_pixels", T.IntegerType()),
        T.StructField("min", T.DoubleType()),
        T.StructField("max", T.DoubleType()),
        T.StructField("median", T.DoubleType()),
        T.StructField("mean", T.DoubleType()),
    ]
)

BBOX_3D = T.StructType(
    [
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
        T.StructField("xl", T.DoubleType()),
        T.StructField("yl", T.DoubleType()),
        T.StructField("zl", T.DoubleType()),
        T.StructField("pitch", T.DoubleType()),
        T.StructField("yaw", T.DoubleType()),
        T.StructField("roll", T.DoubleType()),
        T.StructField("category", T.StringType()),
        T.StructField("label_id", T.IntegerType()),
        T.StructField("object_id", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("method", T.StringType()),
    ]
)

BBOX_2D = T.StructType(
    [
        T.StructField("x_min", T.IntegerType()),
        T.StructField("y_min", T.IntegerType()),
        T.StructField("x_max", T.IntegerType()),
        T.StructField("y_max", T.IntegerType()),
        T.StructField("instance_id", T.IntegerType()),
        T.StructField("area", T.IntegerType()),
        T.StructField("category", T.StringType()),
    ]
)

FRAME = T.StructType(
    [
        T.StructField("dataset", T.StringType(), False),
        T.StructField("split", T.StringType()),
        T.StructField("image_id", T.StringType(), False),
        T.StructField("scene_id", T.StringType()),
        T.StructField("video_id", T.StringType()),
        T.StructField("frame_id", T.StringType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField("filename", T.StringType()),
        T.StructField("rgb_path", T.StringType()),
        T.StructField("depth_path", T.StringType()),
        T.StructField("depth_type", T.StringType()),
        T.StructField("camera", CAMERA),
        T.StructField("depth_stats", DEPTH_STATS),
        T.StructField("bounding_boxes_2d", T.ArrayType(BBOX_2D)),
        T.StructField("bounding_boxes_3d", T.ArrayType(BBOX_3D)),
    ]
)

CODEBOOK = T.StructType(
    [
        T.StructField("instance_id", T.IntegerType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("stage", T.StringType()),
    ]
)

QA_PAIR = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("question", T.StringType(), False),
        T.StructField("answer", T.StringType(), False),
        T.StructField("answer_type", T.StringType(), False),
        T.StructField("options", T.ArrayType(T.StringType())),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)
