"""Geometry column library vs. independent numpy computation of the same
published formulas (R = Rz·Ry·Rx oriented corners, 8×8 vertex-min distance,
interval relations) on analytic fixtures."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vlm_data_pipeline_spark.functions import geometry as G


def np_vertices(x, y, z, xl, yl, zl, pitch, yaw, roll):
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    cr, sr = np.cos(roll), np.sin(roll)
    rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
    r = rz @ ry @ rx
    h = np.array([xl, yl, zl]) / 2
    corners = np.array(
        [
            [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
        ]
    ) * h
    return (r @ corners.T).T + np.array([x, y, z])


BOXES = [
    (0.0, 0.0, 2.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0),
    (1.5, -0.5, 3.0, 2.0, 0.5, 1.0, 0.3, -0.7, 1.1),
    (-2.0, 1.0, 5.0, 0.2, 0.4, 0.8, -1.0, 0.25, 0.5),
]


@pytest.fixture(scope="module")
def box_df(spark):
    rows = [
        {
            "i": i,
            "box": dict(
                zip(
                    ["x", "y", "z", "xl", "yl", "zl", "pitch", "yaw", "roll"], b
                )
            )
            | {"category": "c", "label_id": None, "object_id": None,
               "confidence": None, "method": None},
        }
        for i, b in enumerate(BOXES)
    ]
    from vlm_data_pipeline_spark.schemas import BBOX_3D
    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField("i", T.IntegerType()), T.StructField("box", BBOX_3D)]
    )
    return spark.createDataFrame(rows, schema)


def test_box_vertices_match_numpy(box_df):
    got = (
        box_df.select("i", G.box_vertices(F.col("box")).alias("v"))
        .orderBy("i")
        .collect()
    )
    for row in got:
        expected = np_vertices(*BOXES[row.i])
        actual = np.array(row.v)
        assert np.allclose(actual, expected, atol=1e-12), row.i


def test_min_vertex_distance_analytic(box_df):
    """Two axis-aligned unit cubes 3 m apart on x → nearest faces 2 m."""
    a = box_df.filter("i = 0").select(F.col("box").alias("ba"))
    row = a.select(
        G.min_vertex_distance(
            G.box_vertices(F.col("ba")),
            G.box_vertices(
                F.named_struct(
                    F.lit("x"), F.lit(3.0), F.lit("y"), F.lit(0.0),
                    F.lit("z"), F.lit(2.0), F.lit("xl"), F.lit(1.0),
                    F.lit("yl"), F.lit(1.0), F.lit("zl"), F.lit(1.0),
                    F.lit("pitch"), F.lit(0.0), F.lit("yaw"), F.lit(0.0),
                    F.lit("roll"), F.lit(0.0),
                )
            ),
        ).alias("d")
    ).first()
    assert abs(row.d - 2.0) < 1e-12


def test_center_distance_and_max_dim(box_df):
    rows = (
        box_df.select(
            "i",
            G.center_distance(F.col("box")).alias("d"),
            G.max_dimension(F.col("box")).alias("m"),
        )
        .orderBy("i")
        .collect()
    )
    for r in rows:
        x, y, z, xl, yl, zl, *_ = BOXES[r.i]
        assert abs(r.d - math.sqrt(x * x + y * y + z * z)) < 1e-12
        assert abs(r.m - max(xl, yl, zl)) < 1e-12


def test_min_camera_vertex_distance(box_df):
    rows = (
        box_df.select(
            "i",
            G.min_camera_vertex_distance(G.box_vertices(F.col("box"))).alias("d"),
        )
        .orderBy("i")
        .collect()
    )
    for r in rows:
        verts = np_vertices(*BOXES[r.i])
        assert abs(r.d - np.linalg.norm(verts, axis=1).min()) < 1e-12


def test_normalize_angle():
    import pyspark  # noqa: F401  (spark fixture not needed; pure expr eval)


def test_strict_relations(spark):
    """Unit cube at x=0 vs unit cube at x=3: A strictly Left of B; depth
    overlap → null depth relation."""
    from tests.fixtures import box3
    from vlm_data_pipeline_spark.schemas import BBOX_3D
    import pyspark.sql.types as T

    schema = T.StructType(
        [T.StructField("a", BBOX_3D), T.StructField("b", BBOX_3D)]
    )
    df = spark.createDataFrame(
        [{"a": box3(0.0, 0.0, 2.0), "b": box3(3.0, 0.0, 2.0)}], schema
    )
    r = df.select(
        G.strict_interval_relations(
            G.box_vertices(F.col("a")), G.box_vertices(F.col("b"))
        ).alias("rel")
    ).first()
    assert r.rel.horizontal_rel == "Left"
    assert r.rel.depth_rel is None
    assert r.rel.vertical_rel is None
