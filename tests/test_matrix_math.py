"""F3/F4 closed-form math: quaternion/rotation-matrix → Euler, rigid 4×4
inverse, point transforms — checked against hand-computed/scipy-free
analytic fixtures (SURVEY §2.9 F3/F4)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from vlm_data_pipeline_spark.functions import geometry as G


def test_quaternion_to_euler(spark):
    # 90° about z: q = (cos45, 0, 0, sin45) → roll=90, pitch=yaw=0
    s2 = math.sqrt(0.5)
    df = spark.createDataFrame(
        [(s2, 0.0, 0.0, s2), (1.0, 0.0, 0.0, 0.0), (s2, s2, 0.0, 0.0)],
        "w double, x double, y double, z double",
    )
    rows = df.select(
        G.quaternion_to_euler_deg(
            F.col("w"), F.col("x"), F.col("y"), F.col("z")
        ).alias("e")
    ).collect()
    assert rows[0].e.roll == pytest.approx(90.0)
    assert rows[0].e.pitch == pytest.approx(0.0) and rows[0].e.yaw == pytest.approx(0.0)
    # identity quaternion → all zero
    assert (rows[1].e.pitch, rows[1].e.yaw, rows[1].e.roll) == (0.0, 0.0, 0.0)
    # 90° about x → pitch=90
    assert rows[2].e.pitch == pytest.approx(90.0)


def test_rotmat_to_euler_zyx(spark):
    # Rz(90°): [[0,-1,0],[1,0,0],[0,0,1]] → roll 90, yaw 0, pitch 0
    rz90 = [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]
    # gimbal lock: Ry(90°): [[0,0,1],[0,1,0],[-1,0,0]] → yaw 90, pitch 0
    ry90 = [[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]]
    df = spark.createDataFrame([(rz90,), (ry90,)], "m array<array<double>>")
    rows = df.select(G.rotmat_to_euler_zyx_deg(F.col("m")).alias("e")).collect()
    assert rows[0].e.roll == pytest.approx(90.0)
    assert rows[0].e.yaw == pytest.approx(0.0)
    assert rows[1].e.yaw == pytest.approx(90.0)
    assert rows[1].e.pitch == pytest.approx(0.0)


def test_invert_rigid_and_transform_point(spark):
    # Rz(90) + translation (1,2,3)
    m = [
        [0.0, -1.0, 0.0, 1.0],
        [1.0, 0.0, 0.0, 2.0],
        [0.0, 0.0, 1.0, 3.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
    df = spark.createDataFrame(
        [(m, [1.0, 0.0, 0.0])], "m array<array<double>>, p array<double>"
    )
    got = df.select(
        G.transform_point(F.col("m"), F.col("p")).alias("fwd"),
        G.transform_point(
            G.invert_rigid(F.col("m")),
            G.transform_point(F.col("m"), F.col("p")),
        ).alias("roundtrip"),
        G.invert_rigid(F.col("m")).alias("inv"),
    ).collect()[0]
    # Rz90·(1,0,0) = (0,1,0); +t → (1,3,3)
    assert got.fwd == pytest.approx([1.0, 3.0, 3.0])
    # inverse ∘ forward = identity
    assert got.roundtrip == pytest.approx([1.0, 0.0, 0.0])
    # inverse bottom row intact
    assert got.inv[3] == [0.0, 0.0, 0.0, 1.0]


def test_scale_box(spark):
    box = {
        "x": 1.0, "y": 2.0, "z": 3.0, "xl": 0.5, "yl": 0.5, "zl": 0.5,
        "pitch": 0.25, "yaw": 0.0, "roll": 0.0,
    }
    t = (
        "struct<x:double,y:double,z:double,xl:double,yl:double,zl:double,"
        "pitch:double,yaw:double,roll:double>"
    )
    row = (
        spark.createDataFrame([(box,)], f"b {t}")
        .select(G.scale_box(F.col("b"), F.lit(0.001)).alias("s"))
        .collect()[0]
        .s
    )
    assert row.x == pytest.approx(0.001) and row.zl == pytest.approx(0.0005)
    assert row.pitch == 0.25  # angles scale-invariant
