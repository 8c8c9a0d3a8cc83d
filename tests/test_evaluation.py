"""Evaluation operators (SURVEY §2.11): closed-form fixtures for IoU and
the VOC AP window algebra; tolerance checks for the sampling IoU."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vlm_data_pipeline_spark.functions import evaluation as ev


def _box3(x, y, z, xl, yl, zl, pitch=0.0, yaw=0.0, roll=0.0):
    return {
        "x": float(x), "y": float(y), "z": float(z),
        "xl": float(xl), "yl": float(yl), "zl": float(zl),
        "pitch": float(pitch), "yaw": float(yaw), "roll": float(roll),
    }


BOX_T = (
    "struct<x:double,y:double,z:double,xl:double,yl:double,zl:double,"
    "pitch:double,yaw:double,roll:double>"
)


def test_iou_2d(spark):
    rows = [
        # identical boxes → 1
        ({"x_min": 0, "y_min": 0, "x_max": 10, "y_max": 10},
         {"x_min": 0, "y_min": 0, "x_max": 10, "y_max": 10}, 1.0),
        # half-overlap: inter 50, union 150 → 1/3
        ({"x_min": 0, "y_min": 0, "x_max": 10, "y_max": 10},
         {"x_min": 5, "y_min": 0, "x_max": 15, "y_max": 10}, 1.0 / 3.0),
        # disjoint → 0
        ({"x_min": 0, "y_min": 0, "x_max": 10, "y_max": 10},
         {"x_min": 20, "y_min": 20, "x_max": 30, "y_max": 30}, 0.0),
    ]
    t = "struct<x_min:int,y_min:int,x_max:int,y_max:int>"
    df = spark.createDataFrame(
        [(a, b, e) for a, b, e in rows], f"a {t}, b {t}, expect double"
    )
    got = df.select(ev.iou_2d(F.col("a"), F.col("b")).alias("iou"), "expect").collect()
    for r in got:
        assert r.iou == pytest.approx(r.expect)


def test_aabb_iou_3d(spark):
    a = _box3(0, 0, 0, 1, 1, 1)
    b = _box3(0.5, 0, 0, 1, 1, 1)  # inter 0.5, union 1.5 → 1/3
    c = _box3(5, 5, 5, 1, 1, 1)
    df = spark.createDataFrame([(a, b, c)], f"a {BOX_T}, b {BOX_T}, c {BOX_T}")
    row = df.select(
        ev.aabb_iou_3d(F.col("a"), F.col("a")).alias("self_iou"),
        ev.aabb_iou_3d(F.col("a"), F.col("b")).alias("half"),
        ev.aabb_iou_3d(F.col("a"), F.col("c")).alias("none"),
    ).collect()[0]
    assert row.self_iou == pytest.approx(1.0)
    assert row.half == pytest.approx(1.0 / 3.0)
    assert row.none == 0.0


def test_monte_carlo_iou_oriented(spark):
    mc = ev.monte_carlo_iou_3d_udf(n_samples=4096)
    a = _box3(0, 0, 0, 1, 1, 1)
    shifted = _box3(0.5, 0, 0, 1, 1, 1)
    # unit cube yawed 90° (normalized 0.5·π... stored [-1,1] → 0.5 = 90°)
    rotated = _box3(0, 0, 0, 1, 1, 1, yaw=0.5)
    far = _box3(9, 9, 9, 1, 1, 1)
    df = spark.createDataFrame(
        [(a, shifted, 1), (a, rotated, 2), (a, far, 3)],
        f"a {BOX_T}, b {BOX_T}, seed long",
    )
    aa, bb = ev.box_as_array(F.col("a")), ev.box_as_array(F.col("b"))
    got = df.select(mc(aa, bb, F.col("seed")).alias("iou")).collect()
    assert got[0].iou == pytest.approx(1.0 / 3.0, abs=0.03)
    assert got[1].iou == pytest.approx(1.0, abs=0.02)  # cube symmetric under 90°
    assert got[2].iou == 0.0
    # determinism: same seeds → same estimates
    again = df.select(mc(aa, bb, F.col("seed")).alias("iou")).collect()
    assert [r.iou for r in again] == [r.iou for r in got]


def test_average_precision_voc_fixture(spark):
    # classic: hits at ranks 1 and 3, miss at rank 2, 2 ground truths
    # → AP = 0.5·1 + 0.5·(2/3) = 5/6
    det = spark.createDataFrame(
        [("g", 0.9, 1, 1), ("g", 0.8, 0, 2), ("g", 0.7, 1, 3)],
        "grp string, score double, hit int, det_id int",
    )
    row = ev.average_precision(det, ["grp"], order_cols=["det_id"]).collect()[0]
    assert row.ap == pytest.approx(5.0 / 6.0, abs=1e-6)
    assert row.n_true == 2 and row.n_detections == 3

    # perfect ranking → AP 1.0
    perfect = spark.createDataFrame(
        [("g", 0.9, 1, 1), ("g", 0.8, 1, 2), ("g", 0.7, 0, 3)],
        "grp string, score double, hit int, det_id int",
    )
    assert ev.average_precision(perfect, ["grp"], order_cols=["det_id"]).collect()[
        0
    ].ap == pytest.approx(1.0)


def test_accuracy_under_threshold(spark):
    errs = spark.createDataFrame(
        [("g", 0.05), ("g", 0.1), ("g", 0.2), ("g", 0.5)], "grp string, error double"
    )
    row = ev.accuracy_under_threshold(errs, ["grp"], thresh=0.1).collect()[0]
    assert row.accuracy == pytest.approx(50.0)  # 0.05 and 0.1 pass
    assert row.n == 4


def test_greedy_match_voc_protocol(spark):
    """The VOC matching rules, analytically: best-IoU gt wins, each gt
    matches once, later detections of a matched gt are FPs, sub-threshold
    overlaps are FPs, ties break toward the lower gt index."""
    from vlm_data_pipeline_spark.functions.evaluation import greedy_match_hits

    box = lambda x0, y0, x1, y1: {  # noqa: E731
        "x_min": float(x0), "y_min": float(y0),
        "x_max": float(x1), "y_max": float(y1),
    }
    det = lambda s, b: {"score": float(s), "box": b}  # noqa: E731
    gts = [box(0, 0, 10, 10), box(20, 0, 30, 10)]
    dets = [
        det(0.9, box(0, 0, 10, 10)),    # perfect on gt0 -> hit
        det(0.8, box(1, 0, 11, 10)),    # gt0 already claimed -> FP
        det(0.7, box(20, 0, 30, 10)),   # perfect on gt1 -> hit
        det(0.6, box(50, 50, 60, 60)),  # overlaps nothing -> FP
        det(0.5, box(0, 9, 10, 19)),    # IoU with gt0 ~ 0.05 < 0.5 -> FP
    ]
    schema = (
        "dets array<struct<score:double,box:struct<x_min:double,y_min:double,"
        "x_max:double,y_max:double>>>, gts array<struct<x_min:double,"
        "y_min:double,x_max:double,y_max:double>>"
    )
    df = spark.createDataFrame([(dets, gts)], schema)
    out = df.select(
        greedy_match_hits(F.col("dets"), F.col("gts"), 0.5).alias("h")
    ).collect()[0].h
    assert [(r.score, r.hit) for r in out] == [
        (0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0), (0.5, 0),
    ]
    # no shuffle: one frame is one row
    plan = (
        df.select(greedy_match_hits(F.col("dets"), F.col("gts")).alias("h"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_greedy_match_feeds_average_precision(spark):
    """End-to-end §2.11 eval composition: per-frame greedy matching ->
    explode -> VOC AP. One gt, two dets (one TP at rank 1): AP = 1.0;
    with the TP at rank 2, AP = 0.5."""
    from vlm_data_pipeline_spark.functions.evaluation import (
        average_precision,
        greedy_match_hits,
    )

    box = lambda x0: {  # noqa: E731
        "x_min": float(x0), "y_min": 0.0, "x_max": float(x0 + 10), "y_max": 10.0,
    }
    schema = (
        "image_id string, dets array<struct<score:double,box:struct<"
        "x_min:double,y_min:double,x_max:double,y_max:double>>>, "
        "gts array<struct<x_min:double,y_min:double,x_max:double,"
        "y_max:double>>"
    )
    frames = spark.createDataFrame(
        [
            ("a", [{"score": 0.9, "box": box(0)}, {"score": 0.8, "box": box(50)}],
             [box(0)]),
            ("b", [{"score": 0.9, "box": box(50)}, {"score": 0.8, "box": box(0)}],
             [box(0)]),
        ],
        schema,
    )
    matched = frames.select(
        "image_id",
        F.posexplode(
            greedy_match_hits(F.col("dets"), F.col("gts"), 0.5)
        ).alias("pos", "m"),
    ).select(
        "image_id",
        F.col("m.score").alias("score"),
        F.col("m.hit").alias("hit"),
        "pos",
    )
    ap = {
        r.image_id: r.ap
        for r in average_precision(
            matched, ["image_id"], order_cols=["pos"]
        ).collect()
    }
    assert ap["a"] == pytest.approx(1.0)
    assert ap["b"] == pytest.approx(0.5)
