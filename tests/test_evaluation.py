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


def test_average_precision_has_no_quadratic_window_frame(spark):
    """The VOC suffix-max must be a RUNNING max over the reversed sort,
    never a CURRENT..UNBOUNDED FOLLOWING frame: Spark re-aggregates
    that frame per row (O(n^2) per group — a 3-task stage measured
    pinned for 9+ minutes at sf0.1 before the round-7 fix). The plan
    is the contract: no currentrow-to-unboundedfollowing frame. (The
    whole-partition UNBOUNDED..UNBOUNDED frame for the n_true fallback
    is fine — Spark computes that one once per partition.)"""
    det = spark.createDataFrame(
        [("g", 0.9, 1, 1), ("g", 0.8, 0, 2)],
        "grp string, score double, hit int, det_id int",
    )
    out = ev.average_precision(det, ["grp"], order_cols=["det_id"])
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "currentrow$(), unboundedfollowing$()" not in plan


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


# ---------------------------------------------------------------------------
# Exact oriented 3D IoU (Sutherland–Hodgman)
# ---------------------------------------------------------------------------


def test_exact_iou_3d_analytic():
    """Closed-form fixtures: identity, disjoint, half-shift, nesting both
    ways, and the classic 45°-rotated unit square (octagon section, area
    2(√2−1)) extruded to 3D."""
    import math

    u = [0, 0, 0, 1, 1, 1, 0, 0, 0]
    assert ev.exact_iou_3d(u, u) == pytest.approx(1.0)
    assert ev.exact_iou_3d(u, [5, 0, 0, 1, 1, 1, 0, 0, 0]) == 0.0
    assert ev.exact_iou_3d(u, [0.5, 0, 0, 1, 1, 1, 0, 0, 0]) == pytest.approx(
        0.5 / 1.5
    )
    small = [0, 0, 0, 0.5, 0.5, 0.5, 0, 0, 0]
    assert ev.exact_iou_3d(u, small) == pytest.approx(0.125)
    assert ev.exact_iou_3d(small, u) == pytest.approx(0.125)
    # 45° about z (roll = 0.25 in normalized [-1,1] angle units):
    # unit square ∩ its 45° rotation = octagon, area 2(√2−1)
    a_oct = 2 * (math.sqrt(2) - 1)
    assert ev.exact_iou_3d(u, [0, 0, 0, 1, 1, 1, 0, 0, 0.25]) == pytest.approx(
        a_oct / (2 - a_oct)
    )
    # arbitrarily rotated box nested in a big box: IoU = V_b / V_a
    big = [0, 0, 0, 3, 3, 3, 0, 0, 0]
    assert ev.exact_iou_3d(big, [0, 0, 0, 1, 1, 1, 0.3, 0.1, 0.25]) == pytest.approx(
        1 / 27
    )
    # zero-extent degenerate → 0, matching aabb_iou_3d's guard
    assert ev.exact_iou_3d(u, [0, 0, 0, 0, 1, 1, 0, 0, 0]) == 0.0


def test_exact_iou_3d_matches_aabb_closed_form():
    """On axis-aligned boxes the exact oriented kernel must agree with the
    closed-form aabb_iou_3d to machine precision."""
    import numpy as np

    rng = np.random.default_rng(7)
    for _ in range(50):
        a = np.concatenate([rng.uniform(-1, 1, 3), rng.uniform(0.2, 2.0, 3), [0, 0, 0]])
        b = np.concatenate([rng.uniform(-1, 1, 3), rng.uniform(0.2, 2.0, 3), [0, 0, 0]])
        inter = 1.0
        for i in range(3):
            lo = max(a[i] - a[i + 3] / 2, b[i] - b[i + 3] / 2)
            hi = min(a[i] + a[i + 3] / 2, b[i] + b[i + 3] / 2)
            inter *= max(hi - lo, 0.0)
        va, vb = np.prod(a[3:6]), np.prod(b[3:6])
        expect = inter / (va + vb - inter) if va + vb - inter > 0 else 0.0
        assert ev.exact_iou_3d(a, b) == pytest.approx(expect, abs=1e-12)


def test_exact_iou_3d_vs_monte_carlo_property():
    """|exact − MC| must sit inside the MC estimator's error bound on
    random ORIENTED pairs — the cross-check the sampling path was built
    for (reference iou.py computes both and they agree statistically)."""
    import numpy as np

    rng = np.random.default_rng(42)

    def rot(pitch, yaw, roll):
        return ev._rot_zyx(pitch, yaw, roll)

    n_samples = 8192
    for trial in range(12):
        a = np.concatenate(
            [rng.uniform(-0.3, 0.3, 3), rng.uniform(0.5, 1.5, 3), rng.uniform(-1, 1, 3)]
        )
        b = np.concatenate(
            [rng.uniform(-0.3, 0.3, 3), rng.uniform(0.5, 1.5, 3), rng.uniform(-1, 1, 3)]
        )
        exact = ev.exact_iou_3d(a, b)
        # reference-protocol two-sided MC estimate (same math as the UDF)
        mc_rng = np.random.default_rng(trial)
        boxes = [(x[0:3], x[3:6], rot(x[6], x[7], x[8])) for x in (a, b)]
        vols = [float(np.prod(d)) for _, d, _ in boxes]
        hits = []
        for (c_s, d_s, r_s), (c_o, d_o, r_o) in (
            (boxes[0], boxes[1]),
            (boxes[1], boxes[0]),
        ):
            local = (mc_rng.random((n_samples, 3)) - 0.5) * d_s
            world = local @ r_s.T + c_s
            other = (world - c_o) @ r_o
            hits.append(int(np.all(np.abs(other) <= d_o / 2.0, axis=1).sum()))
        inter = (vols[0] * hits[0] + vols[1] * hits[1]) / 2.0
        union = (vols[0] + vols[1]) * n_samples - inter
        mc = inter / union if union > 0 else 0.0
        # binomial noise on the hit counts → ~4σ bound on the IoU
        p = max(hits[0], hits[1]) / n_samples
        sigma = (p * (1 - p) / n_samples) ** 0.5 + 1e-4
        assert abs(exact - mc) < 4 * sigma + 0.01, (trial, exact, mc)


def test_exact_iou_udf_and_detection_ap_exact_matcher(spark):
    """End-to-end: the exact matcher flips a match the AABB closed form
    gets wrong. Against a unit ground-truth box, a detection rotated 45°
    about z has ORIENTED IoU = octagon-prism ≈ 0.707, while the closed
    form ignores rotation and scores the same extents as identical boxes
    (IoU 1.0) — so at thresh 0.75 matcher='exact' records a miss where
    matcher='closed' records a hit."""
    import math

    rows = [
        # image, category, score, box9 (det)
        ("i1", "cup", 0.9, 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.25),
        # second detection: axis-aligned exact match on gt2
        ("i1", "cup", 0.8, 5.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0),
    ]
    dets = spark.createDataFrame(
        rows,
        "image_id string, category string, score double, x double, y double,"
        "z double, xl double, yl double, zl double, pitch double, yaw double,"
        "roll double",
    )
    gts = spark.createDataFrame(
        [
            ("i1", "cup", 0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0),
            ("i1", "cup", 5.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0),
        ],
        "image_id string, category string, x double, y double, z double,"
        "xl double, yl double, zl double, pitch double, yaw double, roll double",
    )
    # sanity: the rotated det's oriented IoU sits between the thresholds
    a_oct = 2 * (math.sqrt(2) - 1)
    assert 0.5 < a_oct / (2 - a_oct) < 0.75

    ap_exact = ev.detection_ap(
        dets, gts, mode="3d", matcher="exact", iou_thresh=0.75
    ).collect()
    assert len(ap_exact) == 1
    # det1 (score .9) misses, det2 (score .8) hits → precision at the hit
    # is 1/2, recall 1/2 over n_true=2 → AP = 0.25
    assert ap_exact[0].ap == pytest.approx(0.25)

    # closed-form AABB matcher ignores rotation → both hit → AP = 1.0
    ap_aabb = ev.detection_ap(
        dets, gts, mode="3d", matcher="closed", iou_thresh=0.75
    ).collect()
    assert ap_aabb[0].ap == pytest.approx(1.0)

    # the scalar UDF agrees with the kernel through Spark
    pair = spark.createDataFrame(
        [(
            [0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.25],
            [0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0],
        )],
        "a array<double>, b array<double>",
    )
    got = pair.select(ev.exact_iou_3d_udf()(F.col("a"), F.col("b")).alias("v")).collect()
    assert got[0].v == pytest.approx(a_oct / (2 - a_oct))


def test_detection_ap_matcher_validation(spark):
    import pytest as _pytest

    df = spark.range(1)
    with _pytest.raises(ValueError, match="matcher"):
        ev.detection_ap(df, df, matcher="bogus")
    with _pytest.raises(ValueError, match="oriented 3D"):
        ev.detection_ap(df, df, mode="2d", matcher="exact")


def test_exact_iou_3d_properties():
    """Hypothesis-style invariants over random oriented pairs: bounds,
    symmetry, self-IoU = 1, and translation invariance."""
    import numpy as np

    rng = np.random.default_rng(123)
    for _ in range(200):
        a = np.concatenate(
            [rng.uniform(-1, 1, 3), rng.uniform(0.1, 2.0, 3), rng.uniform(-1, 1, 3)]
        )
        b = np.concatenate(
            [rng.uniform(-1, 1, 3), rng.uniform(0.1, 2.0, 3), rng.uniform(-1, 1, 3)]
        )
        v = ev.exact_iou_3d(a, b)
        assert 0.0 <= v <= 1.0
        assert abs(v - ev.exact_iou_3d(b, a)) < 1e-9          # symmetry
        assert ev.exact_iou_3d(a, a) == pytest.approx(1.0)    # identity
        shift = rng.uniform(-5, 5, 3)
        a2, b2 = a.copy(), b.copy()
        a2[0:3] += shift
        b2[0:3] += shift
        assert abs(ev.exact_iou_3d(a2, b2) - v) < 1e-9        # translation
