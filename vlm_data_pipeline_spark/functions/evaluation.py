"""Evaluation metric operators (SURVEY §2.11 — vendored Objectron eval lib).

The reference vendors Google's Objectron evaluation code: point-in-box
tests (box.py:158-176), sampling-based IoU (iou.py:36-70), VOC-style
average precision (metrics.py:31-99), and accuracy-under-threshold
(metrics.py:101-117). Nothing in the pipeline invokes them; we expose the
same capabilities as engine operators because a training-data pipeline at
scale needs detection-quality metrics as first-class aggregations.

Spark-first split:
- axis-aligned IoU (2D and 3D) → closed-form column expressions (codegen);
- oriented-box membership / sampling IoU → vectorized numpy inside a
  pandas UDF (matrix work, the documented slow path);
- average precision → pure window-function relational algebra: cumulative
  TP/FP by descending score, monotonic precision via a reverse running
  max, AP = Σ Δrecall · p_mono — one shuffle per group, no driver loop,
  oracle-expressible in ANSI SQL;
- accuracy-under-threshold → one conditional aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "iou_2d",
    "aabb_iou_3d",
    "box_as_array",
    "monte_carlo_iou_3d_udf",
    "exact_iou_3d",
    "exact_iou_3d_udf",
    "greedy_match_hits_exact_udf",
    "average_precision",
    "accuracy_under_threshold",
    "greedy_match_hits",
    "detection_ap",
]


def _overlap(lo_a: Column, hi_a: Column, lo_b: Column, hi_b: Column) -> Column:
    return F.greatest(F.least(hi_a, hi_b) - F.greatest(lo_a, lo_b), F.lit(0.0))


def iou_2d(a: Column, b: Column) -> Column:
    """Exact IoU of two corner-encoded 2D boxes (x_min..y_max structs)."""
    ix = _overlap(
        a["x_min"].cast("double"), a["x_max"].cast("double"),
        b["x_min"].cast("double"), b["x_max"].cast("double"),
    )
    iy = _overlap(
        a["y_min"].cast("double"), a["y_max"].cast("double"),
        b["y_min"].cast("double"), b["y_max"].cast("double"),
    )
    inter = ix * iy
    area = lambda bb: (  # noqa: E731
        (bb["x_max"] - bb["x_min"]).cast("double")
        * (bb["y_max"] - bb["y_min"]).cast("double")
    )
    union = area(a) + area(b) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def aabb_iou_3d(a: Column, b: Column) -> Column:
    """Exact IoU of two 9-DoF boxes *ignoring rotation* (axis-aligned form —
    the fast path; oriented boxes go through the sampling UDF)."""
    dims = (("x", "xl"), ("y", "yl"), ("z", "zl"))
    inter = F.lit(1.0)
    for c, l in dims:
        inter = inter * _overlap(
            a[c] - a[l] / 2, a[c] + a[l] / 2, b[c] - b[l] / 2, b[c] + b[l] / 2
        )
    vol = lambda bb: bb["xl"] * bb["yl"] * bb["zl"]  # noqa: E731
    union = vol(a) + vol(b) - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def box_as_array(box: Column) -> Column:
    """9-DoF struct → flat array<double> (the sampling UDF's wire format:
    Arrow ships primitive arrays cheaply; struct inputs to scalar pandas
    UDFs are not supported)."""
    return F.array(
        *[box[f].cast("double") for f in ("x", "y", "z", "xl", "yl", "zl", "pitch", "yaw", "roll")]
    )


def monte_carlo_iou_3d_udf(n_samples: int = 2048):
    """Sampling IoU of two *oriented* 9-DoF boxes (iou.py:36-70 semantics).

    Returns a pandas UDF ``(box_as_array(a), box_as_array(b), seed long) →
    double``. Per row: draw ``n_samples`` points uniformly inside each box
    (local frame → rotate Rz·Ry·Rx → translate), count how many fall inside
    the other box (inverse-rotate membership test, box.py:158-176), and
    combine with the reference's volume-normalized two-sided estimate.
    Deterministic: numpy Generator seeded from the per-row seed column.
    Angles are the stored normalized [-1,1] values (×π = radians).
    """
    from pyspark.sql.functions import pandas_udf

    # single shared rotation convention: the exact-vs-MC cross-check
    # property is only meaningful while both paths use the same matrix
    rot = _rot_zyx

    def one_iou(a, b, seed: int) -> float:
        rng = np.random.default_rng(seed)
        boxes = []
        for bb in (np.asarray(a), np.asarray(b)):
            boxes.append((bb[0:3], bb[3:6], rot(bb[6], bb[7], bb[8])))
        vols = [float(np.prod(d)) for _, d, _ in boxes]
        hits = []
        for (c_s, d_s, r_s), (c_o, d_o, r_o) in (
            (boxes[0], boxes[1]),
            (boxes[1], boxes[0]),
        ):
            local = (rng.random((n_samples, 3)) - 0.5) * d_s
            world = local @ r_s.T + c_s
            other_local = (world - c_o) @ r_o  # R⁻¹ = Rᵀ (rigid)
            inside = np.all(np.abs(other_local) <= d_o / 2.0, axis=1)
            hits.append(int(inside.sum()))
        inter = (vols[0] * hits[0] + vols[1] * hits[1]) / 2.0
        union = (vols[0] + vols[1]) * n_samples - inter
        return float(inter / union) if union > 0 else 0.0

    @pandas_udf("double")
    def mc_iou(a: pd.Series, b: pd.Series, seed: pd.Series) -> pd.Series:
        return pd.Series(
            [one_iou(x, y, int(s)) for x, y, s in zip(a, b, seed)]
        )

    return mc_iou


# ---------------------------------------------------------------------------
# Exact oriented 3D IoU (Sutherland–Hodgman polyhedron clipping)
# ---------------------------------------------------------------------------

# 8 corners of the unit box, index = ix*4 + iy*2 + iz over (−.5, +.5)
_UNIT_CORNERS = np.array(
    [
        [sx, sy, sz]
        for sx in (-0.5, 0.5)
        for sy in (-0.5, 0.5)
        for sz in (-0.5, 0.5)
    ]
)
# the six faces as cyclically-ordered corner-index quads
_FACE_IDX = (
    (0, 1, 3, 2),  # x−
    (4, 5, 7, 6),  # x+
    (0, 1, 5, 4),  # y−
    (2, 3, 7, 6),  # y+
    (0, 2, 6, 4),  # z−
    (1, 3, 7, 5),  # z+
)


def _rot_zyx(pitch: float, yaw: float, roll: float) -> np.ndarray:
    """Rz·Ry·Rx from the stored normalized [−1,1] angles (×π = radians) —
    identical to the Monte-Carlo UDF's convention."""
    p, y, r = pitch * np.pi, yaw * np.pi, roll * np.pi
    cp, sp, cy, sy, cr, sr = (
        np.cos(p), np.sin(p), np.cos(y), np.sin(y), np.cos(r), np.sin(r),
    )
    rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    rz = np.array([[cr, -sr, 0], [sr, cr, 0], [0, 0, 1]])
    return rz @ ry @ rx


def _clip_faces_halfspace(
    faces: list[np.ndarray], axis: int, bound: float, sign: float
) -> list[np.ndarray]:
    """One Sutherland–Hodgman pass of a closed convex polyhedron (list of
    convex face polygons, each an (n,3) array) against the half-space
    ``sign·(p[axis] − bound) ≤ 0``, re-capping the cut so the result stays
    closed. The cap polygon is the plane section of a convex polyhedron —
    itself convex — so its crossing points order by angle around their
    centroid in the plane's two free axes. Robust-clipping shape follows
    Ericson, *Real-Time Collision Detection* p. 370 (the same source the
    reference's iou.py cites); the reference instead collects clipped
    points from both boxes and runs scipy's ConvexHull
    (data_processing/objectron/dataset/iou.py:22-34) — capping the
    polyhedron directly gives the identical intersection volume with no
    hull dependency."""
    eps = 1e-12
    out_faces: list[np.ndarray] = []
    cap: list[np.ndarray] = []
    for poly in faces:
        d = sign * (poly[:, axis] - bound)
        if np.all(d <= eps):
            out_faces.append(poly)
            continue
        if np.all(d >= -eps):
            continue
        keep: list[np.ndarray] = []
        n = len(poly)
        for i in range(n):
            dc, dp = d[i], d[i - 1]
            if (dc > eps) != (dp > eps):
                # edge crosses the plane: lerp the intersection point
                t = dp / (dp - dc)
                ip = poly[i - 1] + t * (poly[i] - poly[i - 1])
                keep.append(ip)
                cap.append(ip)
            if dc <= eps:
                keep.append(poly[i])
        if len(keep) >= 3:
            out_faces.append(np.array(keep))
    if len(cap) >= 3:
        pts = np.array(cap)
        ax1, ax2 = [i for i in range(3) if i != axis]
        c = pts.mean(axis=0)
        order = np.argsort(np.arctan2(pts[:, ax2] - c[ax2], pts[:, ax1] - c[ax1]))
        out_faces.append(pts[order])
    return out_faces


def _faces_volume(faces: list[np.ndarray]) -> float:
    """Volume of a closed convex polyhedron given its faces: sum of the
    pyramids from the vertex centroid to each face, each pyramid a fan of
    tetrahedra (divergence theorem; per-face |Σ signed tetra| is safe
    because convexity makes every face's fan uniformly signed)."""
    if not faces:
        return 0.0
    c = np.vstack(faces).mean(axis=0)
    vol = 0.0
    for poly in faces:
        q = poly - c
        if len(q) < 3:
            continue
        cross = np.cross(q[1:-1], q[2:])
        vol += abs(float((cross @ q[0]).sum())) / 6.0
    return vol


def exact_iou_3d(a, b) -> float:
    """EXACT IoU of two oriented 9-DoF boxes — the reference's
    Sutherland–Hodgman protocol (data_processing/objectron/dataset/
    iou.py:22-34) re-expressed as closed polyhedron clipping:

    1. express box B's 8 corners in box A's local frame (A becomes the
       axis-aligned slab [−extent/2, +extent/2]³);
    2. clip B's six faces against A's six half-spaces, re-capping each
       cut (the cap is the convex plane section, ordered by angle);
    3. intersection volume by the divergence theorem over the surviving
       faces; IoU = V∩ / (V_A + V_B − V∩).

    Inputs are the 9-element ``box_as_array`` layout
    (x, y, z, xl, yl, zl, pitch, yaw, roll; angles normalized [−1,1]).
    Degenerate (zero-extent) boxes → 0.0, matching aabb_iou_3d's guard.
    """
    a = np.asarray(a, dtype=float)
    b = np.asarray(b, dtype=float)
    ca, da, ra = a[0:3], a[3:6], _rot_zyx(a[6], a[7], a[8])
    cb, db, rb = b[0:3], b[3:6], _rot_zyx(b[6], b[7], b[8])
    va, vb = float(np.prod(da)), float(np.prod(db))
    if va <= 0.0 or vb <= 0.0:
        return 0.0
    corners_world = (_UNIT_CORNERS * db) @ rb.T + cb
    corners_local = (corners_world - ca) @ ra  # Rᵀ(p−c): rigid inverse
    faces = [corners_local[list(idx)] for idx in _FACE_IDX]
    half = da / 2.0
    for axis in range(3):
        faces = _clip_faces_halfspace(faces, axis, float(half[axis]), 1.0)
        if not faces:
            return 0.0
        faces = _clip_faces_halfspace(faces, axis, float(-half[axis]), -1.0)
        if not faces:
            return 0.0
    inter = min(_faces_volume(faces), min(va, vb))
    union = va + vb - inter
    return float(inter / union) if union > 0 else 0.0


def exact_iou_3d_udf():
    """Pandas UDF ``(box_as_array(a), box_as_array(b)) → double`` over
    :func:`exact_iou_3d` — the rotation-exact sibling of
    :func:`monte_carlo_iou_3d_udf` (no seed: the result is
    deterministic), Arrow-batched like every binary-kernel seam."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ex_iou(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([exact_iou_3d(x, y) for x, y in zip(a, b)])

    return ex_iou


def average_precision(
    detections: DataFrame,
    group_cols: list[str],
    score_col: str = "score",
    hit_col: str = "hit",
    order_cols: list[str] | None = None,
    n_true_col: str | None = None,
) -> DataFrame:
    """VOC-style AP per group as pure window algebra (metrics.py:31-99).

    Input: one row per detection with a confidence score and a 0/1 hit
    flag. ``n_true_col`` names a per-row column carrying the group's TRUE
    ground-truth count (constant within a group) — recall then ends below
    1.0 when detections miss objects, the real VOC denominator. Without
    it, ground-truth count per group falls back to Σ hit (recall reaches
    1.0 by construction — only correct when every GT is matched).

    recall_i = cumTP/Σhit, precision_i = cumTP/i over descending score;
    monotonic precision = max(precision) over the suffix (reverse running
    max — the VOC smoothing loop); AP = Σ (recall_i − recall_{i−1})·p_mono.
    The reference's prepended (0, ·) point is the lag default; the appended
    (1, 0) point contributes 0 by construction.

    ``order_cols`` must make the sort total for deterministic results.

    Scale note: the cumulative windows serialize each group through one
    reducer — inherent to AP's global ranking; a running frame is O(n)
    per group, so one task handles benchmark-sized strata (10^5–10^7
    rows) comfortably. The VOC suffix-max is therefore computed as a
    RUNNING max over the REVERSED sort order, never as a
    CURRENT-TO-UNBOUNDED-FOLLOWING frame: Spark's UnboundedFollowing
    window frame re-aggregates the whole remaining frame for EVERY row
    (O(n²) per group — measured as a 3-task stage pinned at 100% CPU
    for 9+ minutes at sf0.1 and unbounded at sf1, vs seconds for the
    reversed running frame; round-7 finding). max() is order-
    insensitive, so the two formulations are value-identical.
    """
    order = [F.col(score_col).desc()] + [F.col(c) for c in (order_cols or [])]
    # exact reverse of `order`, so UNBOUNDED PRECEDING..CURRENT here ==
    # CURRENT..UNBOUNDED FOLLOWING there (same rows, max is symmetric)
    order_rev = [F.col(score_col).asc()] + [
        F.col(c).desc() for c in (order_cols or [])
    ]
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_suffix = (
        Window.partitionBy(*group_cols)
        .orderBy(*order_rev)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lag = Window.partitionBy(*group_cols).orderBy(*order)
    total = Window.partitionBy(*group_cols)

    n_true_expr = (
        F.col(n_true_col).cast("double")
        if n_true_col is not None
        else F.sum(hit_col).over(total).cast("double")
    )
    ranked = (
        detections.withColumn("_tp", F.sum(hit_col).over(w_cum).cast("double"))
        .withColumn("_i", F.count("*").over(w_cum).cast("double"))
        .withColumn("_n_true", n_true_expr)
        # a group with zero matched GTs has undefined recall → NULL AP
        # (never a fake 0/1, and never an ANSI divide-by-zero)
        .withColumn(
            "_recall",
            F.when(F.col("_n_true") > 0, F.col("_tp") / F.col("_n_true")),
        )
        .withColumn("_precision", F.col("_tp") / F.col("_i"))
        .withColumn("_p_mono", F.max("_precision").over(w_suffix))
        .withColumn("_d_recall", F.col("_recall") - F.lag("_recall", 1, 0.0).over(w_lag))
    )
    return ranked.groupBy(*group_cols).agg(
        F.round(F.sum(F.col("_d_recall") * F.col("_p_mono")), 6).alias("ap"),
        F.max("_n_true").cast("long").alias("n_true"),
        F.count("*").alias("n_detections"),
    )


def accuracy_under_threshold(
    errors: DataFrame,
    group_cols: list[str],
    error_col: str = "error",
    thresh: float = 0.1,
) -> DataFrame:
    """Accuracy = % of errors ≤ threshold (metrics.py:101-117)."""
    return errors.groupBy(*group_cols).agg(
        F.round(
            F.sum(F.when(F.col(error_col) <= thresh, 1).otherwise(0))
            * 100.0
            / F.count("*"),
            6,
        ).alias("accuracy"),
        F.count("*").alias("n"),
    )


def greedy_match_hits(
    dets: Column, gts: Column, iou_thresh: float = 0.5, iou_fn=None
) -> Column:
    """VOC greedy detection↔ground-truth matching, IN-ROW (§2.11,
    metrics.py protocol): detections in descending-score order each claim
    the highest-IoU unmatched ground-truth box with IoU ≥ ``iou_thresh``;
    every GT matches at most once; later (lower-score) detections of the
    same object are false positives.

    ``dets``: array<struct<score double, box B>>; ``gts``: array of the
    same box struct B. ``iou_fn(a, b) -> Column`` defaults to
    :func:`iou_2d` (B = corner-encoded x_min..y_max); pass
    :func:`aabb_iou_3d` with center/extent structs for the 3D protocol
    the reference's Objectron eval CLI runs. Returns
    array<struct<score double, hit int>> in descending-score order —
    the exact input shape :func:`average_precision` consumes after an
    explode. One frame is one row, so the inherently-sequential greedy
    protocol is an array FOLD: no shuffle, no UDF, scales with splits.

    The fold accumulator carries (list of claimed gt indices, emitted
    hits); each step scans gts for the best (iou, -index) candidate not
    yet claimed — O(|dets|·|gts|) per frame, the same complexity the
    reference's per-image loops pay.
    """
    from .text import let

    iou_fn = iou_fn or iou_2d

    def mk(ds: Column, gs: Column) -> Column:
        ordered = F.array_sort(
            F.transform(
                ds,
                lambda d, i: F.struct(
                    (-d["score"]).alias("negscore"),
                    i.alias("idx"),
                    d["score"].alias("score"),
                    d["box"].alias("box"),
                ),
            )
        )
        init = F.struct(
            F.array().cast("array<int>").alias("claimed"),
            F.array().cast("array<struct<score:double,hit:int>>").alias("out"),
        )

        def step(acc: Column, d: Column) -> Column:
            cands = F.filter(
                F.transform(
                    gs,
                    lambda g, gi: F.struct(
                        (-iou_fn(d["box"], g)).alias("negiou"),
                        gi.alias("gi"),
                    ),
                ),
                lambda c: (-c["negiou"] >= F.lit(iou_thresh))
                & ~F.array_contains(acc["claimed"], c["gi"]),
            )
            best = F.get(F.array_sort(cands), 0)
            hit = best["gi"].isNotNull()
            return F.struct(
                F.when(
                    hit, F.array_append(acc["claimed"], best["gi"])
                ).otherwise(acc["claimed"]).alias("claimed"),
                F.array_append(
                    acc["out"],
                    F.struct(
                        d["score"].alias("score"),
                        F.when(hit, 1).otherwise(0).alias("hit"),
                    ),
                ).alias("out"),
            )

        return F.aggregate(ordered, init, step)["out"]

    return let(
        F.coalesce(dets, F.array()),
        lambda ds: let(F.coalesce(gts, F.array()), lambda gs: mk(ds, gs)),
    )


BOX_COLS_2D = ("x_min", "y_min", "x_max", "y_max")
BOX_COLS_3D = ("x", "y", "z", "xl", "yl", "zl")
BOX_COLS_3D_ORIENTED = ("x", "y", "z", "xl", "yl", "zl", "pitch", "yaw", "roll")


def greedy_match_hits_exact_udf(iou_thresh: float = 0.5):
    """The VOC greedy protocol of :func:`greedy_match_hits` with the
    rotation-EXACT oriented IoU kernel — a pandas UDF because
    :func:`exact_iou_3d` is numpy, not a column expression. Wire format
    is flat double arrays (Arrow ships nested primitive lists cheaply):
    ``dets`` = array of [−score, *box9] already lexicographically sorted
    (descending score with box tie-breaks — same total order the column
    fold uses), ``gts`` = array of box9 arrays. Returns array of
    [score, hit] pairs in descending-score order. Tie-break matches the
    fold exactly: highest IoU, then lowest ground-truth index."""
    from pyspark.sql.functions import pandas_udf

    def world_aabb(box9: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        # half-extent of the oriented box's world AABB along axis k is
        # Σⱼ |R[k,j]|·dⱼ/2 — disjoint AABBs ⇒ empty intersection, so the
        # O(36-clip) kernel only runs on pairs that can actually overlap
        c, d = box9[0:3], box9[3:6]
        r = _rot_zyx(box9[6], box9[7], box9[8])
        h = np.abs(r) @ (d / 2.0)
        return c - h, c + h

    def one(dets, gts):
        gs = [np.asarray(g, dtype=float) for g in (gts if gts is not None else [])]
        g_aabb = [world_aabb(g) for g in gs]
        claimed: set[int] = set()
        out = []
        for d in dets if dets is not None else []:
            d = np.asarray(d, dtype=float)
            score, box = -d[0], d[1:]
            d_lo, d_hi = world_aabb(box)
            best_gi, best_iou = -1, -1.0
            for gi, g in enumerate(gs):
                if gi in claimed:
                    continue
                g_lo, g_hi = g_aabb[gi]
                if np.any(d_lo > g_hi) or np.any(d_hi < g_lo):
                    continue
                v = exact_iou_3d(box, g)
                if v >= iou_thresh and v > best_iou:
                    best_gi, best_iou = gi, v
            if best_gi >= 0:
                claimed.add(best_gi)
                out.append([float(score), 1.0])
            else:
                out.append([float(score), 0.0])
        return out

    @pandas_udf("array<array<double>>")
    def match(dets: pd.Series, gts: pd.Series) -> pd.Series:
        return pd.Series([one(d, g) for d, g in zip(dets, gts)])

    return match


def detection_ap(
    dets: DataFrame,
    gts: DataFrame,
    image_col: str = "image_id",
    category_col: str = "category",
    score_col: str = "score",
    box_cols: tuple[str, ...] | None = None,
    iou_thresh: float = 0.5,
    mode: str = "2d",
    matcher: str = "closed",
) -> DataFrame:
    """Per-category AP over flat detection/ground-truth tables — the
    engine's analogue of the vendored Objectron eval CLI
    (objectron/dataset/eval.py): greedy per-image matching at
    ``iou_thresh``, then VOC AP per category.

    ``mode='2d'`` matches corner-encoded pixel boxes with :func:`iou_2d`;
    ``mode='3d'`` matches center/extent 9-DoF boxes with
    :func:`aabb_iou_3d` — the axis-aligned closed form.
    ``matcher='exact'`` (3D only) instead matches with the rotation-EXACT
    Sutherland–Hodgman kernel :func:`exact_iou_3d` — Objectron's own
    clipping protocol (data_processing/objectron/dataset/iou.py:22-34) —
    over the 9-DoF oriented box columns via the Arrow-batched greedy UDF;
    everything downstream of the per-image hit sequence (AP windows,
    real-GT recall, AP-0 rows) is shared with the closed-form path.

    Pipeline shape: one groupBy per table collects the per-(image,
    category) box arrays (the only corpus-sized shuffles, both keyed the
    same); the greedy protocol runs IN-ROW per image; AP is window
    algebra per category. Images whose detections have no ground truth
    still contribute false positives (left join, empty gt array).
    Recall is normalized to the REAL per-category ground-truth count, so
    missed objects (false negatives) lower AP — including categories
    with ground truth but zero detections, which emit an AP-0 row. A
    category with detections but no ground truth anywhere has undefined
    recall → NULL AP.
    """
    if mode not in ("2d", "3d"):
        raise ValueError(f"mode must be '2d' or '3d', got {mode!r}")
    if matcher not in ("closed", "exact"):
        raise ValueError(f"matcher must be 'closed' or 'exact', got {matcher!r}")
    if matcher == "exact" and mode != "3d":
        raise ValueError("matcher='exact' is the oriented 3D protocol")
    # Pin the greedy-match stage's parallelism. The per-(image, category)
    # box arrays are byte-LIGHT (hundreds of compressed bytes per image)
    # but the in-row greedy matcher is CPU-DENSE (O(dets x gts) IoU per
    # row — interpreted fold or Arrow clipping kernel), so AQE's
    # byte-based partition coalescing starves it: at sf1 the stage ran
    # as 3 tasks and sat for 20+ minutes where 32 tasks take ~1 minute.
    # An explicit keyed repartition is exempt from AQE coalescing, and
    # the groupBy below reuses its hash partitioning (ClusteredDistribution
    # satisfied) — so this costs no extra exchange, it just pins the
    # count. defaultParallelism scales with the cluster.
    par = 2 * dets.sparkSession.sparkContext.defaultParallelism
    dets = dets.repartition(par, image_col, category_col)
    gts = gts.repartition(par, image_col, category_col)
    if box_cols is None:
        box_cols = (
            BOX_COLS_2D
            if mode == "2d"
            else (BOX_COLS_3D_ORIENTED if matcher == "exact" else BOX_COLS_3D)
        )
    # collect_list order is partition-dependent; sort the det array by
    # (score desc, box fields) and the gt array by box fields so greedy's
    # tie-breaks — and therefore every hit sequence and AP — are a pure
    # function of the data, not of shuffle arrival order
    if matcher == "exact":
        darr = F.array(
            -F.col(score_col).cast("double"),
            *[F.col(c).cast("double") for c in box_cols],
        )
        garr = F.array(*[F.col(c).cast("double") for c in box_cols])
        d_boxes = dets.groupBy(image_col, category_col).agg(
            F.array_sort(F.collect_list(darr)).alias("_dets")
        )
        g_boxes = gts.groupBy(image_col, category_col).agg(
            F.array_sort(F.collect_list(garr)).alias("_gts")
        )
        match = greedy_match_hits_exact_udf(iou_thresh)
        hits = d_boxes.join(g_boxes, [image_col, category_col], "left").select(
            image_col,
            category_col,
            F.posexplode(match(F.col("_dets"), F.col("_gts"))).alias("pos", "h"),
        )
        flat = hits.select(
            category_col,
            F.col(image_col),
            "pos",
            F.col("h")[0].alias("score"),
            F.col("h")[1].cast("int").alias("hit"),
        )
    else:
        iou_fn = iou_2d if mode == "2d" else aabb_iou_3d
        xs = [F.col(c).cast("double").alias(c) for c in box_cols]
        d_boxes = dets.groupBy(image_col, category_col).agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col(score_col).cast("double")).alias("neg"),
                            F.struct(*xs).alias("box"),
                            F.col(score_col).cast("double").alias("score"),
                        )
                    )
                ),
                lambda s: F.struct(s["score"].alias("score"), s["box"].alias("box")),
            ).alias("_dets")
        )
        g_boxes = gts.groupBy(image_col, category_col).agg(
            F.array_sort(F.collect_list(F.struct(*xs))).alias("_gts")
        )
        hits = d_boxes.join(g_boxes, [image_col, category_col], "left").select(
            image_col,
            category_col,
            F.posexplode(
                greedy_match_hits(F.col("_dets"), F.col("_gts"), iou_thresh, iou_fn)
            ).alias("pos", "h"),
        )
        flat = hits.select(
            category_col,
            F.col(image_col),
            "pos",
            F.col("h.score").alias("score"),
            F.col("h.hit").alias("hit"),
        )
    gt_counts = gts.groupBy(category_col).agg(
        F.count("*").cast("long").alias("_cat_n_true")
    )
    flat = flat.join(F.broadcast(gt_counts), category_col, "left").withColumn(
        "_cat_n_true", F.coalesce(F.col("_cat_n_true"), F.lit(0))
    )
    # (image, pos) makes the per-category sort total → deterministic AP
    ap = average_precision(
        flat, [category_col], order_cols=[image_col, "pos"],
        n_true_col="_cat_n_true",
    )
    # ground truth with zero detections anywhere → AP 0 (all missed).
    # Anti-join against the (cheap) detected-category set, NOT against
    # `ap` — the latter would re-evaluate the whole greedy+window subtree
    # a second time inside the union.
    undetected = gt_counts.join(
        dets.select(category_col).distinct(), category_col, "left_anti"
    ).select(
        category_col,
        F.lit(0.0).alias("ap"),
        F.col("_cat_n_true").alias("n_true"),
        F.lit(0).cast("long").alias("n_detections"),
    )
    return ap.unionByName(undetected)
