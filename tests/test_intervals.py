"""Binned interval joins: closed-interval semantics, exactly-once pair
emission (no dedup pass), brute-force fuzz parity, plan shape, and the
degenerate-bin-width guard."""

from __future__ import annotations

import random

import pytest

from vlm_data_pipeline_spark.operators.intervals import (
    interval_overlap_join,
    point_in_interval_join,
)


def _left(spark, rows):
    return spark.createDataFrame(rows, "lid long, ls double, le double")


def _right(spark, rows):
    return spark.createDataFrame(rows, "rid long, rs double, re double")


def test_overlap_hand_cases(spark):
    """Touching endpoints count (closed intervals); disjoint do not;
    containment and identity do; negative coordinates work."""
    left = _left(spark, [
        (1, 0.0, 10.0),     # overlaps r1 (touching), r2 (contained)
        (2, -20.0, -15.0),  # negative; overlaps r3
        (3, 50.0, 60.0),    # disjoint from everything
    ])
    right = _right(spark, [
        (1, 10.0, 20.0),    # touches l1 at exactly 10
        (2, 2.0, 3.0),      # inside l1
        (3, -16.0, -16.0),  # degenerate point-interval inside l2
        (4, 61.0, 70.0),    # gap of 1 after l3
    ])
    got = {
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bin_width=4.0
        ).collect()
    }
    assert got == {(1, 1), (1, 2), (2, 3)}


def test_overlap_no_duplicates_without_distinct(spark):
    """A pair overlapping across MANY shared bins still emits once —
    the first-overlap-bin rule, not a dropDuplicates."""
    left = _left(spark, [(1, 0.0, 100.0)])
    right = _right(spark, [(1, 0.0, 100.0), (2, 50.0, 200.0)])
    out = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bin_width=1.0
    )
    rows = out.collect()
    assert sorted((r.lid, r.rid) for r in rows) == [(1, 1), (1, 2)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Deduplicate" not in plan and "dropDuplicates" not in plan


def test_overlap_fuzz_matches_brute_force(spark):
    """200 random intervals per side, several bin widths: the binned
    join equals the quadratic reference exactly."""
    rng = random.Random(7)

    def mk(n, lo, hi):
        out = []
        for i in range(n):
            a = rng.uniform(lo, hi)
            b = a + abs(rng.gauss(0, 5))
            out.append((i, round(a, 3), round(b, 3)))
        return out

    lrows, rrows = mk(200, -50, 50), mk(200, -50, 50)
    expected = {
        (l[0], r[0])
        for l in lrows
        for r in rrows
        if l[1] <= r[2] and r[1] <= l[2]
    }
    assert len(expected) > 100  # the fixture actually overlaps
    for w in (0.7, 3.0, 25.0):
        got = {
            (r.lid, r.rid)
            for r in interval_overlap_join(
                _left(spark, lrows), _right(spark, rrows),
                "ls", "le", "rs", "re", bin_width=w,
            ).collect()
        }
        assert got == expected, f"bin_width={w}"


def test_overlap_plan_is_single_equi_join(spark):
    """The whole operator is one hash-partitioned equi-join — never a
    BroadcastNestedLoopJoin/CartesianProduct, no Window, no
    aggregation."""
    left = _left(spark, [(i, float(i), float(i + 2)) for i in range(100)])
    right = _right(spark, [(i, float(i) + 0.5, float(i) + 1.5) for i in range(100)])
    plan = (
        interval_overlap_join(left, right, "ls", "le", "rs", "re", 2.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" not in plan and "HashAggregate" not in plan
    assert ("SortMergeJoin" in plan) or ("HashJoin" in plan)


def test_guard_rejects_degenerate_width_and_bad_intervals(spark):
    from pyspark.errors import PySparkException

    left = _left(spark, [(1, 0.0, 1e9)])  # 1e9-wide interval
    right = _right(spark, [(1, 0.0, 1.0)])
    with pytest.raises(PySparkException, match="bins"):
        # binning a 1e9 span at width 1 → a billion replicas: refuse
        interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bin_width=1.0
        ).collect()
    inverted = _left(spark, [(1, 5.0, 4.0)])
    with pytest.raises(PySparkException, match="inverted"):
        interval_overlap_join(
            inverted, right, "ls", "le", "rs", "re", bin_width=1.0
        ).collect()
    with pytest.raises(ValueError, match="bin_width"):
        interval_overlap_join(left, right, "ls", "le", "rs", "re", 0.0)
    with pytest.raises(ValueError, match="disjoint"):
        interval_overlap_join(left, left, "ls", "le", "ls", "le", 1.0)


def test_point_in_interval_hand_and_plan(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, -3.0), (4, 99.0)], "pid long, p double"
    )
    ivals = _right(spark, [(1, 0.0, 10.0), (2, -5.0, -1.0), (3, 9.5, 20.0)])
    out = point_in_interval_join(points, ivals, "p", "rs", "re", bin_width=4.0)
    got = {(r.pid, r.rid) for r in out.collect()}
    # closed: point 10.0 hits both [0,10] and [9.5,20]
    assert got == {(1, 1), (2, 1), (2, 3), (3, 2)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def _sides(spark):
    left = spark.createDataFrame(
        [(1, 10, 100.0), (2, 10, 5.0), (3, 20, 50.0), (4, 30, 7.0)],
        "pid long, uid long, pts double",
    )
    right = spark.createDataFrame(
        [(101, 10, 100.0), (102, 10, 40.0), (103, 20, 60.0)],
        "sid long, uid long, sts double",
    )
    return left, right


def test_asof_backward_hand_case(spark):
    from vlm_data_pipeline_spark.operators.intervals import asof_join

    left, right = _sides(spark)
    got = {
        r.pid: r.sid
        for r in asof_join(left, right, "uid", "pts", "sts").collect()
    }
    # pid 1: exact ts 100 matches sid 101; pid 2: nothing <= 5 -> null;
    # pid 3: sid 103 is at 60 > 50 -> nothing backward -> null;
    # pid 4: user 30 has no right rows -> null
    assert got == {1: 101, 2: None, 3: None, 4: None}
    # exact matches excluded: pid 1 falls back to sid 102 (ts 40)
    got2 = {
        r.pid: r.sid
        for r in asof_join(
            left, right, "uid", "pts", "sts", allow_exact=False
        ).collect()
    }
    assert got2[1] == 102


def test_asof_forward_and_tolerance(spark):
    from vlm_data_pipeline_spark.operators.intervals import asof_join

    left, right = _sides(spark)
    fwd = {
        r.pid: r.sid
        for r in asof_join(
            left, right, "uid", "pts", "sts", direction="forward"
        ).collect()
    }
    # pid 2 (ts 5): next signup at 40 -> sid 102; pid 3 (50): 60 -> 103
    assert fwd == {1: 101, 2: 102, 3: 103, 4: None}
    tol = {
        r.pid: r.sid
        for r in asof_join(
            left, right, "uid", "pts", "sts",
            direction="forward", tolerance=10.0,
        ).collect()
    }
    # pid 2's nearest-forward match is 35 away -> nulled by tolerance
    assert tol == {1: 101, 2: None, 3: 103, 4: None}


def test_asof_tie_breaks_to_largest_payload(spark):
    from vlm_data_pipeline_spark.operators.intervals import asof_join

    left = spark.createDataFrame([(1, 1, 10.0)], "pid long, uid long, pts double")
    right = spark.createDataFrame(
        [(7, 1, 10.0), (9, 1, 10.0), (8, 1, 10.0)],
        "sid long, uid long, sts double",
    )
    rows = asof_join(left, right, "uid", "pts", "sts").collect()
    assert len(rows) == 1 and rows[0].sid == 9


def test_asof_plan_single_exchange_no_join(spark):
    """The union-window form: ONE hash exchange (the window partition),
    zero join operators — the scalable shape when both sides are huge."""
    from vlm_data_pipeline_spark.operators.intervals import asof_join

    left = spark.createDataFrame(
        [(i, i % 7, float(i)) for i in range(500)],
        "pid long, uid long, pts double",
    )
    right = spark.createDataFrame(
        [(1000 + i, i % 7, float(i) - 0.5) for i in range(500)],
        "sid long, uid long, sts double",
    )
    out = asof_join(left, right, "uid", "pts", "sts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_asof_fuzz_matches_brute_force(spark):
    from vlm_data_pipeline_spark.operators.intervals import asof_join

    rng = random.Random(11)
    lrows = [
        (i, rng.randint(0, 5), round(rng.uniform(0, 100), 2))
        for i in range(150)
    ]
    rrows = [
        (1000 + i, rng.randint(0, 5), round(rng.uniform(0, 100), 2))
        for i in range(150)
    ]
    expected = {}
    for pid, uid, pts in lrows:
        best = None
        for sid, ruid, sts in rrows:
            if ruid == uid and sts <= pts:
                # engine tie-break: largest (sid, sts) payload tuple
                if best is None or (sts, sid) > (best[1], best[0]):
                    best = (sid, sts)
        expected[pid] = best[0] if best else None
    left = spark.createDataFrame(lrows, "pid long, uid long, pts double")
    right = spark.createDataFrame(rrows, "sid long, uid long, sts double")
    got = {
        r.pid: r.sid
        for r in asof_join(left, right, "uid", "pts", "sts").collect()
    }
    assert got == expected


def test_asof_null_timestamps_never_match(spark):
    """Null right_ts rows are dropped (they'd sort first and become
    every left row's fallback); null left_ts rows match nothing in
    EITHER direction (under desc ordering they'd otherwise sort last
    and see every right row)."""
    from vlm_data_pipeline_spark.operators.intervals import asof_join

    left = spark.createDataFrame(
        [(1, 1, 10.0), (2, 1, None)], "pid long, uid long, pts double"
    )
    right = spark.createDataFrame(
        [(7, 1, 5.0), (8, 1, None)], "sid long, uid long, sts double"
    )
    for direction in ("backward", "forward"):
        got = {
            r.pid: r.sid
            for r in asof_join(
                left, right, "uid", "pts", "sts", direction=direction
            ).collect()
        }
        assert got[2] is None, direction  # null left ts: no match
        assert got[1] != 8, direction     # null right ts never matches
    back = {
        r.pid: r.sid
        for r in asof_join(left, right, "uid", "pts", "sts").collect()
    }
    assert back[1] == 7
