"""Batch sessionization: analytic fixtures (known gap structure, ties,
single-event users) + the one-exchange plan shape."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from vlm_data_pipeline_spark.operators.timeseries import (
    session_rollup,
    sessionize,
)


def ts(m: int, s: int = 0):
    return datetime(2024, 1, 1, 0, m, s)


def _df(spark):
    rows = [
        # user 1: 3 sessions — gaps of 10 min split at a 5-min timeout
        (1, ts(0)), (1, ts(2)), (1, ts(4)),
        (1, ts(20)), (1, ts(22)),
        (1, ts(40)),
        # user 2: single event
        (2, ts(0)),
        # user 3: timestamp ties must share a session deterministically
        (3, ts(0)), (3, ts(0)), (3, ts(0)), (3, ts(30)),
    ]
    return spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP")


def test_session_assignment(spark):
    out = sessionize(_df(spark), "ts", ["user_id"], gap_seconds=300)
    got = {
        (r.user_id, r.ts.minute): r.session_idx for r in out.collect()
    }
    assert got[(1, 0)] == got[(1, 2)] == got[(1, 4)] == 1
    assert got[(1, 20)] == got[(1, 22)] == 2
    assert got[(1, 40)] == 3
    assert got[(2, 0)] == 1
    assert got[(3, 0)] == 1 and got[(3, 30)] == 2


def test_rollup_values(spark):
    out = session_rollup(
        _df(spark), "ts", ["user_id"], gap_seconds=300
    ).collect()
    by = {(r.user_id, r.session_idx): r for r in out}
    assert len(by) == 6
    r = by[(1, 1)]
    assert r.n_events == 3 and r.duration_seconds == 240
    assert by[(1, 3)].n_events == 1 and by[(1, 3)].duration_seconds == 0
    assert by[(3, 1)].n_events == 3 and by[(3, 1)].duration_seconds == 0


def test_exact_gap_boundary_is_same_session(spark):
    """gap == gap_seconds stays in-session; gap_seconds+1 splits."""
    rows = [(1, ts(0)), (1, ts(5)), (1, ts(10, 1))]
    df = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP")
    out = sessionize(df, "ts", ["user_id"], gap_seconds=300)
    idx = [r.session_idx for r in out.orderBy("ts").collect()]
    assert idx == [1, 1, 2]


def test_single_exchange_plan(spark):
    """sessionize + rollup must hash-exchange once: the window exchange
    on the key is reused by the (key, session_idx) groupBy (superset
    key) — no second corpus shuffle."""
    out = session_rollup(_df(spark), "ts", ["user_id"], gap_seconds=300)
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_exchange = plan.count("Exchange hashpartitioning")
    assert n_exchange == 1, plan


def test_hypothesis_matches_python_reference(spark):
    """Randomized event sets vs an independent Python sessionizer —
    gaps straddling the timeout, multi-user interleaving, ties."""
    import random

    rng = random.Random(11)
    rows = []
    for user in range(6):
        t = 0
        for _ in range(rng.randint(0, 25)):
            t += rng.choice([0, 1, 60, 299, 300, 301, 1000])
            rows.append((user, datetime.fromtimestamp(1704067200 + t)))
    if not rows:
        return
    df = spark.createDataFrame(rows, "user_id INT, ts TIMESTAMP")
    got = {
        (r.user_id, int(r.ts.timestamp()), r.session_idx)
        for r in sessionize(df, "ts", ["user_id"], 300).collect()
    }
    # independent reference
    expected = set()
    by_user: dict[int, list[int]] = {}
    for u, ts in rows:
        by_user.setdefault(u, []).append(int(ts.timestamp()))
    for u, tss in by_user.items():
        tss.sort()
        idx, prev = 0, None
        for t in tss:
            if prev is None or t - prev > 300:
                idx += 1
            expected.add((u, t, idx))
            prev = t
    assert got == expected
