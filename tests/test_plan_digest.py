"""tools/plan_digest parses real executed-plan strings: the counters
must see codegen spans, exchanges, and pushed filters in a live plan."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

from plan_digest import digest  # noqa: E402


def test_digest_counts_live_plan(spark):
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = (
            spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
            .filter("l_quantity > 10")
            .groupBy("l_returnflag")
            .count()
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    d = digest(plan)
    assert d["exchanges"] == 1, plan
    assert d["wscg_spans"] >= 1, plan  # *(N) prefixes must be counted
    assert d["scans"] == 1
    assert d["pushed_filter_scans"] == 1  # l_quantity > 10 reaches the scan
    assert d["cartesian"] == 0 and d["bnlj"] == 0 and d["python_eval"] == 0


def test_digest_on_synthetic_string():
    plan = (
        "*(2) HashAggregate\n+- Exchange hashpartitioning(x, 32)\n"
        "   +- *(1) Project\n      +- BroadcastNestedLoopJoin\n"
        "         +- CartesianProduct\n"
        "         +- ArrowEvalPython\n"
        "         +- FileScan parquet [x] PushedFilters: [IsNotNull(x)]\n"
        "         +- FileScan parquet [y] PushedFilters: []\n"
    )
    d = digest(plan)
    assert d == {
        "exchanges": 1,
        "broadcasts": 0,
        "scans": 2,
        "pushed_filter_scans": 1,
        "wscg_spans": 2,
        "cartesian": 1,
        "bnlj": 1,
        "python_eval": 1,
    }
