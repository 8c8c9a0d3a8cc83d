"""SCD2 upsert: change/no-op/new-key/history paths, null-safe attribute
comparison, and idempotence of a no-change batch."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from vlm_data_pipeline_spark.operators.scd import scd2_apply

D = datetime.date


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k long, a string, b long, valid_from date, valid_to date, "
        "is_current boolean"
    )


def _upd(spark, rows):
    return spark.createDataFrame(
        rows, "k long, a string, b long, effective_date date"
    )


def _snap(df):
    return {
        (r.k, r.a, r.b, str(r.valid_from), str(r.valid_to), r.is_current)
        for r in df.collect()
    }


def test_scd2_all_paths(spark):
    dim = _dim(
        spark,
        [
            # k=1: will change attr a
            (1, "x", 10, D(2020, 1, 1), None, True),
            # k=1 history row: must pass through untouched
            (1, "w", 9, D(2019, 1, 1), D(2020, 1, 1), False),
            # k=2: update arrives with identical attrs -> no-op
            (2, "y", 20, D(2020, 1, 1), None, True),
            # k=3: no update at all -> carried
            (3, "z", 30, D(2020, 1, 1), None, True),
        ],
    )
    upd = _upd(
        spark,
        [
            (1, "x2", 10, D(2024, 1, 1)),
            (2, "y", 20, D(2024, 1, 1)),
            (4, "new", 40, D(2024, 1, 1)),  # brand-new key
        ],
    )
    out = scd2_apply(dim, upd, ["k"], ["a", "b"])
    assert _snap(out) == {
        (1, "w", 9, "2019-01-01", "2020-01-01", False),  # history
        (1, "x", 10, "2020-01-01", "2024-01-01", False),  # closed
        (1, "x2", 10, "2024-01-01", "None", True),  # opened
        (2, "y", 20, "2020-01-01", "None", True),  # no-op carried
        (3, "z", 30, "2020-01-01", "None", True),  # untouched carried
        (4, "new", 40, "2024-01-01", "None", True),  # fresh insert
    }
    # exactly one current row per live key
    cur = out.filter("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_null_safe_attr_compare(spark):
    dim = _dim(spark, [(1, None, 10, D(2020, 1, 1), None, True)])
    # same attrs (incl. NULL a) -> no-op, not a spurious close/open
    upd = _upd(spark, [(1, None, 10, D(2024, 1, 1))])
    out = scd2_apply(dim, upd, ["k"], ["a", "b"])
    assert _snap(out) == {(1, None, 10, "2020-01-01", "None", True)}
    # NULL -> value IS a change
    upd2 = _upd(spark, [(1, "v", 10, D(2024, 1, 1))])
    out2 = scd2_apply(dim, upd2, ["k"], ["a", "b"])
    assert (1, "v", 10, "2024-01-01", "None", True) in _snap(out2)
    assert (1, None, 10, "2020-01-01", "2024-01-01", False) in _snap(out2)


def test_scd2_history_only_key_reopens(spark):
    """A key that exists ONLY as history (closed by an earlier batch,
    no current row) must RE-OPEN as a new current row when an update
    arrives — not silently vanish (ADVICE r11: the anti-join must key
    on the current slice, not the whole dimension)."""
    dim = _dim(
        spark,
        [
            # k=1 was closed in 2021 and never re-opened: history only
            (1, "old", 5, D(2019, 1, 1), D(2021, 1, 1), False),
            # k=2 is a normal live key, untouched by the batch
            (2, "y", 20, D(2020, 1, 1), None, True),
        ],
    )
    upd = _upd(spark, [(1, "back", 6, D(2024, 1, 1))])
    out = scd2_apply(dim, upd, ["k"], ["a", "b"])
    assert _snap(out) == {
        (1, "old", 5, "2019-01-01", "2021-01-01", False),  # history kept
        (1, "back", 6, "2024-01-01", "None", True),  # re-opened
        (2, "y", 20, "2020-01-01", "None", True),
    }
    cur = out.filter("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_empty_batch_is_identity(spark):
    dim = _dim(
        spark,
        [
            (1, "x", 10, D(2020, 1, 1), None, True),
            (1, "w", 9, D(2019, 1, 1), D(2020, 1, 1), False),
        ],
    )
    out = scd2_apply(dim, _upd(spark, []), ["k"], ["a", "b"])
    assert _snap(out) == _snap(dim)


def test_scd2_plan_has_no_broadcast_hints(spark):
    """The operator must not force-broadcast either side (VERDICT r10
    #1 discipline): at autoBroadcastJoinThreshold=-1 the plan contains
    zero BroadcastExchange nodes."""
    dim = _dim(spark, [(1, "x", 10, D(2020, 1, 1), None, True)])
    upd = _upd(spark, [(1, "x2", 10, D(2024, 1, 1))])
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            scd2_apply(dim, upd, ["k"], ["a", "b"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastExchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)
