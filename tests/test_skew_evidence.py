"""AQE skew-split evidence harness (tools/skew_evidence.py): the digest
must OBSERVE a real runtime skew split when one happens, and report the
absence correctly when the join is uniform — so the fuzzy_edit_join
"no residual skew" measurement in the ledger is a measurement, not an
assertion made by a tool that can never fire."""

from __future__ import annotations

from pyspark.sql import functions as F

from tools.skew_evidence import skew_digest


def _skewed_sides(spark, n_left=60_000, hot=50_000):
    # incompressible payload: skew detection reads post-compression
    # shuffle BYTES, so a constant payload would RLE away the hot
    # partition (documented in the tool header)
    pay = F.concat(
        *[
            F.md5(F.concat(F.col("id").cast("string"), F.lit(i)))
            for i in range(4)
        ]
    )
    left = spark.range(n_left).select(
        F.when(F.col("id") < hot, 0).otherwise(F.col("id")).alias("k"),
        pay.alias("pay"),
    )
    right = spark.range(5_000).select(
        (F.col("id") % 200).alias("k"), F.col("id").alias("v")
    )
    return left, right


def _with_conf(spark, pairs):
    prev = {k: spark.conf.get(k) for k in pairs}
    for k, v in pairs.items():
        spark.conf.set(k, v)
    return prev


def test_skew_digest_sees_runtime_split(spark):
    left, right = _skewed_sides(spark)
    prev = _with_conf(
        spark,
        {
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
                "64k",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    try:
        # the payload must survive into the join output: a pruned
        # payload compresses the hot partition below every threshold
        q = left.join(right.hint("merge"), "k").agg(
            F.sum(F.length("pay")).alias("s")
        )
        d = skew_digest(q)
        assert d["is_final_plan"]
        assert d["skew_joins"] >= 1, d
        assert d["skewed_reads"] >= 1, d
    finally:
        _with_conf(spark, prev)


def test_skew_digest_reports_uniform_join_as_clean(spark):
    # same shape, no hot key -> the digest must NOT report splits
    pay = F.md5(F.col("id").cast("string"))
    left = spark.range(60_000).select(
        (F.col("id") % 5_000).alias("k"), pay.alias("pay")
    )
    right = spark.range(5_000).select(
        (F.col("id") % 200).alias("k"), F.col("id").alias("v")
    )
    prev = _with_conf(
        spark,
        {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    try:
        q = left.join(right.hint("merge"), "k").agg(
            F.sum(F.length("pay")).alias("s")
        )
        d = skew_digest(q)
        assert d["is_final_plan"]
        assert d["skew_joins"] == 0, d
        assert d["skewed_reads"] == 0, d
        assert d["smj"] >= 1, d
    finally:
        _with_conf(spark, prev)
