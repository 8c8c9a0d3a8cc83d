"""Bucketed bronze layout: equi-joins and aggregations on the bucket key
must plan WITHOUT a shuffle exchange on the bucketed sides."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vlm_data_pipeline_spark.sources import bronze


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse dir is a static conf — tables land in the session default
    # (./spark-warehouse); dropped + deleted in teardown
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    bronze.write_bucketed(li, "b_lineitem", ["l_orderkey"], n_buckets=8)
    bronze.write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders",
        ["l_orderkey"],
        n_buckets=8,
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    import shutil

    shutil.rmtree("spark-warehouse", ignore_errors=True)


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_shuffle_free(bucketed_tables):
    spark = bucketed_tables
    li = bronze.read_table(spark, "b_lineitem")
    orders = bronze.read_table(spark, "b_orders")
    # disable broadcast so the join must pick a co-located strategy
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, "l_orderkey").groupBy("l_orderkey").agg(
            F.sum("l_quantity").alias("q"), F.max("o_totalprice").alias("p")
        )
        plan = _executed_plan(joined)
        assert "Exchange hashpartitioning" not in plan, plan
        # sanity: result is real
        assert joined.count() > 0
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_unbucketed_join_shuffles_for_contrast(bucketed_tables, sf_dir):
    spark = bucketed_tables
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _executed_plan(li.join(orders, "l_orderkey"))
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_signature_store_probe_avoids_store_shuffle(spark, sf_dir):
    """The incremental-MinHash docstring claims the signature store is
    'bucketable on (band, bucket) for a zero-shuffle probe' — prove it:
    with the banded store written bucketed on the join keys, the
    band+bucket probe join plans with NO exchange on the store side
    (only the incoming batch shuffles)."""
    from pyspark.sql import functions as F

    from vlm_data_pipeline_spark.operators.dedup import (
        banded_signatures,
        minhash_signatures,
    )
    from vlm_data_pipeline_spark.sources import bronze

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    store_banded = banded_signatures(
        minhash_signatures(docs.filter(F.col("doc_id") % 4 == 0)), 12, 4
    ).select("doc_id", "band", "bucket")
    bronze.write_bucketed(
        store_banded, "b_sig_store", ["band", "bucket"], n_buckets=8
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        store = bronze.read_table(spark, "b_sig_store")
        probe = banded_signatures(
            minhash_signatures(docs.filter(F.col("doc_id") % 4 != 0)), 12, 4
        ).select(
            F.col("doc_id").alias("q_id"), "band", "bucket"
        )
        joined = probe.join(store, ["band", "bucket"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # exactly one exchange: the probe side; the store scan feeds the
        # join straight from its bucketed layout
        assert plan.count("Exchange") == 1, plan[:2500]
        # non-vacuous: the planted near-copies straddle the store/batch
        # split, so the banded probe must actually find collisions
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_sig_store")


def test_bucketed_store_window_cap_costs_no_store_exchange(spark, sf_dir):
    """minhash_incremental_pairs' hot-bucket guard counts store members
    per (band, bucket) with a window — on a store bucketed on those keys
    the scan already satisfies the window's required distribution, so
    the guard adds one LOCAL sort and the probe join still plans with a
    single exchange (the incoming batch side only)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from vlm_data_pipeline_spark.operators.dedup import (
        banded_signatures,
        minhash_signatures,
    )
    from vlm_data_pipeline_spark.sources import bronze

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    store_banded = banded_signatures(
        minhash_signatures(docs.filter(F.col("doc_id") % 4 == 0)), 12, 4
    ).select("doc_id", "band", "bucket")
    bronze.write_bucketed(
        store_banded, "b_sig_store_w", ["band", "bucket"], n_buckets=8
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        store = bronze.read_table(spark, "b_sig_store_w")
        w = Window.partitionBy("band", "bucket")
        capped = (
            store.withColumn("_bn", F.count("*").over(w))
            .filter(F.col("_bn") <= 256)
            .drop("_bn")
        )
        probe = banded_signatures(
            minhash_signatures(docs.filter(F.col("doc_id") % 4 != 0)), 12, 4
        ).select(F.col("doc_id").alias("q_id"), "band", "bucket")
        joined = probe.join(capped, ["band", "bucket"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan[:2500]
        assert "Window" in plan
        assert joined.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_sig_store_w")
