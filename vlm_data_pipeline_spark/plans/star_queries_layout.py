"""Data-layout / diagnostics queries: Z-order clustering + skew report.

The 100 TB operator surface beyond the reference's own inventory
(SURVEY §2 extensions): physical-layout optimization (the Delta/Iceberg
``OPTIMIZE ZORDER BY`` shape) and the pre-join skew diagnosis. Both are
pure integer Column programs, so the DuckDB oracles re-derive every bit
— including the interleaved key itself (``zorder_key_sql`` emits the
same arithmetic as SQL text, the pagerank_oracle_sql precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.layout import (
    compaction_plan,
    key_skew_report,
    zorder_key,
    zorder_key_sql,
    zorder_rank,
)
from .registry import load_tables, register

_ZBITS = 8  # 8 bits/dim * 2 dims = 16-bit key; >>8 below = 256 buckets

# rank expressions as SQL text (must mirror operators.layout.zorder_rank:
# up-shift narrow domains to fill the bit budget, down-shift wide ones)
def _rank_sql(x: str, lo: str, hi: str) -> str:
    blen = f"length(bin({hi} - {lo}))"
    return (
        f"((({x} - {lo}) << greatest(0, {_ZBITS} - {blen}))"
        f" >> greatest(0, {blen} - {_ZBITS}))"
    )


_ZORDER_ORACLE = f"""
WITH b AS (
    SELECT min(l_partkey) AS lo_p, max(l_partkey) AS hi_p,
           min(l_suppkey) AS lo_s, max(l_suppkey) AS hi_s
    FROM lineitem
), r AS (
    SELECT l_partkey, l_suppkey,
           {_rank_sql("l_partkey", "lo_p", "hi_p")} AS rp,
           {_rank_sql("l_suppkey", "lo_s", "hi_s")} AS rs
    FROM lineitem, b
), k AS (
    SELECT l_partkey, l_suppkey,
           {zorder_key_sql(["rp", "rs"], _ZBITS)} AS zkey
    FROM r
)
SELECT CAST(zkey >> {_ZBITS} AS BIGINT) AS zbucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(max(l_partkey) - min(l_partkey) AS BIGINT) AS span_partkey,
       CAST(max(l_suppkey) - min(l_suppkey) AS BIGINT) AS span_suppkey
FROM k
GROUP BY zbucket
"""


@register(
    "layout_zorder_buckets",
    _ZORDER_ORACLE,
    "Z-order layout audit: interleave (l_partkey, l_suppkey) into a "
    "16-bit curve key (operators.layout.zorder_key — shift-quantized "
    "ranks, dimension-major bit interleave, zero UDFs) and aggregate "
    "per 256-key curve segment. span_partkey/span_suppkey per bucket "
    "are the per-file min/max width a z-clustered writer would "
    "produce: each segment covers a tight hyper-rectangle in BOTH "
    "dimensions, which is exactly why multi-column range predicates "
    "prune z-ordered files but not linearly-sorted ones. The oracle "
    "re-derives the full interleaved key bit-for-bit in SQL.",
)
def layout_zorder_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    bounds = li.agg(
        F.min("l_partkey").alias("lo_p"),
        F.max("l_partkey").alias("hi_p"),
        F.min("l_suppkey").alias("lo_s"),
        F.max("l_suppkey").alias("hi_s"),
    )
    j = li.select("l_partkey", "l_suppkey").crossJoin(F.broadcast(bounds))
    rp = zorder_rank(F.col("l_partkey"), F.col("lo_p"), F.col("hi_p"), _ZBITS)
    rs = zorder_rank(F.col("l_suppkey"), F.col("lo_s"), F.col("hi_s"), _ZBITS)
    key = zorder_key([rp, rs], _ZBITS)
    return (
        j.select(
            F.shiftright(key, _ZBITS).alias("zbucket"),
            "l_partkey",
            "l_suppkey",
        )
        .groupBy("zbucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            (F.max("l_partkey") - F.min("l_partkey"))
            .cast("long")
            .alias("span_partkey"),
            (F.max("l_suppkey") - F.min("l_suppkey"))
            .cast("long")
            .alias("span_suppkey"),
        )
    )


_SKEW_ORACLE = """
WITH c AS (
    SELECT o_custkey AS key, CAST(count(*) AS BIGINT) AS n_rows
    FROM orders GROUP BY 1
), t AS (
    SELECT CAST(count(*) AS BIGINT) AS total FROM orders
)
SELECT key, n_rows,
       CAST(n_rows * 1000000 // total AS BIGINT) AS share_ppm
FROM c, t
ORDER BY n_rows DESC, key ASC
LIMIT 25
"""


@register(
    "diag_key_skew",
    _SKEW_ORACLE,
    "Key-skew diagnosis (operators.layout.key_skew_report): top-25 "
    "heaviest join/shuffle keys with exact integer ppm share — the "
    "table that decides between AQE skew split, salting, and a "
    "broadcast rewrite before a 1000-executor stage stalls on one "
    "partition. One hash aggregate; the 1-row total rides a broadcast "
    "cross join (never collected); share is integer DIV, so the "
    "oracle matches bit-for-bit.",
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    return key_skew_report(orders, "o_custkey", top_n=25)


_COMPACT_TARGET = 16384

_COMPACTION_ORACLE = f"""
WITH s AS (
    SELECT doc_id AS name, CAST(n_chars AS BIGINT) AS bytes,
           SUM(CAST(n_chars AS BIGINT)) OVER (
               ORDER BY n_chars DESC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - CAST(n_chars AS BIGINT) AS strt
    FROM documents
)
SELECT CAST(strt // {_COMPACT_TARGET} AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(bytes) AS BIGINT) AS total_bytes
FROM s
GROUP BY 1
"""


@register(
    "layout_compaction_plan",
    _COMPACTION_ORACLE,
    "Small-file compaction planner (operators.layout.compaction_plan, "
    "the lakehouse OPTIMIZE shape): files ordered size-desc/name-asc, "
    "binned by START OFFSET DIV target — the same offset-binning rule "
    "Spark's scan planner uses under maxPartitionBytes, so a bin "
    "exceeds target by at most one file tail and the whole plan is one "
    "window cumsum over file METADATA (skinny one-reducer pass, not a "
    "data shuffle). Demo corpus: each document as a file of n_chars "
    "bytes; per-bin rollup re-derived exactly in SQL.",
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    plan = compaction_plan(
        docs.select("doc_id", "n_chars"),
        "doc_id",
        "n_chars",
        _COMPACT_TARGET,
    )
    return plan.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("bytes").cast("long").alias("total_bytes"),
    )
