"""SURVEY §2 coverage, batch 2: predicates/parsing, per-row array aggregation,
explode pipelines, cube/grouping-sets, set ops, JSON wrangling, percentiles,
and a sessionization extension.

Same contract as batch 1: every float aggregate is exact (integer-scaled),
every pick is fully tie-broken, both sides aliased identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .exact import duck_exact_sum, exact_sum
from .registry import load_tables, register


@register(
    "p3_parse_id_suffix",
    """
    SELECT c_custkey,
           cast(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT) AS name_id,
           c_mktsegment
    FROM customer
    WHERE c_name LIKE 'Customer#%' AND c_acctbal > 0
    """,
    "P3 unlabeled-instance predicate + id parsing (category.startswith"
    "('object_') → int suffix, build_label_codebook_fast.py:47-51). "
    "startswith + regexp_extract + cast as pure codegen'd predicates — "
    "pushed to the scan, no UDF.",
)
def p3_parse_id_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    return (
        cust.filter(F.col("c_name").startswith("Customer#") & (F.col("c_acctbal") > 0))
        .select(
            "c_custkey",
            F.regexp_extract(F.col("c_name"), r"Customer#(\d+)", 1)
            .cast("bigint")
            .alias("name_id"),
            "c_mktsegment",
        )
    )


@register(
    "p4_range_sanity_filter",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_quantity, 2) AS qty,
           round(l_discount, 2) AS disc
    FROM lineitem
    WHERE l_quantity BETWEEN 5 AND 45
      AND l_discount BETWEEN 0.02 AND 0.08
      AND l_extendedprice > 0
      AND l_shipdate IS NOT NULL
    """,
    "P4/P5 numeric-range sanity filters (depth ∈ (0,100), bbox dims ∈ "
    "[0.05,50], distance ∈ [0.2,20] m — taskonomy_processor.py:176-216, "
    "QA_generation/config.py:91-137) + invalid-value exclusion "
    "(hypersim_processor.py:149-151). Conjunctive predicates pushed to the "
    "parquet scan (PushedFilters), thresholds from a config table at scale.",
)
def p4_range_sanity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return li.filter(
        F.col("l_quantity").between(5, 45)
        & F.col("l_discount").between(0.02, 0.08)
        & (F.col("l_extendedprice") > 0)
        & F.col("l_shipdate").isNotNull()
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity", 2).alias("qty"),
        F.round("l_discount", 2).alias("disc"),
    )


@register(
    "a3_array_row_stats",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           round(list_min(embedding), 6) AS vmin,
           round(list_max(embedding), 6) AS vmax,
           (cast(list_sum(list_transform(embedding,
                x -> cast(round(cast(x as DOUBLE) * 1000000.0) as BIGINT))) as DOUBLE)
            / (1000000.0 * len(embedding))) AS vmean
    FROM embeddings
    """,
    "A3 per-row array aggregation (depth-map stats min/max/mean over the "
    "valid-pixel array, data_processing/utils.py:93-127) over the embedding "
    "column: array_min/array_max + an exact integer-scaled mean via "
    "transform+aggregate. Runs inside codegen per row — no shuffle at all.",
)
def a3_array_row_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    # promote float32 → double BEFORE scaling: a float32 multiply loses the
    # fraction that decides the round, and the oracle computes in double
    scaled_sum = F.aggregate(
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") * F.lit(1000000.0)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("vmin"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("vmax"),
        (
            scaled_sum.cast("double")
            / (F.lit(1000000.0) * F.size("embedding").cast("double"))
        ).alias("vmean"),
    )


@register(
    "word_histogram",
    """
    SELECT word, count(*) AS n_occurrences
    FROM (
        SELECT unnest(string_split(text, ' ')) AS word
        FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    HAVING count(*) >= 5
    """,
    "A1/A2 explode-then-count (per-frame and corpus-wide category "
    "histograms over exploded boxes, data_loader.py:109-151, "
    "object_count_qa.py:50-60): explode(split(text)) → groupBy(word) → "
    "HAVING. The generator explodes map-side; only (word,1) partials "
    "shuffle — the token-count workhorse for LLM-corpus statistics.",
)
def word_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= 5)
    )


@register(
    "cube_order_stats",
    f"""
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           count(*) AS n_lines,
           {duck_exact_sum("l_quantity")} AS total_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    "Grouping-sets extension of A4 (SURVEY §2.5 notes cube for the star "
    "demos): CUBE over (returnflag, linestatus). Catalyst Expand produces "
    "all grouping sets in one shuffle.",
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_lines"),
            exact_sum(F.col("l_quantity")).alias("total_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n_lines",
            "total_qty",
        )
    )


@register(
    "e3_segment_set_ops",
    """
    SELECT 'common' AS op, c_mktsegment AS segment FROM (
        SELECT DISTINCT c_mktsegment FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE n_nationkey % 2 = 0
        INTERSECT
        SELECT DISTINCT c_mktsegment FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE n_nationkey % 2 = 1
    )
    UNION ALL
    SELECT 'even_only' AS op, c_mktsegment AS segment FROM (
        SELECT DISTINCT c_mktsegment FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE n_nationkey % 2 = 0
        EXCEPT
        SELECT DISTINCT c_mktsegment FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE n_nationkey % 2 = 1
    )
    """,
    "E3 set union/intersection across partitions of the data (category "
    "vocabulary sets, check_dataset_parameters.py:153-154) as INTERSECT / "
    "EXCEPT over distinct projections.",
)
def e3_segment_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "nation")
    joined = t["customer"].join(
        F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey")
    )
    even = joined.filter(F.col("n_nationkey") % 2 == 0).select("c_mktsegment").distinct()
    odd = joined.filter(F.col("n_nationkey") % 2 == 1).select("c_mktsegment").distinct()
    common = even.intersect(odd).select(
        F.lit("common").alias("op"), F.col("c_mktsegment").alias("segment")
    )
    even_only = even.exceptAll(odd).select(
        F.lit("even_only").alias("op"), F.col("c_mktsegment").alias("segment")
    )
    return common.unionByName(even_only)


@register(
    "f11_json_props",
    """
    SELECT event_type,
           count(*) AS n_events,
           cast(sum(cast(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS BIGINT) AS total_k,
           max(cast(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)) AS max_k
    FROM events
    WHERE props IS NOT NULL
    GROUP BY event_type
    """,
    "F11 JSON wrangling at the edges (nested dict get/normalize, "
    "geometry.py:272-335): extract a numeric field from the JSON props "
    "string and aggregate. Regexp extraction keeps it engine-portable; "
    "from_json with an explicit schema is the production path.",
)
def f11_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    k = F.regexp_extract(F.col("props"), r'"k": (\d+)', 1).cast("bigint")
    return (
        ev.filter(F.col("props").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(k).alias("total_k"),
            F.max(k).alias("max_k"),
        )
    )


@register(
    "a3_median_percentile",
    """
    SELECT c_mktsegment,
           count(*) AS n_customers,
           round(median(c_acctbal), 2) AS median_bal,
           round(quantile_cont(c_acctbal, 0.9), 2) AS p90_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
    "A3 median depth statistic (median over masked depth values, "
    "data_processing/utils.py:93-127) as an exact grouped median + p90. "
    "Spark 4 percentile() is exact with linear interpolation, matching "
    "DuckDB quantile_cont; values are 2-decimal so the interpolated "
    "midpoint is exactly representable. At 100 TB swap to "
    "percentile_approx with a documented error bound.",
)
def a3_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    return cust.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 2).alias("median_bal"),
        F.round(F.expr("percentile(c_acctbal, 0.9)"), 2).alias("p90_bal"),
    )


@register(
    "sessionize_events",
    """
    SELECT user_id,
           count(DISTINCT session_id) AS n_sessions,
           count(*) AS n_events,
           max(session_len) AS max_session_len
    FROM (
        SELECT user_id, session_id, count(*) OVER (PARTITION BY user_id, session_id) AS session_len
        FROM (
            SELECT user_id,
                   sum(is_new) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                                 IS NULL
                              OR epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                                                  ORDER BY ts, event_id)) > 1800
                            THEN 1 ELSE 0 END AS is_new
                FROM events
            )
        )
    )
    GROUP BY user_id
    """,
    "Sessionization EXTENSION (no reference analogue; the scene/sequence "
    "grouping J11 is its batch cousin): lag-gap > 30 min starts a session; "
    "running sum assigns ids. One shuffle on user_id serves every window. "
    "PER-USER aggregate granularity; the round-8 events_sessionize entry "
    "emits the PER-SESSION rollup from the shared library operator "
    "(operators.timeseries.sessionize). Streaming twin: "
    "session_window(ts, '30 minutes') in "
    "vlm_data_pipeline_spark.streaming.",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w = W.partitionBy("user_id").orderBy(*order)
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    with_new = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    with_sess = with_new.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    with_len = with_sess.withColumn(
        "session_len",
        F.count("*").over(W.partitionBy("user_id", "session_id")),
    )
    return with_len.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count("*").alias("n_events"),
        F.max("session_len").alias("max_session_len"),
    )


# ---------------------------------------------------------------------------
# P9: 3D→2D corner-projection predicate
# ---------------------------------------------------------------------------

_P9_SIGNS = [
    (-1, -1, -1), (1, -1, -1), (1, 1, -1), (-1, 1, -1),
    (-1, -1, 1), (1, -1, 1), (1, 1, 1), (-1, 1, 1),
]
_P9_CORNERS = ", ".join(
    f"[x {'+' if sx > 0 else '-'} hx, "
    f"y {'+' if sy > 0 else '-'} hy, "
    f"z {'+' if sz > 0 else '-'} hz]"
    for sx, sy, sz in _P9_SIGNS
)
# Mirror geometry.project_box_to_2d's arithmetic EXACTLY (same literal K,
# same op order) so both engines produce bit-identical doubles pre-trunc.
_P9_U = "(500.0*c[1] + 0.0*c[2] + 320.0*c[3]) / (0.0*c[1] + 0.0*c[2] + 1.0*c[3])"
_P9_V = "(0.0*c[1] + 480.0*c[2] + 240.0*c[3]) / (0.0*c[1] + 0.0*c[2] + 1.0*c[3])"


@register(
    "p9_project_box_2d",
    f"""
    WITH b AS (
        SELECT p_partkey AS pid,
               (p_partkey % 21 - 10) / 2.0 AS x,
               (p_partkey % 13 - 6) / 2.0 AS y,
               cast(p_partkey % 17 - 3 AS DOUBLE) AS z,
               (1 + p_size % 5) / 2.0 AS hx,
               (1 + p_size % 7) / 2.0 AS hy,
               (1 + p_size % 3) / 2.0 AS hz
        FROM part
    ), v AS (
        SELECT pid,
               list_filter([{_P9_CORNERS}], c -> c[3] > 0.1) AS valid
        FROM b
    ), r AS (
        SELECT pid,
               greatest(0, cast(trunc(list_min(list_transform(valid, c -> {_P9_U}))) AS INT)) AS x_min,
               greatest(0, cast(trunc(list_min(list_transform(valid, c -> {_P9_V}))) AS INT)) AS y_min,
               least(640, cast(trunc(list_max(list_transform(valid, c -> {_P9_U}))) AS INT)) AS x_max,
               least(480, cast(trunc(list_max(list_transform(valid, c -> {_P9_V}))) AS INT)) AS y_max
        FROM v
        WHERE len(valid) > 0
    )
    SELECT pid, x_min, y_min, x_max, y_max
    FROM r
    WHERE x_max > x_min AND y_max > y_min
    """,
    "P9 3D→2D corner projection predicate (build_label_codebook_fast.py:"
    "238-280): 8 axis-aligned corners, z>0.1 validity filter, pinhole "
    "projection, truncate+clamp to the image, drop degenerate rects. Boxes "
    "synthesized deterministically from part keys (some behind the camera, "
    "some clipped). Library: functions.geometry.project_box_to_2d — pure "
    "codegen'd array math, no UDF, no shuffle.",
)
def p9_project_box_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.geometry import project_box_to_2d

    part = load_tables(spark, sf_dir, "part")["part"]
    pk, sz = F.col("p_partkey"), F.col("p_size")
    box = F.struct(
        ((pk % 21 - 10) / 2.0).alias("x"),
        ((pk % 13 - 6) / 2.0).alias("y"),
        (pk % 17 - 3).cast("double").alias("z"),
        (1 + sz % 5).cast("double").alias("xl"),
        (1 + sz % 7).cast("double").alias("yl"),
        (1 + sz % 3).cast("double").alias("zl"),
    )
    intr = F.array(
        F.array(F.lit(500.0), F.lit(0.0), F.lit(320.0)),
        F.array(F.lit(0.0), F.lit(480.0), F.lit(240.0)),
        F.array(F.lit(0.0), F.lit(0.0), F.lit(1.0)),
    )
    rect = project_box_to_2d(box, intr, F.lit(640), F.lit(480))
    return (
        part.select(F.col("p_partkey").alias("pid"), rect.alias("r"))
        .filter(F.col("r").isNotNull())
        .select(
            "pid",
            F.col("r.x_min").alias("x_min"),
            F.col("r.y_min").alias("y_min"),
            F.col("r.x_max").alias("x_max"),
            F.col("r.y_max").alias("y_max"),
        )
    )


@register(
    "scd2_segment_upsert",
    """
    WITH latest AS (
        SELECT o_custkey, o_orderpriority FROM (
            SELECT o_custkey, o_orderpriority,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC,
                                               o_orderkey DESC) AS rn
            FROM orders
        ) WHERE rn = 1
    ), upd AS (
        SELECT c_custkey AS k,
               CASE WHEN substr(o_orderpriority, 1, 1) = '1'
                    THEN c_mktsegment
                    ELSE 'SEG-' || substr(o_orderpriority, 1, 1) END AS seg
        FROM latest JOIN customer ON c_custkey = o_custkey
    )
    SELECT c_custkey, c_mktsegment AS segment,
           DATE '1990-01-01' AS valid_from,
           CASE WHEN u.k IS NOT NULL AND u.seg <> c_mktsegment
                THEN DATE '2024-01-01' END AS valid_to,
           (u.k IS NULL OR u.seg = c_mktsegment) AS is_current
    FROM customer LEFT JOIN upd u ON u.k = c_custkey
    UNION ALL
    SELECT c_custkey, u.seg, DATE '2024-01-01', NULL, TRUE
    FROM customer JOIN upd u ON u.k = c_custkey
    WHERE u.seg <> c_mktsegment
    """,
    "SCD type-2 dimension upsert (extension; the MERGE-INTO shape on "
    "plain parquet — the interval-versioned sibling of K5's type-1 "
    "codebook overwrite, producing the validity intervals J9 as-of "
    "joins consume): the customer dimension is seeded as all-current, "
    "an update batch derives each ordering customer's new segment from "
    "their latest order's priority (priority '1-URGENT' keeps the old "
    "segment, exercising the no-op branch), and scd2_apply closes "
    "changed rows at the batch date, opens new current versions, and "
    "passes unchanged rows through. One key-partitioned join; history "
    "never shuffles; no broadcast hints — AQE sizes the batch. The "
    "oracle re-derives the full post-state relationally. Library: "
    "operators.scd.scd2_apply.",
)
def scd2_segment_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd import scd2_apply

    t = load_tables(spark, sf_dir, "customer", "orders")
    cust, orders = t["customer"], t["orders"]
    dim = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1990-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    latest = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(
                F.struct("o_orderdate", "o_orderkey", "o_orderpriority")
            ).alias("m")
        )
        .select("o_custkey", F.col("m.o_orderpriority").alias("prio"))
    )
    updates = (
        latest.join(cust, latest.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            F.when(
                F.substring("prio", 1, 1) == "1", F.col("c_mktsegment")
            )
            .otherwise(F.concat(F.lit("SEG-"), F.substring("prio", 1, 1)))
            .alias("segment"),
            F.lit("2024-01-01").cast("date").alias("effective_date"),
        )
    )
    return scd2_apply(
        dim, updates, key_cols=["c_custkey"], attr_cols=["segment"]
    )
