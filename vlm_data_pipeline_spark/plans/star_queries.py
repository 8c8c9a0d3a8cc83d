"""SURVEY §2 relational operator inventory, demonstrated on the star schema.

Each query is the idiomatic-Spark expression of an operator family that the
reference implements imperatively in Python; citations in each ``doc`` point
at the reference behavior being re-expressed (never copied — the reference is
row-at-a-time Python, ours are Catalyst-planned DataFrame expressions).

Scale notes (100 TB design intent) are inline per query: which side is
broadcast, where the shuffle lands, why the plan survives 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .exact import (
    duck_exact_avg,
    duck_exact_sum,
    exact_avg,
    exact_sum,
    to_scaled_long,
)
from .registry import load_tables, register

# ---------------------------------------------------------------------------
# Deterministic pseudo-random primitive (SURVEY §7.3 "hard parts"):
# the reference uses Python random.sample/choice (qa_base.py:86-127);
# we replace it with hash-seeded uniforms computable identically in
# Spark and DuckDB: first 8 hex chars of md5 → int in [0, 2^32).
# ---------------------------------------------------------------------------


def _hash32(col):  # Spark side
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def _duck_hash32(expr: str) -> str:  # DuckDB side
    return f"(('0x' || substr(md5(cast({expr} as varchar)), 1, 8))::BIGINT)"


# ---------------------------------------------------------------------------
# Flagship: object-count QA (SURVEY §7.1 step 1)
# ---------------------------------------------------------------------------


@register(
    "qa_object_count",
    f"""
    SELECT l_orderkey,
           l_returnflag,
           count(*) AS n_items,
           printf('How many lines with return flag %s are in order %d?',
                  l_returnflag, l_orderkey) AS question,
           cast(count(*) AS VARCHAR) AS answer
    FROM lineitem
    GROUP BY l_orderkey, l_returnflag
    HAVING count(*) >= 2
    """,
    "A1 count-having + F1 templating: the object_count QA task "
    "(QA_generation/tasks/tasks_3d/object_count_qa.py:46-100, min_count "
    "having-filter per QA_generation/config.py:93). Spark: explode-free "
    "groupBy → partial agg map-side, one shuffle on the group key; string "
    "projection post-agg so codegen formats only surviving rows.",
)
def qa_object_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    return (
        li.groupBy("l_orderkey", "l_returnflag")
        .agg(F.count("*").alias("n_items"))
        .filter(F.col("n_items") >= 2)
        .select(
            "l_orderkey",
            "l_returnflag",
            "n_items",
            F.format_string(
                "How many lines with return flag %s are in order %d?",
                F.col("l_returnflag"),
                F.col("l_orderkey"),
            ).alias("question"),
            F.col("n_items").cast("string").alias("answer"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregations (SURVEY §2.5)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag,
           l_linestatus,
           {duck_exact_sum("l_quantity")} AS sum_qty,
           {duck_exact_sum("l_extendedprice")} AS sum_base_price,
           (cast(sum(cast(round(l_extendedprice * 100) as BIGINT)
                    * (100 - cast(round(l_discount * 100) as BIGINT))) as DOUBLE)
            / 10000.0) AS sum_disc_price,
           (cast(sum(cast(round(l_extendedprice * 100) as BIGINT)
                    * (100 - cast(round(l_discount * 100) as BIGINT))
                    * (100 + cast(round(l_tax * 100) as BIGINT))) as DOUBLE)
            / 1000000.0) AS sum_charge,
           {duck_exact_avg("l_quantity")} AS avg_qty,
           {duck_exact_avg("l_extendedprice")} AS avg_price,
           {duck_exact_avg("l_discount")} AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    "A2/A4/F9 dataset-level aggregation with arithmetic expressions "
    "(dataset category histograms, data_loader.py:109-129; running totals, "
    "sunrgbd_processor.py:326-337). TPC-H Q1 shape: predicate pushed to the "
    "parquet scan, map-side partial aggregation, 2-key shuffle, whole-stage "
    "codegen for the arithmetic. Money aggregated in exact integer cents "
    "(plans/exact.py) — BIGINT sums are associative, so the result is "
    "bit-identical at any partitioning AND never drifts at 10^9-row scale "
    "the way double accumulation does.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    price_c = to_scaled_long(F.col("l_extendedprice"), 2)
    disc_c = to_scaled_long(F.col("l_discount"), 2)
    tax_c = to_scaled_long(F.col("l_tax"), 2)
    disc_price_e4 = price_c * (F.lit(100) - disc_c)
    charge_e6 = disc_price_e4 * (F.lit(100) + tax_c)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            exact_sum(F.col("l_quantity")).alias("sum_qty"),
            exact_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            (F.sum(disc_price_e4).cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum(charge_e6).cast("double") / 1000000.0).alias("sum_charge"),
            exact_avg(F.col("l_quantity")).alias("avg_qty"),
            exact_avg(F.col("l_extendedprice")).alias("avg_price"),
            exact_avg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "a4_rollup_totals",
    f"""
    SELECT coalesce(r_name, 'ALL') AS region_name,
           coalesce(n_name, 'ALL') AS nation_name,
           count(*) AS n_customers,
           {duck_exact_sum("c_acctbal")} AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
    "A4 two-level scene/dataset totals (per-scene rollups + grand total, "
    "sunrgbd_processor.py:270-343, hypersim_processor.py:476-517) as a native "
    "ROLLUP. Dims (nation/region) broadcast; single shuffle on grouping sets.",
)
def a4_rollup_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "nation", "region")
    joined = (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            exact_sum(F.col("c_acctbal")).alias("total_acctbal"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "total_acctbal",
        )
    )


@register(
    "a5_mode_category",
    """
    SELECT p_brand, p_type AS modal_type, cnt AS n_parts
    FROM (
        SELECT p_brand, p_type, count(*) AS cnt,
               row_number() OVER (PARTITION BY p_brand
                                  ORDER BY count(*) DESC, p_type ASC) AS rn
        FROM part
        GROUP BY p_brand, p_type
    )
    WHERE rn = 1
    """,
    "A5/J10 argmax-category / modal class (most-frequent category per frame, "
    "object_count_qa.py:68-74; dominant semantic class via bincount.argmax, "
    "taskonomy_processor.py:307-324). Count-then-rank: the heavy agg shuffles "
    "once on (brand,type); ranking runs on the tiny aggregated set. "
    "Deterministic tiebreak on p_type.",
)
def a5_mode_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_tables(spark, sf_dir, "part")["part"]
    counts = part.groupBy("p_brand", "p_type").agg(F.count("*").alias("cnt"))
    w = W.partitionBy("p_brand").orderBy(F.col("cnt").desc(), F.col("p_type").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_brand", F.col("p_type").alias("modal_type"), F.col("cnt").alias("n_parts"))
    )


@register(
    "a6_distinct_stats",
    f"""
    SELECT n_name,
           count(*) AS n_customers,
           count(DISTINCT c_mktsegment) AS n_segments,
           round(min(c_acctbal), 2) AS min_bal,
           round(max(c_acctbal), 2) AS max_bal,
           {duck_exact_avg("c_acctbal")} AS avg_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    "A6 distinct counting (np.unique over masks, taskonomy_processor.py:"
    "327-329) + A8 min/max/avg distribution stats (build_enhanced_codebook.py"
    ":77-80). Broadcast dim join; distinct-agg planned by Catalyst as "
    "two-phase expand.",
)
def a6_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "nation")
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            exact_avg(F.col("c_acctbal")).alias("avg_bal"),
        )
    )


@register(
    "a10_quality_audit",
    """
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           cast(sum(CASE WHEN text IS NULL OR length(text) < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_degenerate,
           cast(sum(CASE WHEN n_chars > 500 THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
           round(cast(sum(n_chars) as DOUBLE) / cast(count(*) as DOUBLE), 6) AS avg_chars
    FROM documents
    GROUP BY source
    """,
    "A10 schema-quality audit (per-dataset completeness counters, "
    "check_dataset_parameters.py:97-172) as one pass of conditional-sum "
    "aggregates — single scan, single shuffle, no per-file Python loop.",
)
def a10_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_tables(spark, sf_dir, "documents")["documents"]
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum(
            F.when(F.col("text").isNull() | (F.length("text") < 10), 1).otherwise(0)
        ).alias("n_degenerate"),
        F.sum(F.when(F.col("n_chars") > 500, 1).otherwise(0)).alias("n_long"),
        F.round(
            F.sum("n_chars").cast("double") / F.count("*").cast("double"), 6
        ).alias("avg_chars"),
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.4)
# ---------------------------------------------------------------------------


@register(
    "j_star_revenue",
    f"""
    SELECT r_name AS region_name,
           n_name AS nation_name,
           count(*) AS n_orders,
           {duck_exact_sum("o_totalprice")} AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    "J3/J5 dimension joins (codebook/category dict probes = broadcast hash "
    "joins; matterport_processor.py:66-71, coco_processor.py:283-321). Fact "
    "table streams once; nation/region (25/5 rows, scale-invariant) are "
    "hint-broadcast; customer is SF-SCALED (150K rows/SF — multi-GB hashed "
    "at sf100) so it carries NO hint: the estimate+AQE machinery broadcasts "
    "it at small sf and shuffles at scale (VERDICT r10 #1). TPC-H Q5 shape.",
)
def j_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer", "nation", "region")
    return (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count("*").alias("n_orders"),
            exact_sum(F.col("o_totalprice")).alias("revenue"),
        )
    )


@register(
    "j2_semi_anti_split",
    """
    SELECT 'with_orders' AS segment, count(*) AS n_customers
    FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
    UNION ALL
    SELECT 'without_orders' AS segment, count(*) AS n_customers
    FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    "J2/E2 membership semi-join + labeled/unlabeled anti-join split "
    "(visible_instance_ids probe, matterport_processor.py:93-120; "
    "labeled-vs-unlabeled split, create_labeled_dataset.py:80-120). "
    "LEFT SEMI / LEFT ANTI with the orders side aggregated to distinct keys. "
    "The key set's cardinality is ~all active customers — UNBOUNDED in SF — "
    "so it carries NO broadcast hint (VERDICT r10 #1): Spark's estimates "
    "broadcast it at small sf and AQE keeps the option open at scale, where "
    "a shuffled semi-join on the key is the right plan.",
)
def j2_semi_anti_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "customer", "orders")
    cust, orders = t["customer"], t["orders"]
    keys = orders.select("o_custkey").distinct()
    witho = (
        cust.join(keys, cust.c_custkey == keys.o_custkey, "left_semi")
        .agg(F.count("*").alias("n_customers"))
        .select(F.lit("with_orders").alias("segment"), "n_customers")
    )
    without = (
        cust.join(keys, cust.c_custkey == keys.o_custkey, "left_anti")
        .agg(F.count("*").alias("n_customers"))
        .select(F.lit("without_orders").alias("segment"), "n_customers")
    )
    return witho.unionByName(without)


@register(
    "j8_pairwise_selfjoin",
    """
    SELECT a.l_orderkey AS orderkey,
           a.l_linenumber AS line_a,
           b.l_linenumber AS line_b,
           round(abs(a.l_extendedprice - b.l_extendedprice), 2) AS price_gap
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
    """,
    "J8 intra-group pairwise self-join — all unordered box pairs of a frame "
    "(obj_obj_distance_qa.py:38-47, obj_obj_rel_pos_qa.py:40-49). Equi-join "
    "on the group key + theta (idx<idx) residual: one co-partitioned shuffle "
    "on orderkey, pair blowup bounded by per-group fanout (§7.3: cap/salt "
    "heavy groups at scale — group sizes here are ≤7).",
)
def j8_pairwise_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    a = li.alias("a")
    b = li.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber")),
    ).select(
        F.col("a.l_orderkey").alias("orderkey"),
        F.col("a.l_linenumber").alias("line_a"),
        F.col("b.l_linenumber").alias("line_b"),
        F.round(F.abs(F.col("a.l_extendedprice") - F.col("b.l_extendedprice")), 2).alias(
            "price_gap"
        ),
    )


@register(
    "j9_asof_prior_view",
    """
    SELECT purchase_id, user_id, view_id,
           strftime(view_ts, '%Y-%m-%d %H:%M:%S') AS view_ts_s
    FROM (
        SELECT p.event_id AS purchase_id, p.user_id, v.event_id AS view_id,
               v.ts AS view_ts,
               row_number() OVER (PARTITION BY p.event_id
                                  ORDER BY v.ts DESC, v.event_id DESC) AS rn
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON v.user_id = p.user_id AND v.ts <= p.ts
    )
    WHERE rn = 1
    """,
    "J9 as-of / nearest-keyframe join (camera pose = keyframe with closest "
    "index, hypersim_processor.py:71-80): for each purchase event, the most "
    "recent prior view event of the same user. Equi-join on the user key "
    "(one co-partitioned shuffle, both sides prunable by event_type at the "
    "scan) + max-of-struct argmax (partial map-side agg; the window "
    "form shuffled the full pair fanout into a sort) — no O(n*m) range "
    "blowup; ties broken on event_id. At cluster scale the per-user "
    "group is the skew unit: AQE skew-join splits hot users.",
)
def j9_asof_prior_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user_id"),
        F.col("ts").alias("view_ts"),
    )
    joined = p.join(
        v, (F.col("v_user_id") == F.col("user_id")) & (F.col("view_ts") <= F.col("p_ts"))
    )
    # max-of-struct instead of the row_number window (round 13, guide
    # §2.3): max(struct(view_ts, view_id)) IS the first row of the
    # window's (view_ts DESC, view_id DESC) order — same tie rule,
    # value-identical (exceptAll symdiff 0 at sf0.1). The join output
    # (every prior view per purchase) now hits a map-side PARTIAL
    # aggregate, so the second exchange carries one candidate per
    # (purchase × map task) instead of the full pair fanout into a
    # sort-window — sf1 min-of-4 interleaved 0.54→0.45 s; at scale the
    # fanout is |views-before-purchase| per user, the skew unit AQE
    # splits. user_id rides in the group key (functionally dependent on
    # purchase_id).
    best = joined.groupBy("purchase_id", "user_id").agg(
        F.max(F.struct(F.col("view_ts"), F.col("view_id"))).alias("b")
    )
    return best.select(
        "purchase_id",
        "user_id",
        F.col("b.view_id").alias("view_id"),
        F.date_format(F.col("b.view_ts"), "yyyy-MM-dd HH:mm:ss").alias("view_ts_s"),
    )


# ---------------------------------------------------------------------------
# Windows / ranking / dedupe (SURVEY §2.6)
# ---------------------------------------------------------------------------


@register(
    "w1_rank_topk",
    """
    SELECT p_brand, p_partkey, round(p_retailprice, 2) AS price, rnk
    FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               row_number() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_partkey ASC) AS rnk
        FROM part
    )
    WHERE rnk <= 3
    """,
    "W1 rank-by-distance top-k (closest-object ranking, "
    "cam_obj_rel_dist_qa.py:66-67,133-137). Window ranking with "
    "deterministic tiebreak; partial top-k could push into the shuffle via "
    "AQE but the window form is the general shape.",
)
def w1_rank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_tables(spark, sf_dir, "part")["part"]
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey").asc())
    return (
        part.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "p_brand",
            "p_partkey",
            F.round("p_retailprice", 2).alias("price"),
            "rnk",
        )
    )


@register(
    "w2_first_per_group",
    """
    SELECT l_orderkey AS orderkey, l_partkey AS first_partkey,
           round(l_quantity, 2) AS first_qty
    FROM (
        SELECT l_orderkey, l_partkey, l_quantity,
               row_number() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_linenumber ASC, l_partkey ASC,
                                           l_quantity ASC) AS rn
        FROM lineitem
    )
    WHERE rn = 1
    """,
    "W2/J7/A7 first-per-group dedupe (one question per category per frame, "
    "object_3d_size_qa.py:32-42; representative-per-instance before "
    "inference, build_label_codebook_fast.py:382-385). The dedupe-before-"
    "expensive-op pattern: at scale this runs BEFORE any costly downstream "
    "stage so the shuffle carries only keys + ordering column.",
)
def w2_first_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    # min-of-struct instead of row_number window (round 13, guide §2.3
    # "aggregate before you shuffle"): struct ordering is lexicographic
    # on its fields, so min(struct(l_linenumber, l_partkey, l_quantity))
    # IS the first row of the window's (l_linenumber, l_partkey,
    # l_quantity) ascending order — the same tie-covering key, value-
    # identical output (exceptAll symdiff 0 at sf0.1). The plan gains
    # map-side PARTIAL aggregation: the exchange carries one candidate
    # struct per (group × map task) instead of every row into a
    # sort-window — sf1 min-of-4 interleaved 0.72→0.47 s, and at scale
    # shuffle bytes track |groups|, not |rows|. (The original tie note
    # stands: (l_orderkey, l_linenumber) is NOT unique in the synthetic
    # data — the struct must cover every projected column or the pick
    # is tie-dependent.)
    first = (
        li.select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .groupBy("l_orderkey")
        .agg(
            F.min(F.struct("l_linenumber", "l_partkey", "l_quantity")).alias("f")
        )
    )
    return first.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("f.l_partkey").alias("first_partkey"),
        F.round(F.col("f.l_quantity"), 2).alias("first_qty"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / sampling (SURVEY §2.7) + set ops (§2.8)
# ---------------------------------------------------------------------------


@register(
    "o2_topn_orders",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    "O1/O2 deterministic ordering + head-N limit (sorted() file ordering, "
    "--limit head-N; data_loader.py:36-38). Spark plans TakeOrderedAndProject "
    "— per-partition top-N then driver merge, no global sort shuffle.",
)
def o2_topn_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


@register(
    "o4_deterministic_sample",
    f"""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE {_duck_hash32("l_orderkey * 10 + l_linenumber")} % 100 < 10
    """,
    "O3/O4 stride & random sampling made deterministic (every-10th-frame, "
    "objectron_processor.py:126-128; random.sample of pairs, "
    "cam_obj_rel_dist_qa.py:70-74) — §7.3 hash-seeded uniforms: md5-derived "
    "32-bit uniform per row, identical in Spark and DuckDB, ~10% sample. "
    "Pure column expr → codegen, trivially parallel, reproducible at any "
    "partitioning.",
)
def o4_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_tables(spark, sf_dir, "lineitem")["lineitem"]
    key = F.col("l_orderkey") * 10 + F.col("l_linenumber")
    return li.filter(_hash32(key) % 100 < 10).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 2).alias("price"),
    )


@register(
    "e1_union_entities",
    """
    SELECT 'order' AS entity_type, o_orderkey AS entity_key,
           round(o_totalprice, 2) AS val
    FROM orders WHERE o_totalprice > 400000
    UNION ALL
    SELECT 'customer' AS entity_type, c_custkey AS entity_key,
           round(c_acctbal, 2) AS val
    FROM customer WHERE c_acctbal > 5000
    """,
    "E1 union of task outputs (all_qa_pairs = Σ task outputs, "
    "generate_qa.py:99-144) as unionByName over aligned projections — "
    "a zero-shuffle concatenation of lineages.",
)
def e1_union_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, "orders", "customer")
    hi_orders = (
        t["orders"]
        .filter(F.col("o_totalprice") > 400000)
        .select(
            F.lit("order").alias("entity_type"),
            F.col("o_orderkey").alias("entity_key"),
            F.round("o_totalprice", 2).alias("val"),
        )
    )
    hi_cust = (
        t["customer"]
        .filter(F.col("c_acctbal") > 5000)
        .select(
            F.lit("customer").alias("entity_type"),
            F.col("c_custkey").alias("entity_key"),
            F.round("c_acctbal", 2).alias("val"),
        )
    )
    return hi_orders.unionByName(hi_cust)


# ---------------------------------------------------------------------------
# Scalar function families (SURVEY §2.9)
# ---------------------------------------------------------------------------


@register(
    "f1_string_projection",
    """
    SELECT printf('%s_qa_%s', c_mktsegment, lpad(cast(c_custkey AS VARCHAR), 6, '0')) AS qa_id,
           chr(65 + cast(c_custkey % 4 AS INT)) AS option_letter,
           split_part(c_name, '#', 2) AS name_suffix,
           upper(c_mktsegment) AS segment_uc
    FROM customer
    """,
    "F1/F2 string templating & parsing (qa id f'{ds}_{task}_{n:06d}' "
    "qa_base.py:55; chr(65+i) option letters qa_base.py:127-131; "
    "split/startswith parsing class_mapping.py:87-103). Pure codegen'd "
    "column exprs — no UDF.",
)
def f1_string_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_tables(spark, sf_dir, "customer")["customer"]
    return cust.select(
        F.format_string(
            "%s_qa_%s",
            F.col("c_mktsegment"),
            F.lpad(F.col("c_custkey").cast("string"), 6, "0"),
        ).alias("qa_id"),
        F.expr("char(65 + int(c_custkey % 4))").alias("option_letter"),
        F.split(F.col("c_name"), "#").getItem(1).alias("name_suffix"),
        F.upper("c_mktsegment").alias("segment_uc"),
    )


@register(
    "f5_box_geometry",
    """
    SELECT p_partkey,
           round(sqrt(x*x + y*y + z*z), 2) AS cam_distance_m,
           round(greatest(xl, yl, zl) * 100, 1) AS max_dim_cm,
           round(((cast(p_partkey * 37 AS INT) % 360 + 540) % 360 - 180) / 180.0, 4) AS yaw_norm,
           CASE WHEN x > 0.1 THEN 'right' WHEN x < -0.1 THEN 'left' ELSE 'center' END AS h_rel,
           CASE WHEN y > 0.1 THEN 'down' WHEN y < -0.1 THEN 'up' ELSE 'middle' END AS v_rel
    FROM (
        SELECT p_partkey,
               (cast(p_partkey % 21 AS INT) - 10) * 0.3 AS x,
               (cast(p_partkey % 13 AS INT) - 6) * 0.2 AS y,
               (cast(p_partkey % 17 AS INT)) * 0.5 + 0.5 AS z,
               p_size * 0.01 AS xl,
               (cast(p_partkey % 5 AS INT) + 1) * 0.1 AS yl,
               (cast(p_partkey % 3 AS INT) + 1) * 0.05 AS zl
        FROM part
    )
    """,
    "F3-F6 geometry scalar family on synthetic integer-derived boxes: "
    "camera-object center distance = l2 norm (geometry.py:401-421), max "
    "dimension in cm = greatest*100 (geometry.py:121-132, "
    "object_3d_size_qa.py:57-59), angle normalization to [-1,1] "
    "(utils.py:28-43), Near/Left/Right relations with the 0.1 m threshold "
    "(geometry.py:455-482). All closed-form Column exprs → whole-stage "
    "codegen; no UDF in the hot path.",
)
def f5_box_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_tables(spark, sf_dir, "part")["part"]
    boxed = part.select(
        "p_partkey",
        ((F.col("p_partkey") % 21).cast("int") - 10).cast("double") * 0.3,
        ((F.col("p_partkey") % 13).cast("int") - 6).cast("double") * 0.2,
        ((F.col("p_partkey") % 17).cast("int")).cast("double") * 0.5 + 0.5,
        (F.col("p_size") * 0.01).alias("xl"),
        ((F.col("p_partkey") % 5).cast("int") + 1).cast("double") * 0.1,
        ((F.col("p_partkey") % 3).cast("int") + 1).cast("double") * 0.05,
    ).toDF("p_partkey", "x", "y", "z", "xl", "yl", "zl")
    return boxed.select(
        "p_partkey",
        F.round(
            F.sqrt(F.col("x") ** 2 + F.col("y") ** 2 + F.col("z") ** 2), 2
        ).alias("cam_distance_m"),
        F.round(F.greatest("xl", "yl", "zl") * 100, 1).alias("max_dim_cm"),
        F.round(
            (((F.col("p_partkey") * 37).cast("int") % 360 + 540) % 360 - 180) / 180.0, 4
        ).alias("yaw_norm"),
        F.when(F.col("x") > 0.1, "right")
        .when(F.col("x") < -0.1, "left")
        .otherwise("center")
        .alias("h_rel"),
        F.when(F.col("y") > 0.1, "down")
        .when(F.col("y") < -0.1, "up")
        .otherwise("middle")
        .alias("v_rel"),
    )


# ---------------------------------------------------------------------------
# Event-time windows (batch equivalent of the streaming extension)
# ---------------------------------------------------------------------------


@register(
    "event_tumbling_window",
    f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n_events,
           {duck_exact_sum("value")} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    "Streaming extension (SURVEY §2.12 — reference has none; labeled as "
    "extension): tumbling 1-hour window aggregation over the events table. "
    "Batch form shown here; vlm_data_pipeline_spark.streaming runs the same "
    "logic as a watermarked Structured Streaming query.",
)
def event_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            exact_sum(F.col("value")).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Interval joins (extension: operators/intervals.py)
# ---------------------------------------------------------------------------

_INTERVAL_CTES = """
p AS (
    SELECT event_id, value,
           CAST(date_part('hour', ts) * 3600 + date_part('minute', ts) * 60
                + date_part('second', ts) AS BIGINT) AS p
    FROM events
), w AS (
    SELECT o_orderkey AS window_id,
           CAST((o_orderkey % 1440) * 60 AS BIGINT) AS ws,
           CAST((o_orderkey % 1440) * 60 + 600 + (o_custkey % 5) * 60
                AS BIGINT) AS we
    FROM orders WHERE o_orderkey % 100 = 0
)
"""


def _event_points(spark: SparkSession, sf_dir: str):
    ev = load_tables(spark, sf_dir, "events")["events"]
    p = (F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts")).cast("long")
    return ev.select("event_id", "value", p.alias("p"))


def _order_windows(spark: SparkSession, sf_dir: str):
    orders = load_tables(spark, sf_dir, "orders")["orders"]
    ws = ((F.col("o_orderkey") % 1440) * 60).cast("long")
    we = (ws + 600 + (F.col("o_custkey") % 5) * 60).cast("long")
    return orders.filter(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderkey").alias("window_id"), ws.alias("ws"), we.alias("we")
    )


@register(
    "events_interval_join",
    f"""
    WITH {_INTERVAL_CTES}
    SELECT w.window_id, p.event_id
    FROM p JOIN w ON p.p BETWEEN w.ws AND w.we
    """,
    "Binned point-in-interval join (operators.intervals): which events "
    "fall inside each synthesized maintenance window (second-of-day "
    "axis, closed bounds). A theta join here plans as a nested-loop "
    "product; the binned form is one equi-join where only the interval "
    "side replicates (~2x at bin_width near the window length) and the "
    "huge point side shuffles at exactly 1x — the published range-join "
    "re-expression, exact output with zero dedup pass (plan-pinned in "
    "tests/test_intervals.py).",
)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.intervals import point_in_interval_join

    return point_in_interval_join(
        _event_points(spark, sf_dir),
        _order_windows(spark, sf_dir),
        "p", "ws", "we",
        bin_width=900.0,
    ).select("window_id", "event_id")


@register(
    "events_interval_rollup",
    f"""
    WITH {_INTERVAL_CTES}
    SELECT w.window_id,
           CAST(count(*) AS BIGINT) AS n_events,
           {duck_exact_sum("p.value")} AS total_value
    FROM p JOIN w ON p.p BETWEEN w.ws AND w.we
    GROUP BY w.window_id
    """,
    "Per-window aggregate over the binned interval join: event count + "
    "exact integer-cents value sum per maintenance window. The join "
    "output is already hash-partitioned by bin, and the groupBy is a "
    "plain partial+final aggregate on top — no extra wide stage beyond "
    "the join's own exchanges.",
)
def events_interval_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.intervals import point_in_interval_join

    joined = point_in_interval_join(
        _event_points(spark, sf_dir),
        _order_windows(spark, sf_dir),
        "p", "ws", "we",
        bin_width=900.0,
    )
    return joined.groupBy("window_id").agg(
        F.count("*").cast("long").alias("n_events"),
        exact_sum(F.col("value")).alias("total_value"),
    )


@register(
    "events_asof_join",
    """
    WITH p AS (
        SELECT event_id AS purchase_id, user_id, ts AS pts
        FROM events WHERE event_type = 'purchase'
    ), s AS (
        SELECT event_id AS signup_id, user_id, ts AS sts
        FROM events WHERE event_type = 'signup'
    ), m AS (
        SELECT p.purchase_id, s.signup_id,
               row_number() OVER (PARTITION BY p.purchase_id
                                  ORDER BY s.sts DESC, s.signup_id DESC) AS rn
        FROM p JOIN s ON p.user_id = s.user_id AND s.sts <= p.pts
    )
    SELECT p.purchase_id, m.signup_id
    FROM p LEFT JOIN (SELECT purchase_id, signup_id FROM m WHERE rn = 1) m
           USING (purchase_id)
    """,
    "Generic ASOF join (operators.intervals.asof_join, the merge_asof "
    "semantics Spark lacks natively): for every purchase event, the "
    "latest prior-or-equal signup by the same user, left-join "
    "semantics. The union-window form touches each row once with ONE "
    "hash exchange and NO join operator (plan-pinned in "
    "tests/test_intervals.py) — unlike join-then-rank (J9's shape, "
    "right for per-key-tiny keyframe sets), which explodes the pre-rank "
    "join when both sides are corpus-sized. Oracle re-derives the match "
    "as a windowed argmax with the engine's exact tie-break (latest ts, "
    "then largest id).",
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.intervals import asof_join

    ev = load_tables(spark, sf_dir, "events")["events"]
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("pts"),
    )
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        F.col("ts").alias("sts"),
    )
    return asof_join(
        purchases, signups, "user_id", "pts", "sts"
    ).select("purchase_id", "signup_id")


@register(
    "events_pivot_activity",
    f"""
    SELECT user_id,
           CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
           CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
           CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
           CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
           CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view,
           coalesce(
               {duck_exact_sum("CASE WHEN event_type = 'purchase' THEN value END")},
               0.0) AS purchase_value
    FROM events
    GROUP BY user_id
    """,
    "Pivot (long-to-wide) coverage: per-user activity matrix — one "
    "count column per event type plus exact-cents purchase revenue — "
    "via DataFrame.pivot with an EXPLICIT value list. The explicit list "
    "matters at scale: pivot without values runs a separate eager "
    "distinct-collect job over the pivot column at PLAN time; with the "
    "list it lowers straight to the two-aggregate pivot_first chain, "
    "both halves map-side combined, no extra pass (plan-pinned in "
    "test_star_queries). Oracle: per-type FILTER aggregates.",
)
def events_pivot_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_tables(spark, sf_dir, "events")["events"]
    types = ["click", "error", "purchase", "signup", "view"]
    wide = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(
            F.count(F.lit(1)).alias("n"),  # count("*") is illegal in pivot
            exact_sum(F.col("value")).alias("v"),
        )
    )
    return wide.select(
        "user_id",
        *[
            F.coalesce(F.col(f"{t}_n"), F.lit(0)).cast("long").alias(f"n_{t}")
            for t in types
        ],
        F.coalesce(F.col("purchase_v"), F.lit(0.0)).alias("purchase_value"),
    )


@register(
    "events_gapfill_hourly",
    f"""
    WITH e AS (
        SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS b, value
        FROM events
    ), agg AS (
        SELECT event_type, b, CAST(count(*) AS BIGINT) AS n,
               {duck_exact_sum("value")} AS v
        FROM e GROUP BY event_type, b
    ), span AS (
        SELECT event_type, min(b) AS lo, max(b) AS hi FROM e GROUP BY 1
    ), grid AS (
        SELECT event_type, unnest(generate_series(lo, hi)) AS b FROM span
    ), j AS (
        SELECT g.event_type, g.b, a.n, a.v
        FROM grid g LEFT JOIN agg a USING (event_type, b)
    )
    SELECT event_type,
           strftime(make_timestamp(b * 3600 * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS bucket_start,
           coalesce(n, CAST(0 AS BIGINT)) AS n_events,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS hourly_value
    FROM j
    """,
    "Hypertable-style continuous aggregate (the brief's named "
    "custom-operator example; TimescaleDB time_bucket_gapfill + locf "
    "semantics): dense per-type hourly grid over each type's own time "
    "span, zero-filled event counts, exact-cents hourly revenue carried "
    "forward through empty buckets. One corpus-sized shuffle (the "
    "bucket aggregate); the grid is synthesized per key from a 2-value "
    "span aggregate, never scanned, with a max_buckets guard against "
    "degenerate bucket widths. Library: operators.timeseries."
    "time_bucket_gapfill.",
)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import time_bucket_gapfill

    ev = load_tables(spark, sf_dir, "events")["events"]
    out = time_bucket_gapfill(
        ev,
        "ts",
        ["event_type"],
        bucket_seconds=3600,
        aggs={
            "n": F.count("*").cast("long"),
            "v": exact_sum(F.col("value")),
        },
        locf_cols=["v"],
    )
    return out.select(
        "event_type",
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias(
            "bucket_start"
        ),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        F.col("v").alias("hourly_value"),
    )


@register(
    "events_window_overlap",
    """
    WITH w1 AS (
        SELECT o_orderkey AS maint_id,
               CAST((o_orderkey % 1440) * 60 AS BIGINT) AS ms,
               CAST((o_orderkey % 1440) * 60 + 600 + (o_custkey % 5) * 60
                    AS BIGINT) AS me
        FROM orders WHERE o_orderkey % 100 = 0
    ), w2 AS (
        SELECT o_orderkey AS deploy_id,
               CAST((o_custkey % 1440) * 60 AS BIGINT) AS ds,
               CAST((o_custkey % 1440) * 60 + 300 + (o_orderkey % 7) * 120
                    AS BIGINT) AS de
        FROM orders WHERE o_orderkey % 151 = 3
    )
    SELECT w1.maint_id, w2.deploy_id
    FROM w1 JOIN w2 ON w1.ms <= w2.de AND w2.ds <= w1.me
    """,
    "The INTERVAL-INTERVAL overlap variant (its point-in-interval "
    "sibling is events_interval_join): which synthesized maintenance "
    "windows collide with which deploy windows on the second-of-day "
    "axis. Binned equi-join, each colliding pair emitted exactly once "
    "from the bin of max(start, start) — no dedup pass (the "
    "first-overlap-bin rule, fuzz-pinned vs the quadratic reference in "
    "tests/test_intervals.py). Library: operators.intervals."
    "interval_overlap_join.",
)
def events_window_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.intervals import interval_overlap_join

    orders = load_tables(spark, sf_dir, "orders")["orders"]
    ms = ((F.col("o_orderkey") % 1440) * 60).cast("long")
    w1 = orders.filter(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderkey").alias("maint_id"),
        ms.alias("ms"),
        (ms + 600 + (F.col("o_custkey") % 5) * 60).cast("long").alias("me"),
    )
    ds = ((F.col("o_custkey") % 1440) * 60).cast("long")
    w2 = orders.filter(F.col("o_orderkey") % 151 == 3).select(
        F.col("o_orderkey").alias("deploy_id"),
        ds.alias("ds"),
        (ds + 300 + (F.col("o_orderkey") % 7) * 120).cast("long").alias("de"),
    )
    return interval_overlap_join(
        w1, w2, "ms", "me", "ds", "de", bin_width=900.0
    ).select("maint_id", "deploy_id")
