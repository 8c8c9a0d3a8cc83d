"""Z-order clustering + skew report: key correctness vs a pure-Python
reference, codegen purity of the key program, a REAL file-pruning proof
from parquet footer statistics, and DuckDB oracle parity for both
registered queries."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from vlm_data_pipeline_spark.operators.layout import (
    cluster_by_zorder,
    compaction_plan,
    key_skew_report,
    zorder_key,
    zorder_rank,
)

SF = "/root/testdata/sf0.001"


def _py_interleave(ranks: list[int], bits: int) -> int:
    n = len(ranks)
    key = 0
    for i in range(bits):
        for j, r in enumerate(ranks):
            key |= ((r >> i) & 1) << (i * n + j)
    return key


@settings(max_examples=40, deadline=None)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**16 - 1),
            st.integers(min_value=0, max_value=2**16 - 1),
        ),
        min_size=1,
        max_size=8,
    ),
    bits=st.integers(min_value=1, max_value=16),
)
def test_zorder_key_matches_python_reference(spark, pts, bits):
    # ranks in [0, 2^bits) — the contract zorder_rank guarantees
    small = sorted({(a % (1 << bits), b % (1 << bits)) for a, b in pts})
    df = spark.createDataFrame(small, "a long, b long")
    got = {
        (r.a, r.b): r.k
        for r in df.select(
            "a", "b", zorder_key([F.col("a"), F.col("b")], bits).alias("k")
        ).collect()
    }
    for a, b in small:
        assert got[(a, b)] == _py_interleave([a, b], bits)


def test_zorder_rank_bounds_and_monotone(spark):
    """Shift quantization lands in [0, 2^bits) and is monotone."""
    rows = [(v,) for v in [0, 1, 7, 100, 12345, 99999, 1_000_000]]
    df = spark.createDataFrame(rows, "x long")
    lo, hi, bits = F.lit(0).cast("long"), F.lit(1_000_000).cast("long"), 8
    out = [
        r.rank
        for r in df.select(
            zorder_rank(F.col("x"), lo, hi, bits).alias("rank")
        ).orderBy("x").collect()
    ]
    assert all(0 <= r < 256 for r in out)
    assert out == sorted(out)


def test_zorder_key_is_pure_codegen(spark):
    """The key program must stay JVM-side: no Python eval in the plan."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    key = zorder_key(
        [F.col("l_partkey") % 256, F.col("l_suppkey") % 256], 8
    )
    plan = (
        li.select(key.alias("z"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "*(" in plan  # the WholeStageCodegen stage marker


def _files_hit(path: str, pred: dict[str, tuple[int, int]]) -> tuple[int, int]:
    """(files whose per-file min/max intersect ALL predicate ranges,
    total files) from parquet footer statistics — the same pruning
    decision a cluster-scale reader makes."""
    files = sorted(glob.glob(os.path.join(path, "part-*.parquet")))
    hit = 0
    for f in files:
        md = pq.read_metadata(f)
        names = md.schema.names
        lo: dict[str, int] = {}
        hi: dict[str, int] = {}
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = names[ci]
                stats = col.statistics
                if stats is None or name not in pred:
                    continue
                lo[name] = min(lo.get(name, stats.min), stats.min)
                hi[name] = max(hi.get(name, stats.max), stats.max)
        if all(
            name in lo and not (hi[name] < a or lo[name] > b)
            for name, (a, b) in pred.items()
        ):
            hit += 1
    return hit, len(files)


def test_cluster_by_zorder_improves_file_pruning(spark, tmp_path):
    """The point of the operator, proven from footer stats: a 2-D range
    predicate must open strictly fewer z-clustered files than linearly
    sorted ones (where the secondary dimension's min/max spans are
    useless in every file)."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    lin_dir = str(tmp_path / "linear")
    z_dir = str(tmp_path / "zorder")
    (
        li.repartitionByRange(64, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lin_dir)
    )
    cluster_by_zorder(
        li, ["l_partkey", "l_suppkey"], bits=8, num_partitions=64
    ).write.mode("overwrite").parquet(z_dir)

    stats = li.agg(
        F.min("l_partkey"), F.max("l_partkey"),
        F.min("l_suppkey"), F.max("l_suppkey"),
    ).first()
    p_lo, p_hi, s_lo, s_hi = stats
    # middle ~quarter box in both dimensions
    pred = {
        "l_partkey": (
            p_lo + (p_hi - p_lo) * 3 // 8, p_lo + (p_hi - p_lo) * 5 // 8
        ),
        "l_suppkey": (
            s_lo + (s_hi - s_lo) * 3 // 8, s_lo + (s_hi - s_lo) * 5 // 8
        ),
    }
    lin_hit, lin_total = _files_hit(lin_dir, pred)
    z_hit, z_total = _files_hit(z_dir, pred)
    assert lin_total == z_total == 64
    assert z_hit < lin_hit, (z_hit, lin_hit)
    # correctness under the predicate: both layouts return identical rows
    q = lambda d: (  # noqa: E731
        spark.read.parquet(d)
        .filter(
            F.col("l_partkey").between(*pred["l_partkey"])
            & F.col("l_suppkey").between(*pred["l_suppkey"])
        )
        .count()
    )
    assert q(lin_dir) == q(z_dir)


def test_key_skew_report_exact(spark):
    df = spark.createDataFrame(
        [(k,) for k in [1] * 6 + [2] * 3 + [3] * 1], "key long"
    )
    rows = key_skew_report(df, "key", top_n=2).collect()
    assert [(r.key, r.n_rows, r.share_ppm) for r in rows] == [
        (1, 6, 600000),
        (2, 3, 300000),
    ]


def test_compaction_plan_offset_binning_exact(spark):
    """Order (size desc, name asc); bin = start-offset DIV target.
    Sizes 10,9,5,3 at target 12: starts 0,10,19,24 → bins 0,0,1,2."""
    df = spark.createDataFrame(
        [("a", 5), ("b", 10), ("c", 3), ("d", 9)], "name string, sz long"
    )
    rows = {
        r.name: (r.bytes, r.bin)
        for r in compaction_plan(df, "name", "sz", 12).collect()
    }
    assert rows == {"b": (10, 0), "d": (9, 0), "a": (5, 1), "c": (3, 2)}


def test_zorder_key_rejects_sign_bit_overflow(spark):
    """4 dims x 16 bits = bit 63 = the BIGINT sign bit: ordering would
    go negative-first and silently break range partitioning."""
    cols = [F.lit(1).cast("long")] * 4
    with pytest.raises(ValueError, match="62"):
        zorder_key(cols, 16)
    assert zorder_key(cols[:3], 16) is not None  # 48 bits: fine
    assert zorder_key(cols, 15) is not None  # 60 bits: fine


def test_compaction_plan_rejects_bad_target(spark):
    df = spark.createDataFrame([("a", 1)], "name string, sz long")
    with pytest.raises(ValueError):
        compaction_plan(df, "name", "sz", 0)


def test_compaction_bins_are_contiguous_and_bounded(spark):
    """Offset binning over the documents corpus: bin ids are dense from
    0, and no bin exceeds target + its largest member's tail."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    target = 16384
    plan = compaction_plan(
        docs.select("doc_id", "n_chars"), "doc_id", "n_chars", target
    )
    agg = (
        plan.groupBy("bin")
        .agg(F.sum("bytes").alias("total"), F.max("bytes").alias("biggest"))
        .orderBy("bin")
        .collect()
    )
    bins = [r.bin for r in agg]
    assert bins == list(range(len(bins)))
    for r in agg:
        assert r.total <= target + r.biggest


@pytest.mark.parametrize(
    "name",
    ["layout_zorder_buckets", "diag_key_skew", "layout_compaction_plan"],
)
def test_layout_queries_match_duckdb_oracle(spark, name):
    from vlm_data_pipeline_spark.plans import QUERIES

    from .oracle import compare

    compare(spark, QUERIES[name], SF)


def test_zorder_buckets_show_locality(spark):
    """Sanity of the layout claim at sf0.001: the per-bucket key spans
    must be far narrower than the full domain for most buckets."""
    from vlm_data_pipeline_spark.plans import QUERIES

    out = QUERIES["layout_zorder_buckets"].build(spark, SF).collect()
    assert len(out) > 32  # 16-bit key >> 8 over real data: many segments
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    p_span = li.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("s")
    ).first().s
    narrow = [r for r in out if r.span_partkey <= p_span // 8]
    assert len(narrow) >= len(out) // 2, (len(narrow), len(out))


def test_cluster_by_zorder_empty_and_all_null_raise(spark):
    """ADVICE r7: an empty DataFrame or an all-NULL cluster column must
    raise a clear ValueError, not an opaque TypeError from int(None)."""
    empty = spark.range(0).selectExpr("id AS a", "id AS b")
    with pytest.raises(ValueError, match="z-order"):
        cluster_by_zorder(empty, ["a", "b"])
    allnull = spark.range(5).selectExpr(
        "id AS a", "CAST(NULL AS BIGINT) AS b"
    )
    with pytest.raises(ValueError, match=r"\['b'\]"):
        cluster_by_zorder(allnull, ["a", "b"])


def test_compaction_plan_distributed_prefix_sum_exact_and_deterministic(
    spark,
):
    """Round-10 rewrite (VERDICT r9 #3 gate): the global running sum is
    a two-pass segmented prefix sum — range repartition, per-partition
    offsets via a bounded triangular broadcast join, partitioned
    running-sum window. Must (a) plan NO partition-less WindowExec,
    (b) match a single-threaded reference bit-for-bit over a
    many-partition input, (c) be stable across repeated executions
    (both branches must observe the same range-shuffle output)."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "tools"
        ),
    )
    from plan_digest import digest

    import random

    rnd = random.Random(7)
    rows = [(f"f{i:05d}", rnd.randrange(1, 10_000)) for i in range(5000)]
    target = 37_000
    # single-threaded reference: sort, cumulate, bin
    start, ref = 0, {}
    for name, sz in sorted(rows, key=lambda r: (-r[1], r[0])):
        ref[name] = (sz, start // target)
        start += sz
    df = spark.createDataFrame(rows, "name string, sz long").repartition(16)
    plan_df = compaction_plan(df, "name", "sz", target)
    p = plan_df._jdf.queryExecution().executedPlan().toString()
    assert digest(p)["global_windows"] == 0, p
    got1 = {r.name: (r.bytes, r.bin) for r in plan_df.collect()}
    got2 = {r.name: (r.bytes, r.bin) for r in plan_df.collect()}
    assert got1 == ref
    assert got2 == ref
