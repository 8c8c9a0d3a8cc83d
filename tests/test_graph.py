"""Fixed-point PageRank: hand-checked structure, mass conservation,
dangling redistribution, partition invariance, parameter guards, and a
direct DuckDB parity check of the unrolled-CTE oracle on a small graph."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from vlm_data_pipeline_spark.operators.graph import (
    PAGERANK_SCALE,
    pagerank,
    pagerank_oracle_sql,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _ranks(df):
    return {r["node"]: r["rank_fp"] for r in df.collect()}


def test_star_graph_center_wins(spark):
    """Everything points at 0 → 0 gets (almost) all damped mass; the
    leaves end equal by symmetry."""
    got = _ranks(pagerank(_edges(spark, [(1, 0), (2, 0), (3, 0)]), iterations=8))
    assert set(got) == {0, 1, 2, 3}
    assert got[1] == got[2] == got[3]
    assert got[0] > 3 * got[1]


def test_cycle_is_uniform(spark):
    """A directed cycle is rank-symmetric: every node identical, and the
    value stays at the uniform initial mass (up to integer rounding)."""
    got = _ranks(pagerank(_edges(spark, [(0, 1), (1, 2), (2, 0)]), iterations=6))
    vals = set(got.values())
    assert len(vals) == 1
    # each sweep floors twice (teleport term + damped term) → ≤ ~2
    # units of mass shaved per sweep
    assert abs(next(iter(vals)) - PAGERANK_SCALE // 3) <= 2 * 6


def test_mass_conserved_with_dangling(spark):
    """Dangling mass is redistributed, not dropped: total stays within
    integer-rounding distance of SCALE (loss ≤ a few units per node per
    sweep from the floor divisions)."""
    e = _edges(spark, [(0, 1), (1, 2), (2, 3), (3, 1), (1, 4)])  # 4 dangles
    iters = 5
    out = pagerank(e, iterations=iters)
    total = out.agg(F.sum("rank_fp")).collect()[0][0]
    n = 5
    assert total <= PAGERANK_SCALE
    assert PAGERANK_SCALE - total < 200 * n * iters


def test_partition_invariance(spark):
    """Bit-identical rank_fp under different partitionings — the point
    of integer fixed-point mass."""
    pairs = [(i, (i * 7 + 3) % 23) for i in range(23) if i != (i * 7 + 3) % 23]
    a = _ranks(pagerank(_edges(spark, pairs).repartition(1), iterations=4))
    b = _ranks(pagerank(_edges(spark, pairs).repartition(13, "dst"), iterations=4))
    assert a == b


def test_parallel_edges_double_contribution(spark):
    """Parallel edges are parallel contributions: duplicating 1→2 pulls
    more mass to 2 than the simple graph does."""
    simple = _ranks(pagerank(_edges(spark, [(1, 2), (1, 3)]), iterations=3))
    doubled = _ranks(
        pagerank(_edges(spark, [(1, 2), (1, 2), (1, 3)]), iterations=3)
    )
    assert doubled[2] > simple[2]
    assert doubled[3] < simple[3]


def test_param_guards(spark):
    e = _edges(spark, [(0, 1)])
    with pytest.raises(ValueError, match="iterations"):
        pagerank(e, iterations=0)
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank(e, damping_pct=101)


def test_oracle_parity_small_graph(spark):
    """operators.graph.pagerank and pagerank_oracle_sql are the same
    function: run both on one 40-node pseudo-random graph (with dangling
    nodes and a hub) and compare every rank_fp exactly."""
    pairs = [(i, (i * i + 1) % 40) for i in range(40) if i % 6 != 0]
    pairs += [(i, 0) for i in range(1, 40, 9)]
    pairs = sorted({(s, d) for s, d in pairs if s != d})
    got = _ranks(pagerank(_edges(spark, pairs), iterations=5))

    con = duckdb.connect()
    con.sql(
        "CREATE TABLE edges_in (src BIGINT, dst BIGINT)"
    )
    con.executemany("INSERT INTO edges_in VALUES (?, ?)", pairs)
    sql = pagerank_oracle_sql(
        "WITH edges AS (SELECT src, dst FROM edges_in)",
        "(SELECT count(*) FROM verts)",
        iterations=5,
    )
    want = {int(n): int(r) for n, r, _ in con.sql(sql).fetchall()}
    assert got == want


def test_pagerank_plan_has_no_wide_cartesian(spark):
    """The only nested-loop join in a sweep is the 1-row dangling-mass
    broadcast; contributions go through hash/sort-merge equi-joins.
    Guards against a refactor degrading the sweep to a real cartesian."""
    e = _edges(spark, [(i, (i + 1) % 10) for i in range(10)])
    plan = pagerank(e, iterations=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_trustrank_unreachable_is_exact_zero(spark):
    """Seeded teleport: a node with no path from any seed holds exactly
    0 mass; seeds and their descendants hold positive mass."""
    # 0 -> 1 -> 2; island 3 -> 4 (unreachable from seed 0)
    e = _edges(spark, [(0, 1), (1, 2), (3, 4)])
    seeds = spark.createDataFrame([(0,)], "node long")
    got = _ranks(pagerank(e, iterations=6, seeds=seeds))
    assert got[3] == 0 and got[4] == 0
    assert got[0] > 0 and got[1] > 0 and got[2] > 0
    assert got[0] > got[1] > got[2]  # trust attenuates with distance


def test_trustrank_seed_guard(spark):
    e = _edges(spark, [(0, 1)])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="seed"):
        pagerank(e, seeds=spark.createDataFrame([(99,)], "node long"))


def test_trustrank_oracle_parity(spark):
    """Seeded variant: Spark vs the seeds_cte-parameterized unrolled
    oracle, exact rank_fp equality on a graph with an unreachable
    island and a dangling seed."""
    pairs = [(i, (i * 3 + 1) % 30) for i in range(30) if i % 5 != 0]
    pairs = sorted({(s, d) for s, d in pairs if s != d})
    seed_ids = [0, 7, 14]  # 0 is dangling (0 % 5 == 0 has no outlinks)
    seeds = spark.createDataFrame([(i,) for i in seed_ids], "node long")
    got = _ranks(pagerank(_edges(spark, pairs), iterations=4, seeds=seeds))

    con = duckdb.connect()
    con.sql("CREATE TABLE edges_in (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO edges_in VALUES (?, ?)", pairs)
    sql = pagerank_oracle_sql(
        "WITH edges AS (SELECT src, dst FROM edges_in)",
        "(SELECT count(*) FROM verts)",
        iterations=4,
        seeds_cte=(
            "seeds AS (SELECT unnest([0, 7, 14])::BIGINT AS node)"
        ),
    )
    want = {int(n): int(r) for n, r, _ in con.sql(sql).fetchall()}
    assert got == want
    assert any(v == 0 for v in got.values())  # some node is untrusted


@pytest.mark.parametrize("seed", [3, 17, 29])
def test_oracle_parity_fuzz(spark, seed):
    """Randomized graphs (self-loop-free, with dangling nodes and
    duplicate-edge collapses) agree with the unrolled oracle exactly —
    three shapes beyond the hand-built parity graph."""
    import random as _random

    rng = _random.Random(seed)
    n = rng.randint(12, 40)
    pairs = sorted({
        (s, d)
        for s in range(n)
        if rng.random() > 0.25  # ~1/4 of nodes dangle
        for d in rng.sample(range(n), rng.randint(1, 4))
        if s != d
    })
    iters = rng.randint(2, 6)
    got = _ranks(pagerank(_edges(spark, pairs), iterations=iters))

    con = duckdb.connect()
    con.sql("CREATE TABLE edges_in (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO edges_in VALUES (?, ?)", pairs)
    sql = pagerank_oracle_sql(
        "WITH edges AS (SELECT src, dst FROM edges_in)",
        "(SELECT count(*) FROM verts)",
        iterations=iters,
    )
    want = {int(v): int(r) for v, r, _ in con.sql(sql).fetchall()}
    assert got == want
