#!/usr/bin/env python
"""Per-sweep wall-clock profile of graph_trustrank (VERDICT r9 #4 /
r8 #5): where does the fixed-point loop's wall go at demo scale, and
does the per-sweep cost scale with data or with fixed job overhead?

Method: rebuild the exact demo graph the registered query uses, then
run the SAME fixed-point loop but force one eager action per sweep
(count of the rank table) and time each; also time the setup actions
(edge checkpoint, vertex count, seed count) that pagerank() performs
before sweep 0. The production query does NOT take a per-sweep action
— sweeps 0..3 execute lazily inside the sweep-4 job (checkpoint_every=4
means a single localCheckpoint after sweep 3) — so the per-sweep walls
here are an upper bound that exposes the overhead structure, not a
regression against the query's own wall.

Usage: python tools/profile_trustrank.py [--sf-dir DIR] [--iters N]
Prints one JSON line per phase and a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from vlm_data_pipeline_spark.operators import graph as graph_ops
    from vlm_data_pipeline_spark.plans.registry import load_tables
    from vlm_data_pipeline_spark.plans.star_queries_llm import _pr_demo_edges
    from vlm_data_pipeline_spark.session import get_spark

    spark = get_spark("trustrank-profile", cpus=args.cpus)
    docs = load_tables(spark, args.sf_dir, "documents")["documents"]

    phases: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        phases[name] = round(time.perf_counter() - t0, 3)
        print(json.dumps({"phase": name, "sec": phases[name]}), flush=True)
        return out

    edges = timed("build_edges_checkpoint", lambda: (
        _pr_demo_edges(docs)
        .select("src", "dst")
        .localCheckpoint()
    ))
    n_edges = timed("count_edges", edges.count)
    verts = timed("verts_distinct_checkpoint", lambda: (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    ))
    n = timed("count_vertices", verts.count)
    seeds = docs.filter(F.col("doc_id") % 50 == 1).select(
        F.col("doc_id").alias("node")
    )
    seed_nodes = timed("seed_restrict_checkpoint", lambda: (
        seeds.distinct().join(verts, "node", "left_semi").localCheckpoint()
    ))
    s = timed("count_seeds", seed_nodes.count)

    tgt = verts.join(
        seed_nodes.withColumn("is_tgt", F.lit(True)), "node", "left"
    ).select("node", F.coalesce("is_tgt", F.lit(False)).alias("is_tgt"))
    tgt = timed("target_flags_checkpoint", tgt.localCheckpoint)

    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    scale = graph_ops.PAGERANK_SCALE
    damping = 85
    tele = ((100 - damping) * (scale // s)) // 100
    ranks = tgt.select(
        "node",
        F.when(F.col("is_tgt"), F.lit(scale // s))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("r"),
    )
    for it in range(args.iters):
        with_od = ranks.join(
            outdeg, ranks["node"] == outdeg["src"], "left"
        ).select("node", "r", "od")
        contrib = (
            edges.join(
                with_od.filter(F.col("od").isNotNull()),
                edges["src"] == with_od["node"],
            )
            .select("dst", F.expr("r div od").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        dangling = with_od.filter(F.col("od").isNull()).agg(
            F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dsum")
        )
        ranks = (
            tgt.join(contrib, tgt["node"] == contrib["dst"], "left")
            .crossJoin(dangling)
            .select(
                "node",
                (
                    F.when(F.col("is_tgt"), F.lit(tele)).otherwise(F.lit(0))
                    + F.expr(
                        f"({damping} * (coalesce(in_sum, 0)"
                        f" + (CASE WHEN is_tgt THEN dsum div {s}"
                        f" ELSE 0 END))) div 100"
                    )
                ).cast("long").alias("r"),
            )
        )
        # eager per-sweep materialization (the profile's whole point)
        ranks = timed(f"sweep_{it}_checkpoint", ranks.localCheckpoint)

    total_mass = timed(
        "final_collect",
        lambda: ranks.agg(F.sum("r")).collect()[0][0],
    )
    print(
        json.dumps(
            {
                "sf_dir": args.sf_dir,
                "edges": n_edges,
                "vertices": n,
                "seeds": s,
                "total_mass_fp": total_mass,
                "phases": phases,
                "setup_sec": round(
                    sum(v for k, v in phases.items() if "sweep" not in k
                        and k != "final_collect"), 3
                ),
                "sweeps_sec": round(
                    sum(v for k, v in phases.items() if "sweep" in k), 3
                ),
            }
        ),
        flush=True,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
