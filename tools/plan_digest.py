#!/usr/bin/env python
"""Registry-wide physical-plan digest — the plan-shape regression
baseline.

BENCH_PLANS=1 audits the 18 headline queries by executing them; this
tool covers the WHOLE registry (154 queries) by building plans only
(no execution — `executedPlan` on the unexecuted QueryExecution), so a
full sweep takes ~a minute. Per query it records the counts that
actually move at 100 TB:

- exchanges:        shuffle boundaries (every one is a corpus-wide
                    repartition at scale)
- broadcasts:       BroadcastExchange nodes (dimension shipping)
- scans / pushed:   parquet scans, and how many carry PushedFilters
                    (predicate made it into the reader)
- wscg:             WholeStageCodegen spans (wider = more of the plan
                    compiled)
- cartesian/bnlj:   nested-loop joins — should be zero except for
                    documented 1-row aggregates

Output: one JSON file (default PLANS.json) mapping query -> digest.
Diff two rounds' files to catch silent plan regressions (a new
exchange, a filter that stopped pushing, a codegen span that split).

Usage: python tools/plan_digest.py [--sf-dir DIR] [--out PLANS.json]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def digest(plan: str) -> dict:
    return {
        "exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning")
        + plan.count("Exchange RoundRobinPartitioning")
        + plan.count("Exchange SinglePartition"),
        "broadcasts": plan.count("BroadcastExchange"),
        "scans": len(re.findall(r"FileScan|BatchScan", plan)),
        "pushed_filter_scans": len(
            re.findall(r"PushedFilters: \[[^\]]", plan)
        ),
        # the tree string renders codegen'd operators as "*(N) Op";
        # count distinct span ids
        "wscg_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "cartesian": plan.count("CartesianProduct"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "python_eval": plan.count("ArrowEvalPython")
        + plan.count("BatchEvalPython"),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=os.path.join(REPO, "PLANS.json"))
    ap.add_argument("--names", default=None, help="comma list; default all")
    args = ap.parse_args()

    from vlm_data_pipeline_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark("plan-digest", cpus=8)
    # AQE wraps the plan in AdaptiveSparkPlanExec and defers
    # CollapseCodegenStages to runtime, so a pre-execution toString
    # shows no *(N) spans. Disable it HERE ONLY: the digest is a STATIC
    # baseline (exchange positions + codegen structure of the initial
    # plan); production sessions keep AQE, which can only improve on
    # this shape at runtime (coalescing, broadcast conversion,
    # skew splits).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs = e.queries()
    names = args.names.split(",") if args.names else sorted(qs)
    out: dict[str, dict] = {}
    failed: list[str] = []
    for name in names:
        try:
            df = qs[name](spark, args.sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            out[name] = digest(plan)
        except Exception as exc:  # noqa: BLE001 — report, don't abort the sweep
            failed.append(name)
            out[name] = {"error": str(exc)[:200]}
        print(f"  {name}: {json.dumps(out[name])}", flush=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps({"queries": len(out), "failed": failed}))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
