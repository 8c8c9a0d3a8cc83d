#!/usr/bin/env python
"""Driver-window oracle comparison at an arbitrary scale factor.

The driver grades correctness at sf0.01; `tools/make_scale.py` +
this script extend the same row-count/schema/value-multiset comparison
to a derived sf1 (or any --sf-dir), answering the question the sf0.01
gate cannot: do the operators stay CORRECT — not just fast — at 10x
the graded scale? DuckDB handles the 6M-row lineitem easily, so every
window oracle re-derives at full volume.

Usage:
    python tools/make_scale.py --factor 10
    python tools/verify_at_scale.py [--sf-dir .scale/sf1] [--names a,b]

Prints one line per query + a final JSON summary line (same shape as
the driver-contract simulator).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(REPO, ".scale", "sf1"))
    ap.add_argument("--names", default=None, help="comma list; default = driver window")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument(
        "--max-rows",
        type=int,
        default=2_000_000,
        help="skip queries whose Spark result exceeds this row count — "
        "the row-level compare collects BOTH engines' full results into "
        "Python and canonicalizes them, which stops being practical in "
        "the tens of millions (a 12M-row task measured >35 min). "
        "Skipped giants stay covered by the sf0.01 driver gate and, for "
        "the QA family, by qa_pipeline_summary_oracle which value-checks "
        "every task's union counts at this scale.",
    )
    args = ap.parse_args()

    from tests.oracle import compare

    from vlm_data_pipeline_spark.plans import QUERIES, _DRIVER_WINDOW
    from vlm_data_pipeline_spark.session import get_spark

    names = args.names.split(",") if args.names else list(_DRIVER_WINDOW)
    spark = get_spark("verify-scale", cpus=args.cpus)

    passed, failed, skipped = [], [], []
    for name in names:
        q = QUERIES[name]
        if q.oracle is None:
            continue
        t0 = time.perf_counter()
        try:
            n = q.build(spark, args.sf_dir).count()
            if n > args.max_rows:
                skipped.append(name)
                print(f"  {name}: SKIP ({n} rows > --max-rows)", flush=True)
                continue
            compare(spark, q, args.sf_dir)
            passed.append(name)
            print(f"  {name}: MATCH rows={n} ({time.perf_counter() - t0:.1f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            failed.append(name)
            print(f"  {name}: FAIL {exc}", flush=True)
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "compared": len(passed) + len(failed),
        "skipped_over_max_rows": skipped,
        "failed": failed,
    }))
    spark.stop()
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
