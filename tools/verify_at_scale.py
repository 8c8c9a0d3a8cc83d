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
    args = ap.parse_args()

    from tests.oracle import compare

    from vlm_data_pipeline_spark.plans import QUERIES, _DRIVER_WINDOW
    from vlm_data_pipeline_spark.session import get_spark

    names = args.names.split(",") if args.names else list(_DRIVER_WINDOW)
    spark = get_spark("verify-scale", cpus=args.cpus)

    passed, failed = [], []
    for name in names:
        q = QUERIES[name]
        if q.oracle is None:
            continue
        t0 = time.perf_counter()
        try:
            compare(spark, q, args.sf_dir)
            passed.append(name)
            print(f"  {name}: MATCH ({time.perf_counter() - t0:.1f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001 — report, keep sweeping
            failed.append(name)
            print(f"  {name}: FAIL {exc}", flush=True)
    print(json.dumps({
        "sf_dir": args.sf_dir,
        "compared": len(passed) + len(failed),
        "failed": failed,
    }))
    spark.stop()
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
