#!/usr/bin/env python
"""Driver-window staleness report — the rotation policy's feedback loop.

Round 10 closed the never-driver-graded pool to zero, which flips the
window's job from COVERAGE (seat everything once) to FRESHNESS (VERDICT
r10 #3: cycle multi-round-stale holders back in so driver evidence stays
recent). This tool reads every committed CORRECTNESS_r*.json and prints,
per registered query:

- rounds graded + last graded round,
- whether it currently holds a window slot,
- staleness = rounds since last grade (capped at the round count for
  never-graded rows — only rows-only queries can legitimately stay
  there, and the report marks which those are).

Output: a sorted human table on stdout plus one JSON summary line, so a
round's rotation can be planned with `python tools/window_staleness.py`
instead of re-deriving the history by hand each time.

Usage: python tools/window_staleness.py [--json-only]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def history() -> tuple[dict[str, list[int]], int]:
    """name -> sorted rounds graded, plus the latest round number."""
    hist: dict[str, list[int]] = {}
    latest = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        latest = max(latest, rnd)
        with open(path) as fh:
            data = json.load(fh)
        for name in data.get("queries", data):
            hist.setdefault(name, []).append(rnd)
    return hist, latest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json-only", action="store_true")
    args = ap.parse_args()

    from vlm_data_pipeline_spark.plans import _DRIVER_WINDOW, QUERIES

    hist, latest = history()
    window = set(_DRIVER_WINDOW)
    rows = []
    for name, q in QUERIES.items():
        graded = hist.get(name, [])
        last = max(graded) if graded else None
        rows.append(
            {
                "name": name,
                "in_window": name in window,
                "oracled": q.oracle is not None,
                "rounds": graded,
                "last": last,
                "staleness": (latest - last) if last is not None else None,
            }
        )

    # never-graded oracled queries are seating DEBT (should be zero
    # since round 10); stale non-window holders are rotation CANDIDATES
    debt = [r for r in rows if r["oracled"] and r["last"] is None]
    stale = sorted(
        (r for r in rows if not r["in_window"] and r["last"] is not None),
        key=lambda r: r["last"],
    )
    if not args.json_only:
        print(f"latest graded round: r{latest}")
        print(f"window size: {len(window)}  registry: {len(rows)}")
        print("\nmost stale non-window holders (rotation candidates):")
        for r in stale[:20]:
            print(
                f"  r{r['last']:02d} (stale {r['staleness']}) {r['name']}"
                f"{'' if r['oracled'] else '  [rows-only]'}"
            )
        if debt:
            print("\nNEVER-GRADED ORACLED (seating debt — should be empty):")
            for r in debt:
                print(f"  {r['name']}")
    print(
        json.dumps(
            {
                "latest_round": latest,
                "window": len(window),
                "registry": len(rows),
                "never_graded_oracled": sorted(r["name"] for r in debt),
                "max_staleness_in_registry": max(
                    (r["staleness"] for r in rows if r["staleness"] is not None),
                    default=0,
                ),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
