"""sf100 de-hint plan evidence (VERDICT r12 #6).

Two layers: a live unit test of the sparse-padding primitive (a padded
parquet must stay bit-for-bit readable while its LISTED length — the
only statistic Catalyst has for a v1 file scan — scales by the factor),
and contract assertions over the committed SF100_PLAN_EVIDENCE.json
artifact so a regenerated artifact that no longer shows the flip fails
the suite instead of silently shipping.
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO))

from tools.sf100_plan_evidence import sparse_pad_parquet  # noqa: E402

ARTIFACT = os.path.join(REPO, "SF100_PLAN_EVIDENCE.json")
SCALED = {"customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"}


def test_sparse_pad_keeps_parquet_readable(tmp_path):
    src = "/root/testdata/sf0.001/nation.parquet"
    dst = str(tmp_path / "padded.parquet")
    sparse_pad_parquet(src, dst, 10)
    assert os.path.getsize(dst) == os.path.getsize(src) * 10
    orig = pq.read_table(src)
    padded = pq.read_table(dst)
    assert padded.equals(orig)


def test_committed_artifact_shows_the_flip():
    with open(ARTIFACT) as fh:
        art = json.load(fh)
    queries = [k for k in art if isinstance(art[k], dict)]
    assert len(queries) >= 3
    for name in queries:
        row = art[name]
        # nothing hint-forced in either direction, at either scale
        assert row["bench.fact_bc_hint"] == 0, name
        assert row["sf100.fact_bc_hint"] == 0, name
        # bench scale: at least one SF-scaled side broadcasts from
        # estimates (the flip has a 'before' — a query that never
        # broadcasts proves nothing about de-hinting)
        bench_bc = set(row["bench.session_thr"]["broadcast"])
        assert bench_bc & SCALED, (name, bench_bc)
        # sf100: NO SF-scaled side broadcasts — under the session
        # threshold and under the default (not threshold-marginal)
        for thr in ("session_thr", "default_thr"):
            sf100_bc = set(row[f"sf100.{thr}"]["broadcast"])
            assert not (sf100_bc & SCALED), (name, thr, sf100_bc)
    # the scale-invariant dimensions KEEP their hinted broadcast at
    # sf100 on the star lineage — de-hinting did not strip them
    star = art["j_star_revenue"]
    assert {"nation", "region"} <= set(
        star["sf100.session_thr"]["broadcast"]
    )
