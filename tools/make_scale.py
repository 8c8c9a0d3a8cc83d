#!/usr/bin/env python
"""Derive a larger scale factor from the driver's sf0.1 parquet tables.

The driver ships sf{0.001,0.01,0.1} (TESTDATA.md, read-only). The judge's
round-6 verdict asks for a 10x scaling checkpoint: the 2x-of-baseline
criterion at sf0.1 cannot see a superlinear cliff, a single sf1 run can.
This tool synthesizes /root/repo/.scale/sf1 deterministically FROM sf0.1 —
it never touches /root/testdata — so the checkpoint is reproducible
(`python tools/make_scale.py --factor 10`).

Design: key-shifted replication, the standard dbgen-style scale-up.

- Replica r in [0, F): every *entity* key column shifts by r * 10^7
  (far above any sf0.1 key).  Foreign keys shift with their parents, so
  join fan-out per replica is identical to sf0.1 and cross-replica joins
  never match — group counts and per-key densities are preserved, total
  volume is exactly F x.
- Dimension tables (region, nation) are NOT replicated, and nationkey
  columns are NOT shifted: all replicas join the same 25 nations, so
  rollup output cardinality (e.g. j_star_revenue's 25 groups) stays
  fixed while input volume scales — the shape a real warehouse has.
- `events.user_id` shifts too: per-user event density stays constant, so
  sessionization / ASOF / window workloads scale linearly instead of
  quadratically per key.
- Timestamps are left untouched. Consequence (documented, intentional):
  synthetic queries that join two fact tables on a *fixed* derived axis
  (events_interval_join's second-of-day) get F x density on BOTH sides
  and therefore ~F^2 x output — that is output-driven work, a property
  of the synthetic dataset, not an operator cliff; the checkpoint
  normalizes such queries by output rows.
- `documents.text`: replica r > 0 maps every whitespace token through a
  seeded random permutation of the corpus vocabulary. This preserves the
  corpus's exact length/Zipf/duplicate structure per replica (dups stay
  dups, near-dups stay near-dups) while guaranteeing NO cross-replica
  near-duplicates — MinHash/Bloom/token workloads scale linearly instead
  of manufacturing F^2 phantom dup pairs. n_chars is recomputed.
- `embeddings.embedding`: replica r > 0 applies a seeded +-1 sign pattern
  (norm-preserving) so replicas are not trivial vector duplicates.
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

OFF = 10_000_000  # replica key shift; far above every sf0.1 key (max 149999)

# entity-key columns to shift per table (nationkey/regionkey stay fixed)
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation"]


def _vocab_perm(texts: pd.Series, r: int) -> dict[str, str]:
    vocab = sorted({t for s in texts for t in s.split(" ") if t})
    rng = np.random.default_rng(9000 + r)
    perm = rng.permutation(len(vocab))
    return {w: vocab[perm[i]] for i, w in enumerate(vocab)}


def scale_table(name: str, src: str, dst: str, factor: int) -> int:
    table = pq.read_table(os.path.join(src, f"{name}.parquet"))
    base = table.to_pandas()
    reps = []
    for r in range(factor):
        df = base.copy()
        for col in SHIFT[name]:
            df[col] = df[col] + r * OFF
        if name == "documents" and r > 0:
            mapping = _vocab_perm(base["text"], r)
            df["text"] = df["text"].map(
                lambda s: " ".join(mapping.get(t, t) for t in s.split(" "))
            )
            df["n_chars"] = df["text"].str.len().astype("int64")
        if name == "embeddings" and r > 0:
            rng = np.random.default_rng(7000 + r)
            dim = len(base["embedding"].iloc[0])
            signs = rng.choice([-1.0, 1.0], size=dim).astype("float32")
            df["embedding"] = df["embedding"].map(
                lambda v: (np.asarray(v, dtype="float32") * signs)
            )
        reps.append(df)
    out = pd.concat(reps, ignore_index=True)
    # Cap row-group size well below pyarrow's 1M-row default: a table
    # under 1M rows otherwise lands in ONE row group, and Spark assigns
    # parquet work per row-group start — 14 file splits of a single-
    # group documents.parquet left 13 tasks empty and serialized every
    # corpus scan onto one core (the consistent 13+1/14 straggler in
    # the first sf10 runs). ~64 groups lets local[32] actually scan in
    # parallel, which is what the real cluster layout would give.
    pq.write_table(
        pa.Table.from_pandas(out, schema=table.schema, preserve_index=False),
        os.path.join(dst, f"{name}.parquet"),
        row_group_size=max(2048, -(-len(out) // 64)),
    )
    return len(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--dst", default=None)
    args = ap.parse_args()
    sf = 0.1 * args.factor
    dst = args.dst or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", ".scale",
        f"sf{sf:g}",
    )
    dst = os.path.abspath(dst)
    os.makedirs(dst, exist_ok=True)
    for name in COPY:
        shutil.copy(
            os.path.join(args.src, f"{name}.parquet"),
            os.path.join(dst, f"{name}.parquet"),
        )
        print(f"{name}: copied (dimension)")
    for name in SHIFT:
        n = scale_table(name, args.src, dst, args.factor)
        print(f"{name}: {n} rows")
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
