"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its DuckDB oracle over the same parquet
tables and compares row count, column-name set, and an order-insensitive
canonical value multiset — the same signal the driver's CORRECTNESS gate
hashes. Catching a mismatch here means catching it before the driver does.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from vlm_data_pipeline_spark.plans.registry import (
    TABLES,
    StarQuery,
    resolve_oracle,
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_cell(v: Any) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}"
    if isinstance(v, int):
        return str(v)
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon_cell(r[i]) for i in order) for r in rows)


def compare(spark, query: StarQuery, sf_dir: str) -> None:
    sdf = query.build(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    res = con.execute(resolve_oracle(query, sf_dir))
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{query.name}: column mismatch spark={sorted(s_cols)} duck={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{query.name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    sc = canon_rows(s_cols, s_rows)
    dc = canon_rows(d_cols, d_rows)
    if sc != dc:
        diff_s = [r for r in sc if r not in set(dc)][:5]
        diff_d = [r for r in dc if r not in set(sc)][:5]
        raise AssertionError(
            f"{query.name}: value mismatch\n spark-only: {diff_s}\n duck-only: {diff_d}"
        )
