"""Every registered star-schema query hash-matches its DuckDB oracle
at sf0.001 — the local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from vlm_data_pipeline_spark.plans import QUERIES

from .oracle import compare

ORACLE_QUERIES = sorted(name for name, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(name for name, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, sf_dir, name):
    compare(spark, QUERIES[name], sf_dir)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, sf_dir, name):
    df = QUERIES[name].build(spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
