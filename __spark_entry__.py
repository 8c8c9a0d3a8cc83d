"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``vlm_data_pipeline_spark.plans`` — one registered
entry per implemented SURVEY.md §2 operator family.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from vlm_data_pipeline_spark.plans import QUERIES  # noqa: E402
from vlm_data_pipeline_spark.plans.registry import (  # noqa: E402
    DRIVER_ORACLE_SF_DIR,
    resolve_oracle,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the object-count QA shape (SURVEY §7.1 step 1):
    group-count-having + question templating.
    """
    return QUERIES["qa_object_count"].build(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.build for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-expressible query.

    Lazy (callable) oracles resolve against the driver's grading scale
    (sf0.01) — they inline reference values computed by an independent
    driver-side pass over the same parquet inputs.
    """
    out: dict[str, str] = {}
    for name, q in QUERIES.items():
        sql = resolve_oracle(q, DRIVER_ORACLE_SF_DIR)
        if sql is not None:
            out[name] = sql
    return out
