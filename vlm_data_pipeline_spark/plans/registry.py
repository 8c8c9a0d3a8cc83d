"""Registry powering ``__spark_entry__.py``.

Every operator family from SURVEY.md §2 is demonstrated as a named query
against the driver's star schema (``/root/testdata/sf*/``), paired with an
ANSI-SQL oracle that DuckDB runs on the same parquet files. The driver
compares row-count + schema + order-insensitive value hash, so:

- every computed column is explicitly aliased identically on both sides;
- every floating-point aggregate is explicitly ``round()``-ed on both sides
  (Spark and DuckDB accumulate doubles in different orders — rounding makes
  the value hash deterministic);
- timestamps are emitted as formatted strings or dates (Spark timestamps are
  session-TZ, DuckDB's are naive; the session TZ is pinned to UTC).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class StarQuery:
    """One oracle-checkable query demonstrating a SURVEY §2 operator."""

    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL over the pre-registered views, or None
    doc: str  # which operator(s) this demonstrates + reference citation


QUERIES: dict[str, StarQuery] = {}


def register(
    name: str, oracle: str | None, doc: str
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        QUERIES[name] = StarQuery(name=name, build=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read the requested star-schema parquet tables.

    Plain ``spark.read.parquet`` so Catalyst keeps full pushdown/pruning;
    at cluster scale these would be catalog tables with the same schemas.

    ``events.ts`` is written as TIMESTAMP(NANOS), which Spark reads as a
    nanosecond long (``spark.sql.legacy.parquet.nanosAsLong``); normalize it
    to a microsecond TimestampType here (values are micro-resolution, so the
    conversion is lossless).
    """
    from pyspark.sql import functions as F

    # events.parquet carries TIMESTAMP(NANOS); without this runtime-settable
    # conf an unconfigured session (e.g. the driver harness's) throws
    # PARQUET_TYPE_ILLEGAL before our bigint normalization below can run.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    out = {}
    for n in names or TABLES:
        df = spark.read.parquet(f"{sf_dir}/{n}.parquet")
        if n == "events" and dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        out[n] = df
    return out
