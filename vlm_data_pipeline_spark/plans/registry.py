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
    # DuckDB SQL over the pre-registered views; None for rows-only; or a
    # callable ``(sf_dir) -> str`` for oracles that embed reference
    # values computed outside both engines (e.g. a driver-side
    # single-threaded zlib pass inlined as a VALUES table — the standard
    # way to oracle a metric DuckDB has no SQL surface for). Resolve via
    # :func:`resolve_oracle`.
    oracle: str | None | Callable[[str], str]
    doc: str  # which operator(s) this demonstrates + reference citation


# The driver grades oracles at this fixed scale; lazy (callable) oracles
# resolved through __spark_entry__.oracle_sql() read their reference
# inputs from here. tests/oracle.compare and tools/verify_at_scale pass
# their own sf_dir instead, so lazy oracles stay scale-correct locally.
DRIVER_ORACLE_SF_DIR = "/root/testdata/sf0.01"


def resolve_oracle(q: "StarQuery", sf_dir: str) -> str | None:
    """The oracle SQL string for ``q`` at ``sf_dir`` (None = rows-only)."""
    if callable(q.oracle):
        return q.oracle(sf_dir)
    return q.oracle


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
