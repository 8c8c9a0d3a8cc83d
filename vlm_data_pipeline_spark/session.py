"""SparkSession factory with scale-conscious defaults.

Local testing runs on ``local[N]`` (one JVM); the configuration is chosen so
the same logical plans survive a multi-executor cluster at 100 TB:

- AQE on (runtime coalescing, skew-join splitting, dynamic join selection)
- shuffle partitions sized to cores locally (override per deployment)
- Arrow enabled for every pandas-UDF boundary
- session timezone pinned to UTC so results are oracle-comparable
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# JVM options for every JVM that executes generated code (round 13).
# Catalyst codegen for wide expression trees — the 64-term min-vertex
# kernel is the extreme case — emits methods past HotSpot's
# DontCompileHugeMethods limit (8000 bytecode bytes): such methods are
# NEVER JIT-compiled and run in the bytecode interpreter forever, which
# measured as 4-8x run-to-run swings on the flagship (qa_pipeline_full
# 8.9-51s for the identical plan depending on which generated methods
# happened to stay under the limit; janino compile time and GC were
# ruled out with CodegenMetrics — 0 new compiles on a 39s warm run).
# -XX:-DontCompileHugeMethods lets C2 compile them (flagship steady at
# 7.7-9.4s, stable across sessions); the code cache is raised to hold
# the compiled giants. Overridable per deployment; on a cluster the
# executor JVMs run this code, so both roles carry the flags.
JVM_CODEGEN_OPTS = os.environ.get(
    "SPARK_GRAFT_JVM_OPTS",
    "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m",
)


def get_spark(
    app_name: str = "vlm_data_pipeline_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the SparkSession.

    ``shuffle_partitions`` defaults to the core count: on local mode more
    partitions than cores only adds task-scheduling overhead, while on a
    real cluster the deployment should override this (or rely on AQE
    coalescing, which is enabled).
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # parallelismFirst coalescing is floored by minPartitionSize
        # (default 1 MiB): a small-byte but CPU-heavy shuffle output —
        # e.g. the ~16 MB frames relation whose per-row QA programs
        # dominate the pipeline — coalesces to 16 partitions and idles
        # half of local[32] through the hottest stage (measured 10.2s →
        # ~6.5s for the 10-task pass at sf0.1 with the floor lowered).
        # 256 KiB keeps such relations at ~core-count partitions while
        # still merging genuinely tiny outputs; at cluster scale
        # partitions >> cores and this floor never binds.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # the driver's events.parquet carries TIMESTAMP(NANOS) which Spark
        # refuses by default; read as long and convert at the source wrapper
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.extraJavaOptions", JVM_CODEGEN_OPTS)
        .config("spark.executor.extraJavaOptions", JVM_CODEGEN_OPTS)
        # Align Spark's whole-stage-codegen bytecode ceiling with
        # HotSpot's huge-method JIT limit (the config's documented
        # purpose): a WSCG method over this size falls back to
        # per-operator codegen, whose expression splitter emits small
        # JIT-able methods. Parameterized for A/B; see ledger §8.
        .config(
            "spark.sql.codegen.hugeMethodLimit",
            os.environ.get("SPARK_GRAFT_HUGE_METHOD_LIMIT", "65535"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
