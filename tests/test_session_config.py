"""Pin the round-13 JVM/codegen session configuration.

The unrolled min-vertex kernel emits generated methods past HotSpot's
DontCompileHugeMethods limit (8000 bytecode bytes); without the flag
override such methods NEVER JIT and the flagship swings 4-8x run to run
(OPTIMIZATION_r13.md section 8). These tests pin the fix so a session.py
edit cannot silently drop it.
"""

from __future__ import annotations


def test_jvm_codegen_opts_configured(spark):
    """Driver and executor JVM options carry the huge-method JIT fix."""
    for role in ("driver", "executor"):
        opts = spark.conf.get(f"spark.{role}.extraJavaOptions")
        assert "-XX:-DontCompileHugeMethods" in opts, (role, opts)
        assert "-XX:ReservedCodeCacheSize=" in opts, (role, opts)


def test_jvm_flags_reached_the_driver(spark):
    """The local-mode driver JVM actually launched with the flags (they
    are launch-time options — a builder config set after JVM start would
    silently not apply; this reads the live JVM's input arguments)."""
    args = (
        spark._jvm.java.lang.management.ManagementFactory.getRuntimeMXBean()
        .getInputArguments()
    )
    live = {args.get(i) for i in range(args.size())}
    assert "-XX:-DontCompileHugeMethods" in live


def test_huge_method_limit_default_is_spark_default(spark):
    """The WSCG bytecode ceiling stays at Spark's default: the
    per-operator-fallback alternative measured 2x slower steady-state
    (ledger section 8) — the env knob exists for JIT-constrained
    deployments, but the default must not drift."""
    assert spark.conf.get("spark.sql.codegen.hugeMethodLimit") == "65535"
