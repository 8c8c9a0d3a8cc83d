"""Unit tests for operators/code.py — the code-corpus curation family
(language id, license cascade, line-shape quality gates, comment
stripping) plus the registry queries' cross-engine oracle parity at
sf0.001 (the driver re-checks at sf0.01)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vlm_data_pipeline_spark.operators import code as code_ops


def _one(spark, path: str, text: str) -> dict:
    df = spark.createDataFrame([(path, text)], "path string, text string")
    gates = code_ops.quality_gates(F.col("text"))
    row = df.select(
        code_ops.language_id(F.col("path"), F.col("text")).alias("language"),
        code_ops.license_detect(F.col("text")).alias("license"),
        *[gates[g].alias(g) for g in ("ok_max_line", "ok_avg_line", "ok_alnum",
                                      "not_autogen", "keep")],
    ).collect()[0]
    return row.asDict()


def test_language_id_extension_wins_over_shebang(spark):
    r = _one(spark, "a/b/tool.py", "#!/usr/bin/env node\nprint(1)\n")
    assert r["language"] == "python"  # .py beats the (buggy) node shebang


def test_language_id_shebang_fallback_and_version_strip(spark):
    r = _one(spark, "bin/deploy", "#!/usr/bin/env python3.11\nprint(1)\n")
    assert r["language"] == "python"
    r2 = _one(spark, "bin/run", "#!/bin/bash\necho hi\n")
    assert r2["language"] == "shell"
    r3 = _one(spark, "bin/x", "no shebang here\n")
    assert r3["language"] == "unknown"


def test_license_spdx_wins_over_phrase(spark):
    text = (
        "// SPDX-License-Identifier: BSD-3-Clause\n"
        "/* Permission is hereby granted, free of charge */\n"
        "int main() {}\n"
    )
    assert _one(spark, "m.c", text)["license"] == "BSD-3-Clause"
    # phrase cascade without SPDX
    assert (
        _one(spark, "m.c", "/* Apache License, Version 2.0 */\nx\n")["license"]
        == "Apache-2.0"
    )
    assert _one(spark, "m.c", "int main() {}\n")["license"] is None


def test_quality_gate_boundaries_are_integer_exact(spark):
    # max line exactly at the limit passes; one over fails
    at = "a" * code_ops.MAX_LINE_LEN
    over = "a" * (code_ops.MAX_LINE_LEN + 1)
    assert _one(spark, "x.py", at)["ok_max_line"]
    assert not _one(spark, "x.py", over)["ok_max_line"]
    # alnum exactly 1/4: 1 alnum char + 3 non-alnum = keep boundary
    assert _one(spark, "x.py", "a,.;")["ok_alnum"]
    assert not _one(spark, "x.py", "a,.;-")["ok_alnum"]


def test_autogen_marker_case_insensitive(spark):
    r = _one(spark, "g.py", "# AUTO-GENERATED, DO NOT EDIT\nx = 1\n")
    assert not r["not_autogen"]
    assert not r["keep"]


def test_strip_comments_families(spark):
    df = spark.createDataFrame(
        [
            ("hash", "#!/bin/sh\n# c1\nx=1  # trail\ny=2\n"),
            ("slash", "/* block\nspans */\nint x; // tail\nint y;\n"),
            ("dash", "-- header\nSELECT 1; -- tail\n"),
        ],
        "family string, text string",
    )
    out = {
        r["family"]: r["s"]
        for r in df.select(
            "family",
            F.when(F.col("family") == "hash",
                   code_ops.strip_comments(F.col("text"), "hash"))
            .when(F.col("family") == "slash",
                  code_ops.strip_comments(F.col("text"), "slash"))
            .otherwise(code_ops.strip_comments(F.col("text"), "dash"))
            .alias("s"),
        ).collect()
    }
    assert out["hash"] == "x=1\ny=2"
    assert out["slash"] == "int x;\nint y;"
    assert out["dash"] == "SELECT 1;"


@pytest.mark.parametrize("name", ["code_corpus_stats", "code_strip_comments"])
def test_code_queries_match_oracle(spark, sf_dir, name):
    from vlm_data_pipeline_spark.plans import QUERIES

    from .oracle import compare

    compare(spark, QUERIES[name], sf_dir)
