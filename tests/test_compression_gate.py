"""Compression-ratio quality signal: ordering properties (repetitive <
prose < random), determinism, null/empty handling, flag bands."""

from __future__ import annotations

import random
import string

from pyspark.sql import functions as F

from vlm_data_pipeline_spark.operators.curation import (
    compression_gate,
    compression_ratio_ppm,
)


def _docs(spark):
    rng = random.Random(7)
    rand_text = "".join(
        rng.choice(string.ascii_letters + string.digits + " ")
        for _ in range(2000)
    )
    rows = [
        (0, "spam " * 400),  # heavy repetition
        (1, "The quick brown fox jumps over the lazy dog. " * 3
            + "Networks of weighted edges admit spectral embeddings; "
            "sampling without replacement changes the variance bound. "
            "A second paragraph discusses unrelated machinery entirely."),
        (2, rand_text),  # near-incompressible
        (3, None),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id INT, text STRING")


def test_ordering_and_nulls(spark):
    out = {
        r.doc_id: r.ppm
        for r in _docs(spark)
        .select("doc_id", compression_ratio_ppm(F.col("text")).alias("ppm"))
        .collect()
    }
    assert out[0] < out[1] < out[2], out
    assert out[0] < 100_000  # "spam "*400 compresses ~100x
    assert out[2] > 700_000  # random alnum barely compresses
    assert out[3] is None
    assert out[4] == 1_000_000  # empty: defined, not a div-by-zero


def test_determinism(spark):
    df = _docs(spark)
    a = df.select(compression_ratio_ppm(F.col("text")).alias("p")).collect()
    b = df.select(compression_ratio_ppm(F.col("text")).alias("p")).collect()
    assert [r.p for r in a] == [r.p for r in b]


def test_gate_flags(spark):
    flags = {
        r.doc_id: r.compression_flag
        for r in compression_gate(_docs(spark)).collect()
    }
    assert flags[0] == "too_repetitive"
    assert flags[1] == "ok"
    assert flags[3] == "null_text"
    # the 1_000_000 ppm sentinel sits inside the default ok band, so
    # empty docs need their own flag to not silently pass the gate
    assert flags[4] == "empty_text"


def test_unicode_ratio_uses_utf8_bytes(spark):
    """Multibyte text must be measured in UTF-8 bytes on both axes."""
    df = spark.createDataFrame([(0, "日本語" * 200)], "id INT, text STRING")
    ppm = df.select(
        compression_ratio_ppm(F.col("text")).alias("p")
    ).first().p
    assert 0 < ppm < 200_000  # 600 repeated chars compress hard
