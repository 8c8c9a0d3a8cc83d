"""Curation operators: quality filtering rules and stratified sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from vlm_data_pipeline_spark.operators import curation


def test_quality_filter_rules(spark):
    docs = spark.createDataFrame(
        [
            (1, "the data pipeline reads the parquet files quickly today"),  # ok
            (2, "hi"),                                    # too few tokens
            (3, "spam spam spam spam spam spam spam"),    # uniq_ratio too low
            (4, "a " * 200 + "bb"),                       # mean word len < 2
        ],
        "doc_id long, text string",
    )
    kept = [r.doc_id for r in curation.quality_filter(docs).collect()]
    assert kept == [1]

    audit = curation.quality_audit(docs).collect()[0]
    assert audit.n_docs == 4
    assert audit.n_survivors == 1
    assert audit.n_tokens_in_band == 3          # doc 2 fails the band
    assert audit.n_uniq_ok == 2                 # docs 3 and 4 fail diversity


def test_quality_filter_zero_shuffle(spark):
    docs = spark.createDataFrame([(1, "some text here")], "doc_id long, text string")
    plan = (
        curation.quality_filter(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan[:1200]


def test_stratified_sample_quota_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}", "en" if i % 3 else "fr") for i in range(100)],
        "doc_id long, text string, lang string",
    )
    s1 = curation.stratified_sample(docs, "lang", 10)
    rows1 = sorted((r.lang, r.doc_id) for r in s1.collect())
    per_lang = {}
    for lang, _ in rows1:
        per_lang[lang] = per_lang.get(lang, 0) + 1
    assert per_lang == {"en": 10, "fr": 10}
    # deterministic across runs and repartitionings
    rows2 = sorted(
        (r.lang, r.doc_id)
        for r in curation.stratified_sample(docs.repartition(13), "lang", 10).collect()
    )
    assert rows1 == rows2
    # a different seed draws a different sample
    rows3 = sorted(
        (r.lang, r.doc_id)
        for r in curation.stratified_sample(docs, "lang", 10, seed="other").collect()
    )
    assert rows1 != rows3
    # quota larger than the stratum returns the whole stratum
    small = curation.stratified_sample(docs.filter("doc_id < 5"), "lang", 10)
    assert small.count() == 5
