"""Domain-engine demonstrations at driver scale (batch 4): the full QA
pipeline, ingest summaries/audits, and the codebook enrichment stage running
over frames synthesized deterministically from the star schema
(sources/star_frames.py).

These are rows-only driver checks (no ANSI-SQL oracle: the pipelines span
generated multi-level lineage with hash-seeded draws and a mapInPandas
stage); their VALUE correctness is pinned by the analytic fixtures in
tests/test_qa_tasks.py / test_geometry.py / test_sources_enrich.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..enrich import apply_codebook, build_codebook, label_histogram
from ..qa import generate_all, qa_summary
from ..sources.json_frames import dataset_summary, parameter_audit
from ..sources.star_frames import synthetic_frames
from .registry import register


@register(
    "qa_pipeline_full",
    None,
    "SURVEY §3.3 end-to-end: all ten QA task generators over frames "
    "synthesized from the star schema (one frame per order, one box per "
    "lineitem) — P1 routing, J8 pair joins, W1/W2 windows, F5/F6 geometry, "
    "F8 deterministic distractors, E1 union. Value-level correctness is "
    "pinned by the analytic fixtures in tests/test_qa_tasks.py.",
)
def qa_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = synthetic_frames(spark, sf_dir)
    return generate_all(frames)


@register(
    "qa_pipeline_summary",
    None,
    "A9/K3: per-task question counts + answer-type mix over the full QA "
    "output (generate_qa.py:147-163).",
)
def qa_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return qa_summary(generate_all(synthetic_frames(spark, sf_dir)))


@register(
    "frames_dataset_summary",
    None,
    "K2: per-(dataset, split) totals with grand rollup over the canonical "
    "frames schema (sunrgbd_processor.py:326-337).",
)
def frames_dataset_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dataset_summary(synthetic_frames(spark, sf_dir))


@register(
    "frames_parameter_audit",
    None,
    "A10: the check_dataset_parameters audit as one aggregation pass over "
    "frames (camera/intrinsics/extrinsics/bbox completeness counters).",
)
def frames_parameter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return parameter_audit(synthetic_frames(spark, sf_dir))


@register(
    "enrich_codebook_pipeline",
    None,
    "SURVEY §3.2 end-to-end: object_N extraction (S2/P3) → representative "
    "dedupe (J7) → mapInPandas stub classifier (M2/M3 interface) → "
    "broadcast-join apply with pseudo_ rewrite (J6) → label histogram (K6). "
    "Every 7th part id is relabeled object_N to exercise the path.",
)
def enrich_codebook_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = synthetic_frames(spark, sf_dir)
    # plant unlabeled instances: every 7th box becomes object_<partkey-hash>
    seeded = frames.withColumn(
        "bounding_boxes_3d",
        F.transform(
            F.col("bounding_boxes_3d"),
            lambda b, i: F.when(
                (F.crc32(b["category"]) + i) % 7 == 0,
                b.withField(
                    "category",
                    F.format_string("object_%d", (F.crc32(b["category"]) + i) % 1000),
                ),
            ).otherwise(b),
        ),
    )
    codebook = build_codebook(seeded)
    labeled = apply_codebook(seeded, codebook, labeled_only=True)
    hist = label_histogram(codebook)
    n_pseudo = F.size(
        F.filter(
            F.col("bounding_boxes_3d"),
            lambda b: b["category"].startswith("pseudo_"),
        )
    )
    stats = labeled.agg(
        F.count("*").alias("n_frames"),
        F.sum(n_pseudo).alias("n_pseudo_boxes"),
    ).select(F.lit("snapshot").alias("label"), F.col("n_pseudo_boxes").alias("n_instances"), F.lit(None).cast("double").alias("avg_confidence"))
    return hist.unionByName(stats)
