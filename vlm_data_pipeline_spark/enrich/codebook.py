"""Codebook enrichment stage (SURVEY §3.2): label unlabeled instances via a
pluggable classifier, then broadcast-join the codebook back over the corpus.

Reference flow re-expressed (never copied):
- scan for ``object_N`` instances (build_label_codebook_fast.py:40-85, S2/P3)
- ONE representative occurrence per instance before expensive inference
  (J7, :382-385 — the dedupe-before-expensive-op pattern; at 100 TB this is
  the difference between classifying 253 crops and 86K)
- classifier = mapInPandas stage with a per-executor model singleton
  (M2/M3); tests use the deterministic stub so the relational engine never
  needs torch (§7.3 hard part #5)
- apply = broadcast equi-join + category rewrite with ``pseudo_`` prefix +
  provenance struct; labeled-only copy keeps only matched boxes
  (J6/K6, create_labeled_dataset.py:72-199). Immutable snapshot — the
  reference's in-place rewrite (:311-348) becomes a new write.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The 69-class vocabulary concept (build_enhanced_codebook.py:89-120);
# a representative subset — deployments pass their own.
LABEL_VOCAB = (
    "chair", "table", "sofa", "bed", "lamp", "desk", "cabinet", "shelf",
    "monitor", "plant", "pillow", "sink", "toilet", "mirror", "window",
)


def extract_unlabeled_instances(frames: DataFrame) -> DataFrame:
    """S2/P3: (instance_id, image_id, pos) triples for ``object_N`` boxes."""
    inst = frames.select(
        "dataset",
        "image_id",
        F.col("rgb_path"),
        F.posexplode("bounding_boxes_3d").alias("pos", "box"),
    )
    return inst.filter(F.col("box.category").startswith("object_")).select(
        "dataset",
        "image_id",
        "rgb_path",
        "pos",
        F.nullif(
            F.regexp_extract(F.col("box.category"), r"^object_(\d+)$", 1), F.lit("")
        )
        .cast("int")
        .alias("instance_id"),
    ).filter(F.col("instance_id").isNotNull())


def representative_per_instance(instances: DataFrame) -> DataFrame:
    """J7/A7: first occurrence of each instance across the corpus (ordered
    by image_id, pos) — the only rows the classifier ever sees."""
    return instances.groupBy("instance_id").agg(
        F.min_by(
            F.struct("dataset", "image_id", "rgb_path", "pos"),
            F.struct("image_id", "pos"),
        ).alias("rep")
    ).select("instance_id", "rep.dataset", "rep.image_id", "rep.rgb_path", "rep.pos")


def stub_classifier(batch_size: int = 16) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """Deterministic stand-in for the CLIP/SAM/DINO stage (M2/M3).

    Real deployment: replace the body with a lazily-initialized
    per-executor model (load weights once per python worker, batch crops
    through the GPU, Arrow batch size tuned via
    spark.sql.execution.arrow.maxRecordsPerBatch). The stub derives
    (label, confidence, stage) from a hash of instance_id so tests are
    reproducible without torch; raises nothing — genuinely undecidable
    inputs in the real path map to confidence below the Stage-B floor and
    are discarded by the caller, mirroring the reference's τ thresholds
    (build_enhanced_codebook.py:375-419).
    """
    import hashlib

    def classify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            h = pdf["instance_id"].map(
                lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
            )
            labels = h.map(lambda v: LABEL_VOCAB[v % len(LABEL_VOCAB)])
            conf = (h % 1000) / 1000.0
            stage = h.map(lambda v: "A" if v % 4 != 0 else "B")
            yield pd.DataFrame(
                {
                    "instance_id": pdf["instance_id"],
                    "label": labels,
                    "confidence": conf,
                    "stage": stage,
                }
            )

    return classify


def build_codebook(
    frames: DataFrame,
    classifier: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]] | None = None,
    min_confidence: float = 0.01,
) -> DataFrame:
    """Scan → representative dedupe → mapInPandas inference → codebook DF
    (instance_id, label, confidence, stage), thresholded like the two-stage
    acceptance (τ discard)."""
    reps = representative_per_instance(extract_unlabeled_instances(frames))
    fn = classifier or stub_classifier()
    out = reps.select("instance_id", "image_id", "rgb_path", "pos").mapInPandas(
        fn, schema="instance_id int, label string, confidence double, stage string"
    )
    return out.filter(F.col("confidence") >= min_confidence)


def two_stage_cascade(
    frames: DataFrame,
    stage_a: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]] | None = None,
    stage_b: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]] | None = None,
    tau_high: float = 0.015,
    tau_mid: float = 0.010,
) -> DataFrame:
    """M3/M4: the two-tier model cascade as a filter-split + union.

    Reference semantics (build_enhanced_codebook.py:375-419): Stage A (the
    cheap model) classifies every representative; accept where confidence ≥
    τ_high. Only the failures go to Stage B (the expensive model: SAM mask
    + CLIP-L/14); accept ≥ τ_mid; the rest are discarded. SURVEY §4 notes
    Catalyst has no analogue — this is pipeline design: the split is a
    filter, the second stage runs over the (small) failure set only, and
    the result is a union tagged with the deciding stage.

    At scale: Stage A touches N rows; Stage B touches only the failures —
    exactly the cost-cascade a 100 TB labeling run needs.
    """
    reps = representative_per_instance(extract_unlabeled_instances(frames))
    cols = ["instance_id", "image_id", "rgb_path", "pos"]
    schema = "instance_id int, label string, confidence double, stage string"

    a_out = reps.select(*cols).mapInPandas(
        stage_a or stub_classifier(), schema=schema
    )
    accepted_a = a_out.filter(F.col("confidence") >= tau_high).withColumn(
        "stage", F.lit("A")
    )
    failures = reps.join(
        a_out.filter(F.col("confidence") < tau_high).select("instance_id"),
        "instance_id",
        "inner",
    )
    b_out = failures.select(*cols).mapInPandas(
        stage_b or stub_classifier(), schema=schema
    )
    accepted_b = b_out.filter(F.col("confidence") >= tau_mid).withColumn(
        "stage", F.lit("B")
    )
    return accepted_a.unionByName(accepted_b)


def apply_codebook(frames: DataFrame, codebook: DataFrame, labeled_only: bool = True) -> DataFrame:
    """J6/K6: rewrite ``object_N`` → ``pseudo_<label>`` via broadcast join,
    attach provenance, optionally drop unmatched boxes (the labeled-only
    snapshot). Returns frames with rebuilt bounding_boxes_3d."""
    # posexplode_outer keeps empty frames in the snapshot
    inst = frames.select(
        "*", F.posexplode_outer("bounding_boxes_3d").alias("pos", "box")
    ).drop("bounding_boxes_3d")
    iid = F.nullif(
        F.regexp_extract(F.col("box.category"), r"^object_(\d+)$", 1), F.lit("")
    ).cast("int")
    inst = inst.withColumn("instance_id", iid)
    joined = inst.join(F.broadcast(codebook), "instance_id", "left")

    relabeled_box = F.when(
        F.col("label").isNotNull(),
        F.col("box").withField(
            "category", F.format_string("pseudo_%s", F.col("label"))
        ).withField("method", F.lit("codebook")).withField(
            "confidence", F.col("confidence")
        ),
    ).otherwise(F.col("box"))
    keep = (
        F.col("label").isNotNull() | F.col("instance_id").isNull()
        if labeled_only
        else F.lit(True)
    )
    kept = joined.withColumn("box", relabeled_box).filter(keep | F.col("box").isNull())

    group_cols = [c for c in frames.columns if c != "bounding_boxes_3d"]
    return kept.groupBy(*group_cols).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos").alias("p"), F.col("box")))
            ),
            lambda s: s["box"],
        ).alias("bounding_boxes_3d")
    )


def label_histogram(codebook: DataFrame) -> DataFrame:
    """K6 summary: per-label counts (create_labeled_dataset.py:183)."""
    return codebook.groupBy("label").agg(
        F.count("*").alias("n_instances"),
        F.round(F.avg("confidence"), 3).alias("avg_confidence"),
    )
