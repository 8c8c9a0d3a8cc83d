"""JSON source/sink round-trip, audits, the star-schema frames synthesizer,
and the codebook enrichment stage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.fixtures import box3, fixture_frames, frame
from vlm_data_pipeline_spark import enrich
from vlm_data_pipeline_spark.qa import generate_all
from vlm_data_pipeline_spark.schemas import FRAME
from vlm_data_pipeline_spark.sources import json_frames, star_frames


def test_json_roundtrip_and_audit(spark, tmp_path):
    frames = fixture_frames(spark)
    out = str(tmp_path / "bronze")
    json_frames.write_frames(frames, out)
    back = spark.read.parquet(out)
    assert back.count() == frames.count()
    # partitioned layout → partition pruning on dataset=
    assert (tmp_path / "bronze" / "dataset=sunrgbd").exists()

    # JSON read path with schema + summary exclusion + limit
    jdir = tmp_path / "json" / "sunrgbd" / "train"
    jdir.mkdir(parents=True)
    rows = frames.toJSON().collect()
    for i, r in enumerate(rows):
        (jdir / f"img_{i}.json").write_text(r)
    (jdir / "summary.json").write_text('{"dataset": "sunrgbd"}')
    loaded = json_frames.read_frames(spark, str(tmp_path / "json"))
    assert loaded.count() == len(rows)  # summary.json excluded
    assert loaded.filter(F.col("_source_file").contains("summary")).count() == 0
    assert json_frames.read_frames(spark, str(tmp_path / "json"), limit=2).count() == 2

    summary = {((r.dataset, r.split)): r for r in json_frames.dataset_summary(frames).collect()}
    assert summary[("ALL", "ALL")].n_frames == 6
    assert summary[("sunrgbd", "train")].n_boxes_3d == 7

    audit = {r.dataset: r for r in json_frames.parameter_audit(frames).collect()}
    assert audit["coco"].with_extrinsics == 0
    assert audit["sunrgbd"].with_camera == audit["sunrgbd"].n_files


def test_star_frames_shape(spark, sf_dir):
    frames = star_frames.synthetic_frames(spark, sf_dir)
    sample = frames.limit(50).collect()
    assert sample
    for r in sample:
        assert r.image_id.startswith("ord_")
        assert len(r.bounding_boxes_3d) >= 1
        # extrinsics present iff even order key
        key = int(r.image_id.split("_")[1])
        assert (r.camera.extrinsics is not None) == (key % 2 == 0)
    # QA pipeline runs end-to-end on the synthesized frames
    qa = generate_all(frames.limit(200))
    assert qa.count() > 0


def test_codebook_enrichment(spark):
    frames = fixture_frames(spark).unionByName(
        fixture_frames(spark)
        .sparkSession.createDataFrame(
            [
                frame(
                    "f7",
                    b3=[
                        box3(0.0, 0.0, 2.0, cat="object_11"),
                        box3(1.0, 0.0, 2.0, cat="object_12"),
                        box3(2.0, 0.0, 2.0, cat="object_11"),
                        box3(3.0, 0.0, 2.0, cat="keep_me"),
                    ],
                )
            ],
            schema=FRAME,
        )
    )
    inst = enrich.extract_unlabeled_instances(frames)
    assert inst.count() == 3  # two object_11 occurrences + one object_12
    reps = enrich.representative_per_instance(inst)
    assert reps.count() == 2  # deduped before "inference"

    cb = enrich.build_codebook(frames)
    rows = {r.instance_id: r for r in cb.collect()}
    assert set(rows) == {11, 12}
    assert all(r.label in enrich.codebook.LABEL_VOCAB for r in rows.values())

    labeled = enrich.apply_codebook(frames, cb, labeled_only=True)
    f7 = labeled.filter(F.col("image_id") == "f7").first()
    cats = [b.category for b in f7.bounding_boxes_3d]
    assert all(c.startswith("pseudo_") or c == "keep_me" for c in cats)
    assert len(cats) == 4  # all matched here (stub labels everything)

    hist = enrich.label_histogram(cb)
    assert hist.agg(F.sum("n_instances")).first()[0] == 2

    # determinism: same codebook twice
    cb2 = {(r.instance_id, r.label) for r in enrich.build_codebook(frames).collect()}
    assert cb2 == {(r.instance_id, r.label) for r in cb.collect()}


def test_apply_codebook_zero_shuffle(spark):
    """The snapshot rewrite is a per-row array program over a collected
    map literal — its plan must contain NO Exchange (the join+groupBy
    form reassembled the whole corpus through one)."""
    from tests.fixtures import fixture_frames

    frames = fixture_frames(spark)
    cb = spark.createDataFrame(
        [(7, "mug", 0.9, "A")],
        "instance_id int, label string, confidence double, stage string",
    )
    out = enrich.apply_codebook(frames, cb, labeled_only=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1500]
    # and row-for-row: every input frame survives (no groupBy merge)
    assert out.count() == frames.count()
