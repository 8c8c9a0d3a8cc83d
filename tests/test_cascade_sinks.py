"""M4 two-stage cascade + K3 envelope sink (SURVEY §2.10/§2.2)."""

from __future__ import annotations

import json
from pathlib import Path

import pandas as pd
from pyspark.sql import functions as F

from tests.fixtures import fixture_frames
from vlm_data_pipeline_spark.enrich import two_stage_cascade
from vlm_data_pipeline_spark.qa import generate_all, write_qa_outputs


def _const_classifier(conf_by_id):
    """Deterministic classifier: per-instance confidence from a dict."""

    def classify(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "instance_id": pdf["instance_id"],
                    "label": ["chair"] * len(pdf),
                    "confidence": pdf["instance_id"].map(
                        lambda i: conf_by_id.get(int(i), 0.0)
                    ),
                    "stage": ["?"] * len(pdf),
                }
            )

    return classify


def test_two_stage_cascade(spark):
    frames = fixture_frames(spark)
    # plant exactly instances object_0..object_4, one per box round-robin
    seeded = frames.withColumn(
        "bounding_boxes_3d",
        F.transform(
            F.coalesce(F.col("bounding_boxes_3d"), F.array()),
            lambda b, i: b.withField(
                "category",
                F.format_string(
                    "object_%d", (F.crc32(F.col("image_id")) + i) % 5
                ),
            ),
        ),
    )
    from vlm_data_pipeline_spark.enrich import extract_unlabeled_instances

    present = {
        r.instance_id
        for r in extract_unlabeled_instances(seeded).select("instance_id").distinct().collect()
    }
    assert len(present) >= 3  # fixture yields several distinct instances

    # stage A accepts ≥ τ_high=0.015; failures go to B, accepted ≥ τ_mid=0.01
    stage_a = _const_classifier({0: 0.5, 1: 0.02, 2: 0.001, 3: 0.012, 4: 0.0})
    stage_b = _const_classifier({2: 0.011, 3: 0.5, 4: 0.002})
    expected = {0: "A", 1: "A", 2: "B", 3: "B", 4: None}  # 4: below both τ

    out = two_stage_cascade(seeded, stage_a, stage_b).collect()
    by_id = {r.instance_id: r for r in out}
    for i in present:
        if expected[i] is None:
            assert i not in by_id
        else:
            assert by_id[i].stage == expected[i], f"instance {i}"
    assert set(by_id) <= present


def test_write_qa_outputs_envelope(spark, tmp_path):
    frames = fixture_frames(spark)
    all_qa = generate_all(frames, tasks=["object_count", "object_3d_size"])
    out = str(tmp_path / "qa")
    write_qa_outputs(all_qa, out, dataset="fixture")

    # pairs partitioned by task → per-task pruning
    assert (tmp_path / "qa" / "pairs" / "task=object_count").exists()
    back = spark.read.json(f"{out}/pairs")
    assert back.count() == all_qa.count()

    env_files = list((tmp_path / "qa" / "envelopes").glob("*.json"))
    assert env_files
    envs = [
        json.loads(line)
        for f in env_files
        for line in Path(f).read_text().splitlines()
        if line.strip()
    ]
    by_task = {e["task_type"]: e for e in envs}
    assert by_task["object_count"]["dataset"] == "fixture"
    assert by_task["object_count"]["total_questions"] > 0
    assert "generated_date" in by_task["object_3d_size"]
