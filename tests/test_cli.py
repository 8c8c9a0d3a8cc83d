"""CLI entry points (__main__.py): every subcommand end-to-end over
fixture data — the switch-from-the-reference usability surface."""

from __future__ import annotations

from tests.fixtures import fixture_frames
from vlm_data_pipeline_spark.__main__ import main


def test_cli_qa_and_summary(spark, tmp_path):
    src = str(tmp_path / "frames")
    fixture_frames(spark).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "qa_out")
    assert main(["qa", "--frames", src, "--out", out, "--cpus", "4",
                 "--tasks", "object_count", "cam_obj_distance"]) == 0
    pairs = spark.read.json(f"{out}/pairs")
    assert pairs.count() > 0
    assert set(pairs.select("task").distinct().toPandas()["task"]) == {
        "object_count", "cam_obj_distance",
    }
    assert main(["summary", "--frames", src, "--cpus", "4"]) == 0


def test_cli_clean(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "the data pipeline reads the parquet files quickly today ok"),
            (2, "hi"),  # quality-filtered
            (3, "the data pipeline reads the parquet files quickly today ok"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(src)
    out = str(tmp_path / "clean_out")
    assert main(["clean", "--docs", src, "--out", out, "--cpus", "4",
                 "--jaccard", "0.8", "--scrub-pii"]) == 0
    kept = spark.read.parquet(f"{out}/clean")
    # doc 2 fails quality; docs 1/3 are near-dups -> min id survives
    assert sorted(r.doc_id for r in kept.collect()) == [1]
