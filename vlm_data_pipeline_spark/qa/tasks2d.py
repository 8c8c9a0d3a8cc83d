"""The four 2D QA tasks as DataFrame transforms
(QA_generation/tasks/tasks_2d/*; 2D boxes in the Taskonomy corner encoding,
normalized by functions.geometry.bbox2d_*)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import detrandom as R
from ..functions import geometry as G
from .base import (
    category_count_entries,
    finalize,
    first_box_per_category,
    meta,
    parse_class_category,
)


def _first_per_category_2d(frames: DataFrame) -> DataFrame:
    """In-row first-box-per-category over the 2D boxes (zero shuffle)."""
    return first_box_per_category(frames, "bounding_boxes_2d", ())

P_COUNT2D = {"min_objects": 1, "max_objects": 20}
P_COUNT_MC = {"min_count": 2, "num_options": 4, "offset": (-3, 3)}
P_BBOX_SIZE = {"num_options": 4, "min_area": 100, "pct": (0.5, 1.8)}
P_OBJ_SIZE = {"min_area": 100, "decimals": 1}


def object_count_2d(frames: DataFrame) -> DataFrame:
    """Total-count question per frame, bounded 1–20 objects; single-category
    frames ask category-specific (tasks_2d/object_count_2d_qa.py:55-92)."""
    entries = category_count_entries(F.col("bounding_boxes_2d"))
    stage = frames.select(
        "dataset", "image_id", entries.alias("entries")
    ).filter(F.size("entries") > 0)
    top = F.array_sort(
        F.transform(
            F.col("entries"),
            lambda e: F.struct((-e["cnt"]).alias("neg"), e["rcat"].alias("rcat")),
        )
    )[0]
    per_frame = stage.select(
        "dataset",
        "image_id",
        F.aggregate(
            F.col("entries"), F.lit(0).cast("long"), lambda a, e: a + e["cnt"]
        ).alias("total"),
        F.size("entries").cast("long").alias("n_cats"),
        top["rcat"].alias("only_cat"),
    ).filter(
        F.col("total").between(P_COUNT2D["min_objects"], P_COUNT2D["max_objects"])
    )
    specific = F.col("n_cats") == 1
    question = F.when(
        specific,
        F.format_string("How many %ss are visible in this image?", F.col("only_cat")),
    ).otherwise(F.lit("How many objects are visible in this image?"))
    md = meta(
        image_id=F.col("image_id"),
        question_type=F.when(specific, "category_specific").otherwise("total_count"),
        unit=F.lit("count"),
    )
    return finalize(
        per_frame,
        "object_count_2d",
        ["image_id"],
        question,
        F.col("total"),
        "numerical",
        md,
    )


def object_count_mc(frames: DataFrame) -> DataFrame:
    """Category-count multiple choice: one question per (frame, category)
    with ≥ min_count instances; integer-offset distractors, floor 1
    (tasks_2d/object_count_qa.py:44-95)."""
    entries = category_count_entries(
        F.col("bounding_boxes_2d"), min_count=P_COUNT_MC["min_count"]
    )
    counts = frames.select(
        "dataset", "image_id", F.explode(entries).alias("e")
    ).select(
        "dataset",
        "image_id",
        F.col("e.rcat").alias("rcat"),
        F.col("e.cnt").alias("cnt"),
    )
    raw = R.offset_distractors(
        F.col("cnt").cast("double"),
        P_COUNT_MC["num_options"],
        *P_COUNT_MC["offset"],
        F.col("image_id"),
        F.lit("count_mc"),
        F.col("rcat"),
    )
    # max(1, int(round(opt))) per reference
    opts = F.transform(
        raw, lambda o: F.greatest(F.lit(1), F.round(o).cast("int"))
    )
    mc = R.multiple_choice(opts, F.col("image_id"), F.lit("cmc"), F.col("rcat"))
    withmc = counts.withColumn("mc", mc)
    md = meta(
        image_id=F.col("image_id"),
        category=F.col("rcat"),
        correct_count=F.col("cnt"),
        answer_value=F.col("mc.answer_value"),
        unit=F.lit("count"),
    )
    return finalize(
        withmc,
        "object_count",
        ["image_id", "rcat"],
        F.format_string("How many %s are there in this image?", F.col("rcat")),
        F.col("mc.answer"),
        "multiple_choice",
        md,
        options=F.col("mc.options"),
    )


def bbox_2d_size(frames: DataFrame) -> DataFrame:
    """Bounding-box area multiple choice, ≥ 100 px², percent distractors
    0.5–1.8×, integer-rounded options (tasks_2d/bbox_2d_size_qa.py:44-100)."""
    first = _first_per_category_2d(frames)
    sized = first.withColumn("area", G.bbox2d_area(F.col("box"))).filter(
        F.col("area") >= P_BBOX_SIZE["min_area"]
    )
    raw = R.percent_distractors(
        F.col("area"),
        P_BBOX_SIZE["num_options"],
        *P_BBOX_SIZE["pct"],
        0,
        F.col("image_id"),
        F.lit("bbox2d"),
        F.col("box.category"),
    )
    opts = F.transform(raw, lambda o: F.round(o).cast("int"))
    mc = R.multiple_choice(opts, F.col("image_id"), F.lit("b2s"), F.col("box.category"))
    withmc = sized.withColumn("mc", mc).withColumn(
        "rcat", parse_class_category(F.col("box.category"))
    )
    md = meta(
        image_id=F.col("image_id"),
        category=F.col("box.category"),
        correct_area=F.round(F.col("area")).cast("int"),
        answer_value=F.col("mc.answer_value"),
        unit=F.lit("square_pixels"),
    )
    return finalize(
        withmc,
        "bbox_2d_size",
        ["image_id", "pos"],
        F.format_string(
            "What is the area (in square pixels) of the bounding box for the %s?",
            F.col("rcat"),
        ),
        F.col("mc.answer"),
        "multiple_choice",
        md,
        options=F.col("mc.options"),
    )


def object_2d_size(frames: DataFrame) -> DataFrame:
    """Width/height/area numerical question, deterministic aspect draw,
    ≥ 100 px² (tasks_2d/object_2d_size_qa.py:55-100)."""
    first = _first_per_category_2d(frames)
    dims = (
        first.withColumn("xywh", G.bbox2d_xywh(F.col("box")))
        .withColumn("area", G.bbox2d_area(F.col("box")))
        .filter(F.col("area") >= P_OBJ_SIZE["min_area"])
        .withColumn("rcat", parse_class_category(F.col("box.category")))
    )
    aspect_idx = R.randint(
        0, 2, F.col("image_id"), F.lit("2dsize"), F.col("box.category")
    )
    question = (
        F.when(
            aspect_idx == 0,
            F.format_string(
                "What is the width of the %s bounding box in pixels?", F.col("rcat")
            ),
        )
        .when(
            aspect_idx == 1,
            F.format_string(
                "What is the height of the %s bounding box in pixels?", F.col("rcat")
            ),
        )
        .otherwise(
            F.format_string(
                "What is the area of the %s bounding box in pixels?", F.col("rcat")
            )
        )
    )
    answer = F.round(
        F.when(aspect_idx == 0, F.col("xywh.w"))
        .when(aspect_idx == 1, F.col("xywh.h"))
        .otherwise(F.col("area")),
        P_OBJ_SIZE["decimals"],
    )
    md = meta(
        image_id=F.col("image_id"),
        category=F.col("box.category"),
        aspect=F.when(aspect_idx == 0, "width")
        .when(aspect_idx == 1, "height")
        .otherwise("area"),
        unit=F.lit("pixels"),
    )
    return finalize(
        dims,
        "object_2d_size",
        ["image_id", "pos"],
        question,
        answer,
        "numerical",
        md,
    )
