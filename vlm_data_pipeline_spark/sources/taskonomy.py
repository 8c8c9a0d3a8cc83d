"""Taskonomy ingest adapter (SURVEY §2.1 S8/S10, §2.4 J10, §2.9 F7).

The reference (data_processing/taskonomy_processor.py) walks
``point_<P>_view_<V>_*`` files, decodes 16-bit depth PNGs and instance/
semantic masks with PIL/cv2, unprojects depth to a point cloud, takes the
AABB of each instance's pixels, and assigns each instance the modal
semantic class of its mask pixels (``bincount.argmax``).

Spark-first:
- File listing as a table (S10): ``binaryFile`` scan + one regexp pulls
  (point, view, modality) out of each filename — no driver-side globbing.
- Pixel decode (S8/F7) is an injectable ``mapInPandas`` stage emitting a
  *relational* pixel-derived table (instance_id, sem_class, pixel counts,
  bbox) — PIL/cv2 are optional deps, absent here, so the default parser
  raises NotImplementedError and tests inject a deterministic fake.
- The modal-class assignment (J10) is pure DataFrame: groupBy + max_by
  with deterministic tie-break — partial aggregation makes it one shuffle
  however many billions of pixels feed it.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "list_view_files",
    "INSTANCE_PIXELS",
    "read_instance_pixels",
    "dominant_semantic_class",
    "pixel_aabb_boxes",
]


def list_view_files(spark: SparkSession, pattern: str, glob: str = "*.png") -> DataFrame:
    """S10: directory tree → (path, point_id, view_id, modality) table.

    Filename convention ``point_<P>_view_<V>_domain_<modality>.png``
    (taskonomy_processor.py:424-447). Listing distributes with the
    binaryFile source; only metadata columns are selected so file contents
    are not read until a decode stage asks for them.
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(pattern)
        .select("path", "length")
    )
    return files.select(
        "path",
        "length",
        F.regexp_extract(F.col("path"), r"point_(\d+)_view_(\d+)", 1)
        .cast("int")
        .alias("point_id"),
        F.regexp_extract(F.col("path"), r"point_(\d+)_view_(\d+)", 2)
        .cast("int")
        .alias("view_id"),
        F.regexp_extract(F.col("path"), r"domain_([a-z0-9_]+)\.", 1).alias("modality"),
    )


INSTANCE_PIXELS = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("instance_id", T.IntegerType(), False),
        T.StructField("sem_class", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("x_min", T.IntegerType()),
        T.StructField("y_min", T.IntegerType()),
        T.StructField("x_max", T.IntegerType()),
        T.StructField("y_max", T.IntegerType()),
    ]
)


def _default_mask_parser(path: str, content: bytes) -> list[dict[str, Any]]:
    try:
        import PIL  # noqa: F401
    except ImportError as exc:  # pragma: no cover - PIL not in this container
        raise NotImplementedError(
            "Mask decoding needs PIL/cv2 (not installed in this environment). "
            "Inject a parser via read_instance_pixels(..., parser=...); the "
            "binaryFile fan-out and the relational (instance, class, count, "
            "bbox) contract are fully wired."
        ) from exc
    raise NotImplementedError  # pragma: no cover


def read_instance_pixels(
    spark: SparkSession,
    pattern: str,
    parser: Callable[[str, bytes], list[dict[str, Any]]] | None = None,
) -> DataFrame:
    """S8/F7: mask files → per-(instance, semantic-class) pixel summaries.

    The parser contract asks the decode stage to pre-reduce each mask to
    (instance_id, sem_class) → (count, pixel AABB) *inside* the UDF — the
    map-side combine the reference does with np.bincount
    (taskonomy_processor.py:307-329) — so executors ship kilobytes, not
    megapixel masks, into the shuffle.
    """
    parse = parser or _default_mask_parser

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in INSTANCE_PIXELS.fields]
        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse(path, content))
            yield pd.DataFrame(rows, columns=cols)

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .option("recursiveFileLookup", "true")
        .load(pattern)
        .select("path", "content")
    )
    return binary.mapInPandas(decode, schema=INSTANCE_PIXELS)


def dominant_semantic_class(pixels: DataFrame) -> DataFrame:
    """J10: per instance, the modal semantic class
    (``bincount.argmax``, taskonomy_processor.py:307-324).

    groupBy + max_by(struct) — ties break toward the smaller class id so
    results are deterministic (np.argmax's first-wins, same outcome).
    """
    per_class = pixels.groupBy("path", "instance_id", "sem_class").agg(
        F.sum("n_pixels").alias("n_pixels")
    )
    return per_class.groupBy("path", "instance_id").agg(
        F.max_by(
            F.col("sem_class"),
            F.struct(
                F.col("n_pixels").alias("n"),
                (-F.col("sem_class")).alias("neg_class"),
            ),
        ).alias("sem_class"),
        F.sum("n_pixels").alias("n_pixels"),
    )


def pixel_aabb_boxes(pixels: DataFrame, min_side: int = 5, min_area: int = 100) -> DataFrame:
    """F7 tail: instance AABB over all its pixel tiles + the reference's 2D
    validity predicates (box > 5×5 px, area ≥ 100 px²,
    taskonomy_processor.py:334-353)."""
    agg = pixels.groupBy("path", "instance_id").agg(
        F.min("x_min").alias("x_min"),
        F.min("y_min").alias("y_min"),
        F.max("x_max").alias("x_max"),
        F.max("y_max").alias("y_max"),
        F.sum("n_pixels").alias("area_px"),
    )
    return agg.filter(
        (F.col("x_max") - F.col("x_min") > min_side)
        & (F.col("y_max") - F.col("y_min") > min_side)
        & (F.col("area_px") >= min_area)
    )
