"""Approximate-nearest-neighbor search over embedding columns (scale
extension per SURVEY §7.1 step 7; BASELINE.json north star).

Two tiers:

- **brute-force top-k**: exact cosine against every corpus vector. The
  query side is tiny → broadcast; the corpus streams. O(|Q|·|C|·d) but
  embarrassingly parallel and shuffle-free until the final per-query top-k.
  This is the correctness baseline every ANN variant is measured against.
- **hyperplane LSH (SRP)**: sign-of-dot against ``planes`` deterministic
  pseudo-random hyperplanes → bucket id (Charikar SRP). Candidates = same
  bucket; exact rerank inside the bucket. At corpus scale the bucket join
  replaces the full cross product with O(collisions); recall tunes with
  planes/tables.

Dot products use integer-scaled exact arithmetic (see dedup.py rationale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.text import hash32

SCALE = 10**4


def _int_vec(vec_col: Column) -> Column:
    return F.transform(vec_col, lambda x: F.round(x.cast("double") * SCALE).cast("long"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for every query vector.

    Returns (query_id, neighbor_id, cosine, rank). Self-matches excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _int_vec(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _int_vec(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine", _dot(F.col("qv"), F.col("cv")).cast("double") / float(SCALE * SCALE)
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def srp_bucket(vec_col: Column, dim: int, planes: int = 8) -> Column:
    """Signed-random-projection bucket id from deterministic hyperplanes.

    Plane p, component i has weight (hash32('p_i') % 2001 - 1000)/1000 ∈
    [-1, 1] — reproducible anywhere (including the SQL oracle) without
    shipping a matrix. bucket = Σ_p (dot(v, plane_p) > 0) << p.
    """
    iv = _int_vec(vec_col)

    def plane_weight(p: Column, i: Column) -> Column:
        return (
            hash32(F.concat(p.cast("string"), F.lit("_"), i.cast("string"))) % 2001 - 1000
        )

    def plane_dot(p: Column) -> Column:
        # Σ_i iv[i] * w[p][i] — exact BIGINT
        return F.aggregate(
            F.zip_with(
                iv,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: x * plane_weight(p, i),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    bucket: Column = F.lit(0).cast("long")
    # unrolled in the plan: `planes` independent exact dot products
    for p in range(planes):
        bucket = bucket + F.when(plane_dot(F.lit(p)) > 0, F.lit(1 << p)).otherwise(0)
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: SRP bucket join, then exact rerank inside the bucket.

    Recall < 1 by construction (single table); raise ``planes`` for purer
    buckets or add OR-tables (union of several bucket joins) for recall.
    Returns (query_id, neighbor_id, cosine, rank) like brute_force_topk.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _int_vec(F.col(vec_col)).alias("qv"),
        srp_bucket(F.col(vec_col), dim, planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _int_vec(F.col(vec_col)).alias("cv"),
        srp_bucket(F.col(vec_col), dim, planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine", _dot(F.col("qv"), F.col("cv")).cast("double") / float(SCALE * SCALE)
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
