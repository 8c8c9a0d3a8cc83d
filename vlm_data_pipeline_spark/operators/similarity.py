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


def ivf_index(
    corpus: DataFrame,
    n_lists: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """IVF coarse quantizer: KMeans centroids + per-vector list assignment.

    The scale path for ANN beyond LSH: k-means cluster the corpus once
    (pyspark.ml, distributed), store each vector with its inverted-list id.
    Returns (assigned DataFrame with ``list_id``, centroid table DataFrame).
    Centroids are a tiny dimension (n_lists × d) — always broadcast.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_lists, seed=seed, maxIter=20).fit(feat)
    assigned = (
        model.transform(feat)
        .withColumnRenamed("prediction", "list_id")
        .select(id_col, vec_col, "list_id")
    )
    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "list_id int, centroid array<double>",
    )
    return assigned, centroids


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: probe the ``nprobe`` nearest inverted lists per query,
    exact-rerank inside them.

    Cost vs brute force ≈ nprobe/n_lists of the corpus per query; recall
    grows with nprobe (nprobe=n_lists degenerates to exact). The KMeans fit
    is the one iterative (non-SQL-expressible) step, so the driver check
    for this operator is rows-only; recall is pinned against
    brute_force_topk in tests.
    Returns (query_id, neighbor_id, cosine, rank).
    """
    assigned, centroids = ivf_index(corpus, n_lists, seed, id_col, vec_col)

    # nearest nprobe centroids per query — centroid dim is tiny: broadcast
    qd = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qraw")
    )
    cdist = qd.crossJoin(F.broadcast(centroids)).withColumn(
        "dist2",
        F.aggregate(
            F.zip_with(
                F.col("qraw").cast("array<double>"),
                F.col("centroid"),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    wq = W.partitionBy("query_id").orderBy(F.col("dist2").asc(), F.col("list_id").asc())
    probes = (
        cdist.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "list_id", _int_vec(F.col("qraw")).alias("qv"))
    )

    c = assigned.select(
        F.col(id_col).alias("neighbor_id"), _int_vec(F.col(vec_col)).alias("cv"), "list_id"
    )
    scored = (
        c.join(F.broadcast(probes), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("qv"), F.col("cv")).cast("double") / float(SCALE * SCALE),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    # each corpus vector lives in exactly one list and each (query, list)
    # probe is unique, so (query, neighbor) pairs are already distinct
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_ann_fixed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame | None = None,
    k: int = 5,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN with a DETERMINISTIC coarse quantizer: caller-supplied (or
    corpus-seeded) centroids instead of the iterative KMeans fit — same
    inverted-list probe + exact in-list rerank as :func:`ivf_ann_topk`,
    but reproducible end-to-end in plain SQL, so the driver can VALUE-
    check this variant (the KMeans path stays rows-only and remains the
    production default when trained centroids exist).

    Determinism choices, both load-bearing:

    - centroids default to the embeddings of the ``n_lists`` LOWEST-ID
      corpus vectors (any engine can re-derive that set);
    - assignment/probing order by INTEGER-scaled squared L2 (the dedup.py
      integer-cosine rationale): exact arithmetic in any engine, no
      last-ulp float ties deciding list membership.

    Scale shape: centroids are dimension-sized → collected to ONE array
    literal; every corpus vector argmins its list IN-ROW (zero shuffle —
    the scan scales with splits); probes explode nprobe rows per query
    and broadcast into the inverted lists; only the final per-query
    top-k windows.
    """
    from ..functions.text import let

    if centroids is None:
        centroids = (
            corpus.orderBy(F.col(id_col).asc())
            .limit(n_lists)
            .select(F.col(id_col), F.col(vec_col))
        )
    cent_rows = sorted(centroids.collect(), key=lambda r: r[0])
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(i).alias("list_id"),
                _int_vec(
                    F.array(*[F.lit(float(x)) for x in r[1]])
                ).alias("civ"),
            )
            for i, r in enumerate(cent_rows)
        ]
    )

    def d2(iv: Column, civ: Column) -> Column:
        return F.aggregate(
            F.zip_with(iv, civ, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    def cent_ranking(iv: Column) -> Column:
        """array<struct<d2, list_id>> sorted ascending — exact ints."""
        return F.array_sort(
            F.transform(
                cent_arr,
                lambda e: F.struct(
                    d2(iv, e["civ"]).alias("d"), e["list_id"].alias("list_id")
                ),
            )
        )

    assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _int_vec(F.col(vec_col)).alias("cv"),
    ).withColumn(
        "list_id", let(F.col("cv"), lambda iv: cent_ranking(iv)[0]["list_id"])
    )
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"), _int_vec(F.col(vec_col)).alias("qv")
        )
        .withColumn(
            "pl",
            F.explode(
                let(F.col("qv"), lambda iv: F.slice(cent_ranking(iv), 1, nprobe))
            ),
        )
        .select("query_id", "qv", F.col("pl.list_id").alias("list_id"))
    )
    scored = (
        assigned.join(F.broadcast(probes), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("qv"), F.col("cv")).cast("double") / float(SCALE * SCALE),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
