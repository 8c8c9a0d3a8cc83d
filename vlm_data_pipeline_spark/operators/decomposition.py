"""Distributed PCA over embedding columns — the standard
dimensionality-reduction step before clustering/ANN in corpus pipelines
(SemDeDup and friends run k-means in a PCA/whitened space).

Scale shape (the driver-coordinated closed-form pattern, like the
KMeans/PQ trainers):

- FIT is one aggregation: each row expands its d-vector to the
  d·(d+1)/2 upper-triangle outer products IN-ROW (plus the d means),
  posexplodes, and partial-aggregates — map-side combine collapses
  every partition to at most d·(d+1)/2 + d rows before the shuffle, so
  the exchange carries O(d²) keys REGARDLESS of corpus size (d=64 →
  2 080 keys). The eigendecomposition of the assembled d×d covariance
  runs on the driver with numpy — a d×d problem, not an n×d one.
- PROJECT is zero-shuffle: the k×d component matrix rides the plan as
  literal arrays (k·d doubles — dimension-sized by construction) and
  each row computes k in-row dot products via fold.

Sign convention: each component is flipped so its
largest-absolute-value coordinate is positive — eigenvectors are
sign-ambiguous, and a deterministic convention makes fits reproducible
across runs/partitionings (variance order ties break toward the lower
eigen index from numpy's ascending-order eigh).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class PCAModel:
    mean: tuple[float, ...]
    components: tuple[tuple[float, ...], ...]  # k rows of d
    explained_variance: tuple[float, ...]  # k eigenvalues, descending
    n: int


def _tri_index_pairs(d: int) -> list[tuple[int, int]]:
    return [(i, j) for i in range(d) for j in range(i, d)]


def scatter_upper_triangle(
    embeddings: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """(idx, s) rows of the un-centered scatter matrix Σ v·vᵀ (upper
    triangle, row-major triangle indexing) plus the component sums —
    the distributed core of the fit, exposed separately so it can be
    value-checked. Exchange carries ≤ d·(d+1)/2 rows per partition
    after map-side combine."""
    v = F.col(vec_col)
    d = F.size(v)
    tri = F.flatten(
        F.transform(
            F.sequence(F.lit(0), d - 1),
            lambda i: F.transform(
                F.sequence(i, d - 1),
                lambda j: (
                    F.element_at(v, i + 1).cast("double")
                    * F.element_at(v, j + 1).cast("double")
                ),
            ),
        )
    )
    return (
        embeddings.filter(v.isNotNull())
        .select(F.posexplode(tri).alias("idx", "p"))
        .groupBy("idx")
        .agg(F.sum("p").alias("s"))
    )


def pca_fit(
    embeddings: DataFrame, vec_col: str = "embedding", k: int = 8
) -> PCAModel:
    """Fit PCA: ONE combined aggregation — each row expands to its
    d·(d+1)/2 upper-triangle products FOLLOWED by its d raw
    coordinates, so the scatter matrix and the mean sums ride the same
    posexplode/groupBy pass (one corpus scan, and the moments provably
    describe the same row set even over non-deterministic inputs like
    upstream samples) — then driver numpy eigh of the d×d covariance.
    ``k`` caps at d."""
    if k < 1:
        raise ValueError("k must be >= 1")
    v = F.col(vec_col)
    base = embeddings.filter(v.isNotNull())
    d_col = F.size(v)
    combined = F.concat(
        F.flatten(
            F.transform(
                F.sequence(F.lit(0), d_col - 1),
                lambda i: F.transform(
                    F.sequence(i, d_col - 1),
                    lambda j: (
                        F.element_at(v, i + 1).cast("double")
                        * F.element_at(v, j + 1).cast("double")
                    ),
                ),
            )
        ),
        F.transform(v, lambda x: x.cast("double")),
    )
    stats = (
        base.select(F.posexplode(combined).alias("idx", "x"))
        .groupBy("idx")
        .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
        .orderBy("idx")
        .collect()
    )
    if not stats:
        raise ValueError("no embeddings to fit")
    # total entries = d(d+1)/2 + d = d(d+3)/2  ->  solve for d
    m = len(stats)
    d = int(round((-3 + (9 + 8 * m) ** 0.5) / 2))
    # the expansion derives d per ROW (F.size) — mixed vector lengths
    # would silently collide slots; with consistent dims the entry
    # count matches the closed form and every index has count n exactly
    if d * (d + 3) // 2 != m or len({int(r["n"]) for r in stats}) != 1:
        raise ValueError(
            "inconsistent embedding dimensions across rows — "
            "normalize the vector column first"
        )
    n = int(stats[0]["n"])
    if n < 2:
        raise ValueError("need at least 2 vectors to fit a covariance")
    n_tri = d * (d + 1) // 2
    mean = np.array([r["s"] for r in stats[n_tri:]]) / n
    scatter = np.zeros((d, d))
    pairs = _tri_index_pairs(d)
    for r in stats[:n_tri]:
        i, j = pairs[r["idx"]]
        scatter[i, j] = r["s"]
        scatter[j, i] = r["s"]
    cov = (scatter - n * np.outer(mean, mean)) / (n - 1)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(-eigvals, kind="stable")[: min(k, d)]
    comps = []
    for idx in order:
        vec = eigvecs[:, idx]
        if vec[int(np.argmax(np.abs(vec)))] < 0:
            vec = -vec
        comps.append(tuple(float(x) for x in vec))
    return PCAModel(
        mean=tuple(float(x) for x in mean),
        components=tuple(comps),
        explained_variance=tuple(float(eigvals[i]) for i in order),
        n=n,
    )


def pca_project(
    embeddings: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Append the k-dim projection (v − mean)·Wᵀ as ``out_col`` —
    zero shuffle, the k×d matrix and mean as plan literals
    (dimension-sized; a d=1024, k=64 model is 65k doubles — still far
    under literal-plan limits, and constant in corpus size)."""
    v = F.col(vec_col)
    mean_lit = F.array(*[F.lit(m) for m in model.mean])

    def dot(component: tuple[float, ...]) -> Column:
        comp_lit = F.array(*[F.lit(c) for c in component])
        return F.aggregate(
            F.zip_with(
                F.zip_with(v, mean_lit, lambda x, m: x.cast("double") - m),
                comp_lit,
                lambda c, w: c * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    return embeddings.withColumn(
        out_col, F.array(*[dot(c) for c in model.components])
    )
