"""Deduplication operators for LLM-corpus pipelines (scale extensions per
SURVEY §7.1 step 7; the reference's only dedupe is first-per-group J7/W2).

Scale design (the point of each operator):

- **exact**: one md5 per doc, one groupBy — the cheap first pass. At 100 TB
  the shuffle carries (fingerprint, id) only, never the text.
- **MinHash + LSH**: signatures are per-row column math (no shuffle);
  banding explodes k/r rows per doc; the bucket join only pairs docs that
  collide in ≥1 band → candidate count ≈ O(near-dups), not O(n²). Exact
  Jaccard verifies candidates. This is the standard web-dedup pipeline
  (Broder '97 resemblance / MMDS ch.3) expressed as DataFrame ops.
- **SimHash**: 32 conditional-sum aggregates per doc after one explode —
  fingerprint closeness (hamming) finds near-dups; here we emit the
  fingerprint and group exact-collisions.
- **n-gram Jaccard**: the verify kernel as a standalone blocked operator.
- **embedding cosine**: blocked exact pairing on integer-scaled dot
  products (unit vectors → dot = cosine).

Every operator takes/returns DataFrames and composes with any source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    doc_fingerprint,
    hash32,
    seeded_hash60,
    tokens,
    word_shingles,
)

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group by canonical fingerprint; keep min-id winner per group.

    Returns (fingerprint, keep_id, n_dups) for groups of size > 1 —
    the delete-list of a dedup pass.
    """
    return (
        df.select(F.col(id_col).alias("doc_id"), doc_fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("group_size"))
        .filter(F.col("group_size") > 1)
        .select("fp", "keep_id", (F.col("group_size") - 1).alias("n_dups"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(shingles: Column, k: int = 12) -> Column:
    """k-permutation MinHash over a shingle array as one nested-lambda
    column expression: sig[j] = min over shingles of hash60(j ':' s).
    Runs entirely in codegen — no shuffle, no UDF."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda j: F.array_min(F.transform(shingles, lambda s: seeded_hash60(j, s))),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact-Jaccard verify.

    Pipeline: shingle → k-minhash → split signature into ``bands`` bands of
    r = k/bands rows → md5(band) bucket key → self-join on (band, bucket)
    → distinct candidate pairs → verify with exact Jaccard ≥ threshold.

    With k=12, b=4, r=3 the S-curve midpoint is (1/4)^(1/3) ≈ 0.63, so
    0.8-similar pairs collide with ~97% probability while <0.3 pairs
    almost never do: candidate volume stays O(near-dups) at corpus scale.
    """
    r = k // bands
    assert bands * r == k, "k must divide into equal bands"

    sh = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(tokens(F.col(text_col)), n).alias("sh"),
    ).filter(F.size("sh") > 0)
    sig = sh.withColumn("sig", minhash_signature(F.col("sh"), k))

    # band index b → bucket key = md5 of that signature slice
    banded = sig.select(
        "doc_id",
        "sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.md5(
                        F.array_join(
                            F.slice(F.col("sig"), b * r + 1, r).cast("array<string>"), ","
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = banded.alias("a")
    b = banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return (
        cands.withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_fingerprints(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32
) -> DataFrame:
    """Per-doc SimHash fingerprint (Charikar '02): tokens vote ±1 on each
    bit of their hash; the sign pattern is the fingerprint.

    One explode + one groupBy with ``bits`` conditional sums — a single
    shuffle on doc_id carrying only (doc_id, token-hash)."""
    tok = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", hash32(F.col("tok")))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    fp: Column = F.lit(0).cast("long")
    for j in range(bits):
        fp = fp + F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(0)
    return agg.select("doc_id", fp.alias("simhash"))


# ---------------------------------------------------------------------------
# Blocked n-gram Jaccard
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    block_cols: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All-pairs exact n-gram Jaccard within blocking-key groups.

    The blocking key bounds the quadratic term: pairs only form inside a
    block (here e.g. (lang, source)), so cost is Σ|block|², not |corpus|².
    For unblockable corpora use minhash_lsh_pairs instead.
    """
    sh = df.select(
        *[F.col(c) for c in block_cols],
        F.col(id_col).alias("doc_id"),
        word_shingles(tokens(F.col(text_col)), n).alias("sh"),
    ).filter(F.size("sh") > 0)
    a = sh.alias("a")
    b = sh.alias("b")
    cond = (F.col("a.doc_id") < F.col("b.doc_id"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        a.join(b, cond)
        .withColumn("jaccard", inter.cast("double") / union.cast("double"))
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            "jaccard",
        )
    )


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    df: DataFrame,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    scale: int = 10**4,
) -> DataFrame:
    """Near-identical embedding pairs by cosine within a blocking key.

    Components are scaled to integers so the dot product is exact BIGINT
    arithmetic (deterministic under any partitioning; also how a fixed-point
    SIMD kernel would do it). Unit-norm inputs → dot == cosine.
    """
    v = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("vid"),
        F.transform(
            F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("long")
        ).alias("iv"),
    )
    a = v.alias("a")
    b = v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.iv"), F.col("b.iv"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.vid") < F.col("b.vid")))
        .withColumn("cosine", dot.cast("double") / float(scale * scale))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            "cosine",
        )
    )
