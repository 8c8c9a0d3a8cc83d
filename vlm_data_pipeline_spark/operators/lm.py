"""N-gram language-model scoring for corpus quality filtering (the
CCNet/Wenzek et al. 2020 pattern: score every document with a small LM,
filter or stratify on perplexity).

Scale design: production CCNet ships a pretrained KenLM binary to every
worker — the broadcast-model pattern. Here the model is a bigram
add-one-smoothed LM whose counts are map LITERALS on the plan (vocab- and
vocab²-bounded by construction — real deployments prune exactly so the
model stays shippable), and scoring is an in-row fold over each
document's own token pairs: ZERO shuffle at any corpus size, exactly like
the repetition/quality signals. Training is one counts aggregation over a
(reference) corpus, collected to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import let, tokens


@dataclass(frozen=True)
class BigramLM:
    """Add-one-smoothed bigram model: P(w2|w1) = (c12 + 1) / (c1 + V)."""

    unigrams: dict[str, int]
    bigrams: dict[str, int]  # key = "w1\x1fw2"
    vocab_size: int


DEFAULT_MAX_VOCAB = 65_536
DEFAULT_MAX_BIGRAMS = 262_144


def train_bigram_lm(
    corpus: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
    max_vocab: int = DEFAULT_MAX_VOCAB,
    max_bigrams: int = DEFAULT_MAX_BIGRAMS,
    sample_fraction: float | None = None,
) -> BigramLM:
    """One distributed counts pass (explode → groupBy, the only shuffle —
    training-time, not scoring-time), collected to the driver.

    Raw web text has UNBOUNDED unigram/bigram vocabulary, so the collect
    is hard-capped: counts below ``min_count`` are dropped and only the
    top ``max_vocab`` unigrams / ``max_bigrams`` bigrams by count (ties →
    lexicographically-first) ship to the driver — the distributed top-K
    (TakeOrderedAndProject) runs BEFORE the collect, so driver memory is
    bounded by the caps, never by the corpus. CCNet additionally trains
    on a bounded reference sample; ``sample_fraction`` applies a
    deterministic (seed=0) row sample first. ``vocab_size`` (the
    add-one-smoothing V) is the RETAINED vocabulary size, mirroring
    whatever pruning was applied.
    """
    if sample_fraction is not None:
        corpus = corpus.sample(fraction=sample_fraction, seed=0)
    toks = corpus.select(tokens(F.col(text_col)).alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .count()
        .filter(F.col("count") >= min_count)
        .orderBy(F.col("count").desc(), F.col("w").asc())
        .limit(max_vocab)
        .collect()
    )
    bi = (
        toks.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> concat(t[i - 1], chr(31), t[i]))"
                )
            ).alias("b")
        )
        .groupBy("b")
        .count()
        .filter(F.col("count") >= min_count)
        .orderBy(F.col("count").desc(), F.col("b").asc())
        .limit(max_bigrams)
        .collect()
    )
    unigrams = {r.w: r["count"] for r in uni}
    return BigramLM(
        unigrams=unigrams,
        bigrams={r.b: r["count"] for r in bi},
        vocab_size=len(unigrams),
    )


# Above this many count entries a create_map literal bloats the plan
# (Catalyst optimization time + driver memory grow with plan size); the
# broadcast-join path in score_corpus takes over.
MAP_LITERAL_LIMIT = 20_000


def mean_neg_log_prob(text: Column, model: BigramLM) -> Column:
    """Per-document mean negative log-probability under the bigram model —
    the (log-)perplexity proxy CCNet buckets on; lower = more fluent.
    NULL for documents with fewer than 2 tokens.

    In-row: two map-literal lookups per token pair inside one fold —
    no explode, no join, no shuffle. Only valid for SMALL models (the
    counts become plan literals): raises above MAP_LITERAL_LIMIT
    entries — use :func:`score_corpus`, which auto-selects the
    broadcast-join path for large models.
    """
    n_entries = len(model.unigrams) + len(model.bigrams)
    if n_entries > MAP_LITERAL_LIMIT:
        raise ValueError(
            f"model has {n_entries} count entries (> {MAP_LITERAL_LIMIT}): "
            f"a create_map plan literal this size blows up Catalyst — use "
            f"score_corpus(), which joins against broadcast count tables"
        )
    v = model.vocab_size
    uni_pairs: list[Column] = []
    for w, c in sorted(model.unigrams.items()):
        uni_pairs.append(F.lit(w))
        uni_pairs.append(F.lit(int(c)))
    bi_pairs: list[Column] = []
    for b, c in sorted(model.bigrams.items()):
        bi_pairs.append(F.lit(b))
        bi_pairs.append(F.lit(int(c)))
    uni_map = (
        F.create_map(*uni_pairs) if uni_pairs else F.lit(None).cast("map<string,int>")
    )
    bi_map = (
        F.create_map(*bi_pairs) if bi_pairs else F.lit(None).cast("map<string,int>")
    )

    def score(t: Column) -> Column:
        n = F.size(t)
        pair_lp = lambda i: F.log(  # noqa: E731 — ln((c12 + 1) / (c1 + V))
            (
                F.coalesce(
                    F.element_at(
                        bi_map,
                        F.concat(
                            F.element_at(t, i),
                            F.lit("\x1f"),
                            F.element_at(t, i + 1),
                        ),
                    ),
                    F.lit(0),
                )
                + 1
            ).cast("double")
            / (
                F.coalesce(F.element_at(uni_map, F.element_at(t, i)), F.lit(0)) + v
            ).cast("double")
        )
        total = F.aggregate(
            F.sequence(F.lit(1), n - 1),
            F.lit(0.0),
            lambda acc, i: acc - pair_lp(i),
        )
        return F.when(n >= 2, total / (n - 1).cast("double"))

    return let(tokens(text), score)


def score_corpus(
    docs: DataFrame,
    model: BigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "mean_nlp",
) -> DataFrame:
    """Score every document (≥ 2 tokens) → (id, ``out_col``), choosing the
    execution path by model size:

    - small model: the zero-shuffle in-row map-literal fold
      (:func:`mean_neg_log_prob`);
    - large model (> MAP_LITERAL_LIMIT count entries): explode each
      document's token pairs and LEFT-join the unigram/bigram count
      tables — both joins BROADCAST (the model is cap-bounded by
      ``train_bigram_lm``, i.e. dimension-sized), then one partial-agg
      groupBy(id) carrying only (id, partial sum, n). Identical scores
      (the same add-one formula), shuffle bounded by documents, never by
      the model.
    """
    if len(model.unigrams) + len(model.bigrams) <= MAP_LITERAL_LIMIT:
        return docs.select(
            F.col(id_col),
            mean_neg_log_prob(F.col(text_col), model).alias(out_col),
        ).filter(F.col(out_col).isNotNull())

    spark = docs.sparkSession
    uni_df = spark.createDataFrame(
        list(model.unigrams.items()), "w string, c_uni long"
    )
    bi_df = spark.createDataFrame(list(model.bigrams.items()), "b string, c_bi long")
    pairs = (
        docs.select(F.col(id_col), tokens(F.col(text_col)).alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.col(id_col),
            F.size("t").alias("n"),
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(t[i - 1] as w, "
                    "concat(t[i - 1], chr(31), t[i]) as b))"
                )
            ).alias("p"),
        )
        .select(id_col, "n", "p.w", "p.b")
    )
    v = model.vocab_size
    nlp = -F.log(
        (F.coalesce(F.col("c_bi"), F.lit(0)) + 1).cast("double")
        / (F.coalesce(F.col("c_uni"), F.lit(0)) + v).cast("double")
    )
    return (
        pairs.join(F.broadcast(bi_df), "b", "left")
        .join(F.broadcast(uni_df), "w", "left")
        .groupBy(id_col)
        .agg((F.sum(nlp) / (F.max("n") - 1).cast("double")).alias(out_col))
    )
