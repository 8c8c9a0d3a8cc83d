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


def train_bigram_lm(
    corpus: DataFrame, text_col: str = "text"
) -> BigramLM:
    """One distributed counts pass (explode → groupBy, the only shuffle —
    training-time, not scoring-time), collected to the driver: counts are
    vocab-bounded, the dimension-table contract every broadcast in this
    repo relies on."""
    toks = corpus.select(tokens(F.col(text_col)).alias("t"))
    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .count()
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
        .collect()
    )
    unigrams = {r.w: r["count"] for r in uni}
    return BigramLM(
        unigrams=unigrams,
        bigrams={r.b: r["count"] for r in bi},
        vocab_size=len(unigrams),
    )


def mean_neg_log_prob(text: Column, model: BigramLM) -> Column:
    """Per-document mean negative log-probability under the bigram model —
    the (log-)perplexity proxy CCNet buckets on; lower = more fluent.
    NULL for documents with fewer than 2 tokens.

    In-row: two map-literal lookups per token pair inside one fold —
    no explode, no join, no shuffle.
    """
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
