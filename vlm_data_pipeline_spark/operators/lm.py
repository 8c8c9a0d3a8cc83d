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


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich et al. 2016)
# ---------------------------------------------------------------------------


def _word_freqs(corpus: DataFrame, text_col: str, max_words: int) -> DataFrame:
    """(word, freq) over the corpus, capped to the ``max_words`` most
    frequent (deterministic tie-break by word) BEFORE any collect — the
    same shippability cap train_bigram_lm applies. BPE statistics ride
    on word frequencies, so the whole training loop only ever touches
    this dimension-sized table, never the corpus again."""
    return (
        corpus.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("w").asc())
        .limit(max_words)
    )


def symbol_pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, count) for adjacent SYMBOL pairs across the word table,
    weighted by word frequency — one BPE statistics pass as a pure
    DataFrame program: split each word into its current symbols
    (``syms`` array column), slide a 2-window in-row, explode, and
    aggregate with map-side partial combine. The shuffle carries
    (pair, partial count) only."""
    pairs = words.select(
        "freq",
        F.explode(
            F.when(
                F.size("syms") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("syms") - 2),
                    lambda i: F.struct(
                        F.element_at(F.col("syms"), i + 1).alias("a"),
                        F.element_at(F.col("syms"), i + 2).alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("freq").cast("long").alias("count")
    )


def _merge_syms(syms: Column, a: str, b: str) -> Column:
    """Apply ONE merge (a, b) → 'ab' to a symbol array, leftmost-greedy
    (the BPE rule: after 'a a' merges in 'a a a', the remaining 'a'
    cannot re-merge with the new 'aa' in the same step) — an in-row fold
    that either appends the symbol or fuses it with the accumulator's
    tail."""
    merged = F.lit(a + b)

    def step(acc: Column, s: Column) -> Column:
        can = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b))
            # element -1 must not itself be the RESULT of a merge this
            # step when a == b == ab-prefix ambiguity cannot arise: the
            # fused symbol 'ab' differs from 'a' unless b == '', which
            # tokens() never emits
        )
        return F.when(
            can,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.array_append(acc, s))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def train_bpe(
    corpus: DataFrame,
    num_merges: int,
    text_col: str = "text",
    max_words: int = DEFAULT_MAX_VOCAB,
) -> list[tuple[str, str]]:
    """Byte-pair-encoding merge table (Sennrich et al. 2016 §3.2) learned
    over the corpus: start from characters, repeatedly count adjacent
    symbol pairs (weighted by word frequency) and fuse the most frequent
    pair. Deterministic: ties break (count desc, a asc, b asc).

    Scale shape: ONE corpus aggregation builds the capped word-frequency
    table (the only corpus-sized work); each merge iteration is a
    pair-count aggregation + a 1-row argmax collect + an in-row merge
    fold over the WORD table (vocab-sized, persisted once) — the
    classic driver-coordinated iterative refinement, same pattern as
    the KMeans/PQ trainers. num_merges bounds the loop.
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    words = _word_freqs(corpus, text_col, max_words).select(
        "freq", F.split(F.col("w"), "(?!^)(?=.)").alias("syms")
    )
    words = words.persist()
    try:
        merges: list[tuple[str, str]] = []
        for _ in range(num_merges):
            best = (
                symbol_pair_counts(words)
                .orderBy(
                    F.col("count").desc(), F.col("a").asc(), F.col("b").asc()
                )
                .limit(1)
                .collect()
            )
            if not best or best[0]["count"] < 1:
                break
            a, b = best[0]["a"], best[0]["b"]
            merges.append((a, b))
            nxt = words.select(
                "freq", _merge_syms(F.col("syms"), a, b).alias("syms")
            ).persist()
            nxt.count()  # materialize before unpersisting the parent
            words.unpersist()
            words = nxt
        return merges
    finally:
        words.unpersist()


def apply_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode every document with a learned merge table: per word, start
    from characters and apply each merge in LEARNED ORDER (the BPE
    encoding rule) — an in-row fold chain, zero shuffle, the merge table
    riding in the plan (merge tables are vocab-sized by construction).
    Appends ``out_col`` (array of subword tokens, per-word boundaries
    preserved by flattening word-wise encodes)."""

    def encode_word(w: Column) -> Column:
        syms = F.split(w, "(?!^)(?=.)")
        for a, b in merges:
            syms = _merge_syms(syms, a, b)
        return syms

    return docs.withColumn(
        out_col,
        F.flatten(F.transform(tokens(F.col(text_col)), encode_word)),
    )
