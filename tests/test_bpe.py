"""BPE tokenizer training/encoding: the classic Sennrich fixture with
hand-computed merges, leftmost-greedy semantics, and scale-shape checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vlm_data_pipeline_spark.operators.lm import (
    apply_bpe,
    symbol_pair_counts,
    train_bpe,
)


def test_train_bpe_classic_corpus(spark):
    """Sennrich's running example shape: a corpus dominated by 'low'-
    family words learns the l+o, lo+w fusions first (weighted by word
    frequency), then the shared er suffix."""
    rows = [(1, "low low low low low lower lower newest widest")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(docs, num_merges=4)
    assert merges[0] == ("l", "o")
    assert merges[1] == ("lo", "w")
    # after low fuses, the most frequent remaining pairs involve the
    # 'est' suffix (newest+widest) and 'lower'
    assert len(merges) == 4
    assert all(isinstance(a, str) and isinstance(b, str) for a, b in merges)


def test_apply_bpe_hand_computed(spark):
    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    docs = spark.createDataFrame(
        [(1, "low lower lowest"), (2, "new newer wider")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.bpe_tokens for r in apply_bpe(docs, merges).collect()
    }
    assert got[1] == ["low", "low", "er", "low", "e", "s", "t"]
    assert got[2] == ["n", "e", "w", "n", "e", "w", "er", "w", "i", "d", "er"]


def test_merge_leftmost_greedy_overlap(spark):
    """'a a a' under merge (a, a) → [aa, a], never [a, aa] or [aa, aa]'s
    phantom re-merge — the overlap rule that distinguishes BPE from a
    global string replace."""
    docs = spark.createDataFrame([(1, "aaa aaaa")], "doc_id long, text string")
    got = apply_bpe(docs, [("a", "a")]).collect()[0].bpe_tokens
    assert got == ["aa", "a", "aa", "aa"]


def test_apply_bpe_zero_shuffle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        apply_bpe(docs, [("t", "h"), ("th", "e")])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_symbol_pair_counts_weighted(spark):
    words = spark.createDataFrame(
        [(5, ["a", "b", "c"]), (2, ["b", "c"])],
        "freq long, syms array<string>",
    )
    got = {
        (r.a, r.b): r["count"] for r in symbol_pair_counts(words).collect()
    }
    assert got == {("a", "b"): 5, ("b", "c"): 7}


def test_train_bpe_validation_and_early_stop(spark):
    docs = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    with pytest.raises(ValueError, match="num_merges"):
        train_bpe(docs, 0)
    # single-char words only → no pairs → training stops early, no crash
    assert train_bpe(docs, 5) == []
