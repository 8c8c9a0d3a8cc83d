"""SFT conversation operators: validation flags on hand-built
conversations, template formatting, prompt dedup, and stream-static
equivalence (all in-row ops)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vlm_data_pipeline_spark.operators import chat

_SCHEMA = (
    "doc_id long, turns array<struct<role: string, content: string>>"
)


def _convs(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


_GOOD = [("user", "hi"), ("assistant", "hello")]


def test_flags_hand_cases(spark):
    rows = [
        (1, _GOOD),  # valid
        (2, [("assistant", "hi"), ("user", "ok")]),  # wrong ends
        (3, [("user", "a"), ("user", "b"), ("assistant", "c")]),  # no alt
        (4, [("user", "a"), ("assistant", "")]),  # empty turn
        (5, [("user", "lonely prompt")]),  # too short
    ]
    df = _convs(spark, rows)
    flags = chat.conversation_flags(F.col("turns"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *[flags[n].alias(n) for n in flags],
            chat.valid_conversation(F.col("turns")).alias("keep"),
        ).collect()
    }
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False and out[2]["starts_user"] is False
    assert out[2]["ends_assistant"] is False
    assert out[3]["alternates"] is False
    assert out[4]["no_empty"] is False
    assert out[5]["has_turns"] is False
    # every other flag of the failing rows still evaluates (auditable)
    assert out[3]["starts_user"] is True and out[3]["ends_assistant"] is True


def test_template_shapes(spark):
    df = _convs(spark, [(1, _GOOD)])
    flat = df.select(
        chat.apply_chat_template(F.col("turns")).alias("f")
    ).collect()[0]["f"]
    assert flat == "<|user|>hi<|end|><|assistant|>hello<|end|>"
    alt = df.select(
        chat.apply_chat_template(
            F.col("turns"), open_fmt="[{role}] ", close="\n"
        ).alias("f")
    ).collect()[0]["f"]
    assert alt == "[user] hi\n[assistant] hello\n"
    with pytest.raises(ValueError, match="role"):
        chat.apply_chat_template(F.col("turns"), open_fmt="<nope>")


def test_prompt_dedup_keys_on_first_user_turn(spark):
    rows = [
        (1, [("user", "same q"), ("assistant", "a1")]),
        (2, [("user", "same q"), ("assistant", "a2 totally different")]),
        (3, [("assistant", "sys"), ("user", "same q"), ("assistant", "a3")]),
        (4, [("user", "unique q"), ("assistant", "a4")]),
        (5, [("assistant", "no user turn at all")]),
    ]
    groups = chat.prompt_dedup_groups(_convs(spark, rows)).collect()
    assert len(groups) == 1
    g = groups[0]
    # 1, 2, 3 share the prompt (3's first USER turn is 'same q' even
    # though an assistant turn precedes it); keeper is the min id
    assert g["keep_id"] == 1 and g["n_dups"] == 2


def test_chat_ops_stream_unchanged(spark, tmp_path):
    from tests.test_streaming import as_sorted_rows, run_stream

    rows = [
        (i, [("user", f"q{i % 3}"), ("assistant", f"a{i}")]) for i in range(12)
    ]
    df = _convs(spark, rows)
    src = str(tmp_path / "chat_src")
    df.write.parquet(src)

    def transform(d):
        return d.filter(chat.valid_conversation(F.col("turns"))).select(
            "doc_id", chat.apply_chat_template(F.col("turns")).alias("flat")
        )

    out = run_stream(
        transform(spark.readStream.schema(df.schema).parquet(src)),
        tmp_path,
        "chat_stream",
        output_mode="append",
    )
    assert as_sorted_rows(out) == as_sorted_rows(transform(spark.read.parquet(src)))


def test_preference_pairs_hand_cases(spark):
    """Chosen/rejected corners, tie-breaking, margin filter, and the
    single-completion / all-tied degenerate prompts."""
    rows = [
        # prompt A: clear winner and loser
        ("A", 1, "best", 90), ("A", 2, "mid", 50), ("A", 3, "worst", 10),
        # prompt B: two-way tie — ids break it, still a distinct pair
        ("B", 4, "x", 70), ("B", 5, "y", 70),
        # prompt C: single completion — no pair possible
        ("C", 6, "alone", 40),
        # prompt D: margin below threshold
        ("D", 7, "p", 55), ("D", 8, "q", 51),
    ]
    df = spark.createDataFrame(
        rows, "prompt_fp string, doc_id long, completion string, score long"
    )
    out = {
        r["prompt_fp"]: r
        for r in chat.preference_pairs(df, min_margin=5).collect()
    }
    # only A clears the margin: B ties (margin 0), C has one
    # completion, D's margin is 4
    assert set(out) == {"A"}
    assert out["A"]["chosen_id"] == 1 and out["A"]["rejected_id"] == 3
    assert out["A"]["margin"] == 80
    # at min_margin=0, B's tie still yields a DISTINCT pair via the
    # opposite-corner id tie-breaks; C never pairs with itself
    loose = {
        r["prompt_fp"]: r
        for r in chat.preference_pairs(df, min_margin=0).collect()
    }
    assert set(loose) == {"A", "B", "D"}
    assert loose["B"]["chosen_id"] == 4 and loose["B"]["rejected_id"] == 5
    assert loose["B"]["margin"] == 0


def test_parse_conversation_json(spark):
    """Bare arrays, wrapped objects, and garbage all land correctly;
    parsed turns flow straight into validation/templating."""
    rows = [
        (1, '[{"role": "user", "content": "hi"},'
            ' {"role": "assistant", "content": "yo"}]'),
        (2, '{"messages": [{"role": "user", "content": "q"},'
            ' {"role": "assistant", "content": "a"}]}'),
        (3, "not json at all"),
        (4, '{"something": "else"}'),
    ]
    df = spark.createDataFrame(rows, "id long, j string")
    parsed = df.select(
        "id", chat.parse_conversation_json(F.col("j")).alias("turns")
    )
    got = {r["id"]: r["turns"] for r in parsed.collect()}
    assert [t["content"] for t in got[1]] == ["hi", "yo"]
    assert [t["role"] for t in got[2]] == ["user", "assistant"]
    assert got[3] is None and got[4] is None
    flat = parsed.filter(chat.valid_conversation(F.col("turns"))).select(
        chat.apply_chat_template(F.col("turns")).alias("f")
    )
    assert sorted(r["f"] for r in flat.collect()) == [
        "<|user|>hi<|end|><|assistant|>yo<|end|>",
        "<|user|>q<|end|><|assistant|>a<|end|>",
    ]
