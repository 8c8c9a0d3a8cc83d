"""Property-based tests (hypothesis) for the pure-Python decode layers and
the cross-engine determinism contracts.

The wire readers are plain Python, so hypothesis can hammer them with its
default example counts; Spark-backed properties batch all generated rows
into ONE DataFrame per test to keep runtime sane.
"""

from __future__ import annotations

import hashlib
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from vlm_data_pipeline_spark.sources.pbwire import (
    iter_fields,
    iter_tfrecords,
    packed_floats,
    packed_varints,
    parse_tf_example,
)


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _tag(field: int, wt: int) -> bytes:
    return _varint((field << 3) | wt)


field_num = st.integers(min_value=1, max_value=2**28)

record = st.one_of(
    st.tuples(field_num, st.just(0), st.integers(min_value=0, max_value=2**63 - 1)),
    st.tuples(field_num, st.just(1), st.integers(min_value=0, max_value=2**64 - 1)),
    st.tuples(field_num, st.just(2), st.binary(max_size=64)),
    st.tuples(field_num, st.just(5), st.integers(min_value=0, max_value=2**32 - 1)),
)


@given(st.lists(record, max_size=32))
def test_pbwire_roundtrip_any_message(records):
    """Encoding arbitrary (field, wiretype, value) records and walking
    them back must be lossless — including unknown fields, huge field
    numbers, empty payloads, and max-range varints."""
    buf = bytearray()
    for field, wt, val in records:
        buf += _tag(field, wt)
        if wt == 0:
            buf += _varint(val)
        elif wt == 1:
            buf += val.to_bytes(8, "little")
        elif wt == 2:
            buf += _varint(len(val)) + val
        else:
            buf += val.to_bytes(4, "little")
    got = list(iter_fields(bytes(buf)))
    assert got == records


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=64))
def test_packed_varints_roundtrip(vals):
    assert packed_varints(b"".join(_varint(v) for v in vals)) == vals


@given(
    st.lists(
        st.floats(width=32, allow_nan=False, allow_infinity=False), max_size=64
    )
)
def test_packed_floats_roundtrip(vals):
    packed = b"".join(struct.pack("<f", v) for v in vals)
    assert packed_floats(packed) == vals


@given(st.lists(st.binary(max_size=200), max_size=16))
def test_tfrecord_framing_roundtrip(payloads):
    out = bytearray()
    for p in payloads:
        out += struct.pack("<Q", len(p)) + b"\x00" * 4 + p + b"\x00" * 4
    assert list(iter_tfrecords(bytes(out))) == payloads


feature_name = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=20
)


@given(
    st.dictionaries(
        feature_name,
        st.one_of(
            st.tuples(st.just("bytes"), st.lists(st.binary(max_size=32), max_size=8)),
            st.tuples(
                st.just("floats"),
                st.lists(
                    st.floats(width=32, allow_nan=False, allow_infinity=False),
                    min_size=1,
                    max_size=8,
                ),
            ),
            st.tuples(
                st.just("ints"),
                st.lists(
                    st.integers(min_value=0, max_value=2**62), min_size=1, max_size=8
                ),
            ),
        ),
        max_size=8,
    )
)
def test_tf_example_roundtrip(features):
    """Arbitrary feature maps (bytes/float/int kinds) encode → parse back
    losslessly through the no-tensorflow wire reader."""

    def _len(field, payload):
        return _tag(field, 2) + _varint(len(payload)) + payload

    entries = b""
    for name, (kind_name, vals) in features.items():
        if kind_name == "bytes":
            kind = _len(1, b"".join(_len(1, v) for v in vals))
        elif kind_name == "floats":
            kind = _len(2, _len(1, b"".join(struct.pack("<f", v) for v in vals)))
        else:
            kind = _len(3, _len(1, b"".join(_varint(v) for v in vals)))
        entries += _len(1, _len(1, name.encode()) + _len(2, kind))
    ex = _len(1, entries)
    got = parse_tf_example(ex)
    assert set(got) == set(features)
    for k, (_, vals) in features.items():
        assert got[k] == list(vals)


def test_hash32_matches_python_model(spark):
    """hash32 (md5-prefix) must equal the portable Python model — the
    contract every DuckDB oracle relies on. One DataFrame, many rows."""
    from pyspark.sql import functions as F

    from vlm_data_pipeline_spark.functions.text import hash32

    samples = ["", "a", "hello world", "ümläut", "0" * 300, "\t\n x"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r.h for r in df.select(hash32(F.col("s")).alias("h")).collect()]
    want = [
        int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) for s in samples
    ]
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    degs=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=20,
    )
)
def test_normalize_angle_range_property(spark, degs):
    """normalize_angle_deg maps any finite degrees into [-1, 1] and agrees
    with the Python model ((d % 360) wrapped to (-180, 180], /180) —
    including the ±180° → +1.0 reference quirk."""
    import math

    from pyspark.sql import functions as F

    from vlm_data_pipeline_spark.functions.geometry import normalize_angle_deg

    df = spark.createDataFrame([(d,) for d in degs], "d double")
    got = [r.n for r in df.select(normalize_angle_deg(F.col("d")).alias("n")).collect()]

    def model(d: float) -> float:
        m = math.fmod(math.fmod(d, 360.0) + 360.0, 360.0)
        if m > 180.0:
            m -= 360.0
        return m / 180.0

    for g, d in zip(got, degs):
        assert -1.0 <= g <= 1.0
        assert g == model(d) or abs(g - model(d)) < 1e-12


@settings(max_examples=40, deadline=None)
@given(
    data=st.data(),
    width=st.integers(min_value=1, max_value=8),
    height=st.integers(min_value=1, max_value=8),
    bit16=st.booleans(),
)
def test_png_roundtrip_random_images(data, width, height, bit16):
    """Random gray images at random per-row filter choices survive the
    encode → decode round-trip exactly — exercises all five PNG filters
    on arbitrary content, both bit depths."""
    from tests.test_png_codec import encode_png
    from vlm_data_pipeline_spark.sources.png_codec import decode_png

    hi = 65535 if bit16 else 255
    rows = [
        [data.draw(st.integers(min_value=0, max_value=hi)) for _ in range(width)]
        for _ in range(height)
    ]
    filters = [data.draw(st.integers(min_value=0, max_value=4)) for _ in range(height)]
    png = encode_png(rows, bit_depth=16 if bit16 else 8, filters=filters)
    img = decode_png(png)
    assert (img.width, img.height) == (width, height)
    assert img.rows == rows


@settings(max_examples=25, deadline=None)
@given(
    data=st.data(),
    shape=st.lists(st.integers(min_value=1, max_value=5), min_size=1, max_size=3),
    chunked=st.booleans(),
)
def test_hdf5_roundtrip_random_tensors(data, shape, chunked):
    """Random float64 tensors at random shapes survive the hdf5lite
    decode round-trip through the test-side writer (contiguous and
    gzip-chunked layouts)."""
    import numpy as np

    from tests.test_hdf5lite import make_hdf5
    from vlm_data_pipeline_spark.sources.hdf5lite import read_datasets

    n = 1
    for d in shape:
        n *= d
    vals = [
        data.draw(
            st.floats(allow_nan=False, allow_infinity=False, width=32)
        )
        for _ in range(n)
    ]
    arr = np.array(vals, dtype="<f8").reshape(shape)
    blob = make_hdf5({"t": arr}, chunk_gzip={"t"} if chunked else frozenset())
    out = read_datasets(blob, ["t"])
    assert out["t"].shape == tuple(shape)
    assert np.array_equal(out["t"], arr)


def test_tfrecord_truncated_raises():
    import pytest as _pytest

    good = struct.pack("<Q", 5) + b"\x00" * 4 + b"hello" + b"\x00" * 4
    bad = struct.pack("<Q", 99) + b"\x00" * 4 + b"short"
    assert list(iter_tfrecords(good)) == [b"hello"]
    with _pytest.raises(ValueError, match="truncated"):
        list(iter_tfrecords(good + bad))
    # cut INSIDE the trailing payload CRC: payload complete, CRC short
    with _pytest.raises(ValueError, match="truncated"):
        list(iter_tfrecords(good[:-2]))
    # trailing partial 12-byte header must raise, not be silently dropped
    with _pytest.raises(ValueError, match="truncated"):
        list(iter_tfrecords(good + struct.pack("<Q", 5)[:6]))


def test_tf_example_no_features():
    assert parse_tf_example(b"") == {}


def test_corpus_report_analytic(spark):
    """Hand-computable corpus: counts a=4, b=2, c=1 -> vocab 3, tokens 7,
    TTR 3/7; slope equals the numpy least-squares fit of ln(freq) on
    ln(rank); modal word ties break lexicographically."""
    import math

    from vlm_data_pipeline_spark.functions.text import corpus_report

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a a b c")], "doc_id long, text string"
    )
    r = corpus_report(docs, zipf_top=3).collect()[0]
    assert (r.n_docs, r.n_tokens, r.vocab_size) == (2, 7, 3)
    assert r.type_token_ratio == round(3 / 7, 6)
    assert (r.top_word, r.top_freq) == ("a", 4)
    xs = [math.log(i) for i in (1, 2, 3)]
    ys = [math.log(c) for c in (4, 2, 1)]
    n = 3
    mx, my = sum(xs) / n, sum(ys) / n
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    assert r.zipf_slope == round(slope, 4)


def test_corpus_report_top_word_tie_break(spark):
    from vlm_data_pipeline_spark.functions.text import corpus_report

    docs = spark.createDataFrame(
        [(1, "zz aa zz aa")], "doc_id long, text string"
    )
    r = corpus_report(docs).collect()[0]
    assert r.top_word == "aa" and r.top_freq == 2


def test_canonical_url_idempotent_and_total(spark):
    """Property sweep in one pass: for 200 randomized URL-ish strings
    (schemes, ports, params, fragments, unicode junk), canonicalization
    never crashes and is IDEMPOTENT: canon(canon(u)) == canon(u)."""
    import random

    from pyspark.sql import functions as F

    from vlm_data_pipeline_spark.operators.dedup import canonical_url

    rng = random.Random(11)
    schemes = ["http://", "https://", "HTTPS://", "", "ftp://"]
    hosts = ["www.Ex.com", "ex.com:443", "EX.com:80", "ex.com:8080", "."]
    paths = ["", "/", "/a/b/", "/a//", "/%20x", "/ünï/ç"]
    queries = ["", "?a=1&utm_x=2", "?utm_a&b", "?z=9&a=1&a=0", "?ref"]
    frags = ["", "#f", "#a#b"]
    urls = [
        rng.choice(schemes)
        + rng.choice(hosts)
        + rng.choice(paths)
        + rng.choice(queries)
        + rng.choice(frags)
        for _ in range(200)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        canonical_url(F.col("url")).alias("c1"),
        canonical_url(canonical_url(F.col("url"))).alias("c2"),
    ).collect()
    assert len(rows) == 200
    for r in rows:
        assert r.c1 == r.c2, r


def test_span_removal_invariants_random_corpus(spark):
    """Randomized corpus with planted shared spans: (a) n_removed ==
    n_tokens − tokens(out), (b) the output is a SUBSEQUENCE of the
    original tokens, (c) a second pass over the survivors of a
    duplicate-free corpus is the identity, (d) results are partition-
    independent."""
    import random

    from pyspark.sql import functions as F

    from vlm_data_pipeline_spark.functions.text import tokens
    from vlm_data_pipeline_spark.operators.dedup import remove_duplicate_spans

    rng = random.Random(23)
    shared = [" ".join(f"s{j}_{i}" for i in range(rng.randint(6, 14))) for j in range(4)]
    docs = []
    for d in range(40):
        parts = [f"u{d}_{i}" for i in range(rng.randint(0, 20))]
        if rng.random() < 0.5:
            ins = rng.choice(shared)
            pos = rng.randint(0, len(parts))
            parts[pos:pos] = ins.split()
        docs.append((d, " ".join(parts)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = remove_duplicate_spans(df, k=5)
    rows = {r.doc_id: r for r in out.collect()}
    orig = {
        r.doc_id: r.t
        for r in df.select("doc_id", tokens(F.col("text")).alias("t")).collect()
    }
    for d, r in rows.items():
        got = r.text.split() if r.text else []
        assert r.n_tokens == len(orig[d])
        assert r.n_removed == len(orig[d]) - len(got)
        it = iter(orig[d])
        assert all(tok in it for tok in got), f"not a subsequence: doc {d}"
    rows2 = {
        r.doc_id: r for r in remove_duplicate_spans(df.repartition(7), k=5).collect()
    }
    assert {d: (r.n_removed, r.text) for d, r in rows.items()} == {
        d: (r.n_removed, r.text) for d, r in rows2.items()
    }
    # duplicate-free corpus: identity (up to whitespace normalization)
    clean = spark.createDataFrame(
        [(d, " ".join(f"only{d}_{i}" for i in range(12))) for d in range(10)],
        "doc_id long, text string",
    )
    again = remove_duplicate_spans(clean, k=5).collect()
    assert all(r.n_removed == 0 for r in again)


def test_winnow_guarantee_fuzz(spark):
    """20 randomized doc pairs, each sharing a planted span of exactly
    w+k-1 tokens at random offsets: the winnowing guarantee holds in
    every case (>= 1 shared fingerprint)."""
    import random

    from pyspark.sql import functions as F

    from vlm_data_pipeline_spark.functions.text import tokens, winnow_fingerprints

    rng = random.Random(5)
    k, w = 4, 5
    rows = []
    for pair in range(20):
        span = " ".join(f"p{pair}_{i}" for i in range(k + w - 1))
        for side in (0, 1):
            n1, n2 = rng.randint(0, 30), rng.randint(0, 30)
            body = (
                [f"x{pair}_{side}_{i}" for i in range(n1)]
                + span.split()
                + [f"y{pair}_{side}_{i}" for i in range(n2)]
            )
            rows.append((pair * 2 + side, pair, " ".join(body)))
    df = spark.createDataFrame(rows, "doc_id long, pair long, text string")
    got = df.select(
        "doc_id",
        "pair",
        winnow_fingerprints(tokens(F.col("text")), k=k, w=w).alias("sel"),
    ).collect()
    by_pair: dict[int, list[set]] = {}
    for r in got:
        by_pair.setdefault(r.pair, []).append({s.fp for s in r.sel})
    for pair, (a, b) in by_pair.items():
        assert a & b, f"guarantee violated for pair {pair}"


def test_quality_classifier_scores_bounded_random(spark):
    """Scores are always in (0, 1) and finite for random weights/text."""
    import random

    from vlm_data_pipeline_spark.operators.curation import (
        quality_classifier_scores,
    )

    rng = random.Random(3)
    w = [rng.randint(-(10**13), 10**13) for _ in range(64)]
    docs = spark.createDataFrame(
        [
            (i, " ".join(f"t{rng.randrange(50)}" for _ in range(rng.randint(0, 30))))
            for i in range(100)
        ],
        "doc_id long, text string",
    )
    rows = quality_classifier_scores(docs, w).collect()
    assert len(rows) == 100
    for r in rows:
        assert 0.0 < r.score < 1.0


def test_sentences_fuzz_never_crashes_and_invariants(spark):
    """Randomized punctuation/unicode text: the splitter never crashes,
    every sentence is non-empty and trimmed, and stripping whitespace
    from the concatenation of sentences loses no non-space characters."""
    import random

    from pyspark.sql import functions as F

    from vlm_data_pipeline_spark.functions.text import sentences

    rng = random.Random(41)
    alphabet = "ab .!?\t\n…汉字é;"
    texts = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    rows = df.select("i", sentences(F.col("text")).alias("s")).collect()
    assert len(rows) == 200
    for r in rows:
        for sent in r.s:
            assert sent == sent.strip() and sent != ""
        glued = "".join("".join(r.s).split())
        orig = "".join(texts[r.i].split())
        assert glued == orig, r.i


def test_vertical_tab_tokenization_matches_duckdb(spark):
    """Review-pass regression: Java \\s includes \\x0B but RE2's does
    not, so every oracle-paired whitespace regex spells the class out.
    A \\x0B-bearing doc must tokenize and sentence-split identically in
    Spark and DuckDB."""
    import duckdb
    from pyspark.sql import functions as F

    from vlm_data_pipeline_spark.functions.text import sentences, tokens
    from vlm_data_pipeline_spark.plans.star_queries_llm import _D_TOKS

    text = "a\x0bb c. Second\x0b sentence here. \x0btail"
    df = spark.createDataFrame([(text,)], "text string")
    srow = df.select(
        tokens(F.col("text")).alias("t"), sentences(F.col("text")).alias("s")
    ).collect()[0]
    drow = duckdb.sql(
        f"SELECT {_D_TOKS} AS t FROM (SELECT ? AS text)", params=[text]
    ).fetchone()
    assert list(srow.t) == list(drow[0])
    # \x0B is treated as whitespace in BOTH engines (the Java behavior)
    assert "a" in srow.t and "b" in srow.t
    for sent in srow.s:
        assert not sent.startswith("\x0b") and not sent.endswith("\x0b")


def test_span_removal_fuzz_never_crashes(spark):
    """Random unicode corpora (including empty, whitespace-only, and
    separator-bearing docs) never crash either span variant, and the
    structural invariants hold on every row."""
    import random

    from vlm_data_pipeline_spark.operators.dedup import (
        dedup_sentence_spans,
        remove_duplicate_spans,
    )

    rng = random.Random(97)
    alphabet = "ab \t\n.!?\x1f\x1e…汉 é\x0b"
    docs = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60))))
        for i in range(120)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    tok = remove_duplicate_spans(df, k=3).collect()
    assert len(tok) == 120
    for r in tok:
        assert 0 <= r.n_removed <= r.n_tokens
    sent = dedup_sentence_spans(df, n_sent=2).collect()
    assert len(sent) == 120
    for r in sent:
        assert 0 <= r.n_removed <= r.n_sentences
