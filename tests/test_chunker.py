"""Chunker (U1) + file parse (S7/P10) tests, incl. hypothesis properties
(SURVEY.md §5.2 items 1 and 5)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from knowledgebot_spark.operators import chunker as ch

WORDS = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=5), min_size=0, max_size=60
)


def _chunks_builtin(spark, text, size, overlap):
    df = spark.createDataFrame([(text,)], ["text"])
    out = ch.chunk_windows(df, "text", size, overlap)
    return [
        r.chunk_text
        for r in out.orderBy("chunk_pos").select("chunk_pos", "chunk_text").collect()
    ]


def test_window_stride_tail(spark):
    text = " ".join(f"w{i}" for i in range(10))
    # size 4, overlap 1 -> stride 3: windows at 0,3,6,9; final partial kept
    got = _chunks_builtin(spark, text, 4, 1)
    assert got == ["w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9", "w9"]


def test_overlap_guard():
    with pytest.raises(ValueError, match="overlap"):
        ch._check(5, 5)
    with pytest.raises(ValueError, match="overlap"):
        ch._check(5, 7)


def test_pandas_udf_matches_builtin(spark):
    texts = [""] + [
        " ".join(f"t{i}" for i in range(n)) for n in (1, 4, 5, 6, 19, 20, 21, 47)
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    a = ch.chunk_windows(df, "text", 20, 5).select("text", "chunk_pos", "chunk_text")
    b = ch.chunk_text_pandas(df, "text", 20, 5).select(
        "text", "chunk_pos", "chunk_text"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


@settings(max_examples=20, deadline=None)
@given(words=WORDS, size=st.integers(2, 8), overlap=st.integers(0, 3))
def test_chunk_coverage_property(spark, words, size, overlap):
    """Every token appears in some window; consecutive windows overlap by
    exactly `overlap` tokens (except the tail)."""
    if overlap >= size:
        overlap = size - 1
    text = " ".join(words)
    got = _chunks_builtin(spark, text, size, overlap)
    toks = text.split(" ") if text else []
    stride = size - overlap
    # reconstruct: window i covers toks[i*stride : i*stride+size]
    expect = []
    start = 0
    while start < len(toks):
        expect.append(" ".join(toks[start : start + size]))
        start += stride
    if not expect:
        expect = [text]
    assert got == expect


def test_parse_header_body_roundtrip(spark):
    # S7 ∘ K1 == identity on (meta, body); P10 space->underscore keys.
    value = (
        "Channel Name: general\n"
        "Message Author: Amy: Smith\n"     # embedded ': ' in the value
        "Message Date: 05 July 2025\n"
        "---\n\n"
        "the body\nwith --- inside\nand more"
    )
    df = spark.createDataFrame([(value,)], ["value"])
    r = ch.parse_header_body(df).collect()[0]
    assert r.meta["Channel_Name"] == "general"
    assert r.meta["Message_Author"] == "Amy: Smith"   # split on FIRST ': ' only
    assert r.meta["Message_Date"] == "05 July 2025"
    assert r.body == "the body\nwith --- inside\nand more"


def test_parse_empty_body_filter(spark):
    # F7: files whose parsed body is empty are skippable via body != ''.
    value = "K: v\n---\n\n   "
    df = spark.createDataFrame([(value,)], ["value"])
    out = ch.parse_header_body(df).filter(F.col("body") != "")
    assert out.count() == 0


KEY_ALPHA = st.text(alphabet="abcdefg XY", min_size=1, max_size=12).filter(
    lambda k: k.strip() and ": " not in k and not k.startswith(" ")
    and not k.endswith(" ")
)
VAL_ALPHA = st.text(
    alphabet="abc-: .#", min_size=1, max_size=20
).filter(lambda v: v == v.strip())


@settings(max_examples=20, deadline=None)
@given(
    header=st.dictionaries(KEY_ALPHA, VAL_ALPHA, min_size=1, max_size=5),
    body_lines=st.lists(
        st.text(alphabet="xyz-. #", min_size=0, max_size=15), min_size=1, max_size=4
    ),
)
def test_parse_header_fuzz_roundtrip(spark, header, body_lines):
    """S7 parse survives values with embedded ': ', '-', '#' and bodies
    containing '---' lines (split anchors on the FIRST separator)."""
    import re

    from hypothesis import assume

    # distinct raw keys may collide after space->underscore normalization,
    # which is a genuine duplicate-map-key error — not what this fuzzes
    assume(
        len({re.sub(r"\s+", "_", k) for k in header}) == len(header)
    )
    body = "\n".join(body_lines).strip()
    value = (
        "\n".join(f"{k}: {v}" for k, v in header.items()) + "\n---\n\n" + body
    )
    df = spark.createDataFrame([(value,)], ["value"])
    r = ch.parse_header_body(df).collect()[0]
    want_meta = {re.sub(r"\s+", "_", k): v for k, v in header.items()}
    assert dict(r.meta) == want_meta
    assert r.body == re.sub(r"\s+$", "", re.sub(r"^\s+", "", body))


# --- pluggable tokenizer seam (U1; TextProcessor.py:38-40 tiktoken) ----------

def test_chunk_udf_custom_tokenizer(spark):
    """A subword-shaped tokenizer (chars here — deterministic, no external
    lib) flows through the pandas-UDF seam: windows are token-count-sized
    in the TOKENIZER's units, reassembled by its detokenizer.  Defined as
    closures so cloudpickle ships them by value (a real deployment puts
    them in a shipped package module)."""

    def char_tokenize(text):
        return list(text)

    def char_detokenize(toks):
        return "".join(toks)

    df = spark.createDataFrame([(1, "abcdefghij")], ["doc_id", "text"])
    out = ch.chunk_text_pandas(
        df, chunk_size=4, overlap=1, tokenizer=char_tokenize,
        detokenizer=char_detokenize,
    ).orderBy("chunk_pos")
    got = [r.chunk_text for r in out.collect()]
    # stride 3 over 10 chars: [0:4],[3:7],[6:10],[9:10]
    assert got == ["abcd", "defg", "ghij", "j"]


def test_chunk_udf_default_matches_jvm_path(spark):
    """No tokenizer passed -> whitespace parity with chunk_windows."""
    text = " ".join(f"w{i}" for i in range(23))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    jvm = ch.chunk_windows(df, chunk_size=8, overlap=3)
    py = ch.chunk_text_pandas(df, chunk_size=8, overlap=3)
    assert sorted(
        (r.chunk_pos, r.chunk_text) for r in jvm.collect()
    ) == sorted((r.chunk_pos, r.chunk_text) for r in py.collect())


def test_chunk_udf_tiktoken_parity():
    """Exercised only where tiktoken exists (not this container): the
    reference's cl100k_base windows decode to text whose re-encoding
    reproduces the window's token slice."""
    pytest.importorskip("tiktoken")
    enc_fn, dec_fn = ch.tiktoken_pair()
    toks = enc_fn("the quick brown fox jumps over the lazy dog " * 10)
    assert dec_fn(toks[:8]) and enc_fn(dec_fn(toks[:8]))[:8] == list(toks[:8])


def test_chunk_udf_vendored_bpe_subword(spark):
    """The SAME parity property as the tiktoken test, but always executed:
    the vendored byte-level BPE (operators/bpe.py) drives the pandas-UDF
    chunker — real subword windows (merged multi-char tokens), correct
    stride arithmetic in TOKEN units, and window re-encode stability."""
    from knowledgebot_spark.operators import bpe

    enc_fn, dec_fn = bpe.pair()
    text = "the quick brown fox jumps over the lazy dog " * 4
    toks = enc_fn(text)
    assert len(toks) < len(text.encode())  # genuinely subword, not bytes
    assert enc_fn(dec_fn(toks[:8]))[:8] == toks[:8]

    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = ch.chunk_text_pandas(
        df, chunk_size=10, overlap=3, tokenizer=enc_fn, detokenizer=dec_fn
    ).orderBy("chunk_pos")
    got = [r.chunk_text for r in out.collect()]
    # expected windows computed driver-side with the same pair
    stride = 7
    expect = [
        dec_fn(toks[s : s + 10]) for s in range(0, len(toks), stride)
    ]
    assert got == expect
    # full coverage: stride-concatenation of non-overlap prefixes + tail
    # reassembles the original text exactly (byte-level BPE is lossless)
    reassembled = "".join(
        dec_fn(toks[s : s + stride]) for s in range(0, len(toks), stride)
    )
    assert reassembled == text


def test_vendored_bpe_lossless_roundtrip():
    from knowledgebot_spark.operators import bpe

    for t in ("", "a", "héllo wörld ✓", "  spaces  ", "the theatre is over"):
        assert bpe.decode(bpe.encode(t)) == t, repr(t)


def test_vendored_bpe_merge_table_well_ordered():
    """Every merge's components must be single bytes or products of
    strictly lower-rank merges — the property that makes sequential
    rank-order application equal to lowest-rank-first greedy."""
    from knowledgebot_spark.operators import bpe

    for rank, (a, b) in enumerate(bpe.MERGES):
        for comp in (a, b):
            if len(comp) > 1:
                creator = bpe._TOKEN_ID[comp] - 256
                assert 0 <= creator < rank, (rank, comp)
    # and no pair can span a piece boundary: right components never start
    # with a space; left components never end with one (except ' ' itself,
    # which always begins its piece)
    for a, b in bpe.MERGES:
        assert not b.startswith(b" ")
        assert a == b" " or not a.endswith(b" ")


def test_vendored_bpe_fast_path_matches_reference():
    """The piece-cached fast encode must equal whole-sequence greedy BPE
    (reference _apply_bpe) token-for-token on real corpus text."""
    import duckdb

    from knowledgebot_spark.operators import bpe

    rows = duckdb.sql(
        "SELECT text FROM read_parquet('/root/testdata/sf0.001/documents.parquet') LIMIT 60"
    ).fetchall()
    texts = [r[0] for r in rows] + ["", " ", "a  double  space", "the the the"]
    for t in texts:
        whole = [
            bpe._TOKEN_ID[p]
            for p in bpe._apply_bpe([bytes([x]) for x in t.encode("utf-8")])
        ]
        assert bpe.encode(t) == whole, repr(t[:60])
