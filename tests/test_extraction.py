"""Extraction-spine operator unit tests (SURVEY.md §5.2 item 1).

Covers: P1 regex multiplicity/DOTALL/non-greedy, F4 empty-block filter,
A2 ordinal determinism, J1 UnknownUser default, J2 mention order
preservation, F1 strict vs F2 inclusive watermark bounds, F5 edit-reply
predicate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knowledgebot_spark.operators import edits as ed
from knowledgebot_spark.operators import extraction as ex

MSG_SCHEMA = (
    "channel_id string, ts_raw string, ts_micros bigint, "
    "thread_ts_raw string, full_text string"
)


def _messages(spark, rows):
    return spark.createDataFrame(rows, MSG_SCHEMA)


def test_block_extract_multiplicity_and_dotall(spark):
    rows = [
        ("C1", "1.000001", 1_000_001, None,
         "#KNOWLEDGE one #END mid #KNOWLEDGE two\nacross lines #END"),
        ("C1", "2.000001", 2_000_001, None, "no tags here"),
        ("C1", "3.000001", 3_000_001, None, "#KNOWLEDGE    #END"),  # empty block
        ("C1", "4.000001", 4_000_001, None,
         "#KNOWLEDGE a #END #KNOWLEDGE b #END #KNOWLEDGE c #END"),
    ]
    out = ex.extract_blocks(ex.with_msg_key(_messages(spark, rows)))
    got = {
        (r.msg_key, r.snippet_no): r.content
        for r in out.select("msg_key", "snippet_no", "content").collect()
    }
    # message 1: two blocks, second spans a newline (DOTALL), non-greedy
    assert got[("C1_1.000001", 1)] == "one"
    assert got[("C1_1.000001", 2)] == "two\nacross lines"
    # message 3 (whitespace-only block) filtered entirely (F4)
    assert not any(k.startswith("C1_3.") for k, _ in got)
    # message 4: ordinals 1..3 in document order
    assert [got[("C1_4.000001", i)] for i in (1, 2, 3)] == ["a", "b", "c"]


def test_ordinal_determinism_many_partitions(spark):
    # A2: ordinals anchor to posexplode positions, never shuffle order —
    # stable under repartitioning.
    text = " ".join(f"#KNOWLEDGE block{i} #END" for i in range(20))
    rows = [("C1", f"{i}.0", i, None, text) for i in range(50)]
    df = ex.with_msg_key(_messages(spark, rows)).repartition(7)
    out = ex.extract_blocks(df)
    for r in out.select("snippet_no", "content").collect():
        assert r.content == f"block{r.snippet_no - 1}"


def test_author_unknown_user_default(spark):
    msgs = spark.createDataFrame(
        [("U1", "a"), ("U404", "b"), (None, "c")], ["user_id", "x"]
    )
    users = spark.createDataFrame([("U1", "Alice")], ["user_id", "real_name"])
    out = {r.x: r.author for r in ex.resolve_author(msgs, users).collect()}
    assert out == {"a": "Alice", "b": "UnknownUser", "c": "UnknownUser"}


def test_mention_order_preserved(spark):
    # J2: mention order is document order, not alphabetical / join order.
    rows = [("C1", "1.0", 1, None, "hi <@UZZZ> then <@UAAA> then <@UZZZ>")]
    users = spark.createDataFrame(
        [("UZZZ", "Zed"), ("UAAA", "Amy")], ["user_id", "real_name"]
    )
    out = ex.resolve_mentions(ex.with_msg_key(_messages(spark, rows)), users)
    assert out.collect()[0].mentions_csv == "Zed, Amy, Zed"


def test_mention_empty_guard(spark):
    # F8: no mentions -> NULL, not empty string.
    rows = [("C1", "1.0", 1, None, "no mentions at all")]
    users = spark.createDataFrame([("U1", "A")], ["user_id", "real_name"])
    out = ex.resolve_mentions(ex.with_msg_key(_messages(spark, rows)), users)
    assert out.collect()[0].mentions_csv is None


def test_watermark_bounds_strict_vs_inclusive(spark):
    # F1 strict > ckpt; F2 inclusive >= ckpt - lookback.
    ckpt = 10 * 86400 * 1_000_000
    lookback_days = 7
    lo = ckpt - lookback_days * 86400 * 1_000_000
    rows = [
        ("C1", "lo-1", lo - 1, None, "x"),
        ("C1", "lo", lo, None, "x"),
        ("C1", "ckpt", ckpt, None, "x"),      # exactly ckpt: excluded (strict)
        ("C1", "ckpt+1", ckpt + 1, None, "x"),
    ]
    out = ex.filter_fresh(_messages(spark, rows), ckpt, lookback_days)
    got = {r.ts_raw for r in out.collect()}
    # both bounds must hold simultaneously: scan-bound keeps lo..; freshness
    # keeps only > ckpt
    assert got == {"ckpt+1"}


def test_edit_reply_predicate(spark):
    # F5: '#EDIT' in text AND thread reply (thread_ts set and != own ts).
    rows = [
        ("C1", "1.0", 1, None, "#EDIT not a reply"),
        ("C1", "2.0", 2, "2.0", "#EDIT self-thread parent"),
        ("C1", "3.0", 3, "1.0", "#EDIT real edit"),
        ("C1", "4.0", 4, "1.0", "plain reply"),
    ]
    msgs = _messages(spark, rows).withColumnRenamed("full_text", "msg_text")
    got = {r.ts_raw for r in ed.edit_replies(msgs).collect()}
    assert got == {"3.0"}


def test_channel_inner_join_drops_unknown(spark):
    # F6/J3: unknown channel ids drop via the inner join.
    msgs = spark.createDataFrame([("C1", "a"), ("C9", "b")], ["channel_id", "x"])
    channels = spark.createDataFrame(
        [("C1", "general", "t", "p")], ["channel_id", "name", "topic", "purpose"]
    )
    out = ex.enrich_channel(msgs, channels)
    assert [r.x for r in out.collect()] == ["a"]
    assert out.collect()[0].channel_name == "general"


def test_format_output_date_and_key(spark):
    rows = [("C1", "1700000000.000042", 1_700_000_000_000_042, None, "t")]
    df = (
        ex.with_msg_key(_messages(spark, rows))
        .withColumn("snippet_no", F.lit(3))
        .withColumn("channel_name", F.lit("chan one"))
        .withColumn("author", F.lit("A"))
        .withColumn("members_csv", F.lit("A, B"))
        .withColumn("mentions_csv", F.lit(None).cast("string"))
    )
    r = ex.format_output(df).collect()[0]
    assert r.msg_date == "20231114"                 # UTC (P4)
    assert r.pretty_date == "14 November 2023"      # P5
    assert r.ts_underscored == "1700000000_000042"  # P6
    assert r.chunk_key == "chan_one_20231114_1700000000_000042_03"  # P7/P8
    # P9: mentions line absent when NULL
    assert "Mentions:" not in r.header
    assert r.header.splitlines()[0] == "Channel Name: chan one"


def test_nested_tag_behavior_matches_reference(spark):
    # SURVEY.md §5.2 / KnowledgeBot.py:37 nested-tag question: the reference
    # regex is non-greedy with no nesting support, so an inner '#KNOWLEDGE'
    # becomes part of the block and the dangling '#END' is plain text.
    rows = [
        ("C1", "1.0", 1, None, "#KNOWLEDGE outer #KNOWLEDGE inner #END trailing #END"),
    ]
    out = ex.extract_blocks(ex.with_msg_key(_messages(spark, rows)))
    got = [(r.snippet_no, r.content) for r in out.collect()]
    assert got == [(1, "outer #KNOWLEDGE inner")]
