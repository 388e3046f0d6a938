"""Extraction-spine query catalog (SURVEY.md §2.1 S/F/P/J/A ops).

Each query runs the Spark operators over the deterministic Slack-like model
(model.py) and carries a DuckDB oracle that recreates the identical model
via the MODEL_CTE prefix — so the driver's hash compare exercises the real
operator semantics end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledgebot_spark import model
from knowledgebot_spark.operators import edits as ed
from knowledgebot_spark.operators import extraction as ex
from knowledgebot_spark.registry import register

CKPT = model.CKPT_MICROS
LOOKBACK = model.LOOKBACK_MICROS

# Shared oracle CTE fragments -------------------------------------------------

_BLK_CTE = """
keyed AS (
  SELECT concat_ws('_', channel_id, ts_raw) AS msg_key, m.*
  FROM messages m
), blk AS (
  SELECT k.*, t.pos, t.block
  FROM (SELECT *, regexp_extract_all(full_text, '(?s)#KNOWLEDGE(.*?)#END', 1) AS blocks
        FROM keyed WHERE contains(full_text, '#KNOWLEDGE')) k,
  LATERAL (SELECT unnest(k.blocks) AS block, generate_subscripts(k.blocks, 1) AS pos) t
  WHERE trim(t.block) <> ''
), ord AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY msg_key ORDER BY pos) AS INTEGER) AS snippet_no,
         trim(block) AS content
  FROM blk
)"""


# S1 — dimension scan with isin filter ---------------------------------------

@register(
    "kb_dim_scan",
    sql=model.MODEL_CTE
    + """
SELECT channel_id, name, topic, purpose
FROM channels_dim
WHERE name IN ('chan africa', 'chan europe', 'chan asia')
""",
    tags=("S1", "F6"),
)
def kb_dim_scan(spark: SparkSession, sf: str) -> DataFrame:
    return model.channels_dim(spark, sf).filter(
        F.col("name").isin("chan africa", "chan europe", "chan asia")
    )


# J6 — configured-vs-found set difference (left anti join) --------------------

@register(
    "kb_channel_missing",
    sql=model.MODEL_CTE
    + """
SELECT w.name AS missing_name
FROM (VALUES ('chan africa'), ('chan europe'), ('chan nowhere')) w(name)
ANTI JOIN channels_dim c ON c.name = w.name
""",
    tags=("J6",),
)
def kb_channel_missing(spark: SparkSession, sf: str) -> DataFrame:
    wanted = spark.createDataFrame(
        [("chan africa",), ("chan europe",), ("chan nowhere",)], ["name"]
    )
    found = model.channels_dim(spark, sf)
    return wanted.join(found, "name", "left_anti").select(F.col("name").alias("missing_name"))


# F1/F2 — freshness + lookback window counters --------------------------------

@register(
    "kb_freshness",
    sql=model.MODEL_CTE
    + f"""
SELECT
  count(*) AS n_scanned,
  CAST(sum(CASE WHEN ts_micros > {CKPT} THEN 1 ELSE 0 END) AS BIGINT) AS n_fresh,
  CAST(sum(CASE WHEN ts_micros >= {CKPT - LOOKBACK} AND ts_micros <= {CKPT} THEN 1 ELSE 0 END) AS BIGINT) AS n_lookback_only
FROM messages
""",
    tags=("F1", "F2", "A3"),
)
def kb_freshness(spark: SparkSession, sf: str) -> DataFrame:
    m = model.messages(spark, sf)
    return m.agg(
        F.count("*").alias("n_scanned"),
        F.sum(F.when(F.col("ts_micros") > CKPT, 1).otherwise(0)).alias("n_fresh"),
        F.sum(
            F.when(
                (F.col("ts_micros") >= CKPT - LOOKBACK) & (F.col("ts_micros") <= CKPT), 1
            ).otherwise(0)
        ).alias("n_lookback_only"),
    )


# P1/F3/F4/A2 — block extraction with posexplode-anchored ordinals ------------

@register(
    "kb_extract_blocks",
    sql=model.MODEL_CTE
    + ","
    + _BLK_CTE
    + """
SELECT msg_key, snippet_no, content
FROM ord
""",
    tags=("P1", "F3", "F4", "A2", "P11"),
)
def kb_extract_blocks(spark: SparkSession, sf: str) -> DataFrame:
    m = ex.with_msg_key(model.messages(spark, sf))
    return ex.extract_blocks(m).select("msg_key", "snippet_no", "content")


# S4/J1 — author resolution with UnknownUser default --------------------------

@register(
    "kb_author_counts",
    sql=model.MODEL_CTE
    + """
SELECT coalesce(u.real_name, 'UnknownUser') AS author, count(*) AS n_msgs
FROM messages m LEFT JOIN users_dim u USING (user_id)
GROUP BY 1
""",
    tags=("S4", "J1"),
)
def kb_author_counts(spark: SparkSession, sf: str) -> DataFrame:
    m = ex.resolve_author(model.messages(spark, sf), model.users_dim(spark, sf))
    return m.groupBy("author").agg(F.count("*").alias("n_msgs"))


# S5/A1/P12 — members per channel --------------------------------------------

@register(
    "kb_members",
    sql=model.MODEL_CTE
    + """
SELECT channel_id,
       string_agg(real_name, ', ' ORDER BY real_name) AS members_csv,
       count(*) AS n_members
FROM members
GROUP BY channel_id
""",
    tags=("S5", "A1", "P12"),
)
def kb_members(spark: SparkSession, sf: str) -> DataFrame:
    m = model.members(spark, sf)
    return m.groupBy("channel_id").agg(
        F.array_join(F.array_sort(F.collect_list("real_name")), ", ").alias("members_csv"),
        F.count("*").alias("n_members"),
    )


# P3/J2/F8 — order-preserving mention resolution ------------------------------

@register(
    "kb_mentions",
    sql=model.MODEL_CTE
    + """
, keyed AS (
  SELECT concat_ws('_', channel_id, ts_raw) AS msg_key, full_text FROM messages
), ment AS (
  SELECT f.msg_key, t.pos, t.mid
  FROM (SELECT msg_key, regexp_extract_all(full_text, '<@([A-Z0-9]+)>', 1) AS ids FROM keyed) f,
  LATERAL (SELECT unnest(f.ids) AS mid, generate_subscripts(f.ids, 1) AS pos) t
)
SELECT m.msg_key,
       string_agg(coalesce(u.real_name, 'UnknownUser'), ', ' ORDER BY m.pos) AS mentions_csv
FROM ment m LEFT JOIN users_dim u ON u.user_id = m.mid
GROUP BY m.msg_key
""",
    tags=("P3", "J2", "F8"),
)
def kb_mentions(spark: SparkSession, sf: str) -> DataFrame:
    m = ex.with_msg_key(model.messages(spark, sf))
    resolved = ex.resolve_mentions(m, model.users_dim(spark, sf))
    return resolved.filter(F.col("mentions_csv").isNotNull()).select(
        "msg_key", "mentions_csv"
    )


# S3 — thread expansion (parent <- replies self-join) -------------------------

@register(
    "kb_thread_expansion",
    sql=model.MODEL_CTE
    + """
SELECT concat_ws('_', p.channel_id, p.ts_raw) AS parent_key, count(*) AS n_replies
FROM messages r
JOIN messages p ON r.thread_ts_micros = p.ts_micros AND r.channel_id = p.channel_id
GROUP BY 1
""",
    tags=("S3", "J5"),
)
def kb_thread_expansion(spark: SparkSession, sf: str) -> DataFrame:
    m = model.messages(spark, sf)
    replies = m.filter(F.col("thread_ts_micros").isNotNull()).select(
        F.col("channel_id").alias("r_channel_id"),
        F.col("thread_ts_micros").alias("parent_ts_micros"),
    )
    parents = m.select("channel_id", "ts_raw", "ts_micros")
    joined = replies.join(
        parents,
        (replies.r_channel_id == parents.channel_id)
        & (replies.parent_ts_micros == parents.ts_micros),
        "inner",
    )
    return joined.groupBy(
        F.concat_ws("_", "channel_id", "ts_raw").alias("parent_key")
    ).agg(F.count("*").alias("n_replies"))


# F5/J5 — #EDIT replies joined to their parents -------------------------------

@register(
    "kb_edit_parents",
    sql=model.MODEL_CTE
    + """
SELECT concat_ws('_', p.channel_id, p.ts_raw) AS parent_key,
       concat_ws('_', e.channel_id, e.ts_raw) AS edit_key,
       substr(p.full_text, 1, 30) AS parent_prefix
FROM messages e
JOIN messages p ON e.thread_ts_micros = p.ts_micros AND e.channel_id = p.channel_id
WHERE contains(e.msg_text, '#EDIT')
  AND e.thread_ts_raw IS NOT NULL AND e.thread_ts_raw <> e.ts_raw
""",
    tags=("F5", "J5"),
)
def kb_edit_parents(spark: SparkSession, sf: str) -> DataFrame:
    m = model.messages(spark, sf)
    e = ed.edit_replies(m)
    joined = ed.join_parents(e, m)
    return joined.select(
        F.concat_ws("_", "channel_id", "ts_raw").alias("parent_key"),
        F.concat_ws("_", "channel_id", "edit_ts_raw").alias("edit_key"),
        F.substring("full_text", 1, 30).alias("parent_prefix"),
    )


# Full M1 spine ---------------------------------------------------------------

_SPINE_SQL = (
    model.MODEL_CTE
    + f"""
, fresh AS (
  SELECT * FROM messages
  WHERE ts_micros >= {CKPT - LOOKBACK} AND ts_micros > {CKPT}
), keyed AS (
  SELECT concat_ws('_', channel_id, ts_raw) AS msg_key, m.* FROM fresh m
), blk AS (
  SELECT k.*, t.pos, t.block
  FROM (SELECT *, regexp_extract_all(full_text, '(?s)#KNOWLEDGE(.*?)#END', 1) AS blocks
        FROM keyed WHERE contains(full_text, '#KNOWLEDGE')) k,
  LATERAL (SELECT unnest(k.blocks) AS block, generate_subscripts(k.blocks, 1) AS pos) t
  WHERE trim(t.block) <> ''
), ord AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY msg_key ORDER BY pos) AS INTEGER) AS snippet_no,
         trim(block) AS content
  FROM blk
), auth AS (
  SELECT o.*, coalesce(u.real_name, 'UnknownUser') AS author
  FROM ord o LEFT JOIN users_dim u USING (user_id)
), chan AS (
  SELECT a.*, c.name AS channel_name FROM auth a JOIN channels_dim c USING (channel_id)
), memagg AS (
  SELECT channel_id, string_agg(real_name, ', ' ORDER BY real_name) AS members_csv
  FROM members GROUP BY channel_id
), wmem AS (
  SELECT ch.*, memagg.members_csv FROM chan ch LEFT JOIN memagg USING (channel_id)
), ment AS (
  SELECT f.msg_key, string_agg(coalesce(u.real_name, 'UnknownUser'), ', ' ORDER BY t.pos) AS mentions_csv
  FROM (SELECT msg_key, regexp_extract_all(full_text, '<@([A-Z0-9]+)>', 1) AS ids FROM keyed) f,
  LATERAL (SELECT unnest(f.ids) AS mid, generate_subscripts(f.ids, 1) AS pos) t
  LEFT JOIN users_dim u ON u.user_id = t.mid
  GROUP BY f.msg_key
), out AS (
  SELECT w.*, mn.mentions_csv,
    strftime(make_timestamp(w.ts_micros), '%Y%m%d') AS msg_date,
    strftime(make_timestamp(w.ts_micros), '%d %B %Y') AS pretty_date,
    regexp_replace(w.ts_raw, '\\.', '_', 'g') AS ts_underscored,
    regexp_replace(w.channel_name, '[^\\w\\-.]', '_', 'g') AS channel_sanitized
  FROM wmem w LEFT JOIN ment mn USING (msg_key)
)
SELECT msg_key, channel_id, channel_name, msg_date, pretty_date, ts_underscored, snippet_no,
  printf('%s_%s_%s_%02d', channel_sanitized, msg_date, ts_underscored, snippet_no) AS chunk_key,
  author, members_csv, mentions_csv, content,
  concat_ws(chr(10),
    'Channel Name: ' || channel_name,
    'Channel Members: ' || coalesce(members_csv, ''),
    'Message Date: ' || pretty_date,
    'Message Author: ' || author,
    CASE WHEN mentions_csv IS NOT NULL THEN 'Mentions: ' || mentions_csv END) AS header
FROM out
"""
)


@register(
    "kb_spine_full",
    sql=_SPINE_SQL,
    tags=("M1", "P4", "P5", "P6", "P7", "P8", "P9", "J1", "J3", "J4", "A2"),
)
def kb_spine_full(spark: SparkSession, sf: str) -> DataFrame:
    return ex.build_knowledge_chunks(
        model.messages(spark, sf),
        model.users_dim(spark, sf),
        model.channels_dim(spark, sf),
        model.members(spark, sf),
        ckpt_micros=CKPT,
        lookback_days=model.LOOKBACK_DAYS,
    )
