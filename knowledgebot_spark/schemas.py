"""Typed StructType schemas for the pipeline datasets (SURVEY.md §1.1 D1-D6).

The reference is schema-dynamic (Slack JSON dicts); the engine declares
typed schemas up front so absent fields become typed nulls and Catalyst can
prune nested fields (relevant for D1 ``attachments``).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DateType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# D1 — messages fact stream (Slack conversations_history/replies shape,
# KnowledgeBot.py:460-502)
MESSAGES = StructType(
    [
        StructField("channel_id", StringType()),
        StructField("ts_raw", StringType()),        # epoch.micros string, key material
        StructField("ts", TimestampType()),
        StructField("thread_ts_raw", StringType()),
        StructField("user_id", StringType()),
        StructField("text", StringType()),
        StructField(
            "attachments",
            ArrayType(StructType([StructField("text", StringType())])),
        ),
    ]
)

# D2 — channels dimension (KnowledgeBot.py:258-262)
CHANNELS = StructType(
    [
        StructField("channel_id", StringType()),
        StructField("name", StringType()),
        StructField("topic", StringType()),
        StructField("purpose", StringType()),
    ]
)

# D3 — users dimension (KnowledgeBot.py:310-311)
USERS = StructType(
    [
        StructField("user_id", StringType()),
        StructField("real_name", StringType()),
    ]
)

# channel_members bridge (KnowledgeBot.py:344-345)
CHANNEL_MEMBERS = StructType(
    [
        StructField("channel_id", StringType()),
        StructField("user_id", StringType()),
    ]
)

# D4 — knowledge chunks, columnized form of the per-block .txt files
# (filename fields KnowledgeBot.py:403, header fields :408-417, body :419)
KNOWLEDGE_CHUNKS = StructType(
    [
        StructField("channel_name", StringType()),
        StructField("msg_date", DateType()),
        StructField("msg_ts_raw", StringType()),
        StructField("snippet_no", IntegerType()),
        StructField("chunk_key", StringType()),
        StructField("members", ArrayType(StringType())),
        StructField("author", StringType()),
        StructField("mentions", ArrayType(StringType())),
        StructField("keywords", ArrayType(StringType())),
        StructField("summary", StringType()),
        StructField("content", StringType()),
    ]
)

# D5 — vector chunks (Weaviate class KnowledgeChunk,
# VectorDatabase/VectorDatabase.py:44-57, + chunker provenance)
VECTOR_CHUNKS = StructType(
    [
        StructField("chunk_id", StringType()),
        StructField("source", StringType()),
        StructField("chunk_pos", IntegerType()),
        StructField("text", StringType()),
        StructField("channel_name", StringType()),
        StructField("channel_members", StringType()),
        StructField("message_date", StringType()),
        StructField("message_author", StringType()),
        StructField("keywords", StringType()),
        StructField("summary", StringType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)

# D6 — engine state / checkpoint (data/state.json, KnowledgeBot.py:133-165)
ENGINE_STATE = StructType(
    [
        StructField("pipeline", StringType()),
        StructField("last_run_ts_micros", LongType()),
    ]
)

# multimodal asset table (north-star LLM-pipeline surface): opaque binary
# payload + typed metadata; decode/feature-extract runs as mapInPandas
MEDIA_ASSETS = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),    # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)
