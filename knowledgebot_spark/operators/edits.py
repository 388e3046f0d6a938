"""#EDIT reprocessing operators (SURVEY.md §2.1 F5/J5, §2.2 intended
semantics of the reference's broken `_process_message` path,
KnowledgeBot.py:538-611).

An `#EDIT` thread reply requests re-extraction of its *parent* message:
filter edit replies (F5), self-join to parents on thread_ts (J5), feed the
parents back through the M1 spine, and let the keyed sink's
delete-then-append semantics (K2) replace the stale chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_replies(msgs: DataFrame, text_col: str = "msg_text") -> DataFrame:
    """F5: '#EDIT' in text AND the message is a thread reply
    (thread_ts set and != own ts — KnowledgeBot.py:577-588)."""
    return msgs.filter(
        F.col(text_col).contains("#EDIT")
        & F.col("thread_ts_raw").isNotNull()
        & (F.col("thread_ts_raw") != F.col("ts_raw"))
    )


def join_parents(edits: DataFrame, msgs: DataFrame) -> DataFrame:
    """J5: locate each edit's parent by thread_ts == parent.ts within the
    same channel (KnowledgeBot.py:593-603).  The edit side is small
    (a filter over recent messages) — broadcast it so the big message scan
    never shuffles."""
    e = F.broadcast(
        edits.select(
            F.col("channel_id").alias("e_channel_id"),
            F.col("ts_raw").alias("edit_ts_raw"),
            F.col("thread_ts_micros").alias("parent_ts_micros"),
        )
    )
    return msgs.join(
        e,
        (msgs.channel_id == e.e_channel_id) & (msgs.ts_micros == e.parent_ts_micros),
        "inner",
    ).drop("e_channel_id")
