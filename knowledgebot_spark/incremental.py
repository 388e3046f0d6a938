"""Incremental extraction run (SURVEY.md §3 E1 as one batch DAG).

Mirrors the reference's ``main`` -> ``process_channel`` lifecycle
(KnowledgeBot.py:668-705, 425-534) with M2 semantics:

  * pre-scan checkpoint stamp (K5, KnowledgeBot.py:110);
  * freshness F1 (strict >) within lookback F2 (>= ckpt - 7d);
  * every processed message's key is tombstoned before append — including
    messages whose new text has no ``#KNOWLEDGE`` block (K2 tag-removal,
    KnowledgeBot.py:483-485);
  * ``#EDIT`` thread replies re-extract their *parent* message (the
    intended semantics of the reference's broken ``_process_message``,
    SURVEY.md §2.2) — parents re-enter the spine and their keys tombstone;
  * chunks land in a (channel_name, msg_date)-partitioned parquet table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knowledgebot_spark.operators import edits as ed
from knowledgebot_spark.operators import extraction as ex
from knowledgebot_spark.sinks.checkpoint import IncrementalRun
from knowledgebot_spark.sinks.keyed_parquet import upsert_chunks


def run_extraction(
    spark: SparkSession,
    msgs: DataFrame,
    users: DataFrame,
    channels: DataFrame,
    members: DataFrame,
    output_path: str,
    state_path: str,
    now_micros: int,
    lookback_days: int = 7,
) -> dict:
    """One incremental run; returns A3-style counters."""
    run = IncrementalRun(state_path, now_micros)
    ckpt = run.checkpoint_micros

    keyed = ex.with_msg_key(msgs)
    fresh = ex.filter_fresh(keyed, ckpt, lookback_days)

    # #EDIT replies pull their parents back into scope even when the parent
    # itself is older than the checkpoint (J5 on the full keyed scan).
    edit_parents = ex.with_msg_key(
        ed.join_parents(ed.edit_replies(fresh), keyed).drop(
            "edit_ts_raw", "parent_ts_micros"
        )
    )
    scope = fresh.unionByName(edit_parents.select(fresh.columns)).dropDuplicates(
        ["msg_key"]
    )

    chunks = ex.build_knowledge_chunks(
        scope, users, channels, members, ckpt_micros=None
    )
    # K2: every in-scope message key is reprocessed — deletes run even for
    # messages that no longer (or never) contain a knowledge block.  The
    # channel inner-join (F6) must apply to the tombstone set too, so that
    # keys map to real partitions.
    reprocessed = (
        ex.enrich_channel(scope, channels).select("msg_key").distinct()
    )

    upsert_chunks(spark, output_path, chunks, reprocessed_keys=reprocessed)
    run.commit()

    # A3 counters: metadata-cheap — no full-table scan (parquet count()
    # reads footers only, no data pages)
    return {
        "checkpoint_before": ckpt,
        "checkpoint_after": run.start_micros,
        "n_reprocessed_keys": reprocessed.count(),
        "n_chunks_in_table": spark.read.parquet(output_path).count(),
    }


def read_chunk_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def chunks_for_message(spark: SparkSession, path: str, msg_key: str) -> DataFrame:
    """Partition-pruned point lookup by message key."""
    return spark.read.parquet(path).filter(F.col("msg_key") == msg_key)
