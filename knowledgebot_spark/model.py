"""Deterministic Slack-like dataset model derived from the testdata tables.

The driver's testdata has no `messages`/`users`/`channels` fixtures
(TESTDATA.md lists only the TPC-H-ish star schema + events/documents/
embeddings), so the extraction-spine operators (SURVEY.md §2.1) are
exercised over a Slack-shaped model derived *deterministically* from those
tables:

    users_dim     <- customer  (user_id 'U%06d' of c_custkey, real_name)
    channels_dim  <- region    (channel_id 'C<r_regionkey>')
    members       <- customer  (channel = c_custkey % 5)
    messages      <- documents (ts/thread/user/text/attachments synthesized
                                from doc_id + text with pure integer/string
                                expressions)

Every derivation below is written in a dialect-portable SQL expression
subset (CASE/||/CAST AS STRING/lpad/substr/%/chr) that evaluates
identically in Spark SQL and DuckDB, so the DuckDB oracle recreates the
exact same model via the CTE prefix in :data:`MODEL_CTE`.  Parity is by
construction: the Spark side applies the *same strings* via ``selectExpr``.

Content mix follows FIXTURES.md §1: 0/1/2 `#KNOWLEDGE…#END` blocks per
message, empty blocks, mentions `<@U…>` (known + unknown ids), `#EDIT`
thread replies, attachments, NULL users, thread replies (doc_id % 5 == 4
replies to doc_id - 4), and messages on both sides of the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# --- checkpoint constants (F1 strict >, F2 lookback >= ckpt - 7d) ---------
# ckpt equals ts(doc_id=100) exactly, so the strict freshness filter
# excludes docs 0..100 at every scale factor (doc spacing is 137 s).
CKPT_SEC = 1700000000 + 100 * 137
CKPT_FRAC = 100 % 7
CKPT_MICROS = CKPT_SEC * 1_000_000 + CKPT_FRAC
LOOKBACK_DAYS = 7
LOOKBACK_MICROS = LOOKBACK_DAYS * 86400 * 1_000_000

# --- shared dialect-portable expression strings ---------------------------

_TS_SEC = "(1700000000 + {d} * 137)"
_TS_FRAC = "({d} % 7)"


def _ts_micros(d: str) -> str:
    return f"({_TS_SEC.format(d=d)} * 1000000 + {_TS_FRAC.format(d=d)})"


def _ts_raw(d: str) -> str:
    return (
        f"(CAST({_TS_SEC.format(d=d)} AS STRING) || '.' || "
        f"lpad(CAST({_TS_FRAC.format(d=d)} AS STRING), 6, '0'))"
    )


USERS_EXPRS = [
    "'U' || lpad(CAST(c_custkey AS STRING), 6, '0') AS user_id",
    "c_name AS real_name",
]

CHANNELS_EXPRS = [
    "'C' || CAST(r_regionkey AS STRING) AS channel_id",
    "'chan ' || lower(r_name) AS name",          # space: exercises P7 sanitize
    "'topic-' || CAST(r_regionkey AS STRING) AS topic",
    "'purpose ' || lower(r_name) AS purpose",
]

MEMBERS_EXPRS = [
    "'C' || CAST(c_custkey % 5 AS STRING) AS channel_id",
    "'U' || lpad(CAST(c_custkey AS STRING), 6, '0') AS user_id",
    "c_name AS real_name",
]
# Channel membership is BOUNDED (~80/channel max): real channels do not grow
# with corpus size, and an unbounded per-group collect_list (-> multi-KB
# members_csv strings threaded through every downstream row) is exactly the
# skew anti-pattern the engine avoids at scale.
MEMBERS_FILTER = "c_custkey <= 400"

_MENTION1 = "'U' || lpad(CAST((doc_id * 29) % 90 AS STRING), 6, '0')"
_MENTION2 = "'U' || lpad(CAST(90000 + (doc_id % 53) AS STRING), 6, '0')"

_TEXT = f"""CASE doc_id % 4
  WHEN 0 THEN '#KNOWLEDGE ' || substr(text, 1, 80) || ' #END'
  WHEN 1 THEN 'fyi <@' || {_MENTION1} || '> and <@' || {_MENTION2}
       || '> #KNOWLEDGE first: ' || substr(text, 1, 40)
       || ' #END also #KNOWLEDGE second: ' || substr(text, 41, 40) || ' #END'
  WHEN 2 THEN CASE WHEN doc_id % 20 = 14 THEN '#EDIT please revise'
       ELSE '#KNOWLEDGE   #END plus ' || substr(text, 1, 30) END
  ELSE substr(text, 1, 60) END"""

_ATT_TEXT = "'attached note ' || CAST(doc_id AS STRING)"

MESSAGES_EXPRS = [
    "doc_id AS msg_id",
    "'C' || CAST(doc_id % 5 AS STRING) AS channel_id",
    f"{_ts_micros('doc_id')} AS ts_micros",
    f"{_ts_raw('doc_id')} AS ts_raw",
    # thread replies: every 5th doc replies to the previous doc in the SAME
    # channel (doc_id - 5 keeps channel_id = doc_id % 5 stable)
    f"""CASE WHEN doc_id % 5 = 4 AND doc_id > 4 THEN {_ts_raw('(doc_id - 5)')}
        ELSE NULL END AS thread_ts_raw""",
    f"""CASE WHEN doc_id % 5 = 4 AND doc_id > 4 THEN {_ts_micros('(doc_id - 5)')}
        ELSE NULL END AS thread_ts_micros""",
    """CASE WHEN doc_id % 11 = 10 THEN NULL
        WHEN doc_id % 7 = 3 THEN 'U' || lpad(CAST(90000 + (doc_id % 97) AS STRING), 6, '0')
        ELSE 'U' || lpad(CAST((doc_id * 13) % 90 AS STRING), 6, '0') END AS user_id""",
    f"({_TEXT}) AS msg_text",
    # P2 attachment flatten+append (KnowledgeBot.py:487-491): body = text
    # + '\n'-joined attachment texts when attachments exist.
    f"""CASE WHEN doc_id % 6 = 0
        THEN ({_TEXT}) || chr(10) || {_ATT_TEXT}
        ELSE ({_TEXT}) END AS full_text""",
]

# DuckDB CTE prefix recreating the model; prepend to every pipeline oracle.
MODEL_CTE = f"""WITH users_dim AS (
  SELECT {', '.join(USERS_EXPRS)} FROM customer
), channels_dim AS (
  SELECT {', '.join(CHANNELS_EXPRS)} FROM region
), members AS (
  SELECT {', '.join(MEMBERS_EXPRS)} FROM customer WHERE {MEMBERS_FILTER}
), messages AS (
  SELECT {', '.join(MESSAGES_EXPRS)} FROM documents
)"""


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    # Route through the cached table loader: one analyzed relation per
    # (session, path), zero jobs and zero reader round-trips per re-build.
    # The fact scan (documents -> messages) additionally spreads when the
    # file is a single parquet row group, so the regex/explode spine work
    # parallelizes (see tables.read_spread; pass-through on real inputs).
    from knowledgebot_spark.tables import read_spread, read_table

    if table == "documents":
        return read_spread(spark, sf_dir, table)
    return read_table(spark, sf_dir, table)


def users_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _read(spark, sf_dir, "customer").selectExpr(*USERS_EXPRS)


def channels_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _read(spark, sf_dir, "region").selectExpr(*CHANNELS_EXPRS)


def members(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _read(spark, sf_dir, "customer")
        .filter(MEMBERS_FILTER)
        .selectExpr(*MEMBERS_EXPRS)
    )


def messages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slack-shaped message fact table (D1) derived from documents.

    Column pruning note: reads only (doc_id, text) from the parquet scan —
    verified via .explain ReadSchema."""
    return _read(spark, sf_dir, "documents").selectExpr(*MESSAGES_EXPRS)
