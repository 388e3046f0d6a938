"""Query catalog: name -> (Spark callable, optional DuckDB oracle SQL).

Every implemented operator from SURVEY.md §2 registers at least one query
here; ``__spark_entry__`` re-exports the catalog to the driver harness.
Queries with ``sql=None`` are genuinely non-SQL-expressible (custom
stateful/streaming/approximate ops) and get the driver's weaker rows-only
check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "QueryDef"] = {}

_MODULES = (
    "knowledgebot_spark.queries_pipeline",
    "knowledgebot_spark.queries_relational",
    "knowledgebot_spark.queries_tpch",
    "knowledgebot_spark.queries_llm",
    "knowledgebot_spark.queries_corpus",
    "knowledgebot_spark.queries_streaming",
    "knowledgebot_spark.queries_formats",
    "knowledgebot_spark.queries_events",
)


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    sql: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)


def register(name: str, sql: str | None = None, tags: tuple[str, ...] = ()):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QueryDef(name, fn, sql, tags)
        return fn

    return deco


# The driver's correctness harness hash-checks only the FIRST 50 entries of
# queries(), in iteration order — so output ordering is evidence policy, not
# cosmetics.  The rotation is DERIVED, not hand-planned, from the repo's
# CORRECTNESS_r*.json files (+ QUERY_STAMPS.json) at load time:
#   1. never-checked queries (no hash_match:true row in any round) sort
#      FIRST — new work always enters the window immediately;
#   2. then queries whose implementation CHANGED since their last green
#      stamp (stamps.changed_since_stamp: the closure hash of the query
#      function + its same-module helpers differs from the source the
#      driver actually checked — VERDICT r10 #1: evidence must follow
#      code churn, not just age), stalest first;
#   3. remaining checked queries sort by the round they were LAST
#      hash-green, ascending — once coverage is closed, each round's
#      50-row window re-certifies the STALEST evidence (the
#      re-certification rotation), so driver evidence never ages
#      indefinitely;
#   4. ties break by _OUTPUT_ORDER module rank, then registration order.
# Rows-only results (err: no_oracle) don't count as evidence — upgrading
# such a query to a real oracle puts it back in the window.
_OUTPUT_ORDER = (
    "knowledgebot_spark.queries_events",
    "knowledgebot_spark.queries_corpus",
    "knowledgebot_spark.queries_formats",
    "knowledgebot_spark.queries_llm",
    "knowledgebot_spark.queries_relational",
    "knowledgebot_spark.queries_tpch",
    "knowledgebot_spark.queries_streaming",
    "knowledgebot_spark.queries_pipeline",
)


_LAST_GREEN_CACHE: dict[str, int] | None = None


def last_green_round() -> dict[str, int]:
    """name -> round number of the LATEST ``hash_match: true`` row across
    all driver correctness files (repo-root ``CORRECTNESS_r*.json``).
    Names absent from the map have never been hash-green.  Cached per
    process; unreadable/absent files contribute nothing (first round, or
    a stripped deployment, degrades to plain module ordering)."""
    global _LAST_GREEN_CACHE
    if _LAST_GREEN_CACHE is None:
        import json
        import re
        from pathlib import Path

        last: dict[str, int] = {}
        root = Path(__file__).resolve().parents[1]
        for path in sorted(root.glob("CORRECTNESS_r*.json")):
            m = re.search(r"_r(\d+)", path.stem)
            if not m:
                continue
            rnd = int(m.group(1))
            try:
                data = json.loads(path.read_text())
            except Exception:
                continue
            for name, row in data.items():
                if isinstance(row, dict) and row.get("hash_match") is True:
                    last[name] = max(last.get(name, 0), rnd)
        _LAST_GREEN_CACHE = last
    return _LAST_GREEN_CACHE


def driver_green() -> frozenset[str]:
    """Query names with a ``hash_match: true`` row in ANY round's driver
    correctness file."""
    return frozenset(last_green_round())


def load() -> dict[str, QueryDef]:
    last = last_green_round()
    for mod in _MODULES:
        importlib.import_module(mod)
    from knowledgebot_spark import stamps

    changed = stamps.changed_since_stamp(last)
    rank = {mod: i for i, mod in enumerate(_OUTPUT_ORDER)}
    items = list(_REGISTRY.items())  # insertion order == registration order
    items.sort(
        key=lambda kv: (
            # never-checked (0) < changed-since-stamp (1) < merely stale (2)
            0 if kv[0] not in last else (1 if kv[0] in changed else 2),
            last.get(kv[0], 0),  # within a class: stalest evidence first
            rank.get(kv[1].fn.__module__, len(rank)),
        )
    )
    return dict(items)  # sort() is stable: registration order within module


# Runtime-settable confs the engine depends on, applied defensively in case
# the caller (driver harness) built its own SparkSession without them:
#   * UTC session TZ — P4/P5 date derivations assume it (KnowledgeBot.py:481);
#   * no partition-type inference — the keyed sink round-trips its schema.
# (spark.sql.legacy.parquet.nanosAsLong is gone: Spark 4.1 accepts-but-ignores
# it and reads TIMESTAMP(NANOS) as TIMESTAMP_NTZ natively; a silently-ignored
# conf here is how round 3's streaming epoch bug slipped in.)
_REQUIRED_CONFS = (
    ("spark.sql.session.timeZone", "UTC"),
    ("spark.sql.sources.partitionColumnTypeInference.enabled", "false"),
    ("spark.sql.execution.arrow.pyspark.enabled", "true"),
)


def ensure_confs(spark: SparkSession) -> None:
    for key, value in _REQUIRED_CONFS:
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # static conf in this session; engine sessions set it at build


def _with_confs(fn: QueryFn) -> QueryFn:
    def wrapped(spark: SparkSession, sf_dir: str):
        ensure_confs(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def queries() -> dict[str, QueryFn]:
    return {name: _with_confs(qd.fn) for name, qd in load().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.sql for name, qd in load().items() if qd.sql is not None}
