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
    "knowledgebot_spark.queries_llm",
    "knowledgebot_spark.queries_streaming",
    "knowledgebot_spark.queries_formats",
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


def load() -> dict[str, QueryDef]:
    for mod in _MODULES:
        importlib.import_module(mod)
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: qd.fn for name, qd in load().items()}


def oracle_sql() -> dict[str, str]:
    return {name: qd.sql for name, qd in load().items() if qd.sql is not None}
