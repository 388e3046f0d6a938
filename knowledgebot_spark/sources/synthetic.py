"""Custom Python data source (Spark 4 DataSource API, §2.3 scans row).

The reference reads from a live service API (Slack conversations.history,
KnowledgeBot.py:214-260) — an imperative, paginated, rate-limited source
that no file reader models.  This is the Spark-native answer: a DSv2
Python DataSource whose ``partitions()`` declares the parallel fetch plan
(one InputPartition per shard/cursor) and whose ``read(partition)``
generator yields rows for exactly its own slice — executors fetch in
parallel, restarts re-fetch only their partition, and the optimizer sees
an ordinary relation.

The synthetic generator here stands in for the HTTP client (deterministic
ids/payloads so the DuckDB oracle can verify the scan end-to-end); a real
Slack source swaps the row generator for paginated API calls with the
cursor in the partition value — the Spark plumbing is identical.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class SyntheticDocsDataSource(DataSource):
    """``spark.read.format("synthetic_docs").option("n", …).option("parts", …)``"""

    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, shard int, payload string"

    def reader(self, schema) -> "SyntheticDocsReader":
        return SyntheticDocsReader(self.options)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))

    def partitions(self):
        # the parallel fetch plan: one partition per shard (for a live API
        # source these carry page cursors / channel ids)
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition):
        shard = partition.value
        for doc_id in range(shard, self.n, self.parts):
            yield (doc_id, shard, f"doc-{doc_id:08d}")


def register_sources(spark) -> None:
    """Idempotent per-session registration."""
    try:
        spark.dataSource.register(SyntheticDocsDataSource)
    except Exception:
        pass  # already registered in this session


# --- streaming variant --------------------------------------------------------

class SyntheticEventsStreamSource(DataSource):
    """Streaming Python data source (Spark 4 ``simpleStreamReader`` API):
    deterministic event micro-batches with real offset management — the
    Spark-native model of a cursor-paginated service API consumed as a
    stream (the reference polls Slack history with a ``oldest`` cursor;
    this is that loop inverted into a source the engine schedules).

    ``read(start)`` returns every batch available beyond ``start`` in one
    call (Trigger.AvailableNow snapshots availability at ONE read), and
    ``readBetweenOffsets`` replays any committed range exactly — restart
    safety comes from offsets alone, not source state."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events_stream"

    def schema(self) -> str:
        return "event_id bigint, batch int"

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options) -> None:
        self.max_batches = int(options.get("batches", 5))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))

    def initialOffset(self) -> dict:
        return {"v": 0}

    def _rows(self, lo: int, hi: int):
        # a LIST, not a generator: the engine's prefetch cache copy.copy()s
        # the returned iterator, which generators don't support
        r = self.rows_per_batch
        return [(b * r + i, b) for b in range(lo, hi) for i in range(r)]

    def read(self, start: dict):
        v = start["v"]
        if v >= self.max_batches:
            return [], start
        return self._rows(v, self.max_batches), {"v": self.max_batches}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["v"], end["v"])


def register_stream_sources(spark) -> None:
    try:
        spark.dataSource.register(SyntheticEventsStreamSource)
    except Exception:
        pass
