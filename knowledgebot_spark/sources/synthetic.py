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

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


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
