"""Custom streaming Python data sink (Spark 4 ``DataSourceStreamWriter``).

The reference's write path is imperative file emission (K1: one .txt per
chunk, KnowledgeBot.py:406-419).  This is that writer as an engine-managed
streaming sink with an exactly-once commit protocol:

* ``write(iterator)`` runs per partition per micro-batch and stages rows
  into a task-private temp file (never visible to readers);
* ``commit(messages, batchId)`` runs once per batch on the driver and
  atomically renames every staged file to its final ``b{batchId}_`` name —
  a replayed batch re-stages and re-renames the same content, so retries
  cannot double-write;
* ``abort`` removes staged temp files on task/batch failure.

At 100 TB the same protocol holds: task-side staging + driver-side commit
is how every transactional Spark sink (file/Delta/Iceberg) achieves
exactly-once on top of at-least-once task execution.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    WriterCommitMessage,
)


class JsonLinesCommit(WriterCommitMessage):
    def __init__(self, path: str, count: int) -> None:
        self.path = path
        self.count = count


class JsonLinesSinkDataSource(DataSource):
    """``df.writeStream.format("jsonlines_sink").option("path", …)``"""

    @classmethod
    def name(cls) -> str:
        return "jsonlines_sink"

    def streamWriter(self, schema, overwrite) -> "JsonLinesStreamWriter":
        return JsonLinesStreamWriter(self.options)


class JsonLinesStreamWriter(DataSourceStreamWriter):
    def __init__(self, options) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlines_sink requires option 'path'")

    def write(self, iterator):
        from pyspark import TaskContext

        part = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp_{part}_{os.getpid()}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return JsonLinesCommit(tmp, n)

    def commit(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            if m.count:
                final = m.path.replace("_tmp_", f"b{batchId}_p")
                os.replace(m.path, final)
            else:
                os.remove(m.path)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def register_sink(spark) -> None:
    try:
        spark.dataSource.register(JsonLinesSinkDataSource)
    except Exception:
        pass
